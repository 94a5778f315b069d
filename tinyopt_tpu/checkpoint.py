"""Checkpoint / resume for long-running solves.

The reference has no checkpointing (its solves are µs–ms scale;
SURVEY.md §5.4) — its closest analogues are the ``InitWith`` warm start
and the per-iteration history.  At TPU batch scale a solve can run long
enough to be worth checkpointing, so this module exposes the segmented
loop execution (the same machinery as the ``max_duration_ms`` timeout
driver, optimize.py) as a public API plus orbax persistence:

    solver = segment_solver(fn, options, x_example, iters_per_segment=10)
    x, out, st = solver.start(x0)           # first 10 iterations
    save_state(path, st)                    # ... process dies ...
    st = load_state(path, solver.abstract_state(x0))
    x, out, st = solver.resume(st)          # next 10, EXACT continuation

Resuming is bit-exact: the segment state is the complete loop carry
(λ schedule with compounded bad factors, accept/reject flags, failure
budgets, first-order optimizer state, Rebuild(false) flags), so N
segments of k iterations follow the identical trajectory to one N·k
iteration solve (the contract pinned by optimize._optimize_with_timeout
and tests/test_checkpoint.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import manifold as mf
from .optimize import _build_system
from .optimizers.loop import optimize_from_acc
from .options import Options
from .stop_reasons import StopReason


@dataclasses.dataclass
class SegmentSolver:
    """Jitted (start, resume) pair running ``iters_per_segment``
    iterations per call with full state continuity."""

    start: Callable     #: x0 -> (x, Output, state)
    resume: Callable    #: state -> (x, Output, state)
    options: Options
    _x_example: Any

    def abstract_state(self, x_example=None):
        """ShapeDtypeStruct pytree of the segment state — the restore
        template for :func:`load_state`."""
        x = mf.as_pytree(self._x_example if x_example is None
                         else x_example)
        return jax.eval_shape(self.start, x)[2]

    def run(self, x0, *, max_segments: int | None = None):
        """Drive segments until a terminal stop reason (anything but
        MAX_ITERS) or ``max_segments``.  Returns ``(x, Output, state)``."""
        x0 = mf.as_pytree(x0)
        x, out, st = self.start(x0)
        n = 1
        while int(out.stop_reason) in (int(StopReason.MAX_ITERS),
                                       int(StopReason.NONE)):
            if max_segments is not None and n >= max_segments:
                break
            x, out, st = self.resume(st)
            n += 1
        return x, out, st


def segment_solver(fn: Callable, options: Options | None = None,
                   x_example=None, *, mode: str = "auto",
                   iters_per_segment: int = 10) -> SegmentSolver:
    """Build a resumable solver running ``iters_per_segment`` loop
    iterations per device dispatch (see module docstring)."""
    options = options or Options()
    if x_example is None:
        raise ValueError("segment_solver requires x_example")
    x_example = mf.as_pytree(x_example)
    seg_opts = options.replace(max_iters=iters_per_segment,
                               max_duration_ms=0.0,
                               check_final_cost=False)
    acc, ev, _n_res, spec, num_diff_used, mode = _build_system(
        fn, seg_opts, mode, x_example)

    start = jax.jit(lambda x0: optimize_from_acc(
        x0, acc, ev, seg_opts, spec, num_diff_used=num_diff_used,
        return_state=True))
    resume = jax.jit(lambda st: optimize_from_acc(
        st.x, acc, ev, seg_opts, spec, num_diff_used=num_diff_used,
        segment_state=st, return_state=True))
    return SegmentSolver(start=start, resume=resume, options=options,
                         _x_example=x_example)


def save_state(path: str, state) -> None:
    """Persist a segment state (or any array pytree) with orbax."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree_util.tree_map(jnp.asarray, state),
               force=True)
    ckptr.wait_until_finished()


def load_state(path: str, abstract_state):
    """Restore a segment state saved by :func:`save_state`.

    ``abstract_state`` is the template from
    :meth:`SegmentSolver.abstract_state` (orbax needs the pytree
    structure and shapes/dtypes to restore into).
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, abstract_state)
