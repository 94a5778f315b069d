"""Levenberg-Marquardt damping schedule as pure state transitions.

Re-expresses the reference ``SolverLM`` damping strategy (reference:
include/tinyopt/solvers/lm.h:123-154) functionally: the state is a pair
(λ, bad_factor) carried through the jitted optimization loop.

Key semantics preserved:
  * good step: λ *= good_factor (default 1/3), or a quality-based scale
    ``max(s, 1 − (2q − 1)³)`` when a step quality is provided; any
    compounded bad factor from previous consecutive failures is reverted
    (lm.h:123-137).
  * bad step: λ *= bad_factor, and bad_factor itself doubles each
    consecutive failure (lm.h:140-145).
  * failed linear solve: same as a bad step (lm.h:148).
  * λ clamped to ``damping_range`` (default [1e-9, 1e9]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LMState(NamedTuple):
    lam: jax.Array          #: damping factor λ
    bad_factor: jax.Array   #: current compounding bad-step scale


def lm_init(opts, dtype) -> LMState:
    return LMState(
        lam=jnp.asarray(opts.lm.damping_init, dtype),
        bad_factor=jnp.asarray(opts.lm.bad_factor, dtype),
    )


def _clamp(lam, opts):
    lo, hi = opts.lm.damping_range
    return jnp.clip(lam, lam.dtype.type(lo), lam.dtype.type(hi))


def lm_good_step(state: LMState, quality, opts) -> LMState:
    gf = state.lam.dtype.type(opts.lm.good_factor)
    s = jnp.where(
        quality != 0,
        jnp.maximum(gf, 1.0 - (2.0 * quality - 1.0) ** 3),
        gf,
    ).astype(state.lam.dtype)
    # Revert the compounded bad factors if the previous "bad" steps led here
    base_bad = state.lam.dtype.type(opts.lm.bad_factor)
    s = jnp.where(state.bad_factor != base_bad, s / state.bad_factor, s)
    return LMState(lam=_clamp(state.lam * s, opts), bad_factor=jnp.full_like(state.bad_factor, base_bad))


def lm_bad_step(state: LMState, opts) -> LMState:
    base_bad = state.lam.dtype.type(opts.lm.bad_factor)
    return LMState(
        lam=_clamp(state.lam * state.bad_factor, opts),
        bad_factor=state.bad_factor * base_bad,
    )


def lm_failed_step(state: LMState, opts) -> LMState:
    return lm_bad_step(state, opts)


def tr_bad_step(state: LMState, opts) -> LMState:
    """DOGLEG rejection: fixed shrink, NO compounding.

    lm.h's compounding bad factor (2, 4, 8, ...) is right for LM — each
    escalation also rotates the step toward −g, so acceptance usually
    arrives within a couple of tries.  For a trust RADIUS it collapses
    double-geometrically through rejection/rollback pairs (the rollback
    re-evaluation is itself a "bad step", reference optimizer.h:427-448),
    after which the first accepted radius-clipped step is ~1e-8 of the
    natural scale and spuriously fires MIN_DELTA_NORM (measured on Wood:
    stall at cost 7.74 with |∇| = 5).  Classic TR shrinks by a fixed
    factor per rejection (Nocedal & Wright alg. 4.1, Δ ← Δ/4).
    """
    return LMState(
        lam=_clamp(state.lam * state.lam.dtype.type(opts.lm.bad_factor),
                   opts),
        bad_factor=state.bad_factor,
    )
