"""Whole-solve fused Pallas kernel: the full batched LM/GN loop on-chip.

The batched solver's remaining HBM cost is structural: every outer LM
iteration XLA materializes the batch's Jacobians (B, n_res, d) and normal
equations (B, d, d) to HBM between the accumulate, solve, and accept/reject
stages.  This kernel fuses the ENTIRE solve — residual + Jacobian via
forward-mode AD, JᵀJ/JᵀR accumulation, per-instance LM damping, the
Jacobi-preconditioned CG solve, accept/reject/rollback, λ schedule and the
stop-reason cascade — into one Pallas program: each batch tile's state
lives in VMEM from x₀ to convergence, and HBM traffic collapses to the
problem inputs and outputs.

The user's residual function is traced *inside* the kernel body (Pallas
kernels are ordinary JAX traces), so any residual whose ops Mosaic can
lower — elementwise math (including transcendentals), small matmuls —
runs on-chip, differentiated by ``jax.jvp``/``jax.vjp`` exactly like the
XLA path (diff/auto).  Known Mosaic gaps: no floating-point iota (write
``jnp.arange(n, dtype=jnp.int32).astype(f32)``), no gathers.  A residual
the kernel cannot lower falls back to the identical-semantics vmapped XLA
path at first call (parallel/batched._with_vmap_fallback).

Manifold parameters (SO3/SE3/SE23 and any registered ``Manifold``) are
supported natively: the kernel keeps the flat ambient parameters (P per
instance, e.g. quaternion+translation = 7 per pose) in VMEM, differentiates
``δ ↦ r(x ⊞ δ)`` at δ = 0 on the tangent space (D = 6 per pose), and applies
accepted steps through the registered retraction — all traced into the same
Mosaic program (exp/compose maps are elementwise math).

Semantics are bit-compatible with the ``hessian.carry_system=False`` +
``hessian.solver="cg"`` configuration of the jitted while-loop
(optimizers/loop.py): same accumulate-at-current-point build, same retry /
λ-escalation, acceptance, rollback/probe, failure budgets and stop-reason
cascade (reference behavior: include/tinyopt/optimizers/optimizer.h:243-534,
lm.h:123-154).  ``tests/test_fused.py`` asserts the parity against the XLA
path instance-by-instance.

No reference counterpart: the reference is single-instance CPU (SURVEY.md
§2.3); this is the "fused accumulate+solve" deliverable of BASELINE.md
taken to its endpoint.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .. import manifold as mf
from ..cost import Cost
from ..options import Options, SolverType
from ..output import Output
from ..stop_reasons import StopReason
from .pallas_cg import pcg_core

_I32 = jnp.int32


class _XLayout(NamedTuple):
    """Static layout of a flat parameter vector (possibly on a manifold).

    ``dims`` counts flattened parameter scalars (P, e.g. 7 per SE3 pose:
    quaternion + translation); ``t_dims`` counts tangent dimensions (D,
    e.g. 6 per pose).  For pure-Euclidean parameters P == D and the
    retraction is plain addition.  ``treedef`` is the array-level treedef:
    unflattening it rebuilds manifold objects (they are registered
    pytrees).
    """
    treedef: Any
    shapes: tuple
    sizes: tuple
    dims: int                 # P: flattened parameter scalars
    t_dims: int               # D: tangent dimension (step/gradient width)
    spec: Any                 # mf.TangentSpec of one instance
    has_manifold: bool
    dtype: Any


def _x_layout(x_example) -> _XLayout | None:
    """Flat layout of ``x`` if all array leaves share one float dtype."""
    x_example = mf.as_pytree(x_example)
    leaves, treedef = jax.tree_util.tree_flatten(x_example)
    has_manifold = any(
        mf.manifold_for(l) is not None
        for l in jax.tree_util.tree_flatten(
            x_example, is_leaf=mf._is_manifold_leaf)[0])
    shapes, sizes = [], []
    dtype = None
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return None
        if dtype is None:
            dtype = arr.dtype
        elif arr.dtype != dtype:
            return None                       # mixed dtypes: XLA path only
        shapes.append(arr.shape)
        sizes.append(int(arr.size))
    if dtype is None or sum(sizes) == 0:
        return None
    spec = mf.tangent_spec(x_example)
    return _XLayout(treedef, tuple(shapes), tuple(sizes), sum(sizes),
                    spec.dims, spec, has_manifold, dtype)


def fused_supported(options: Options, mode: str, x_example,
                    n_res: int | None = None) -> bool:
    """Whether the fused whole-solve kernel covers this configuration.

    The fused path implements the ``carry_system=False`` loop semantics
    with the CG normal-equation solver and no in-loop host effects; any
    other configuration silently uses the (identical-semantics) XLA path.
    """
    o = options
    if o.solver_type not in (SolverType.LEVENBERG_MARQUARDT,
                             SolverType.GAUSS_NEWTON,
                             SolverType.DOGLEG):
        return False
    if mode != "residuals":
        return False
    if (o.hessian.save_last or o.hessian.carry_system
            or o.check_final_cost or o.log.enable
            or o.max_duration_ms > 0
            or o.stop_callback is not None or o.stop_callback2 is not None
            or o.hessian.check_min_H_diag > 0):
        return False
    if _x_layout(x_example) is None:
        return False
    if n_res is not None and n_res == 0:
        return False
    return True


def _flatten_batch_x(x_batch, layout: _XLayout) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(x_batch)
    cols = [jnp.reshape(jnp.asarray(l), (jnp.shape(l)[0], -1)) for l in leaves]
    return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=-1)


def _unflatten_x(xv: jax.Array, layout: _XLayout):
    leaves, off = [], 0
    for shp, sz in zip(layout.shapes, layout.sizes):
        leaves.append(jnp.reshape(xv[off:off + sz], shp))
        off += sz
    return jax.tree_util.tree_unflatten(layout.treedef, leaves)


def _solver_kernel(*refs, residual_fn, layout: _XLayout, data_treedef,
                   n_data: int, squeezed: tuple, n_res: int, opts: Options,
                   max_iters_total: int, coloring=None):
    """One batch tile, x₀ → converged x, entirely in VMEM."""
    d = layout.t_dims                             # tangent width (steps, g)
    P = layout.dims                               # flat parameter width
    dtype = layout.dtype
    x0 = refs[0][:]                               # (BT, P)
    # Rank-1 data leaves arrive lifted to (BT, 1) (Mosaic block-shape
    # constraint); squeeze them back before handing to the residual fn.
    data_vals = [r[:][:, 0] if sq else r[:]
                 for r, sq in zip(refs[1:1 + n_data], squeezed)]
    # Identity colorings need no constants at all: the single probe is
    # all-ones (synthesized in-kernel) and the recovery contraction is a
    # slice, so neither array is shipped to VMEM (see fused_batched_solver).
    n_extra = 2 if (coloring is not None and not coloring.identity) else 0
    if n_extra:
        probes_ref, recovery_ref = refs[1 + n_data:1 + n_data + 2]
    cap = max_iters_total if opts.save_history else 0
    out_refs = refs[1 + n_data + n_extra:]
    if cap:
        (x_ref, cost_ref, rerr_ref, stop_ref, it_ref, nfail_ref, nconsec_ref,
         lam_ref, g_ref, nres_ref,
         errs_ref, deltas_ref, succ_ref, nhist_ref) = out_refs
    else:
        (x_ref, cost_ref, rerr_ref, stop_ref, it_ref, nfail_ref, nconsec_ref,
         lam_ref, g_ref, nres_ref) = out_refs

    BT = x0.shape[0]
    is_lm = opts.solver_type == SolverType.LEVENBERG_MARQUARDT
    is_dl = opts.solver_type == SolverType.DOGLEG
    lam_sched = is_lm or is_dl            # λ-scheduled solver families
    max_tries = (opts.max_consec_failures
                 if opts.max_consec_failures > 0 else 255)
    cg_iters = opts.hessian.cg_iters or d
    big = jnp.asarray(jnp.inf, dtype)

    def res_flat(xv, data_i):
        from ..diff.auto import flatten_residuals
        x_tree = _unflatten_x(xv, layout)
        if data_treedef is None:
            out = residual_fn(x_tree)
        else:
            out = residual_fn(
                x_tree, jax.tree_util.tree_unflatten(data_treedef, data_i))
        return flatten_residuals(out).astype(dtype)

    def ret_flat(xv, dv):
        """Flat manifold retraction x ⊞ δ: (P,) ⊞ (d,) -> (P,).

        Pure-Euclidean parameters use plain addition (P == d); manifold
        leaves dispatch through the registry retraction (quaternion
        exp/compose for SO3/SE3 — all Mosaic-lowerable elementwise math),
        exactly the map the XLA path differentiates (diff/auto
        residual_jacobian: δ ↦ r(retract(x, δ)) at δ = 0).
        """
        if not layout.has_manifold:
            return xv + dv
        x2 = mf.retract(_unflatten_x(xv, layout), dv, layout.spec)
        parts = [jnp.ravel(jnp.asarray(a))
                 for a in jax.tree_util.tree_leaves(x2)]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    def linearize_at(x):
        """Linearize the batched tangent map δ ↦ r(x ⊞ δ) at δ = 0.

        Returns ``(r, jvp_fn, vjp_fn)``: primal residuals (BT, n_res) and
        tangent-only linear maps (BT, d) → (BT, n_res) and back.  The
        primal chain (residual evaluation + manifold retraction trace) is
        evaluated ONCE per linearization point and its intermediates are
        shared by every subsequent application — the d diag-sweep jvps and
        the 2·cg_iters CG matvec sweeps — instead of being recomputed
        inside each ``jax.jvp``/``jax.vjp`` call (the dominant kernel cost
        before this: ~135 primal+tangent evaluation units per outer
        iteration, now ~70 tangent-only ones).  J is the tangent-space
        Jacobian ∂r(x ⊞ δ)/∂δ at δ = 0, exactly the map the XLA path
        differentiates (diff/auto residual_jacobian).
        """
        def G(dmat):
            def one(x_i, d_i, *data_i):
                if layout.has_manifold:
                    return res_flat(ret_flat(x_i, d_i), data_i)
                return res_flat(x_i + d_i, data_i)
            return jax.vmap(one)(x, dmat, *data_vals)

        zero_t = x[:, :1] * jnp.zeros((1, d), dtype)       # (BT, d) zeros
        r, jvp_fn = jax.linearize(G, zero_t)
        vjp_lin = jax.linear_transpose(jvp_fn, zero_t)
        return r, jvp_fn, (lambda q: vjp_lin(q)[0])

    def accumulate(x, r, jvp_fn, vjp_fn):
        """diag(H) (BT, d), g (BT, d), err (BT, 1) — matrix-free.

        The normal matrix H = JᵀJ is never materialized: g = Jᵀr comes from
        one reverse-mode sweep and the CG solve applies H as p ↦ Jᵀ(J p)
        (jvp+vjp, diff/auto semantics, reference
        diff/optimize_autodiff.h:149-164).  Only diag(H) — needed for the
        reference's multiplicative damping and the Jacobi preconditioner —
        is built explicitly, as the row-sum-of-squares of the basis-jvp
        Jacobian.  This keeps every per-CG-iteration op 2-D (BT, n) where
        Mosaic vectorizes across the whole tile; explicit (BT, d, d) tiles
        lower to per-instance loops and were ~10× slower end-to-end.
        """
        g = vjp_fn(r)                              # JᵀR

        if coloring is not None:
            # Curtis–Powell–Reid colored probing (ops/coloring.py): one jvp
            # sweep per color, then diag_j = Σ_i (J p_{color(j)})_i² · S_ij
            # as a single constant one-hot contraction on the MXU
            # (precision HIGHEST: the recovery sum must be exact f32 —
            # colored diag equals the per-dimension diag bit-for-bit up to
            # summation order, keeping parity with the XLA path).
            if coloring.identity:
                # J is exactly diagonal (row i ↔ dim i): the single probe
                # is all-ones and the recovery contraction is the identity
                # on the first d lanes — no constants, no 6-pass HIGHEST
                # matmul per outer iteration.
                Jp = jvp_fn(jnp.ones((BT, d), dtype))
                diagH = (Jp * Jp)[:, :d]
            else:
                probes = probes_ref[:]             # (C, d)
                sqs = []
                for c in range(coloring.n_colors):
                    Jp = jvp_fn(
                        jnp.broadcast_to(probes[c:c + 1, :], (BT, d)))
                    sqs.append(Jp * Jp)
                SQ = (sqs[0] if len(sqs) == 1
                      else jnp.concatenate(sqs, axis=-1))
                diagH = jnp.dot(SQ, recovery_ref[:],  # (BT, C·n) @ (C·n, d)
                                precision=jax.lax.Precision.HIGHEST)
        else:
            # Generic fallback: diag(H)_j = ‖J e_j‖², one 2-D jvp sweep per
            # tangent dim, accumulated into the j-th column with a one-hot
            # mask.  Shapes stay (BT, n) throughout: a batched basis-jvp
            # would materialize a rank-3 (BT, d, n_res) tile, which Mosaic
            # processes one instance (one sub-tile) at a time — measured
            # ~10× slower end-to-end.  Sweeps run in a fori_loop over
            # chunks of K with the chunk body unrolled: full unrolling of
            # all d sweeps blows up Mosaic compile time, while one sweep
            # per loop trip pays per-trip loop overhead d times.
            jj = jax.lax.broadcasted_iota(_I32, (1, d), 1)
            K = 8

            def diag_chunk(c, diagH):
                for i in range(K):
                    j = c * K + i                  # dynamic column index
                    e_j = (jj == j).astype(dtype)  # (1, d) one-hot
                    Jej = jvp_fn(jnp.broadcast_to(e_j, (BT, d)))
                    dj = jnp.sum(Jej * Jej, axis=-1)[:, None]     # (BT, 1)
                    # j >= d contributes a zero mask — padding no-ops
                    diagH = diagH + dj * e_j
                return diagH

            diagH = jax.lax.fori_loop(0, (d + K - 1) // K, diag_chunk,
                                      jnp.zeros((BT, d), dtype))

        err = jnp.sum(r * r, axis=-1)[:, None]
        # Cost scaling (reference solvers/base.h:41-45 order)
        if not opts.cost.use_squared_norm:
            err = jnp.sqrt(err)
        if opts.cost.downscale_by_2:
            err = 0.5 * err
        if opts.cost.normalize:
            err = err / dtype.type(max(n_res, 1))
        if opts.grad_clipping > 0:
            v = dtype.type(opts.grad_clipping)
            g = jnp.clip(g, -v, v)
        return diagH, g, err

    # Per-instance scalar state is kept as (BT, 1) columns throughout:
    # Mosaic's layout engine handles f32 1-D vectors (the CG kernel's
    # pattern) but not i32/bool 1-D relayouts (minor-dim insertion,
    # 1-D→2-D shape casts for full reductions, boolean-valued selects all
    # fail); 2-D columns sidestep every such case.  Float lane-reductions
    # go through the known-good "reduce to (BT,) then [:, None]" pattern.

    def all_lanes(pred):
        """(BT, d) bool -> (BT, 1) bool: all() via an f32 min-reduce."""
        return jnp.min(pred.astype(dtype), axis=-1)[:, None] > 0.5

    def any_inst(mask):
        """(BT, 1) bool -> scalar any(), reduced in f32."""
        return jnp.max(mask.astype(dtype)) > 0.5

    def nm_solve(jvp_fn, vjp_fn, diagH, g, dampl):
        """Solve the (damped) normal equations (H ⊕ dampl) dx = −g.

        Same damping semantics as solvers/step.propose_step (multiplicative
        H[i,i]·(1+λ); absolute λ for exactly-zero diagonals, ops/linalg
        damp_diagonal) and the same Jacobi-preconditioned CG formulas, with
        the matvec applied as Jᵀ(J p) through the shared linearization.
        """
        def matvec(p):
            return vjp_fn(jvp_fn(p)) + dampl * p

        diag_d = diagH + dampl                    # diagonal of damped H
        dinv = jnp.where(diag_d > 0,
                         1.0 / jnp.where(diag_d > 0, diag_d, 1.0), 1.0)
        if coloring is not None and coloring.n_colors == 1:
            # One color == every pair of Jacobian columns has disjoint row
            # support == H = JᵀJ is EXACTLY diagonal (all off-diagonal
            # inner products are structurally zero).  The damped normal
            # equations then solve in closed form — the entire CG loop
            # (2·cg_iters jvp/vjp sweeps) disappears.  This is the same
            # answer Jacobi-PCG reaches exactly on its first iteration.
            return -g * dinv
        return pcg_core(matvec, dinv, -g, cg_iters, unroll=True)

    def rowsum(a):
        return jnp.sum(a, axis=-1)[:, None]

    def propose_dogleg(jvp_fn, vjp_fn, diagH, g, lam):
        """Rowwise Powell dogleg — solvers/step.dogleg_core semantics on
        (BT, d) rows with (BT, 1) scalar columns.

        Same geometry, same κ-capped step-length-relative radius
        Δ = ref/λ, same Levenberg fallback for insane GN steps (see the
        dogleg_core/_dogleg_step docstrings for the measured rationale).
        The fallback solve is gated by a SCALAR lax.cond on "any instance
        needs it": the common all-GN-sane tile pays exactly one (undamped)
        CG solve plus one curvature matvec per outer iteration.  Boolean
        combinations use logical ops, never boolean-valued selects
        (Mosaic constraint, see the layout comment above).
        """
        tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
        dx_gn = nm_solve(jvp_fn, vjp_fn, diagH, g, jnp.zeros_like(diagH))
        ok_gn = all_lanes(jnp.isfinite(dx_gn))
        dx_gn = jnp.where(ok_gn, dx_gn, jnp.zeros_like(dx_gn))
        gg = rowsum(g * g)
        gHg = rowsum(g * vjp_fn(jvp_fn(g)))       # curvature along −g
        pos_curv = gHg > 0
        alpha = jnp.where(pos_curv, gg / jnp.where(pos_curv, gHg, 1.0),
                          dtype.type(0))
        dx_sd = (-alpha) * g                      # Cauchy point
        n_gn2 = rowsum(dx_gn * dx_gn)
        n_sd2 = rowsum(dx_sd * dx_sd)
        kappa2 = dtype.type(1e6)
        gn_sane = ok_gn & ((n_sd2 <= 0) | (n_gn2 <= kappa2 * n_sd2))
        # Insane GN → two-stage Levenberg fallback (solvers/step.
        # dogleg_core): first the schedule's own λ (gauge-singular
        # problems — LM-grade step), escalating to λ_eff = max(λ, 1)
        # only when that step is itself κ-insane (truly singular
        # minima).  Each stage is solved for the whole tile only when
        # at least one instance needs it.
        need_reg = ~gn_sane
        damp = jnp.where(diagH == 0, jnp.ones_like(diagH), diagH)

        def run_reg1(_):
            return nm_solve(jvp_fn, vjp_fn, diagH, g, damp * lam)

        dx_r1 = jax.lax.cond(any_inst(need_reg), run_reg1,
                             lambda _: jnp.zeros_like(g), 0)
        ok_r1 = need_reg & all_lanes(jnp.isfinite(dx_r1))
        n_r1 = rowsum(dx_r1 * dx_r1)
        r1_sane = ok_r1 & ((n_sd2 <= 0) | (n_r1 <= kappa2 * n_sd2))
        need2 = need_reg & (~r1_sane)

        def run_reg2(_):
            lam_eff = jnp.maximum(lam, dtype.type(1.0))
            return nm_solve(jvp_fn, vjp_fn, diagH, g, damp * lam_eff)

        dx_r2 = jax.lax.cond(any_inst(need2), run_reg2,
                             lambda _: jnp.zeros_like(g), 0)
        ok_r2 = need2 & all_lanes(jnp.isfinite(dx_r2))
        dx_reg = jnp.where(r1_sane, dx_r1, dx_r2)
        ok_reg = r1_sane | ok_r2
        dx_reg = jnp.where(ok_reg, dx_reg, dx_sd)
        n_reg2 = rowsum(dx_reg * dx_reg)
        ref2 = jnp.where(gn_sane, n_gn2,
                         jnp.where(ok_reg, n_reg2,
                                   jnp.where(pos_curv & (n_sd2 > 0),
                                             n_sd2, gg)))
        radius = jnp.sqrt(jnp.maximum(ref2, tiny)) / lam
        bd_len = jnp.where(pos_curv & (n_sd2 > 0),
                           jnp.minimum(radius, jnp.sqrt(n_sd2)), radius)
        dx_bd = jnp.where(gg > 0,
                          -(bd_len / jnp.sqrt(jnp.maximum(gg, tiny))),
                          dtype.type(0)) * g
        reg_scale = jnp.minimum(
            1.0, radius / jnp.sqrt(jnp.maximum(n_reg2, tiny)))
        dx_reg = reg_scale * dx_reg
        dvec = dx_gn - dx_sd
        qa = jnp.maximum(rowsum(dvec * dvec), tiny)
        qb = 2.0 * rowsum(dx_sd * dvec)
        qc = n_sd2 - radius * radius
        disc = jnp.maximum(qb * qb - 4.0 * qa * qc, 0.0)
        tau = (-qb + jnp.sqrt(disc)) / (2.0 * qa)
        dx_mid = dx_sd + jnp.clip(tau, 0.0, 1.0) * dvec
        use_gn = gn_sane & (n_gn2 <= radius * radius)
        use_reg = (~gn_sane) & ok_reg
        use_bd = (~use_gn) & (~use_reg) & (
            (n_sd2 >= radius * radius) | (~pos_curv) | (~gn_sane))
        dx = jnp.where(use_gn, dx_gn,
                       jnp.where(use_reg, dx_reg,
                                 jnp.where(use_bd, dx_bd, dx_mid)))
        return dx, all_lanes(jnp.isfinite(dx))

    def propose(jvp_fn, vjp_fn, diagH, g, lam):
        """Step proposal: damped PCG (LM), undamped PCG (GN), or dogleg."""
        if is_dl:
            return propose_dogleg(jvp_fn, vjp_fn, diagH, g, lam)
        if is_lm:
            damp = jnp.where(diagH == 0, jnp.ones_like(diagH), diagH)
            dampl = damp * lam                    # (BT, d)
        else:
            dampl = jnp.zeros_like(diagH)
        dx = nm_solve(jvp_fn, vjp_fn, diagH, g, dampl)
        ok = all_lanes(jnp.isfinite(dx))
        return dx, ok

    # LM schedule on (BT, 1) λ columns (solvers/lm.py semantics, lm.h:123-154)
    lam_lo = dtype.type(opts.lm.damping_range[0])
    lam_hi = dtype.type(opts.lm.damping_range[1])
    base_bad = dtype.type(opts.lm.bad_factor)
    good_f = dtype.type(opts.lm.good_factor)

    def lm_good(lam, bad, quality):
        s = jnp.where(quality != 0,
                      jnp.maximum(good_f, 1.0 - (2.0 * quality - 1.0) ** 3),
                      good_f).astype(dtype)
        s = jnp.where(bad != base_bad, s / bad, s)
        return jnp.clip(lam * s, lam_lo, lam_hi), jnp.full_like(bad, base_bad)

    def lm_bad(lam, bad):
        return jnp.clip(lam * bad, lam_lo, lam_hi), bad * base_bad

    def dl_bad(lam, bad):
        # DOGLEG rejection/failure: FIXED shrink of the trust radius, no
        # compounding (solvers/lm.tr_bad_step — compounding collapses Δ
        # double-geometrically through rejection/rollback pairs).
        return jnp.clip(lam * base_bad, lam_lo, lam_hi), bad

    sched_bad = dl_bad if is_dl else lm_bad

    # ---- Outer loop carry (per-instance, loop.py _Carry no-carry mode) ----
    # Inits are derived from the loaded x0 (not plain constants) so the
    # while-carry layout is inferred as the natural vector layout; constant
    # inits get a fully-replicated layout and the yield→carry relayout of
    # computed values is unsupported in Mosaic.
    zvecP = x0 * dtype.type(0)                 # (BT, P) zeros, vector layout
    zcol = zvecP[:, :1]                        # (BT, 1) zeros
    # (BT, d) zeros: derived from loaded data (zcol) so the while-carry
    # layout is the natural vector layout even when d != P.
    zvecD = zvecP if d == P else zcol * jnp.zeros((1, d), dtype)
    zicol = zcol.astype(_I32)                  # (BT, 1) int zeros
    carry0 = (
        x0,                                    # x
        x0,                                    # best_x
        zcol + big,                            # best_cost
        zcol + jnp.asarray(jnp.inf, dtype),    # final_rerr
        zcol + dtype.type(opts.lm.damping_init),   # lam
        zcol + base_bad,                       # bad_factor
        zvecD,                                 # last_dx
        zicol,                                 # has_last_dx (0/1)
        zicol,                                 # it
        zicol,                                 # num_failures
        zicol,                                 # num_consec
        zicol + int(StopReason.NONE),          # stop
        zvecD,                                 # g (final_grad)
        zicol,                                 # best_num_res
    )
    if cap:
        # Per-iteration history (loop.py save_history semantics): fixed-cap
        # (BT, cap) rows in the carry, written by a one-hot column select
        # keyed on the per-instance iteration index (Mosaic has no per-row
        # dynamic scatter; the masked select is 3 cheap 2-D ops per iter).
        zhist = zcol * jnp.zeros((1, cap), dtype)      # (BT, cap) zeros
        carry0 = carry0 + (zhist, zhist, zhist.astype(_I32),
                           zicol)                       # errs/deltas2/succ/nh

    def active_of(stop, it):
        return (stop == int(StopReason.NONE)) & (it < max_iters_total)

    def outer_cond(c):
        return any_inst(active_of(c[11], c[8]))

    def outer_body(c):
        (x, best_x, best_cost, final_rerr, lam, bad, last_dx, has_last_i,
         it, num_failures, num_consec, stop, g_prev, best_nres) = c[:14]
        if cap:
            h_errs, h_deltas, h_succ, h_nh = c[14:]
        has_last = has_last_i != 0
        act = active_of(stop, it)

        r_lin, jvp_fn, vjp_fn = linearize_at(x)
        diagH, g, err = accumulate(x, r_lin, jvp_fn, vjp_fn)

        # --- Inner solve-retry with λ escalation (optimizer.h:356-399) ---
        def retry_cond(s):
            dx, ok_i, r_lam, r_bad, nf, nc, gu_i = s
            m = act & (ok_i == 0) & (gu_i == 0) & (nc <= max_tries)
            return any_inst(m)

        def retry_body(s):
            dx, ok_i, r_lam, r_bad, nf, nc, gu_i = s
            ok, give_up = ok_i != 0, gu_i != 0
            upd = act & (~ok) & (~give_up) & (nc <= max_tries)
            dx_new, ok_new = propose(jvp_fn, vjp_fn, diagH, g, r_lam)
            nf2 = nf + jnp.where(upd & (~ok_new), 1, 0).astype(_I32)
            nc2 = nc + jnp.where(upd & (~ok_new), 1, 0).astype(_I32)
            gu_new = (~ok_new) & (opts.max_consec_failures > 0) & (
                nc2 >= opts.max_consec_failures)
            if lam_sched:
                f_lam, f_bad = sched_bad(r_lam, r_bad)
            else:
                f_lam, f_bad = r_lam, r_bad
            esc = upd & (~ok_new) & (~gu_new)
            # Masks stored as i32 columns (no boolean-valued selects).
            return (jnp.where(upd & ok_new, dx_new, dx),
                    jnp.where(upd, ok_new.astype(_I32), ok_i),
                    jnp.where(esc, f_lam, r_lam),
                    jnp.where(esc, f_bad, r_bad),
                    jnp.where(upd, nf2, nf),
                    jnp.where(upd, nc2, nc),
                    jnp.where(upd, (give_up | gu_new).astype(_I32), gu_i))

        # First proposal outside the loop: in the overwhelmingly common
        # case every active instance's first solve succeeds (a damped
        # PSD system only yields a non-finite dx when the inputs are
        # already non-finite), and the whole retry machinery — two
        # while-cond evaluations plus ~10 masked state selects per outer
        # iteration — reduces to this one unmasked propose.  The slow
        # branch replays the identical first trip (same λ, deterministic
        # propose), so trajectories, counters and λ schedules are
        # bit-identical to the plain loop.
        dx1, ok1 = propose(jvp_fn, vjp_fn, diagH, g, lam)

        # dx/mask inits derived from carried values (same layout-inference
        # constraint as carry0).
        retry0 = (last_dx * dtype.type(0), it * 0,
                  lam, bad, num_failures, num_consec, it * 0)

        def retry_fast(s):
            dx0, ok_i, r_lam, r_bad, nf, nc, gu_i = s
            return (jnp.where(act, dx1, dx0), ok1.astype(_I32),
                    r_lam, r_bad, nf, nc, gu_i)

        def retry_slow(s):
            return jax.lax.while_loop(retry_cond, retry_body, s)

        # Fast-path eligibility must match the loop's ENTRY condition too:
        # an instance whose consecutive-failure count already exceeds
        # max_tries is never updated by the loop (solved stays 0 ->
        # SOLVER_FAILED), so it forces the slow branch rather than being
        # silently marked solved.
        all_first_ok = ~any_inst(act & ~(ok1 & (num_consec <= max_tries)))
        dx, solved_i, lam, bad, rs_nf, rs_nc, _gu = jax.lax.cond(
            all_first_ok, retry_fast, retry_slow, retry0)
        solved = solved_i != 0

        # --- Early failure routing (loop.py / optimizer.h:364-425) ---
        err_bad = (~jnp.isfinite(err)) | ~all_lanes(jnp.isfinite(g))
        # Algebraically identical to the nested solved/err_bad selects
        # (err_bad wins in both branches) with one fewer op on the chain.
        stop_early = jnp.where(
            err_bad, int(StopReason.SYSTEM_HAS_NAN_OR_INF),
            jnp.where(solved, int(StopReason.NONE),
                      int(StopReason.SOLVER_FAILED))).astype(_I32)
        dx_norm2 = jnp.sum(dx * dx, axis=-1)[:, None]
        dxn_bad = ~jnp.isfinite(dx_norm2)
        stop_early = jnp.where(
            (stop_early == 0) & dxn_bad,
            int(StopReason.SYSTEM_HAS_NAN_OR_INF), stop_early).astype(_I32)
        early_fail = stop_early != 0

        # --- Accept / reject (optimizer.h:427-459) ---
        derr = err - best_cost
        is_good = derr < 0
        from ..utils import float_epsilon
        feps = dtype.type(float_epsilon(dtype))
        rel_derr = jnp.where(
            (best_cost > feps) & jnp.isfinite(best_cost),
            (best_cost - err) / best_cost, dtype.type(0))
        first_eval = ~jnp.isfinite(best_cost)
        good = is_good | first_eval

        if lam_sched:
            # DOGLEG ignores the quality heuristic (loop.py: a low-quality
            # good step must not shrink a trust RADIUS).
            quality = (rel_derr
                       if opts.use_step_quality_approx and not is_dl
                       else jnp.zeros((BT, 1), dtype))
            g_lam, g_bad = lm_good(lam, bad, quality)
            b_lam, b_bad = sched_bad(lam, bad)
            apply_good = act & (~early_fail) & good & (~first_eval)
            apply_bad = act & (~early_fail) & (~good)
            lam = jnp.where(apply_good, g_lam,
                            jnp.where(apply_bad, b_lam, lam))
            bad = jnp.where(apply_good, g_bad,
                            jnp.where(apply_bad, b_bad, bad))

        accepted = (~early_fail) & good
        rejected = (~early_fail) & (~good)
        num_consec_new = jnp.where(
            accepted, 0,
            rs_nc + jnp.where(rejected, 1, 0)).astype(_I32)
        num_failures_new = (rs_nf + jnp.where(rejected, 1, 0)).astype(_I32)

        best_cost_new = jnp.where(accepted, err, best_cost)
        best_nres_new = jnp.where(accepted, n_res, best_nres).astype(_I32)
        final_rerr_new = jnp.where(accepted, rel_derr, final_rerr)

        budget_stop = jnp.where(
            rejected & (opts.max_consec_failures > 0)
            & (num_consec_new >= opts.max_consec_failures),
            int(StopReason.MAX_CONSEC_NO_DECR),
            jnp.where(
                rejected & (opts.max_total_failures > 0)
                & (num_failures_new >= opts.max_total_failures),
                int(StopReason.MAX_NO_DECR),
                int(StopReason.NONE))).astype(_I32)
        budget_fail = (stop_early == 0) & (budget_stop != 0)

        # --- Stop cascade (optimizer.h:518-534) ---
        # Priority encoding: the codes MIN_ERROR(1) < MIN_REL_ERROR(2) <
        # MIN_DELTA_NORM(3) < MIN_GRAD_NORM(4) ascend in exactly the
        # cascade's first-match order, so "minimum fired code" equals the
        # reference's sequential set-if chain — with the four predicates
        # evaluated in parallel (2-level min tree) instead of serially.
        grad_norm2 = jnp.sum(g * g, axis=-1)[:, None]
        NOHIT = jnp.asarray(127, _I32)
        cands = []

        def cand(pred, code):
            cands.append(jnp.where(pred, code, NOHIT).astype(_I32))

        if opts.min_error > 0:
            cand(err < opts.min_error, int(StopReason.MIN_ERROR))
        if opts.min_rerr_dec > 0:
            noise = dtype.type(8) * jnp.finfo(dtype).eps
            cand((rel_derr > noise) & (rel_derr < opts.min_rerr_dec),
                 int(StopReason.MIN_REL_ERROR))
        if opts.min_step_norm2 > 0:
            cand(dx_norm2 < opts.min_step_norm2,
                 int(StopReason.MIN_DELTA_NORM))
        if opts.min_grad_norm2 > 0:
            cand(grad_norm2 < opts.min_grad_norm2,
                 int(StopReason.MIN_GRAD_NORM))
        if cands:
            while len(cands) > 1:
                cands = [jnp.minimum(a, b)
                         for a, b in zip(cands[::2], cands[1::2])] + (
                    [cands[-1]] if len(cands) % 2 else [])
            cascade = jnp.where(cands[0] == NOHIT, 0, cands[0]).astype(_I32)
        else:
            cascade = jnp.zeros((BT, 1), _I32)

        stop_new = jnp.where(stop_early != 0, stop_early,
                             jnp.where(budget_stop != 0, budget_stop,
                                       cascade)).astype(_I32)

        # --- Apply / rollback / probe (loop.py, optimizer.h:266-299) ---
        # act is folded into the apply masks so inactive instances reduce
        # to x_new = x + 0, best_x_new = best_x, last_dx_new = last_dx —
        # the wide (BT, P)/(BT, d) final selects below then need no
        # separate act-gating (3 fewer wide ops on the serial chain).
        returned_dx = (~early_fail) & (~budget_fail)
        success = act & accepted & returned_dx
        fail = ~success
        probe = act & fail & (~has_last) & returned_dx
        roll = act & fail & has_last
        x_base = jnp.where(roll, best_x, x)
        # Terminal success or the instance's final iteration: freeze x at
        # the evaluated point (mirrors loop.py — no unevaluated trailing
        # proposal in the returned x).
        applied = jnp.where((success | probe) & (cascade == 0)
                            & (it + 1 < max_iters_total), dx,
                            jnp.zeros_like(dx))
        # Manifold step application: x ⊞ δ rowwise; a zero δ is an exact
        # no-op (exp(0) = identity quaternion bit-exactly), so the masked
        # instances are unchanged just like the Euclidean x + 0.
        if layout.has_manifold:
            x_new = jax.vmap(ret_flat)(x_base, applied)
        else:
            x_new = x_base + applied
        best_x_new = jnp.where(success, x, best_x)
        last_dx_new = jnp.where(success | probe, dx, last_dx)
        # i32-valued select chain (Mosaic: no boolean-valued selects)
        has_last_new = jnp.where(
            success, 1, jnp.where(has_last, 0, probe.astype(_I32)))

        def upd(new, old):
            return jnp.where(act, new, old)

        out = (x_new, best_x_new,
               upd(best_cost_new, best_cost),
               upd(final_rerr_new, final_rerr),
               upd(lam, c[4]), upd(bad, c[5]),
               last_dx_new, upd(has_last_new, has_last_i),
               upd(it + 1, it).astype(_I32),
               upd(num_failures_new, num_failures),
               upd(num_consec_new, num_consec),
               upd(stop_new, stop), upd(g, g_prev),
               upd(best_nres_new, best_nres))
        if cap:
            # One-hot column write at this instance's iteration index
            # (loop.py: entries appended unless the step was an early
            # failure; succ records is_good, not the auto-accept `good`).
            ii = jax.lax.broadcasted_iota(_I32, (1, cap), 1)
            rec = act & (~early_fail)
            mask = rec & (ii == it)                    # (BT, cap)
            out = out + (
                jnp.where(mask, err, h_errs),
                jnp.where(mask, dx_norm2, h_deltas),
                jnp.where(mask, is_good.astype(_I32), h_succ),
                jnp.where(rec, it + 1, h_nh).astype(_I32))
        return out

    c = jax.lax.while_loop(outer_cond, outer_body, carry0)

    # All per-instance scalars are already (BT, 1) columns.
    x_ref[:] = c[0]
    cost_ref[:] = c[2]
    rerr_ref[:] = c[3]
    stop_ref[:] = jnp.where(c[11] == int(StopReason.NONE),
                            int(StopReason.MAX_ITERS), c[11]).astype(_I32)
    it_ref[:] = c[8]
    nfail_ref[:] = c[9]
    nconsec_ref[:] = c[10]
    lam_ref[:] = c[4]
    g_ref[:] = c[12]
    nres_ref[:] = c[13]
    if cap:
        errs_ref[:] = c[14]
        deltas_ref[:] = c[15]
        succ_ref[:] = c[16]
        nhist_ref[:] = c[17]


def fused_batched_solver(residual_fn: Callable, options: Options,
                         x_example, data_example=None, *,
                         block: int = 256,
                         interpret: bool = False) -> Callable:
    """Build the fused whole-solve callable for a batch of instances.

    Returns ``solve(x0_batch[, data_batch]) -> (x_opt_batch, Output)`` with
    the exact result structure of ``vmap``-of-``optimize_from_acc`` under
    the same options.  Use :func:`fused_supported` first; this function
    raises on unsupported configurations.
    """
    layout = _x_layout(x_example)
    if layout is None or not fused_supported(options, "residuals", x_example):
        raise ValueError(
            "fused_batched_solver: configuration not supported (requires "
            "same-dtype float parameters, residuals mode, carry_system="
            "False, no save_last/logging/callbacks)")
    d = layout.t_dims                          # tangent width (dx, g)
    P = layout.dims                            # flat parameter width
    dtype = layout.dtype
    opts = options

    if data_example is None:
        data_treedef = None
        n_res = int(sum(
            l.size for l in jax.tree_util.tree_leaves(
                jax.eval_shape(residual_fn, x_example))))
    else:
        data_treedef = jax.tree_util.tree_structure(data_example)
        n_res = int(sum(
            l.size for l in jax.tree_util.tree_leaves(
                jax.eval_shape(residual_fn, x_example, data_example))))
    if n_res == 0:
        raise ValueError("fused_batched_solver: empty residuals")

    coloring = None
    if opts.hessian.diag_coloring == "auto":
        from .coloring import detect_diag_coloring
        coloring = detect_diag_coloring(residual_fn, x_example, data_example,
                                        layout.spec, n_res, d, dtype)

    max_iters_total = opts.max_iters + 1       # +1 rollback slot

    def solve(x0_batch, data_batch=None):
        xflat = _flatten_batch_x(x0_batch, layout).astype(dtype)
        B = xflat.shape[0]
        data_leaves = ([] if data_batch is None
                       else [jnp.asarray(l) for l in
                             jax.tree_util.tree_leaves(data_batch)])
        # Lift rank-1 leaves to (B, 1) for legal Mosaic block shapes.
        squeezed = tuple(l.ndim == 1 for l in data_leaves)
        data_leaves = [l[:, None] if sq else l
                       for l, sq in zip(data_leaves, squeezed)]

        # VMEM budget: the matrix-free kernel holds only 2-D (BT, d) /
        # (BT, n_res) vectors — loop state (~16 columns), CG workspace and
        # AD temporaries (~8 residual-width rows) — plus the per-tile data,
        # double-buffered across grid steps.  Bigger tiles mean fewer
        # sequential grid steps, so budget generously.
        d_lane = ((max(d, P) + 127) // 128) * 128
        r_lane = ((n_res + 127) // 128) * 128
        # Manifold retraction/log traces (quaternion exp/compose/log per
        # jvp sweep) hold several times more live rows than the plain
        # Euclidean accumulate — scale the temporary estimate accordingly.
        tmp_rows = 24 if layout.has_manifold else 8
        if coloring is not None:
            # + the concatenated per-color squared sweeps (BT, C·n_res)
            tmp_rows += coloring.n_colors
        cap = max_iters_total if opts.save_history else 0
        hist_lane = ((cap + 127) // 128) * 128 if cap else 0
        per_inst = ((16 * d_lane + tmp_rows * r_lane + 6 * hist_lane)
                    * jnp.dtype(dtype).itemsize)
        import math
        per_inst += sum(
            math.prod(l.shape[1:]) * l.dtype.itemsize for l in data_leaves)
        budget = int(__import__("os").environ.get(
            "TINYOPT_FUSED_VMEM_BUDGET", 9 * 1024 * 1024))
        if coloring is not None and not coloring.identity:
            # The coloring constants are resident once (not per-instance)
            crows = ((coloring.recovery.shape[0] + 7) // 8) * 8
            budget -= 2 * crows * d_lane * jnp.dtype(dtype).itemsize
        if opts.hessian.fused_block > 0:
            # Explicit tile size: used verbatim (the caller measured it);
            # only the hard Mosaic scoped-VMEM ceiling still applies.
            blk = opts.hessian.fused_block
        else:
            blk = block
            while blk > 8 and 2 * blk * per_inst > budget:
                blk //= 2
        Bp = ((B + blk - 1) // blk) * blk
        if Bp != B:
            pad = Bp - B
            rep = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])], axis=0)
            xflat = rep(xflat)
            data_leaves = [rep(l) for l in data_leaves]

        in_specs = [pl.BlockSpec((blk, P), lambda i: (i, 0))]
        for l in data_leaves:
            nd = l.ndim
            in_specs.append(pl.BlockSpec(
                (blk,) + l.shape[1:],
                functools.partial(
                    lambda i, _nd: (i,) + (0,) * (_nd - 1), _nd=nd)))
        extra_inputs = []
        if coloring is not None and not coloring.identity:
            probes = jnp.asarray(coloring.probes, dtype)
            recovery = jnp.asarray(coloring.recovery, dtype)
            in_specs.append(pl.BlockSpec(probes.shape, lambda i: (0, 0)))
            in_specs.append(pl.BlockSpec(recovery.shape, lambda i: (0, 0)))
            extra_inputs = [probes, recovery]

        col = pl.BlockSpec((blk, 1), lambda i: (i, 0))
        out_specs = [
            pl.BlockSpec((blk, P), lambda i: (i, 0)),      # x
            col, col, col, col, col, col, col,             # per-inst scalars
            pl.BlockSpec((blk, d), lambda i: (i, 0)),      # g
            col,                                           # nres
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bp, P), dtype),
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((Bp, 1), _I32),
            jax.ShapeDtypeStruct((Bp, 1), _I32),
            jax.ShapeDtypeStruct((Bp, 1), _I32),
            jax.ShapeDtypeStruct((Bp, 1), _I32),
            jax.ShapeDtypeStruct((Bp, 1), dtype),
            jax.ShapeDtypeStruct((Bp, d), dtype),
            jax.ShapeDtypeStruct((Bp, 1), _I32),
        ]
        if cap:
            hspec = pl.BlockSpec((blk, cap), lambda i: (i, 0))
            out_specs += [hspec, hspec, hspec, col]
            out_shape += [
                jax.ShapeDtypeStruct((Bp, cap), dtype),    # errs
                jax.ShapeDtypeStruct((Bp, cap), dtype),    # deltas2
                jax.ShapeDtypeStruct((Bp, cap), _I32),     # successes
                jax.ShapeDtypeStruct((Bp, 1), _I32),       # num_hist
            ]

        kernel = functools.partial(
            _solver_kernel, residual_fn=residual_fn, layout=layout,
            data_treedef=data_treedef, n_data=len(data_leaves),
            squeezed=squeezed, n_res=n_res, opts=opts,
            max_iters_total=max_iters_total, coloring=coloring)
        # kernel_trace: residual/manifold code traced inside the kernel
        # swaps Mosaic-unlowerable transcendentals (atan2 in SO3.log, …)
        # for polynomial equivalents (ops/kernel_math.py).
        from .kernel_math import kernel_trace
        # The default Mosaic scoped-vmem limit (16 MB) is tight for traces
        # with many AD temporaries; the chip has far more VMEM — raise the
        # limit and keep the block-size budget targeting well under it.
        params = None
        if not interpret:
            from jax.experimental.pallas import tpu as pltpu
            params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        with kernel_trace():
            outs = pl.pallas_call(
                kernel, grid=(Bp // blk,), in_specs=in_specs,
                out_specs=out_specs, out_shape=out_shape,
                interpret=interpret, compiler_params=params,
                debug=bool(__import__("os").environ.get(
                    "TINYOPT_PALLAS_DEBUG")))(xflat, *data_leaves,
                                              *extra_inputs)
        (xf, cost, rerr, stop, it, nfail, nconsec, lam, g, nres) = outs[:10]
        if cap:
            h_errs, h_deltas, h_succ, h_nh = outs[10:]

        sl = lambda a: a[:B, 0]                  # (Bp, 1) column outputs
        x_out_flat = xf[:B]
        # Unflatten back to the user's pytree structure
        leaves, off = [], 0
        for shp, sz in zip(layout.shapes, layout.sizes):
            leaves.append(jnp.reshape(
                x_out_flat[:, off:off + sz], (B,) + shp))
            off += sz
        x_out = jax.tree_util.tree_unflatten(layout.treedef, leaves)

        out = Output(
            final_cost=Cost(cost=sl(cost), num_residuals=sl(nres),
                            inlier_ratio=jnp.ones((B,), jnp.float32)),
            final_rerr_dec=sl(rerr),
            stop_reason=sl(stop),
            num_iters=sl(it),
            num_failures=sl(nfail),
            num_consec_failures=sl(nconsec),
            duration_ms=jnp.zeros((B,), jnp.float32),
            final_grad=g[:B],
            final_hessian=None,
            errs=h_errs[:B] if cap else jnp.zeros((B, 0), dtype),
            deltas2=h_deltas[:B] if cap else jnp.zeros((B, 0), dtype),
            successes=(h_succ[:B] != 0) if cap
            else jnp.zeros((B, 0), bool),
            num_hist=sl(h_nh).astype(_I32) if cap
            else jnp.zeros((B,), _I32),
            final_lambda=sl(lam),
            num_diff_used=False,
        )
        return x_out, out

    # jit the whole wrapper: the pad/slice/Output plumbing around the
    # pallas_call must compile into the same executable (eagerly it is
    # dozens of dispatches — each a full round-trip on remote backends).
    solve = jax.jit(solve)
    if data_example is None:
        out = lambda x0_batch: solve(x0_batch)
    else:
        out = lambda x0_batch, data_batch: solve(x0_batch, data_batch)
    # Marker for batched_optimize: a Pallas call cannot be GSPMD-auto-
    # partitioned, so the mesh path must wrap this in shard_map.
    out._tinyopt_fused = True
    return out
