"""Mesh-sharded Schur-complement bundle adjustment.

Distributes one large bipartite NLLS problem (sparse.schur_optimize's
regime) over a device mesh by sharding the LANDMARK axis — the classic
distributed-BA decomposition, mapped onto shard_map + XLA collectives:

* each device holds its landmark columns of the observation grid, and
  computes that shard's (r, Ja, Jb) linearization, C/E blocks, and g_b —
  the O(n_b)-sized state never exists in one place;
* the camera-side partials (Ba, g_a, cost) and the reduced-camera-system
  partials (E C⁻¹ Eᵀ, E C⁻¹ g_b) are completed with ONE ``psum`` each
  over the mesh axis (ICI) — the only cross-landmark coupling the
  algebra has;
* the (n_a·da)² reduced solve runs replicated on every device (zero
  communication — it is tiny next to the landmark work), and the local
  landmark back-substitutions are ``all_gather``-ed (n_b·db floats, KBs)
  so the loop's carry (x, g, dx) stays fully replicated.

Because every quantity the outer loop inspects (cost, |dx|², |∇|², λ) is
identical on all devices, the accept/reject control flow never diverges
across the mesh, and the trajectory matches the single-device
``schur_optimize`` up to psum summation order.  LM, GN and DogLeg all
work (DogLeg's curvature gᵀHg uses a psum-completed arrow matvec; its
Levenberg fallback re-eliminates under the same replicated lax.cond).

No reference counterpart: the reference is single-threaded and concedes
large systems ("not fast for large systems yet",
/root/reference/README.md:30).  Scaling contract: n_b must be divisible
by the mesh axis size — pad with mask=0 landmarks (masked pairs
contribute exactly zero residual AND Jacobian, ops/schur.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import manifold as mf
from ..cost import Cost, rss as rss_exact
from ..diff.auto import flatten_residuals
from ..optimizers.loop import optimize_from_acc
from ..options import Options, SolverType
from ..ops.schur import (SchurSystem, _damp_blocks, _esum,
                         bipartite_perms, blocks_from, linearize_grid,
                         schur_eliminate)
from .sharded import _shard_map



def make_sharded_schur_system(pair_fn: Callable, a0, b0, data, mask,
                              mesh: Mesh, axis: str,
                              spec: mf.TangentSpec):
    """Build landmark-sharded (accumulate, evaluate, n_res, propose).

    Same contract as ops/schur.schur_system; ``data``/``mask`` leaves are
    (n_a, n_b, ...) grids sharded (or shardable) on the landmark axis.
    """
    a0 = mf.as_pytree(a0)
    b0 = mf.as_pytree(b0)
    n_a = jnp.shape(jax.tree_util.tree_leaves(a0)[0])[0]
    n_b = jnp.shape(jax.tree_util.tree_leaves(b0)[0])[0]
    a_ex = jax.tree_util.tree_map(lambda l: l[0], a0)
    b_ex = jax.tree_util.tree_map(lambda l: l[0], b0)
    spec_a = mf.tangent_spec(a_ex)
    spec_b = mf.tangent_spec(b_ex)
    da, db = spec_a.dims, spec_b.dims
    dtype = spec.dtype

    axis_size = mesh.shape[axis]
    if n_b % axis_size != 0:
        raise ValueError(
            f"n_b={n_b} not divisible by mesh axis '{axis}'={axis_size}; "
            "pad the landmark axis with mask=0 columns (masked pairs "
            "contribute zero residual and zero Jacobian)")
    nb_loc = n_b // axis_size

    d_ex = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(jnp.shape(l)[2:],
                                       jnp.result_type(l)), data)
    m = int(sum(math.prod(l.shape) for l in jax.tree_util.tree_leaves(
        jax.eval_shape(lambda a, b, d: flatten_residuals(pair_fn(a, b, d)),
                       a_ex, b_ex, d_ex))))
    # Observed-pair residual count (ops/schur.py semantics).  Computed
    # from the global mask BEFORE sharding; jit-traceable either way.
    n_res = jnp.count_nonzero(mask).astype(jnp.int32) * m

    # Loop-global <-> element-major tangent adapters (multi-leaf element
    # pytrees only; None = identity, ops/schur.bipartite_perms).
    em2gl, gl2em = bipartite_perms(a0, b0, n_a, n_b, da, db)

    def _to_gl(v):
        return v if em2gl is None else v[em2gl]

    def _to_em(v):
        return v if gl2em is None else v[gl2em]

    x_spec = jax.tree_util.tree_map(lambda _: P(), (a0, b0))
    grid_spec = jax.tree_util.tree_map(lambda _: P(None, axis), data)
    mask_spec = P(None, axis)
    # SchurSystem leaves: Ba replicated, C/E sharded on the landmark dim;
    # the layout index maps (if any) replicated.
    H_spec = SchurSystem(Ba=P(), C=P(axis), E=P(None, axis),
                         em2gl=None if em2gl is None else P(),
                         gl2em=None if gl2em is None else P())

    def _local_b(b):
        """This device's landmark rows of the replicated b pytree."""
        j = jax.lax.axis_index(axis)
        return jax.tree_util.tree_map(
            lambda l: jax.lax.dynamic_slice_in_dim(l, j * nb_loc, nb_loc, 0),
            b)

    def _local_gb(g):
        g_b = g[n_a * da:].reshape(n_b, db)
        j = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(g_b, j * nb_loc, nb_loc, 0)

    def _gather_b(v_loc):
        """(nb_loc, k) local rows -> (n_b, k) replicated."""
        return jax.lax.all_gather(v_loc, axis, axis=0, tiled=True)

    @partial(_shard_map, mesh=mesh,
             in_specs=(x_spec, grid_spec, mask_spec),
             out_specs=(H_spec, P(), P()))
    def _accumulate_sm(x, data_l, mask_l):
        a = mf.as_pytree(x[0])
        b_loc = _local_b(mf.as_pytree(x[1]))
        r, Ja, Jb = linearize_grid(pair_fn, a, b_loc, data_l, mask_l,
                                   spec_a, spec_b, dtype)
        Ba_p, C_l, E_l, ga_p, gb_l, rss_p = blocks_from(r, Ja, Jb, dtype)
        # one fused all-reduce for the camera-side partials
        # (parallel/sharded.py rationale)
        Ba, g_a, rss = jax.lax.psum((Ba_p, ga_p, rss_p), axis)
        g = _to_gl(jnp.concatenate(
            [g_a.reshape(-1), _gather_b(gb_l).reshape(-1)]))
        return SchurSystem(Ba, C_l, E_l, em2gl, gl2em), g, rss

    @partial(_shard_map, mesh=mesh,
             in_specs=(x_spec, grid_spec, mask_spec), out_specs=P())
    def _evaluate_sm(x, data_l, mask_l):
        a = mf.as_pytree(x[0])
        b_loc = _local_b(mf.as_pytree(x[1]))

        def one_cam(a_i, d_i, m_i):
            def one(b_j, d_ij, m_ij):
                return flatten_residuals(
                    pair_fn(a_i, b_j, d_ij)).astype(dtype) * m_ij
            return jax.vmap(one)(b_loc, d_i, m_i)

        r = jax.vmap(one_cam)(a, data_l, mask_l)
        return jax.lax.psum(rss_exact(r), axis)

    def _eliminate_local(E_l, Bd, Cd_l, g, use_chol, refine=0,
                         cg_iters=0):
        """Sharded elimination: (dx replicated, ok replicated); g/dx in
        the loop's global layout, algebra element-major."""
        g = _to_em(g)
        g_a = g[:n_a * da].reshape(n_a, da)
        dx_a, dx_b_l, ok = schur_eliminate(
            E_l, Bd, Cd_l, g_a, _local_gb(g), use_cholesky=use_chol,
            reduce_fn=lambda t: jax.lax.psum(t, axis), refine=refine,
            cg_iters=cg_iters)
        # ok from the replicated reduced solve is already identical on
        # every device; dx_b finiteness is a cross-shard AND.
        bad_b = jax.lax.psum(
            jnp.any(~jnp.isfinite(dx_b_l)).astype(jnp.int32), axis)
        ok = ok & (bad_b == 0)
        dx = _to_gl(jnp.concatenate(
            [dx_a.reshape(-1), _gather_b(dx_b_l).reshape(-1)]))
        return dx, ok

    def _matvec_local(Ba, C_l, E_l, v):
        """Replicated arrow-matvec H·v from the local blocks (v/result
        in the loop's global layout)."""
        v = _to_em(v)
        v_a = v[:n_a * da].reshape(n_a, da)
        v_b_l = _local_gb(v)
        o_a = (_esum("iab,ib->ia", Ba, v_a)
               + jax.lax.psum(
                   _esum("ijab,jb->ia", E_l, v_b_l), axis))
        o_b_l = (_esum("jab,jb->ja", C_l, v_b_l)
                 + _esum("ijab,ia->jb", E_l, v_a))
        return _to_gl(jnp.concatenate(
            [o_a.reshape(-1), _gather_b(o_b_l).reshape(-1)]))

    def make_propose(opts: Options):
        use_chol = opts.hessian.use_ldlt
        refine = opts.hessian.schur_refine
        cg_it = opts.hessian.schur_cg_iters

        @partial(_shard_map, mesh=mesh,
                 in_specs=(H_spec, P(), P()), out_specs=(P(), P()))
        def _propose_sm(H, g, lam):
            Ba, C_l, E_l = H.Ba, H.C, H.E
            if opts.solver_type == SolverType.DOGLEG:
                from ..solvers.step import dogleg_core
                dx_gn, ok_gn = _eliminate_local(E_l, Ba, C_l, g,
                                                use_chol, refine, cg_it)
                gHg = jnp.vdot(g, _matvec_local(Ba, C_l, E_l, g))
                return dogleg_core(
                    g, lam, dx_gn, ok_gn, gHg,
                    lambda le: _eliminate_local(
                        E_l, _damp_blocks(Ba, le), _damp_blocks(C_l, le),
                        g, use_chol, refine, cg_it))
            is_lm = opts.solver_type == SolverType.LEVENBERG_MARQUARDT
            Bd = _damp_blocks(Ba, lam) if is_lm else Ba
            Cd_l = _damp_blocks(C_l, lam) if is_lm else C_l
            return _eliminate_local(E_l, Bd, Cd_l, g, use_chol, refine,
                                    cg_it)

        def propose(H, g, lam, opts_inner):
            return _propose_sm(H, g, lam)

        return propose

    def accumulate(x, data=data, mask=mask):
        H, g, rss = _accumulate_sm(x, data, mask)
        return H, g, Cost.make(rss, n_res)

    def evaluate(x, data=data, mask=mask):
        return Cost.make(_evaluate_sm(x, data, mask), n_res)

    return accumulate, evaluate, n_res, make_propose


def sharded_schur_optimize(x0: tuple, pair_fn: Callable, data, mask,
                           options: Options | None = None, *,
                           mesh: Mesh | None = None, axis: str = "block",
                           jit: bool = True):
    """Landmark-sharded Schur BA over the mesh. ``(x_opt, Output)``.

    Drop-in for :func:`tinyopt_tpu.sparse.schur_optimize` at multi-device
    scale — same pair_fn/data/mask contract, same Output semantics, same
    trajectory up to psum summation order.  ``data``/``mask`` are placed
    with ``NamedSharding(mesh, P(None, axis))`` unless already global.
    """
    options = options or Options()
    if mesh is None:
        from .mesh import local_mesh
        mesh = local_mesh(axis)
    if not (isinstance(x0, tuple) and len(x0) == 2):
        raise ValueError("sharded_schur_optimize needs x0 = (a0, b0)")
    x0 = (mf.as_pytree(x0[0]), mf.as_pytree(x0[1]))
    mask = jnp.asarray(mask)
    spec = mf.tangent_spec(x0)

    # Check divisibility BEFORE device_put (whose sharding error is
    # opaque); same message as make_sharded_schur_system.
    n_b = jnp.shape(jax.tree_util.tree_leaves(x0[1])[0])[0]
    if n_b % mesh.shape[axis] != 0:
        raise ValueError(
            f"n_b={n_b} not divisible by mesh axis "
            f"'{axis}'={mesh.shape[axis]}; pad the landmark axis with "
            "mask=0 columns (masked pairs contribute zero residual and "
            "zero Jacobian)")

    # Compiled-solve cache (sparse._SOLVE_CACHE semantics): keyed on the
    # ORIGINAL data/mask object identities (the device_put below is
    # deterministic given mesh/axis); mutable numpy data skips caching.
    from ..sparse import (_solver_cache_get, _solver_cache_key,
                          _solver_cache_put)
    orig_leaves = jax.tree_util.tree_leaves((data, mask))
    key = _solver_cache_key("sharded_schur", pair_fn, options, jit, x0,
                            orig_leaves, extra=(mesh, axis))
    run = _solver_cache_get(key)
    if run is None:
        sharding = NamedSharding(mesh, P(None, axis))
        already_global = any(
            getattr(l, "sharding", None) is not None
            and not getattr(l, "is_fully_addressable", True)
            for l in jax.tree_util.tree_leaves((data, mask)))
        if not already_global:
            data = jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), sharding), data)
            mask = jax.device_put(mask, sharding)

        acc, ev, n_res, make_propose = make_sharded_schur_system(
            pair_fn, x0[0], x0[1], data, mask, mesh, axis, spec)
        propose = make_propose(options)

        # data/mask ride as jit ARGUMENTS (multi-process global arrays
        # cannot be closed over — parallel/sharded.py).
        def solve(x, d, mk):
            return optimize_from_acc(x, lambda xv: acc(xv, d, mk),
                                     lambda xv: ev(xv, d, mk), options,
                                     spec, propose=propose)

        if jit:
            solve = jax.jit(solve)
        data_g, mask_g = data, mask

        def run(x):
            return solve(x, data_g, mask_g)

        # The cached entry holds the PLACED global arrays (strong refs via
        # the closure), keyed on the pre-put objects.
        _solver_cache_put(key, run, orig_leaves)
    return run(x0)
