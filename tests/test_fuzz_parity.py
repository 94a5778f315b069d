"""Property-based parity fuzzing: random residual programs through the
fused whole-solve kernel vs the XLA loop.

The hand-written parity tests (test_fused.py) pin specific behaviors;
this file sweeps a seeded family of randomly composed residual programs
(elementwise transcendentals, cross-dimension mixing, data leaves of
different ranks, varying n_res/dims) and requires instance-by-instance
agreement of final cost, convergence classification, and parameters.
Any Mosaic-lowering gap must either produce identical results through
the automatic vmap fallback or be caught here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu.ops.pallas_solver import fused_batched_solver, fused_supported
from tinyopt_tpu.parallel.batched import batched_solver


def _random_program(rng, d, n_res):
    """Build a random smooth residual program r(x, data) -> (n_res,).

    Composes a random linear mix, a random diagonal nonlinearity, and a
    random target — covering dense/sparse-ish Jacobian structures and the
    transcendentals Mosaic must lower.  All array constants ride in the
    per-instance ``data`` pytree (a pallas kernel cannot capture constant
    arrays from a closure; see test_captured_constants_fall_back).
    """
    kind = rng.integers(0, 4)

    def residual(x, data):
        z = data["A"] @ x + data["shift"]
        if kind == 0:
            nl = jnp.tanh(z)
        elif kind == 1:
            nl = jnp.sin(z) + 0.1 * z * z
        elif kind == 2:
            nl = jnp.exp(-z * z) * z
        else:
            nl = z / jnp.sqrt(1.0 + z * z)
        return data["w"] * nl - data["y"]

    def make_data(batch):
        A = rng.normal(0, 1.0, (n_res, d)) * (
            rng.uniform(size=(n_res, d)) < 0.6)
        return {
            "A": jnp.broadcast_to(jnp.asarray(A, jnp.float32),
                                  (batch, n_res, d)),
            "w": jnp.broadcast_to(
                jnp.asarray(rng.uniform(0.5, 1.5, (n_res,)), jnp.float32),
                (batch, n_res)),
            "shift": jnp.broadcast_to(
                jnp.asarray(rng.uniform(-0.3, 0.3, (n_res,)), jnp.float32),
                (batch, n_res)),
            # y is filled by the caller so that a known x_true is an
            # exact root — keeps the random programs convergent (far
            # starts on chaotic programs amplify last-ulp differences
            # between the matrix-free kernel and the explicit-JtJ path
            # into divergent trajectories, which is not a lowering bug)
            "y": jnp.zeros((batch, n_res), jnp.float32),
        }

    return residual, make_data


def _assert_instance_parity(outr, outf, xr, xf):
    np.testing.assert_allclose(np.asarray(outr.final_cost.cost),
                               np.asarray(outf.final_cost.cost),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outr.succeeded()),
                                  np.asarray(outf.succeeded()))
    # Parameters agree wherever the instance converged to a unique point
    conv = np.asarray(outr.converged()) & np.asarray(outf.converged())
    np.testing.assert_allclose(np.asarray(xr)[conv], np.asarray(xf)[conv],
                               rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("seed", range(8))
def test_random_program_parity(seed):
    rng = np.random.default_rng(seed)
    d = int(rng.integers(2, 12))
    n_res = int(rng.integers(d, 24))
    batch = 16
    residual, make_data = _random_program(rng, d, n_res)

    data = make_data(batch)
    x_true = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, d)), jnp.float32)
    y = jax.vmap(residual)(x_true, data)
    data = dict(data, y=data["y"] + y)       # x_true is an exact root
    x0 = x_true + jnp.asarray(rng.normal(0, 0.1, (batch, d)), jnp.float32)
    x_ex = x0[0]
    d_ex = jax.tree_util.tree_map(lambda a: a[0], data)

    opts = to.Options(max_iters=12, min_error=0.0, min_rerr_dec=1e-12,
                      min_step_norm2=1e-16, max_consec_failures=4,
                      save_history=False,
                      hessian=to.HessianOptions(save_last=False,
                                                solver="cg", cg_iters=10,
                                                carry_system=False))
    ref = jax.jit(batched_solver(residual, opts, "residuals", x_ex, d_ex))
    assert fused_supported(opts.replace(hessian=to.HessianOptions(
        save_last=False, solver="fused", cg_iters=10, carry_system=False)),
        "residuals", x_ex)
    fused = fused_batched_solver(
        residual, opts.replace(hessian=to.HessianOptions(
            save_last=False, solver="fused", cg_iters=10,
            carry_system=False)),
        x_ex, d_ex, interpret=True)

    xr, outr = ref(x0, data)
    xf, outf = fused(x0, data)
    _assert_instance_parity(outr, outf, xr, xf)


def test_captured_constants_fall_back():
    """A residual closing over a constant ARRAY cannot lower into the
    pallas kernel ('captures constants ... pass them as inputs'); the
    batched_solver wrapper must degrade to the vmapped XLA path with a
    warning — including when the solve runs under an OUTER jit, where
    the compile failure would otherwise surface after the wrapper
    returned."""
    import warnings

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(0, 1.0, (6, 4)), jnp.float32)  # captured!

    def residual(x):
        return A @ x - 1.0

    opts = to.Options(max_iters=10, max_consec_failures=0,
                      save_history=False,
                      hessian=to.HessianOptions(save_last=False,
                                                solver="fused", cg_iters=8,
                                                carry_system=False))
    solve = batched_solver(residual, opts, "residuals", jnp.zeros(4))
    x0 = jnp.asarray(rng.uniform(-1, 1, (8, 4)), jnp.float32)
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        xs, outs = jax.jit(solve)(x0)
    assert bool(outs.succeeded().all())
    # residual is linear: every instance lands on the least-squares
    # solution of A x = 1
    x_ls = np.linalg.lstsq(np.asarray(A), np.ones(6), rcond=None)[0]
    # TPU default-precision matmuls truncate to bf16 (~3 decimal digits)
    tol = 2e-2 if on_tpu else 1e-4
    np.testing.assert_allclose(np.asarray(xs),
                               np.broadcast_to(x_ls, (8, 4)),
                               rtol=tol, atol=tol)
    if on_tpu:
        # the fused path was requested and must have fallen back audibly
        assert any("fused" in str(wi.message) for wi in w)


@pytest.mark.parametrize("seed", range(4))
def test_random_se3_program_parity(seed):
    """Manifold fuzzing: SE(3) parameters with randomly composed
    point-based residuals — the most delicate kernel path (in-kernel
    quaternion retraction, ambient-P/tangent-D layout, kernel_math
    substitutions) must match the XLA loop on random programs too."""
    from tinyopt_tpu.manifolds import SE3, SO3

    rng = np.random.default_rng(100 + seed)
    n_pts = int(rng.integers(4, 10))
    batch = 8
    kind = int(rng.integers(0, 3))
    w_scale = float(rng.uniform(0.05, 0.25))

    def residual(pose, data):
        p = pose.rotation.apply(data["pts"]) + pose.translation[None, :]
        if kind == 0:
            r = p - data["tgt"]
        elif kind == 1:
            r = jnp.tanh(p) - data["tgt"]
        else:
            r = p * data["w"] - data["tgt"]
        return r.reshape(-1)

    pts = jnp.asarray(rng.uniform(-1, 1, (batch, n_pts, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (batch, n_pts, 3)), jnp.float32)
    true_pose = SE3.exp(jnp.asarray(
        w_scale * rng.normal(size=(batch, 6)), jnp.float32))
    rot_b = SO3(true_pose.rotation.wxyz[:, None, :])
    moved = rot_b.apply(pts) + true_pose.translation[:, None, :]
    if kind == 1:
        tgt = jnp.tanh(moved)
    elif kind == 2:
        tgt = moved * w
    else:
        tgt = moved
    tgt = tgt + 1e-4 * jnp.asarray(
        rng.normal(size=tgt.shape), jnp.float32)
    data = {"pts": pts, "w": w, "tgt": tgt}
    x0 = SE3.exp(jnp.asarray(
        w_scale * rng.normal(size=(batch, 6)) * 0.3, jnp.float32))

    x_ex = jax.tree_util.tree_map(lambda a: a[0], x0)
    d_ex = jax.tree_util.tree_map(lambda a: a[0], data)
    opts = to.Options(max_iters=12, min_error=0.0, min_rerr_dec=1e-12,
                      min_step_norm2=1e-16, max_consec_failures=4,
                      save_history=False,
                      hessian=to.HessianOptions(save_last=False,
                                                solver="cg", cg_iters=10,
                                                carry_system=False))
    ref = jax.jit(batched_solver(residual, opts, "residuals", x_ex, d_ex))
    fused = fused_batched_solver(
        residual, opts.replace(hessian=to.HessianOptions(
            save_last=False, solver="fused", cg_iters=10,
            carry_system=False)),
        x_ex, d_ex, interpret=True)
    xr, outr = ref(x0, data)
    xf, outf = fused(x0, data)
    np.testing.assert_allclose(np.asarray(outr.final_cost.cost),
                               np.asarray(outf.final_cost.cost),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outr.succeeded()),
                                  np.asarray(outf.succeeded()))
