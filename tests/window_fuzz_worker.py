"""Window/band reduce fuzz worker (run per seed in a fresh process).

See tests/test_fuzz_sparse.py TestWindowBandFuzz for why this is a
subprocess: jaxlib's CPU runtime corrupts its heap when these programs
run after a shard_map program in the same process (upstream bug).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "concurrency_optimized_scheduler" not in _flags:
    # upstream XLA CPU thunk-scheduler race — see tests/conftest.py
    os.environ["XLA_FLAGS"] = (
        _flags
        + " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np       # noqa: E402


def run(seed: int) -> None:
    from tinyopt_tpu.ops.schur_obs import (
        _pick_chunk, detect_camera_bandwidth, make_reduce_pass,
        make_reduce_pass_window, make_reduce_pass_window_banded,
        plan_window_reduce, plan_window_reduce_banded)
    rng = np.random.default_rng(seed)
    n_a = int(rng.integers(6, 30))
    K = int(rng.integers(2, 6))
    n_b = int(rng.integers(3, 10)) * 16
    da, db = 4, 3
    bw_target = int(rng.integers(1, 4))
    base = rng.integers(0, max(n_a - bw_target, 1), n_b)
    cam = base[:, None] + rng.integers(0, bw_target + 1, (n_b, K))
    cam = np.minimum(cam, n_a - 1)
    mask = (rng.random((n_b, K)) < 0.8).astype(float)
    mask[rng.random(n_b) < 0.1] = 0.0      # some all-masked rows
    cam = np.where(mask > 0, cam, 0)       # the cam-0 contract
    E = rng.normal(size=(n_b, K * da * db))
    E = E * np.repeat(mask, da * db, 1)    # masked rows zero
    Cd = rng.normal(size=(n_b, db, db))
    Cd = (Cd @ Cd.transpose(0, 2, 1)
          + 3 * np.eye(db)) * (mask.max(1) > 0)[:, None, None]
    Cd = Cd.reshape(n_b, db * db)
    g_b = rng.normal(size=(n_b, db)) * (mask.max(1) > 0)[:, None]
    CH = _pick_chunk(n_b, 16)
    ci = jnp.asarray(cam, jnp.int32)
    E_j, C_j, g_j = map(jnp.asarray, (E, Cd, g_b))

    rp_s = make_reduce_pass(n_a, K, da, db, jnp.float64, CH)
    S_s, rhs_s, Ci_s = jax.jit(lambda: rp_s(E_j, C_j, ci, g_j))()

    wplan = plan_window_reduce(cam, n_a, K, CH, mask_np=mask)
    assert wplan is not None
    rp_w = make_reduce_pass_window(n_a, K, da, db, jnp.float64,
                                   CH, wplan)
    S_w, rhs_w, Ci_w = jax.jit(lambda: rp_w(E_j, C_j, ci, g_j))()
    np.testing.assert_allclose(np.asarray(S_w), np.asarray(S_s),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(rhs_w), np.asarray(rhs_s),
                               rtol=1e-9, atol=1e-12)

    bw = detect_camera_bandwidth(cam, mask)
    bplan = plan_window_reduce_banded(cam, n_a, K, CH, bw,
                                      mask_np=mask)
    assert bplan is not None
    rp_b = make_reduce_pass_window_banded(n_a, K, da, db,
                                          jnp.float64, CH, bplan)
    S_low, rhs_b, Ci_b = jax.jit(lambda: rp_b(E_j, C_j, ci, g_j))()
    np.testing.assert_allclose(np.asarray(rhs_b), np.asarray(rhs_s),
                               rtol=1e-9, atol=1e-12)
    # densify the band and compare against the scatter S
    S4 = np.asarray(S_s).reshape(n_a, n_a, da, da)
    B4 = np.asarray(S_low).reshape(n_a, bw + 1, da, da)
    for i in range(n_a):
        np.testing.assert_allclose(B4[i, 0], S4[i, i],
                                   rtol=1e-9, atol=1e-12)
        for o in range(1, bw + 1):
            if i - o >= 0:
                np.testing.assert_allclose(
                    B4[i, o], S4[i, i - o], rtol=1e-9, atol=1e-12)
    print("WINDOW-FUZZ-OK")


if __name__ == "__main__":
    run(int(sys.argv[1]))
