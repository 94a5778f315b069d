"""Probe: marginal device time per 10k-solve batch of the fused kernel.

Runs the multirep fori bench at K=1 and K=33 and reports
(wall_33 - wall_1) / 32 — the pure device time of one repetition,
independent of the tunnel's fixed dispatch overhead.  Used to attribute
kernel time while iterating on pallas_solver internals.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

import tinyopt_tpu as to
from tinyopt_tpu.models.problems import PriorProblem, prior_residual
from tinyopt_tpu.parallel.batched import batched_solver

BATCH = 10_000
DIMS = 50


def make_bench(k_reps: int, cg_iters: int = 8):
    opts = to.Options(
        max_iters=10, min_error=0.0, min_rerr_dec=1e-12,
        min_step_norm2=1e-16, max_consec_failures=3,
        save_history=False,
        hessian=to.HessianOptions(save_last=False, solver="fused",
                                  cg_iters=cg_iters, carry_system=False),
    )

    def gen(key):
        k0, k1, k2 = jax.random.split(key, 3)
        y = jax.random.uniform(k0, (BATCH, DIMS), jnp.float32, -1, 1)
        std = jax.random.uniform(k1, (BATCH, DIMS), jnp.float32, 0.1, 1.1)
        x0 = jax.random.uniform(k2, (BATCH, DIMS), jnp.float32, -1, 1)
        return PriorProblem(y=y, inv_std=1.0 / std), x0

    data_ex, x0_ex = gen(jax.random.PRNGKey(0))
    x_ex = jax.tree_util.tree_map(lambda a: a[0], x0_ex)
    d_ex = jax.tree_util.tree_map(lambda a: a[0], data_ex)
    solve = batched_solver(prior_residual, opts, "residuals", x_ex, d_ex)

    @jax.jit
    def bench(seed):
        key = jax.random.PRNGKey(seed)

        def body(i, carry):
            cost_sum, conv_sum = carry
            data, x0 = gen(jax.random.fold_in(key, i))
            x0 = x0 + jnp.float32(1e-30) * cost_sum
            _, out = solve(x0, data)
            return (cost_sum + out.final_cost.cost.sum(),
                    conv_sum + out.converged().sum())

        z = jnp.float32(0.0)
        return lax.fori_loop(0, k_reps, body, (z, z))

    return bench


def timed(bench, n=4):
    times = []
    for rep in range(n):
        seed = (time.time_ns() + rep) % (2**31)
        t0 = time.perf_counter()
        r = bench(seed)
        conv = float(r[1])
        times.append(time.perf_counter() - t0)
    return min(times), conv


def main():
    cg = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b1 = make_bench(1, cg)
    b33 = make_bench(33, cg)
    float(b1(0)[0]); float(b33(0)[0])       # compile
    w1, c1 = timed(b1)
    w33, c33 = timed(b33)
    marginal = (w33 - w1) / 32
    print(f"cg_iters={cg}: w1={w1*1e3:.1f}ms w33={w33*1e3:.1f}ms "
          f"marginal={marginal*1e3:.3f}ms/rep "
          f"({marginal/BATCH*1e6:.3f} us/solve) conv={c33/(33*BATCH):.3f}")


if __name__ == "__main__":
    main()
