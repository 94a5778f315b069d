"""Experiment: amortize tunnel dispatch overhead by running K solve-batches
inside one jitted call (lax.fori_loop), generating fresh problem instances
on-device per repetition from a folded PRNG key.

Honesty: the per-call seed changes every call (no server-side execution
cache hit), every repetition's instances are distinct, and the returned
scalars (cost sum / converged count) depend on every repetition through
the fori carry, so all K solves must actually execute before the forced
float() read returns.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

import tinyopt_tpu as to
from tinyopt_tpu.models.problems import PriorProblem, prior_residual
from tinyopt_tpu.parallel.batched import batched_solver

BATCH = 10_000
DIMS = 50


def make_bench(k_reps: int):
    opts = to.Options(
        max_iters=10, min_error=0.0, min_rerr_dec=1e-12,
        min_step_norm2=1e-16, max_consec_failures=3,
        save_history=False,
        hessian=to.HessianOptions(save_last=False, solver="fused",
                                  cg_iters=8, carry_system=False),
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
            cost_sum, conv_sum, iters_sum = carry
            data, x0 = gen(jax.random.fold_in(key, i))
            # mix the carry into the start point so XLA cannot reorder or
            # elide a repetition (adds a true serial dependency)
            x0 = x0 + jnp.float32(1e-30) * cost_sum
            x_opt, out = solve(x0, data)
            return (cost_sum + out.final_cost.cost.sum(),
                    conv_sum + out.converged().sum(),
                    iters_sum + out.num_iters.sum())

        z = jnp.float32(0.0)
        return lax.fori_loop(0, k_reps, body, (z, z, jnp.float32(0.0)))

    return bench


def main():
    print("backend:", jax.default_backend())
    for k in (128, 256):
        bench = make_bench(k)
        t0 = time.perf_counter()
        r = bench(0)
        float(r[0])
        compile_s = time.perf_counter() - t0
        times = []
        for rep in range(3):
            seed = (time.time_ns() + rep) % (2**31)
            t0 = time.perf_counter()
            cost_sum, conv_sum, iters_sum = bench(seed)
            c = float(cost_sum)
            times.append(time.perf_counter() - t0)
            conv = float(conv_sum) / (k * BATCH)
        dt = min(times)
        n = k * BATCH
        print(f"K={k:3d}: wall={dt*1e3:8.1f}ms  {n/dt:12.0f} solves/s  "
              f"({dt/n*1e6:.3f} us/solve)  conv={conv:.3f}  "
              f"compile={compile_s:.1f}s  cost_sum={c:.1f}")


if __name__ == "__main__":
    main()
