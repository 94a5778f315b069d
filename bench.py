"""Headline benchmark: batched 50-dim NLLS solves on TPU.

Mirrors the reference's hardest published dense benchmark — the 50-dim
whitened Gaussian prior, 56.26 µs per LM solve single-threaded CPU
(BASELINE.md row 9, reference benchmarks/dense.cpp:83-114, options
benchmarks/options.h:10-27) — at production-serving scale: REPS batches of
10k independent instances, all solved inside ONE dispatched XLA program
(a ``lax.fori_loop`` around the whole-solve fused Pallas kernel), with
fresh problem instances generated on-device per repetition.

Honesty protocol (the axon tunnel serves repeat executions of previously
seen (executable, inputs) from a persistent server-side cache, and
``block_until_ready`` alone does not guarantee completion):
  * the per-call seed changes every call, so no execution-cache hit;
  * every repetition's instances derive from ``fold_in(key, rep)`` — all
    REPS × BATCH solves are distinct problems;
  * the returned scalars (cost sum, converged count, iteration count)
    depend on every repetition through the fori carry, and the carry is
    folded back into the next repetition's starting points, so no
    repetition can be elided or reordered;
  * timing ends at a forced ``float()`` read of those scalars.

Measured decomposition (2026-08-17, v5e-1): a trivial jitted function on
fresh inputs costs ~26 ms/call on the tunnel (fixed round-trip); the
marginal device time per additional 10k-solve repetition is ~1.6 ms.
Single-dispatch repetitions amortize the round-trip to ~2%.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = full LM solves per second and vs_baseline is the speedup over the
reference's 1/56.26µs = 17,775 solves/s.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


REF_SOLVE_US = 56.26          # BASELINE.md: dense VecX Prior-50, per solve
BATCH = 10_000
DIMS = 50
REPS = 2048                   # solve-batches per dispatched program: large
                              # enough that the tunnel's fixed ~26 ms
                              # round-trip is ~2% of the wall (throughput
                              # approaches the kernel's marginal rate)


def main():
    import tinyopt_tpu as to
    from tinyopt_tpu.models.problems import PriorProblem, prior_residual
    from tinyopt_tpu.parallel.batched import batched_solver

    # Reference benchmark options (benchmarks/options.h:10-27), with the
    # whole-solve fused Pallas kernel (ops/pallas_solver.py): the entire
    # batched LM loop — matrix-free accumulate, damped Jacobi-PCG solve,
    # accept/reject, λ schedule, stop cascade — runs in VMEM.
    opts = to.Options(
        max_iters=10, min_error=0.0, min_rerr_dec=1e-12,
        min_step_norm2=1e-16, max_consec_failures=3,
        save_history=False,
        hessian=to.HessianOptions(save_last=False, solver="fused",
                                  cg_iters=8, carry_system=False,
                                  fused_block=512),
    )

    def gen(key):
        # Same instance distribution as models/problems.make_prior_batch,
        # generated on-device (reference benchmarks/dense.cpp:85-95).
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
            # Fold the carry into the starts: a true serial dependency, so
            # XLA cannot elide or reorder repetitions.
            x0 = x0 + jnp.float32(1e-30) * cost_sum
            _, out = solve(x0, data)
            return (cost_sum + out.final_cost.cost.sum(),
                    conv_sum + out.converged().sum(),
                    iters_sum + out.num_iters.sum())

        z = jnp.float32(0.0)
        return lax.fori_loop(0, REPS, body, (z, z, z))

    # Warmup / compile (fresh kernel compiles take minutes; the server-side
    # compile cache makes repeats seconds)
    cost_sum, conv_sum, iters_sum = bench(0)
    float(cost_sum)

    times = []
    conv = mean_iters = 0.0
    for rep in range(5):
        seed = (time.time_ns() + rep) % (2**31)
        t0 = time.perf_counter()
        cost_sum, conv_sum, iters_sum = bench(seed)
        float(cost_sum)                       # force completion
        times.append(time.perf_counter() - t0)
        n = REPS * BATCH
        conv = float(conv_sum) / n
        mean_iters = float(iters_sum) / n
    dt = min(times)

    n_solves = REPS * BATCH
    solves_per_s = n_solves / dt
    ref_solves_per_s = 1e6 / REF_SOLVE_US
    print(json.dumps({
        "metric": "batched_prior50_lm_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": f"solves/s (reps={REPS} x batch={BATCH}, dims={DIMS}, f32, "
                f"conv={conv:.2f}, mean_iters={mean_iters:.1f}, "
                f"wall={dt*1e3:.1f}ms, one dispatch)",
        "vs_baseline": round(solves_per_s / ref_solves_per_s, 2),
    }))


if __name__ == "__main__":
    main()
