"""Roofline measurement: batched JᵀJ build + Cholesky on the MXU.

BASELINE.json's north star asks for near-roofline FLOPs on the
JᵀJ-build + Cholesky step in the dense batched regime.  This experiment
measures achieved FLOP/s of

  * H = JᵀJ            (batched einsum bnd,bne->bde — pure MXU)
  * L = cholesky(H+λI) (batched, the solve path of solvers/step.py)

for f32 and bf16 inputs across problem shapes, against v5e peak
(197 TFLOP/s bf16; true-f32 via Precision.HIGHEST ≈ peak/6 — the 6-pass
bf16 decomposition).

Methodology (the tunnel's fixed ~26 ms round-trip and execution cache
make naive timing lie, CLAUDE.md):
  * inputs are generated ONCE per dispatch from the seed (fresh seed per
    call defeats the server-side execution cache);
  * the kernel under test runs K times inside one ``lax.fori_loop`` with
    a carried data dependency (iteration i consumes a scalar from
    iteration i−1's output, and the input is perturbed by it), so XLA
    can neither elide nor batch the repetitions;
  * K is sized so kernel time dominates the round-trip, and the rate is
    (wall_K − wall_1)/(K − 1) on the same program at two K values.

Run: python benchmarks/exp_roofline.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12          # v5e MXU peak, bf16
PEAK_F32 = PEAK_BF16 / 6    # f32 via 6-pass bf16 (Precision.HIGHEST)


def make_bench(B, n, d, dtype, k_reps, step):
    @jax.jit
    def bench(seed):
        J0 = jax.random.uniform(jax.random.PRNGKey(seed), (B, n, d),
                                jnp.float32, -1.0, 1.0)
        if step == "chol":
            # Build H once; the loop times ONLY the batched Cholesky.
            Jd = J0.astype(dtype)
            H0 = jnp.einsum("bnd,bne->bde", Jd, Jd,
                            preferred_element_type=jnp.float32)
            H0 = (H0 + H0.transpose(0, 2, 1)) / 2 + \
                (n / 2.0) * jnp.eye(d, dtype=jnp.float32)

            def body(i, acc):
                H = H0 + (jnp.float32(1e-30) * acc) * \
                    jnp.eye(d, dtype=jnp.float32)
                L = jnp.linalg.cholesky(H)
                # consume EVERY output element or XLA dead-code-eliminates
                # the untouched part of the computation
                return acc + jnp.nansum(L)

            return lax.fori_loop(0, k_reps, body, jnp.float32(0.0))

        # TPU DEFAULT precision truncates f32 matmul inputs to bf16 (one
        # MXU pass); HIGHEST uses the 6-pass bf16 decomposition for true
        # f32 accuracy.  Measure what users of each dtype actually get.
        prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)

        def body(i, acc):
            J = (J0 + jnp.float32(1e-30) * acc).astype(dtype)
            H = jnp.einsum("bnd,bne->bde", J, J, precision=prec,
                           preferred_element_type=jnp.float32)
            # consume EVERY output element or XLA dead-code-eliminates the
            # untouched columns of the matmul (observed: a [d-1,d-1]-only
            # read collapsed the einsum to one column's reduction)
            return acc + H.sum()

        return lax.fori_loop(0, k_reps, body, jnp.float32(0.0))

    return bench


def timed(bench, reps=3):
    ts = []
    for r in range(reps):
        seed = (time.time_ns() + r) % (2 ** 31)
        t0 = time.perf_counter()
        float(bench(seed))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    shapes = [(64, 512, 256), (32, 1024, 512), (16, 2048, 512)]
    print(f"{'B×n×d':>16} {'dtype':>9} {'step':>5} {'per-rep':>9} "
          f"{'TFLOP/s':>8} {'% roofline':>10}")
    for B, n, d in shapes:
        jtj_flops = 2.0 * B * n * d * d
        for dtype, peak in ((jnp.bfloat16, PEAK_BF16),
                            (jnp.float32, PEAK_F32)):
            for step, flops in (("JtJ", jtj_flops),
                                ("chol", B * d ** 3 / 3.0)):
                if step == "chol" and dtype == jnp.bfloat16:
                    continue        # H is f32 either way (accumulation)
                b1 = make_bench(B, n, d, dtype, 1, step)
                float(b1(0))
                w1 = timed(b1)
                # Adaptive K: grow until loop time dominates the fixed
                # ~26 ms dispatch round-trip by an order of magnitude.
                k_hi = 512
                while True:
                    bk = make_bench(B, n, d, dtype, k_hi, step)
                    float(bk(0))    # compile
                    wk = timed(bk)
                    if wk - w1 > 0.25 or k_hi >= 16384:
                        break
                    k_hi *= 4
                marginal = (wk - w1) / (k_hi - 1)
                tf = flops / marginal / 1e12
                print(f"{B:>5}×{n}×{d:<5} {jnp.dtype(dtype).name:>9} "
                      f"{step:>5} {marginal*1e3:8.4f}ms {tf:8.1f} "
                      f"{100 * tf * 1e12 / peak:9.1f}%  (K={k_hi})",
                      flush=True)


if __name__ == "__main__":
    main()
