"""Micro-probe: row-granular gather/scatter costs on the TPU.

Prices the primitive operations the sparse-obs BA reduction can be
built from, at the flagship's shapes (rows of 36 f32 = one (da, da)
camera-pair block), with the honest fori-loop marginal design:

  * gather of R rows from an (N, 36) buffer, R ∈ {28k, 1M, 2.8M}
  * scatter-SET of 28k sorted-unique rows into (1M, 36)
  * scatter-ADD of 28k sorted-unique rows into (1M, 36)
  * scatter-ADD of 1.4M unsorted rows (the r3 baseline design)
  * dense sum over a (28k, 50, 36) padded-class array (tree reduce)

Usage: python benchmarks/exp_gather_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(reps=9):
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32
    W = 36
    N = 1_400_000
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.normal(size=(N + 1, W)), dtype)

    def timed(fn, *args):
        def loop(k, *args):
            def body(i, carry):
                s, _ = carry
                out = fn(jnp.asarray(1.0, dtype) + s * 1e-12, *args)
                return (out, carry[0] * 0.0)

            out0 = fn(jnp.asarray(1.0, dtype), *args)
            s, _ = jax.lax.fori_loop(0, k - 1, body, (out0, out0 * 0.0))
            return s

        jl = jax.jit(loop, static_argnums=0)
        walls = {}
        for k in (1, reps):
            float(jl(k, *args))
            t0 = time.perf_counter()
            float(jl(k, *args))
            walls[k] = time.perf_counter() - t0
        return (walls[reps] - walls[1]) / (reps - 1)

    rows = []
    for R in (28_000, 1_000_000, 2_800_000):
        idx = jnp.asarray(rng.integers(0, N, R), jnp.int32)

        def g(eps, idx=idx):
            # consume EVERY gathered element — a strided read lets XLA
            # DCE the un-consumed gather rows (exp_roofline trap)
            return jnp.sum((buf * eps)[idx]).astype(dtype)

        t = timed(g)
        rows.append((f"gather {R/1e6:.2f}M rows", t,
                     f"{t/R*1e9:.1f} ns/row"))

    uids = jnp.asarray(np.sort(rng.choice(1_000_000, 28_000,
                                          replace=False)), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(28_000, W)), dtype)
    target = jnp.zeros((1_000_000, W), dtype)

    def sset(eps):
        out = target.at[uids].set(vals * eps, unique_indices=True,
                                  indices_are_sorted=True)
        return jnp.sum(out[::4096, 0]).astype(dtype)

    t = timed(sset)
    rows.append(("scatter-set 28k sorted-unique -> 1M", t,
                 f"{t/28_000*1e9:.1f} ns/row"))

    def sadd(eps):
        out = target.at[uids].add(vals * eps, unique_indices=True,
                                  indices_are_sorted=True)
        return jnp.sum(out[::4096, 0]).astype(dtype)

    t = timed(sadd)
    rows.append(("scatter-add 28k sorted-unique -> 1M", t,
                 f"{t/28_000*1e9:.1f} ns/row"))

    big_ids = jnp.asarray(rng.integers(0, 1_000_000, N), jnp.int32)

    def sadd_big(eps):
        out = target.at[big_ids].add(buf[:-1] * eps)
        return jnp.sum(out[::4096, 0]).astype(dtype)

    t = timed(sadd_big)
    rows.append(("scatter-add 1.4M unsorted -> 1M", t,
                 f"{t/N*1e9:.1f} ns/row"))

    padded = jnp.asarray(rng.normal(size=(28_000, 50, W)), dtype)

    def dsum(eps):
        return jnp.sum(jnp.sum(padded * eps, axis=1)).astype(dtype)

    t = timed(dsum)
    rows.append(("dense sum (28k, 50, 36) axis=1", t,
                 f"{t/(28_000*50)*1e9:.1f} ns/row"))

    print(f"# backend={jax.default_backend()}, W={W} f32, marginal "
          f"over {reps-1} reps")
    for name, t, per in rows:
        print(f"{name:38s} {t*1e3:8.2f} ms   {per}")


if __name__ == "__main__":
    main()
