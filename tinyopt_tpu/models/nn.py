"""Tiny neural-network model: a perceptron trained as NLLS / GD.

Counterpart of the reference's NN integration test model (reference:
tests/nn.cpp:62-296): a single linear+sigmoid layer whose parameters
(W, b) are optimized either as a least-squares residual (LM/GN) or a
scalar loss (GD).  Parameters are a pytree dict, so the whole framework
(manifold layer, AD, batching) applies unchanged — this is the
demonstration that the optimizer covers ML-style models, not just
geometric ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..losses.activations import sigmoid


class PerceptronData(NamedTuple):
    inputs: jax.Array    #: (N, in_dim)
    targets: jax.Array   #: (N, out_dim)


def init_perceptron(in_dim: int, out_dim: int, dtype=jnp.float32, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "W": 0.5 * jax.random.normal(k1, (out_dim, in_dim), dtype),
        "b": 0.1 * jax.random.normal(k2, (out_dim,), dtype),
    }


def forward(params, x):
    """Batched forward: sigmoid(x Wᵀ + b) (nn.cpp batch forward)."""
    return sigmoid(x @ params["W"].T + params["b"])


def residuals(params, data: PerceptronData):
    """Per-sample prediction residuals, flattened (NLLS training)."""
    return (forward(params, data.inputs) - data.targets).reshape(-1)


def mse_cost(params, data: PerceptronData):
    """Scalar ½-free MSE-style cost = ‖residuals‖² (GD training)."""
    r = residuals(params, data)
    return jnp.vdot(r, r)


def manual_jacobian(params, data: PerceptronData):
    """Analytic residual Jacobian via the chain rule.

    For y = σ(z), z = xWᵀ + b: dy/dW[o,i] = σ'(z_o)·x_i, dy/db_o = σ'(z_o).
    Tangent layout matches the pytree order of ``params`` (dict: sorted
    keys → W then b... actually 'W' < 'b' lexicographically) flattened
    row-major, the same layout the manifold layer produces.
    """
    x = data.inputs
    z = x @ params["W"].T + params["b"]
    s = sigmoid(z)
    ds = s * (1.0 - s)                          # (N, out)
    n, out_dim = ds.shape
    in_dim = x.shape[1]
    # dres[n,o]/dW[p,i] = δ_{op}·ds[n,o]·x[n,i]
    JW = jnp.einsum("no,ni->noi", ds, x)        # (N, out, in)
    JW_full = jnp.zeros((n, out_dim, out_dim, in_dim), x.dtype)
    idx = jnp.arange(out_dim)
    JW_full = JW_full.at[:, idx, idx, :].set(JW)
    JW_flat = JW_full.reshape(n * out_dim, out_dim * in_dim)
    # dres[n,o]/db[p] = δ_{op}·ds[n,o]
    Jb = jnp.zeros((n, out_dim, out_dim), x.dtype)
    Jb = Jb.at[:, idx, idx].set(ds)
    Jb_flat = Jb.reshape(n * out_dim, out_dim)
    return jnp.concatenate([JW_flat, Jb_flat], axis=1)
