"""Padding for batched heterogeneous problem instances.

JAX requires static shapes: a batch of instances with different residual
counts (e.g. circle fits with 8..17 observations each) must be padded to
one shape before ``vmap`` (SURVEY.md §7 "dynamic dims" hard part; the
reference handles runtime sizes with dynamic Eigen matrices instead —
per-instance allocation, no batching).

The contract: pad observation arrays to the max count and carry a weight
mask; residual functions multiply by the mask so padded rows contribute
exactly zero residual AND zero Jacobian (their cost/JᵀJ contributions
vanish — mathematically identical to the unpadded problem).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pad_instances(data_list: Sequence[Any], pad_value: float = 0.0):
    """Stack per-instance pytrees with unequal leading axes.

    Each element of ``data_list`` is one instance's data pytree; every leaf
    is padded along axis 0 to the max count across instances, then stacked.
    Returns ``(stacked, mask)`` with ``mask`` of shape (B, n_max): 1.0 for
    real rows, 0.0 for padding.
    """
    if not data_list:
        raise ValueError("empty instance list")
    counts = [
        int(jax.tree_util.tree_leaves(d)[0].shape[0]) for d in data_list
    ]
    n_max = max(counts)

    def pad_leaf(a, n):
        a = jnp.asarray(a)
        if a.shape[0] == n_max:
            return a
        pad_width = [(0, n_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad_width, constant_values=pad_value)

    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(
            [pad_leaf(l, c) for l, c in zip(leaves, counts)]),
        *data_list)
    mask = jnp.asarray(
        np.arange(n_max)[None, :] < np.asarray(counts)[:, None],
        jnp.float32)
    return stacked, mask


def masked_residuals(r: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero out padded residual rows (apply inside the residual fn).

    ``r``: (n_max, ...) per-instance residuals, ``mask``: (n_max,).

    Implemented with ``where`` rather than multiplication: a residual
    function that divides/logs/sqrts its data produces inf/NaN on the
    pad_value rows, and NaN · 0 = NaN would poison the whole instance —
    ``where`` discards the padded rows' values AND their AD tangents.
    """
    r = jnp.asarray(r)
    m = mask.reshape((mask.shape[0],) + (1,) * (r.ndim - 1)) > 0
    return jnp.where(m, r, jnp.zeros((), r.dtype))
