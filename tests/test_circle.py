"""2D circle fit (3-param dense NLLS), mirroring reference tests/circle.cpp."""

import numpy as np
import jax.numpy as jnp

import tinyopt_tpu as to


def make_circle(n, r, center, noise=0.0, seed=0):
    """Points on a circle at regular spacing (circle.cpp:21-30)."""
    rng = np.random.default_rng(seed)
    angles = np.arange(n) * 2 * np.pi / (n - 1)
    pts = center[None, :] + r * np.stack([np.cos(angles), np.sin(angles)], -1)
    pts += noise * rng.uniform(-1, 1, pts.shape)
    return jnp.asarray(pts)


def test_fit_circle():
    radius = 2.0
    center = np.array([2.0, 7.0])
    obs = make_circle(10, radius, center, noise=1e-5)

    def residuals(x):
        c = x[:2]
        radius2 = x[2] * x[2]
        delta = obs - c[None, :]
        return jnp.sum(delta * delta, axis=-1) - radius2

    x0 = jnp.array([0.0, 0.0, 1.0])
    opts = to.Options(lm=to.LMOptions(damping_init=1e1))
    x, out = to.optimize(x0, residuals, opts)

    assert bool(out.succeeded())
    assert abs(float(x[0]) - center[0]) < 1e-5
    assert abs(float(x[1]) - center[1]) < 1e-5
    assert abs(float(x[2]) - radius) < 1e-5
