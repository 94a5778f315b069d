"""Parameter-type matrix: the pytree/manifold system.

Mirror of the reference's traits tests (tests/types.cpp:17-50,
tests/userdef_params.cpp:46-185, tests/userdef_params_jet.cpp:22-80):
scalars, vectors, matrices, nested containers, and user-defined manifold
types all optimize through the same API.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tinyopt_tpu as to
from tinyopt_tpu import Manifold, register_manifold
from tinyopt_tpu import manifold as mf


class TestEuclideanPytrees:
    def test_python_scalar(self):
        x, out = to.optimize(1.0, lambda x: x * x - 2.0)
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)

    def test_jnp_scalar(self):
        x, out = to.optimize(jnp.asarray(2.0), lambda x: x * x - 2.0)
        assert float(x) == pytest.approx(np.sqrt(2), abs=1e-6)

    def test_vector(self):
        x, out = to.optimize(jnp.zeros(3), lambda p: p - jnp.arange(3.0))
        np.testing.assert_allclose(np.asarray(x), [0.0, 1.0, 2.0],
                                   atol=1e-8)

    def test_matrix_flattened(self):
        """2-D parameters: tangent = flattened entries (traits.h:166-191)."""
        target = jnp.arange(6.0).reshape(2, 3)
        x, out = to.optimize(jnp.zeros((2, 3)),
                             lambda M: (M - target).reshape(-1))
        np.testing.assert_allclose(np.asarray(x), np.asarray(target),
                                   atol=1e-8)

    def test_tuple_of_params(self):
        """Pair concatenation (traits.h:310-349)."""
        def res(xy):
            a, b = xy
            return jnp.stack([a * a - 2.0, jnp.sum(b) - 3.0,
                              b[0] - b[1] - 1.0])

        (a, b), out = to.optimize((1.0, jnp.ones(2)), res)
        assert float(a) == pytest.approx(np.sqrt(2), abs=1e-6)
        assert float(b[0] + b[1]) == pytest.approx(3.0, abs=1e-6)

    def test_dict_of_params(self):
        def res(p):
            return jnp.concatenate([
                jnp.atleast_1d(p["s"] * p["s"] - 4.0),
                p["v"] - 1.0,
            ])

        p, out = to.optimize({"s": 1.0, "v": jnp.zeros(2)}, res)
        assert abs(float(p["s"])) == pytest.approx(2.0, abs=1e-6)
        np.testing.assert_allclose(np.asarray(p["v"]), [1.0, 1.0], atol=1e-8)

    def test_list_of_vectors(self):
        """std::vector<Vec> analogue (traits.h:217-260)."""
        def res(ps):
            return jnp.concatenate([p - i for i, p in enumerate(ps)])

        ps, out = to.optimize([jnp.zeros(2), jnp.zeros(2)], res)
        np.testing.assert_allclose(np.asarray(ps[1]), [1.0, 1.0], atol=1e-8)


class TestTangentSpec:
    def test_dims_and_offsets(self):
        spec = mf.tangent_spec({"a": jnp.zeros(3), "b": jnp.zeros((2, 2))})
        assert spec.dims == 7
        assert spec.leaf_dims == (3, 4)
        assert spec.offsets == (0, 3)

    def test_retract_local_roundtrip(self):
        x = {"a": jnp.array([1.0, 2.0]), "b": jnp.asarray(5.0)}
        spec = mf.tangent_spec(x)
        delta = jnp.array([0.1, -0.2, 0.3])
        y = mf.retract(x, delta, spec)
        np.testing.assert_allclose(np.asarray(mf.local(x, y, spec)),
                                   np.asarray(delta), atol=1e-12)


# --- User-defined manifold type (userdef_params.cpp analogue) ---

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UnitVec2:
    """A point on the unit circle, parametrized by its 2-D embedding but
    with a 1-D tangent (angle) — a genuinely non-Euclidean user type."""
    xy: jax.Array

    @staticmethod
    def from_angle(t):
        t = jnp.asarray(t)
        return UnitVec2(jnp.stack([jnp.cos(t), jnp.sin(t)]))


def _uv2_retract(v: UnitVec2, delta):
    c, s = jnp.cos(delta[0]), jnp.sin(delta[0])
    x, y = v.xy[0], v.xy[1]
    return UnitVec2(jnp.stack([c * x - s * y, s * x + c * y]))


def _uv2_local(a: UnitVec2, b: UnitVec2):
    ang = jnp.arctan2(b.xy[1], b.xy[0]) - jnp.arctan2(a.xy[1], a.xy[0])
    return jnp.atleast_1d(jnp.arctan2(jnp.sin(ang), jnp.cos(ang)))


register_manifold(UnitVec2, Manifold(
    dims=lambda v: 1, retract=_uv2_retract, local=_uv2_local))


class TestUserDefinedManifold:
    def test_tangent_dims(self):
        spec = mf.tangent_spec(UnitVec2.from_angle(0.3))
        assert spec.dims == 1  # not 2: the manifold overrides the leaf size

    def test_optimize_on_circle(self):
        """Align a unit vector with a target direction: 1-DoF problem."""
        target = UnitVec2.from_angle(2.0)

        def res(v: UnitVec2):
            return v.xy - target.xy

        v, out = to.optimize(UnitVec2.from_angle(0.1), res)
        assert bool(out.converged())
        np.testing.assert_allclose(np.asarray(v.xy), np.asarray(target.xy),
                                   atol=1e-7)
        # The constraint ||xy|| == 1 is preserved exactly by the retraction
        assert float(jnp.linalg.norm(v.xy)) == pytest.approx(1.0, rel=1e-12)

    def test_mixed_manifold_and_euclidean(self):
        target = UnitVec2.from_angle(-1.2)

        def res(p):
            v, scale = p
            return jnp.concatenate([v.xy - target.xy,
                                    jnp.atleast_1d(scale * scale - 9.0)])

        # max_consec_failures=0: the scale coordinate overshoots from a far
        # start and needs several λ escalations before the first decrease.
        (v, scale), out = to.optimize(
            (UnitVec2.from_angle(0.5), 1.0), res,
            to.Options(max_consec_failures=0, max_iters=100))
        np.testing.assert_allclose(np.asarray(v.xy), np.asarray(target.xy),
                                   atol=1e-6)
        assert abs(float(scale)) == pytest.approx(3.0, abs=1e-6)

    def test_numdiff_on_manifold(self):
        """Manifold-aware finite differences on the user type
        (userdef_params.cpp:152-185 uses numdiff-only local structs)."""
        target = UnitVec2.from_angle(1.0)
        v, out = to.optimize(UnitVec2.from_angle(0.0),
                             lambda v: v.xy - target.xy, mode="numdiff")
        assert out.num_diff_used
        np.testing.assert_allclose(np.asarray(v.xy), np.asarray(target.xy),
                                   atol=1e-5)


class TestSparseMatrixParams:
    """params_trait<SparseMatrix> analogue (reference traits.h:193-215):
    a jax.experimental.sparse BCOO leaf optimizes its STORED VALUES; the
    sparsity pattern is structural (manifold._register_sparse_params)."""

    def _problem(self):
        from jax.experimental import sparse as jsparse
        M0 = jsparse.BCOO.fromdense(jnp.asarray(
            [[1.0, 0, 2.0], [0, 3.0, 0], [0.5, 0, 0]]))
        rng = np.random.default_rng(0)
        V = jnp.asarray(rng.normal(size=(5, 3)))
        data_true = jnp.asarray([2.0, -1.0, 0.7, 1.3])
        M_true = jsparse.BCOO((data_true, M0.indices), shape=M0.shape)
        dn = (((1,), (0,)), ((), ()))
        T = jsparse.bcoo_dot_general(M_true, V.T, dimension_numbers=dn)

        def res(M):
            return (jsparse.bcoo_dot_general(M, V.T,
                                             dimension_numbers=dn)
                    - T).reshape(-1)
        return M0, res, data_true

    def test_tangent_is_stored_values(self):
        M0, res, _ = self._problem()
        spec = mf.tangent_spec(M0)
        assert spec.dims == 4                        # nnz, not 9
        assert jnp.issubdtype(spec.dtype, jnp.floating)
        d = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        M1 = mf.retract(M0, d, spec)
        np.testing.assert_allclose(np.asarray(M1.data),
                                   np.asarray(M0.data + d))
        np.testing.assert_array_equal(np.asarray(M1.indices),
                                      np.asarray(M0.indices))
        np.testing.assert_allclose(np.asarray(mf.local(M0, M1)),
                                   np.asarray(d))

    def test_optimizes_values_only(self):
        M0, res, data_true = self._problem()
        M_opt, out = to.optimize(M0, res)
        assert bool(out.converged()), int(out.stop_reason)
        np.testing.assert_allclose(np.asarray(M_opt.data),
                                   np.asarray(data_true), atol=1e-8)
        np.testing.assert_array_equal(np.asarray(M_opt.indices),
                                      np.asarray(M0.indices))

    def test_mixed_pytree_with_dense_leaves(self):
        M0, res, data_true = self._problem()

        def res2(x):
            return jnp.concatenate([res(x["M"]), x["b"] - 1.0])

        x_opt, out = to.optimize({"M": M0, "b": jnp.zeros(3)}, res2)
        assert bool(out.converged())
        np.testing.assert_allclose(np.asarray(x_opt["M"].data),
                                   np.asarray(data_true), atol=1e-8)
        np.testing.assert_allclose(np.asarray(x_opt["b"]),
                                   np.ones(3), atol=1e-10)
