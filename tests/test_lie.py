import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatslam_tpu.ops import lie


def random_se3(key, shape=()):
    k1, k2 = jax.random.split(key)
    xi = jax.random.normal(k1, tuple(shape) + (6,)) * 0.5
    return lie.exp(xi)


def test_identity_and_inverse():
    g = random_se3(jax.random.PRNGKey(0), (7,))
    gi = lie.inv(g)
    e = lie.mul(g, gi)
    np.testing.assert_allclose(e[..., :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(e[..., 6]), 1.0, atol=1e-5)


def test_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(1), (32, 6)) * 0.7
    xi2 = lie.log(lie.exp(xi))
    # fp32 roundoff dominates (the same check passes at 2e-14 in float64)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-2)


def test_exp_small_angle():
    xi = jnp.zeros((6,)).at[0].set(0.3)  # pure translation
    g = lie.exp(xi)
    np.testing.assert_allclose(np.asarray(g[:3]), [0.3, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[3:]), [0, 0, 0, 1], atol=1e-6)


def test_matrix_roundtrip():
    g = random_se3(jax.random.PRNGKey(2), (16,))
    T = lie.to_matrix(g)
    g2 = lie.from_matrix(T)
    # sign-canonicalize quaternions before comparing
    gq = np.asarray(g[..., 3:]) * np.sign(np.asarray(g[..., 6:7]))
    g2q = np.asarray(g2[..., 3:]) * np.sign(np.asarray(g2[..., 6:7]))
    np.testing.assert_allclose(np.asarray(g2[..., :3]), np.asarray(g[..., :3]), atol=1e-5)
    np.testing.assert_allclose(g2q, gq, atol=1e-5)


def test_action_matches_matrix():
    g = random_se3(jax.random.PRNGKey(3), (8,))
    p = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    out = lie.act3(g, p)
    T = np.asarray(lie.to_matrix(g))
    expect = np.einsum("nij,nj->ni", T[:, :3, :3], np.asarray(p)) + T[:, :3, 3]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_homogeneous_action():
    g = random_se3(jax.random.PRNGKey(5))
    X = jnp.asarray([0.2, -0.1, 1.0, 0.5])  # (x, y, z, d)
    Y = lie.act(g, X)
    R = np.asarray(lie.quat_to_matrix(g[3:]))
    expect_xyz = R @ np.asarray(X[:3]) + 0.5 * np.asarray(g[:3])
    np.testing.assert_allclose(np.asarray(Y[:3]), expect_xyz, atol=1e-5)
    assert float(Y[3]) == pytest.approx(0.5)


def test_compose_matches_matrix_product():
    ga = random_se3(jax.random.PRNGKey(6), (4,))
    gb = random_se3(jax.random.PRNGKey(7), (4,))
    T = np.asarray(lie.to_matrix(lie.mul(ga, gb)))
    expect = np.asarray(lie.to_matrix(ga)) @ np.asarray(lie.to_matrix(gb))
    np.testing.assert_allclose(T, expect, atol=1e-5)


def test_adjoint_identity():
    """Adj(g) xi satisfies exp(Adj(g) xi) = g exp(xi) g^-1."""
    g = random_se3(jax.random.PRNGKey(8))
    xi = jax.random.normal(jax.random.PRNGKey(9), (6,)) * 0.1
    lhs = lie.exp(jnp.einsum("ij,j->i", lie.adjoint(g), xi))
    rhs = lie.mul(lie.mul(g, lie.exp(xi)), lie.inv(g))
    # exact in float64 (2e-16); fp32 roundoff sets the tolerance here
    np.testing.assert_allclose(np.asarray(lhs[:3]), np.asarray(rhs[:3]), atol=1e-3)
    lq = np.asarray(lhs[3:]) * np.sign(float(lhs[6]))
    rq = np.asarray(rhs[3:]) * np.sign(float(rhs[6]))
    np.testing.assert_allclose(lq, rq, atol=1e-3)


def test_retr_is_left_multiplication():
    g = random_se3(jax.random.PRNGKey(10))
    xi = jax.random.normal(jax.random.PRNGKey(11), (6,)) * 0.1
    np.testing.assert_allclose(
        np.asarray(lie.retr(g, xi)),
        np.asarray(lie.mul(lie.exp(xi), g)), atol=1e-6)


def test_sim3_action_and_inverse():
    g8 = jnp.concatenate([random_se3(jax.random.PRNGKey(12)), jnp.asarray([1.7])])
    X = jnp.asarray([0.3, 0.2, 2.0, 1.0])
    Y = lie.sim3_act(g8, X)
    back = lie.sim3_act(lie.sim3_inv(g8), Y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(X), atol=1e-5)


def test_sim3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(13), (8, 7)) * 0.5
    g = lie.sim3_exp(xi)
    back = lie.sim3_log(g)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=2e-5)


def test_sim3_exp_small_tangent():
    """Taylor fallbacks: tiny / zero rotation and scale components."""
    for scale in (0.0, 1e-9, 1e-5):
        xi = jnp.asarray([0.1, -0.2, 0.3, scale, -scale, scale, scale])
        g = lie.sim3_exp(xi)
        assert np.all(np.isfinite(np.asarray(g)))
        back = lie.sim3_log(g)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   atol=1e-5)
    # pure-rotation tangent with zero sigma (den = theta^2 branch)
    xi = jnp.asarray([0.0, 0.0, 0.0, 0.4, 0.1, -0.2, 0.0])
    back = lie.sim3_log(lie.sim3_exp(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-5)


def test_sim3_exp_reduces_to_se3():
    """sigma = 0 must reproduce the SE3 exponential."""
    xi6 = jax.random.normal(jax.random.PRNGKey(14), (5, 6)) * 0.4
    xi7 = jnp.concatenate([xi6, jnp.zeros((5, 1))], -1)
    g8 = lie.sim3_exp(xi7)
    g7 = lie.exp(xi6)
    np.testing.assert_allclose(np.asarray(g8[:, :7]), np.asarray(g7),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g8[:, 7]), 1.0, atol=1e-6)


def test_sim3_compose_matches_matrix_product():
    xa = jax.random.normal(jax.random.PRNGKey(15), (4, 7)) * 0.3
    xb = jax.random.normal(jax.random.PRNGKey(16), (4, 7)) * 0.3
    ga, gb = lie.sim3_exp(xa), lie.sim3_exp(xb)
    T = np.asarray(lie.sim3_to_matrix(lie.sim3_mul(ga, gb)))
    expect = np.asarray(lie.sim3_to_matrix(ga)) @ \
        np.asarray(lie.sim3_to_matrix(gb))
    np.testing.assert_allclose(T, expect, atol=1e-5)


def test_sim3_adjoint_identity():
    """exp(Adj(g) xi) = g exp(xi) g^-1 on Sim(3)."""
    g = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(17), (7,)) * 0.3)
    xi = jax.random.normal(jax.random.PRNGKey(18), (7,)) * 0.1
    lhs = lie.sim3_exp(jnp.einsum("ij,j->i", lie.sim3_adjoint(g), xi))
    rhs = lie.sim3_mul(lie.sim3_mul(g, lie.sim3_exp(xi)), lie.sim3_inv(g))
    lq = np.asarray(lhs[3:7]) * np.sign(float(lhs[6]))
    rq = np.asarray(rhs[3:7]) * np.sign(float(rhs[6]))
    np.testing.assert_allclose(np.asarray(lhs[:3]), np.asarray(rhs[:3]),
                               atol=2e-3)
    np.testing.assert_allclose(lq, rq, atol=1e-3)
    np.testing.assert_allclose(float(lhs[7]), float(rhs[7]), atol=1e-4)


def test_sim3_retr():
    g = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(19), (7,)) * 0.3)
    xi = jax.random.normal(jax.random.PRNGKey(20), (7,)) * 0.1
    np.testing.assert_allclose(
        np.asarray(lie.sim3_retr(g, xi)),
        np.asarray(lie.sim3_mul(lie.sim3_exp(xi), g)), atol=1e-6)


def test_inv_matrix_np_matches_device():
    """Host batched c2w conversion == to_matrix(inv(g)) on device (the
    save/eval paths pull 7-vecs and convert on the host)."""
    rng = np.random.RandomState(5)
    g = []
    for i in range(7):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        g.append(np.concatenate([rng.randn(3), q]).astype(np.float32))
    g = np.stack(g)
    ref = np.asarray(jax.vmap(lambda p: lie.to_matrix(lie.inv(p)))(
        jnp.asarray(g)))
    np.testing.assert_allclose(lie.inv_matrix_np(g), ref, atol=1e-5)
