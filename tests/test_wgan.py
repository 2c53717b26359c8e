"""WGAN / WGAN-GP loss tests (the reference advertises these but never
implements them — GAN.py:464-470; formulas follow akanimax/pro_gan_pytorch)."""

import numpy as np

import jax
import jax.numpy as jnp

from stylegan_tpu import losses
from stylegan_tpu.train.steps import build_train_step
from tests.test_train_steps import make_cfgs, make_state


def _lin_dis(w):
    w = jnp.asarray(w)

    def dis_fn(x):
        return jnp.tanh(x.reshape(x.shape[0], -1) @ w).sum(axis=1,
                                                           keepdims=True)
    return dis_fn


def test_wgan_formula():
    rs = np.random.RandomState(0)
    w = rs.randn(12, 3).astype(np.float32)
    reals = rs.randn(5, 12).astype(np.float32)
    fakes = rs.randn(5, 12).astype(np.float32)
    dis = _lin_dis(w)
    r, f = np.asarray(dis(jnp.asarray(reals))), np.asarray(dis(jnp.asarray(fakes)))
    expected = f.mean() - r.mean() + 0.001 * (r ** 2).mean()
    got = float(losses.wgan_dis_loss(dis, jnp.asarray(reals), jnp.asarray(fakes)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    np.testing.assert_allclose(
        float(losses.wgan_gen_loss(dis, None, jnp.asarray(fakes))),
        -f.mean(), rtol=1e-5)


def test_gradient_penalty_unit_norm_is_zero():
    """For D(x) = <u, x> with ||u||=1, dD/dx = u everywhere -> GP == 0."""
    u = np.zeros((12, 1), np.float32)
    u[3, 0] = 1.0

    def dis(x):
        return x.reshape(x.shape[0], -1) @ jnp.asarray(u)

    rs = np.random.RandomState(1)
    reals = jnp.asarray(rs.randn(4, 12).astype(np.float32))
    fakes = jnp.asarray(rs.randn(4, 12).astype(np.float32))
    gp = float(losses.gradient_penalty(dis, reals, fakes,
                                       jax.random.PRNGKey(0)))
    assert gp < 1e-6


def test_gradient_penalty_scaling():
    """D(x) = 3 * <u, x>, ||u||=1 -> grad norm 3 -> GP == (3-1)^2 == 4."""
    u = np.zeros((12, 1), np.float32)
    u[5, 0] = 1.0

    def dis(x):
        return 3.0 * (x.reshape(x.shape[0], -1) @ jnp.asarray(u))

    rs = np.random.RandomState(2)
    reals = jnp.asarray(rs.randn(4, 12).astype(np.float32))
    fakes = jnp.asarray(rs.randn(4, 12).astype(np.float32))
    gp = float(losses.gradient_penalty(dis, reals, fakes,
                                       jax.random.PRNGKey(1)))
    np.testing.assert_allclose(gp, 4.0, rtol=1e-4)


def test_wgan_gp_train_step_smoke():
    gen_cfg, dis_cfg = make_cfgs()
    state, g_tx, d_tx = make_state(gen_cfg, dis_cfg, seed=21)
    step = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=1,
                            loss="wgan-gp", donate=False)
    batch = 8
    reals = jnp.asarray(np.random.RandomState(3)
                        .randn(batch, 16, 16, 3).astype(np.float32))
    z = jnp.asarray(np.random.RandomState(4).randn(batch, 32).astype(np.float32))
    new_state, metrics = step(state, reals, z, jax.random.PRNGKey(5),
                              jnp.float32(0.5))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    for leaf in jax.tree_util.tree_leaves(new_state.d_params):
        assert np.isfinite(np.asarray(leaf)).all()
