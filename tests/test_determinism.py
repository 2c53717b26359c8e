"""Determinism: identical keys -> identical samples and identical train
updates (jit-level reproducibility the reference cannot offer — its noise
comes from global torch/python RNG state)."""

import numpy as np

import jax
import jax.numpy as jnp

from stylegan_tpu.models import generator_apply, generator_init
from stylegan_tpu.train.steps import build_train_step
from tests.test_train_steps import make_cfgs, make_state


def test_sampling_deterministic():
    gen_cfg, _ = make_cfgs()
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    key = jax.random.PRNGKey(2)
    a = generator_apply(gen_cfg, params, z, depth=2, alpha=1.0, rng=key,
                        train=True)
    b = generator_apply(gen_cfg, params, z, depth=2, alpha=1.0, rng=key,
                        train=True)
    np.testing.assert_array_equal(np.asarray(a.images), np.asarray(b.images))
    c = generator_apply(gen_cfg, params, z, depth=2, alpha=1.0,
                        rng=jax.random.PRNGKey(3), train=True)
    assert not np.array_equal(np.asarray(a.images), np.asarray(c.images))


def test_train_step_deterministic():
    gen_cfg, dis_cfg = make_cfgs()
    state, g_tx, d_tx = make_state(gen_cfg, dis_cfg, seed=31)
    step = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=1,
                            donate=False)
    reals = jax.random.normal(jax.random.PRNGKey(4), (8, 16, 16, 3))
    z = jax.random.normal(jax.random.PRNGKey(5), (8, 32))
    key = jax.random.PRNGKey(6)
    s1, m1 = step(state, reals, z, key, jnp.float32(0.5))
    s2, m2 = step(state, reals, z, key, jnp.float32(0.5))
    assert float(m1["d_loss"]) == float(m2["d_loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
