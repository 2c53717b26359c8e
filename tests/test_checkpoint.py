"""Checkpoint IO tests: npz params, partial loads, full train-state (orbax
with npz fallback)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from stylegan_tpu.io import checkpoint as ckpt
from stylegan_tpu.train.state import (create_train_state, make_d_optimizer,
                                      make_g_optimizer)


def small_tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "a": {"weight": jax.random.normal(k, (4, 8)), "bias": jnp.zeros(8)},
        "blocks": [{"w": jnp.ones((2, 2)) * 3}, {"w": jnp.ones((3, 3)) * 4}],
    }


def test_save_load_params(tmp_path):
    t = small_tree()
    p = str(tmp_path / "t.npz")
    ckpt.save_params(p, t, metadata={"depth": 3})
    loaded, meta = ckpt.load_params_into(small_tree(seed=1), p, partial=False)
    assert meta == {"depth": 3}
    for a, b in zip(jax.tree_util.tree_leaves(t),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_load_keeps_missing(tmp_path):
    t = small_tree()
    p = str(tmp_path / "t.npz")
    ckpt.save_params(p, {"a": t["a"]})  # only half the tree
    tgt = small_tree(seed=2)
    before = np.asarray(tgt["blocks"][0]["w"]).copy()
    loaded, _ = ckpt.load_params_into(tgt, p)
    np.testing.assert_array_equal(np.asarray(loaded["a"]["weight"]),
                                  np.asarray(t["a"]["weight"]))
    np.testing.assert_array_equal(np.asarray(loaded["blocks"][0]["w"]), before)


def test_shape_mismatch_keeps_template(tmp_path):
    p = str(tmp_path / "t.npz")
    ckpt.save_params(p, {"a": {"weight": jnp.zeros((9, 9))}})
    tgt = small_tree(seed=3)
    loaded, _ = ckpt.load_params_into(tgt, p)
    assert np.asarray(loaded["a"]["weight"]).shape == (4, 8)


def test_train_state_roundtrip(tmp_path):
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()
    g = small_tree(seed=4)
    d = small_tree(seed=5)
    state = create_train_state(g, d, g_tx, d_tx, use_ema=True)
    path = str(tmp_path / "ckpt")
    ckpt.save_train_state(path, state, {"depth": 2, "epoch": 7})

    template = create_train_state(small_tree(seed=6), small_tree(seed=7),
                                  g_tx, d_tx, use_ema=True)
    restored, meta = ckpt.load_train_state(path, template)
    assert meta.get("depth") == 2 and meta.get("epoch") == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.g_opt_state),
                    jax.tree_util.tree_leaves(restored.g_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_npz_fallback(tmp_path):
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()
    state = create_train_state(small_tree(8), small_tree(9), g_tx, d_tx,
                               use_ema=False)
    path = str(tmp_path / "ckpt2")
    ckpt.save_train_state(path, state, {"epoch": 1}, use_orbax=False)
    assert os.path.exists(path + ".npz")
    template = create_train_state(small_tree(10), small_tree(11), g_tx, d_tx,
                                  use_ema=False)
    restored, meta = ckpt.load_train_state(path, template)
    assert meta.get("epoch") == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.d_params),
                    jax.tree_util.tree_leaves(restored.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
