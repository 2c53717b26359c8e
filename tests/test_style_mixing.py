"""Style-mixing regularization semantics (reference GAN.py:281-289):
mix with probability p; cutoff uniform on [1, 2*(depth+1)] inclusive; layers
below the cutoff keep w1, layers at/above take w2."""

import numpy as np

import jax
import jax.numpy as jnp

from stylegan_tpu.models.generator import mix_styles

NUM_LAYERS = 10  # res 64


def _mix_once(seed, depth, prob):
    k = jax.random.PRNGKey(seed)
    k_cut, k_prob = jax.random.split(k)
    w1 = jnp.zeros((1, NUM_LAYERS, 4))
    w2 = jnp.ones((1, NUM_LAYERS, 4))
    out = np.asarray(mix_styles(k_cut, k_prob, w1, w2, depth, prob))[0, :, 0]
    # out[i] == 1 where w2 was taken
    return out


def test_prefix_structure():
    """Mixing always keeps a w1 prefix and a w2 suffix."""
    for seed in range(50):
        out = _mix_once(seed, depth=2, prob=1.0)
        switch = np.flatnonzero(np.diff(out) != 0)
        assert len(switch) <= 1  # at most one transition
        assert out[0] == 0  # layer 0 always keeps w1 (cutoff >= 1)


def test_cutoff_range_and_distribution():
    depth = 2
    cur_layers = 2 * (depth + 1)  # 6
    cutoffs = []
    for seed in range(400):
        out = _mix_once(seed, depth, prob=1.0)
        cutoff = int(np.argmax(out)) if out.max() > 0 else NUM_LAYERS
        cutoffs.append(cutoff)
    cutoffs = np.asarray(cutoffs)
    # cutoff uniform on [1, cur_layers]; cutoff == cur_layers means no used
    # layer mixes but trailing (unused) layers switch to w2
    assert cutoffs.min() >= 1
    assert cutoffs.max() <= cur_layers
    counts = np.bincount(cutoffs, minlength=cur_layers + 1)[1:cur_layers + 1]
    # every cutoff value occurs (uniform over 6 values, 400 draws)
    assert (counts > 20).all(), counts


def test_mixing_probability():
    depth = 2
    cur_layers = 2 * (depth + 1)
    mixed = 0
    n = 300
    for seed in range(n):
        out = _mix_once(seed, depth, prob=0.5)
        # "not mixed" = cutoff == cur_layers (all used layers keep w1)
        if out[:cur_layers].max() > 0:
            mixed += 1
    frac = mixed / n
    # p=0.5 to mix, and when mixing, cutoff<cur_layers w.p. 5/6
    expected = 0.5 * 5 / 6
    assert abs(frac - expected) < 0.12, frac


def test_prob_zero_never_mixes_used_layers():
    for seed in range(20):
        out = _mix_once(seed, depth=3, prob=1e-9)
        assert out[:2 * 4].max() == 0
