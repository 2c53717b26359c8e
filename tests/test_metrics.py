"""SWD metric sanity: zero for identical sets, monotone with distribution
shift, pyramid shapes correct."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylegan_tpu.metrics import sliced_wasserstein_distance
from stylegan_tpu.metrics.swd import laplacian_pyramid


def test_pyramid_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    pyr = laplacian_pyramid(x, 3)
    assert [p.shape[1] for p in pyr] == [32, 16, 8]


def test_pyramid_reconstructs():
    """Sum of (upsampled) pyramid levels reconstructs the input."""
    from stylegan_tpu.ops import blur2d, make_blur_kernel, upscale2d
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3)
                    .astype(np.float32))
    pyr = laplacian_pyramid(x, 2)
    k = make_blur_kernel([1, 4, 6, 4, 1])
    recon = pyr[0] + blur2d(upscale2d(pyr[1]), k)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-5)


def test_identical_sets_near_zero():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 32, 32, 3)
                    .astype(np.float32))
    out = sliced_wasserstein_distance(x, x, key=jax.random.PRNGKey(0),
                                      n_patches=512, n_proj=32)
    # same images, same patch RNG per side differs — small but not huge
    assert out["avg"] < 0.2


def test_detects_distribution_shift():
    rs = np.random.RandomState(2)
    real = jnp.asarray(rs.randn(8, 32, 32, 3).astype(np.float32))
    similar = jnp.asarray(rs.randn(8, 32, 32, 3).astype(np.float32))
    shifted = jnp.asarray((rs.randn(8, 32, 32, 3) * 3 + 2).astype(np.float32))
    d_close = sliced_wasserstein_distance(real, similar,
                                          key=jax.random.PRNGKey(1),
                                          n_patches=512, n_proj=32)["avg"]
    d_far = sliced_wasserstein_distance(real, shifted,
                                        key=jax.random.PRNGKey(1),
                                        n_patches=512, n_proj=32)["avg"]
    assert d_far > d_close
