"""Sliced Wasserstein Distance over a Laplacian pyramid (ProGAN, Karras et
al. 2018 §5 / appendix A — the metric used before FID became standard).

Per pyramid level: extract 7x7x3 patches around random locations, normalize
per channel (mean/std over the patch set), project onto random unit
directions, sort, and average |sorted_real - sorted_fake|.  Lower is better;
reported per level and averaged.  Runs entirely in JAX — no pretrained
features — so it works in air-gapped TPU environments where FID's InceptionV3
weights cannot be fetched.

Typical use: compare a batch of generated samples against a batch of training
images at matched resolution during/after training.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops import avg_pool2d, blur2d, make_blur_kernel, upscale2d

_PATCH = 7


def _gaussian_kernel():
    return make_blur_kernel([1, 4, 6, 4, 1])


def laplacian_pyramid(images: jax.Array, levels: int) -> List[jax.Array]:
    """NHWC batch -> list of detail levels, finest first (last = residual)."""
    pyramid = []
    cur = images
    for _ in range(levels - 1):
        blurred = blur2d(cur, _gaussian_kernel())
        down = avg_pool2d(blurred, 2)
        up = blur2d(upscale2d(down), _gaussian_kernel())
        pyramid.append(cur - up)
        cur = down
    pyramid.append(cur)
    return pyramid


def _extract_patches(level: jax.Array, n_patches: int, key) -> jax.Array:
    """Random 7x7 patches -> (n_patches, 7*7*C), channel-normalized."""
    b, h, w, c = level.shape
    k1, k2, k3 = jax.random.split(key, 3)
    bi = jax.random.randint(k1, (n_patches,), 0, b)
    yi = jax.random.randint(k2, (n_patches,), 0, max(1, h - _PATCH + 1))
    xi = jax.random.randint(k3, (n_patches,), 0, max(1, w - _PATCH + 1))

    def take(args):
        bidx, y, x = args
        return jax.lax.dynamic_slice(level, (bidx, y, x, 0),
                                     (1, min(_PATCH, h), min(_PATCH, w), c))[0]

    patches = jax.vmap(lambda a: take(a))((bi, yi, xi))
    # per-channel normalization over the patch set (ProGAN appendix A)
    mean = jnp.mean(patches, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(patches, axis=(0, 1, 2), keepdims=True) + 1e-8
    patches = (patches - mean) / std
    return patches.reshape(n_patches, -1)


def _swd_1d(a: jax.Array, b: jax.Array, n_proj: int, key) -> jax.Array:
    dim = a.shape[1]
    dirs = jax.random.normal(key, (dim, n_proj))
    dirs = dirs / (jnp.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12)
    pa = jnp.sort(a @ dirs, axis=0)
    pb = jnp.sort(b @ dirs, axis=0)
    return jnp.mean(jnp.abs(pa - pb))


def sliced_wasserstein_distance(real: jax.Array, fake: jax.Array,
                                key=None, levels: int = None,
                                n_patches: int = 2048,
                                n_proj: int = 128) -> Dict[str, float]:
    """real/fake: (B, H, W, C) in [-1, 1] at the same resolution.

    Returns {"level_{res}": swd, ..., "avg": mean} (x1e3 like the paper's
    tables is left to the caller)."""
    assert real.shape == fake.shape, (real.shape, fake.shape)
    if key is None:
        key = jax.random.PRNGKey(0)
    h = real.shape[1]
    if levels is None:
        levels = max(1, int(jnp.log2(h)) - 2)  # down to 8x8-ish

    pyr_r = laplacian_pyramid(jnp.asarray(real, jnp.float32), levels)
    pyr_f = laplacian_pyramid(jnp.asarray(fake, jnp.float32), levels)
    out = {}
    vals = []
    for lvl, (lr, lf) in enumerate(zip(pyr_r, pyr_f)):
        key, k1, k2, k3 = jax.random.split(key, 4)
        pr = _extract_patches(lr, n_patches, k1)
        pf = _extract_patches(lf, n_patches, k2)
        v = float(_swd_1d(pr, pf, n_proj, k3))
        out[f"level_{lr.shape[1]}"] = v
        vals.append(v)
    out["avg"] = float(sum(vals) / len(vals))
    return out
