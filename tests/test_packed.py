"""Packed (space-to-depth) conv/epilogue ops == their unpacked reference ops.

The packed domain is a pure execution-layout choice; every op here must match
the unpacked op it replaces through space_to_depth/depth_to_space to float32
roundoff (summation order differs, so exact-bitwise is not expected).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylegan_tpu.ops import packed as pk
from stylegan_tpu.ops.linear import (_conv_same, _fused_downscale_conv,
                                     _fused_upscale_conv)
from stylegan_tpu.ops.primitives import (add_noise, blur2d, instance_norm,
                                         make_blur_kernel, pixel_norm,
                                         style_modulate, upscale2d)

TOL = dict(rtol=2e-5, atol=2e-5)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_space_to_depth_roundtrip_and_order():
    x = _rand(jax.random.PRNGKey(0), (2, 8, 8, 3))
    p = pk.space_to_depth(x)
    assert p.shape == (2, 4, 4, 12)
    # lane order: c*4 + (di*2 + dj)
    np.testing.assert_array_equal(p[0, 1, 2, 2 * 4 + 1 * 2 + 0],
                                  x[0, 2 * 1 + 1, 2 * 2 + 0, 2])
    np.testing.assert_allclose(pk.depth_to_space(p), x)


@pytest.mark.parametrize("k", [1, 3])
def test_conv_packed_same(k):
    key = jax.random.PRNGKey(1)
    x = _rand(key, (2, 16, 16, 6))
    w = _rand(jax.random.fold_in(key, 1), (k, k, 6, 10)) * 0.3
    ref = _conv_same(x, w)
    out = pk.depth_to_space(pk.conv_packed_same(pk.space_to_depth(x), w))
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("blur", [None, (1, 2, 1)])
@pytest.mark.parametrize("in_packed", [False, True])
def test_conv_packed_up(blur, in_packed):
    key = jax.random.PRNGKey(2)
    x = _rand(key, (2, 8, 8, 6))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 6, 10)) * 0.3
    bk = make_blur_kernel(blur) if blur else None
    ref = _fused_upscale_conv(x, w)
    if bk is not None:
        ref = blur2d(ref, bk)
    xin = pk.space_to_depth(x) if in_packed else x
    out = pk.conv_packed_up(xin, w, in_packed=in_packed)
    if bk is not None:
        out = pk.blur_packed(out, bk)
    np.testing.assert_allclose(pk.depth_to_space(out), ref, **TOL)


@pytest.mark.parametrize("blur", [None, (1, 2, 1)])
def test_conv_packed_down(blur):
    key = jax.random.PRNGKey(3)
    x = _rand(key, (2, 16, 16, 6))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 6, 10)) * 0.3
    bk = make_blur_kernel(blur) if blur else None
    xb = blur2d(x, bk) if bk is not None else x
    ref = _fused_downscale_conv(xb, w)
    xp = pk.space_to_depth(x)
    if bk is not None:
        xp = pk.blur_packed(xp, bk)
    out = pk.depth_to_space(pk.conv_packed_down(xp, w))
    np.testing.assert_allclose(out, ref, **TOL)


def test_add_noise_packed():
    key = jax.random.PRNGKey(4)
    x = _rand(key, (2, 8, 8, 6))
    noise = _rand(jax.random.fold_in(key, 1), (2, 8, 8, 1))
    nw = _rand(jax.random.fold_in(key, 2), (6,))
    ref = add_noise(x, nw, noise)
    out = pk.depth_to_space(pk.add_noise_packed(
        pk.space_to_depth(x), nw, pk.space_to_depth(noise)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_instance_norm_packed():
    x = _rand(jax.random.PRNGKey(5), (2, 8, 8, 6)) * 3 + 1.5
    ref = instance_norm(x)
    out = pk.depth_to_space(pk.instance_norm_packed(pk.space_to_depth(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_pixel_norm_packed():
    x = _rand(jax.random.PRNGKey(6), (2, 8, 8, 6)) * 2
    ref = pixel_norm(x)
    out = pk.depth_to_space(pk.pixel_norm_packed(pk.space_to_depth(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_style_modulate_packed():
    key = jax.random.PRNGKey(7)
    x = _rand(key, (2, 8, 8, 6))
    style = _rand(jax.random.fold_in(key, 1), (2, 12))
    ref = style_modulate(x, style)
    out = pk.depth_to_space(pk.style_modulate_packed(
        pk.space_to_depth(x), style))
    np.testing.assert_allclose(out, ref, **TOL)


def test_upscale_rgb_packed():
    x = _rand(jax.random.PRNGKey(8), (2, 8, 8, 3))
    ref = upscale2d(x)
    out = pk.depth_to_space(pk.upscale_rgb_packed(x))
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("structure,depth,alpha", [
    ("linear", 5, 1.0),     # both 128/256 stages packed, packed-in upconv
    ("linear", 5, 0.35),    # fade-in blend crosses the packed to_rgb path
    ("linear", 4, 0.5),     # final stage packed, previous stage unpacked
    ("linear", 3, 1.0),     # no packed stage reached — must be identical
    ("fixed", 5, 1.0),
])
def test_packed_synthesis_matches_unpacked(structure, depth, alpha):
    """cfg.packed is an execution-layout choice: same samples, same rng."""
    from dataclasses import replace

    from stylegan_tpu.models import SynthesisConfig, synthesis_apply, synthesis_init

    cfg = SynthesisConfig(resolution=256, fmap_base=1024,
                          blur_filter=(1, 2, 1), structure=structure)
    cfg_pk = replace(cfg, packed=True)
    assert cfg_pk.packed_block(4) and cfg_pk.packed_block(5)
    assert not cfg_pk.packed_block(3)
    key = jax.random.PRNGKey(11)
    params = synthesis_init(key, cfg)
    dlat = _rand(jax.random.fold_in(key, 1), (2, cfg.num_layers, 512)) * 0.3
    rng = jax.random.fold_in(key, 2)
    ref = synthesis_apply(cfg, params, dlat, depth=depth, alpha=alpha, rng=rng)
    out = synthesis_apply(cfg_pk, params, dlat, depth=depth, alpha=alpha,
                          rng=rng)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("structure,depth,alpha", [
    ("linear", 6, 1.0),     # full depth at 256: both packed stages
    ("linear", 6, 0.4),     # fade-in: packed from_rgb residual blend
    ("linear", 5, 0.4),     # entry at 128: packed straight, unpacked below
    ("linear", 3, 1.0),     # below packing threshold — identical path
    ("fixed", 6, 1.0),
])
def test_packed_discriminator_matches_unpacked(structure, depth, alpha):
    from dataclasses import replace

    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_apply,
                                     discriminator_init)

    # fmap_max keeps nf(1)==nf(2) (the architecture, like the reference's,
    # requires it at the top block); fmap_base keeps the >=128 stages narrow
    # enough to pack
    cfg = DiscriminatorConfig(resolution=256, fmap_base=1024, fmap_max=256,
                              structure=structure)
    cfg_pk = replace(cfg, packed=True)
    assert cfg_pk.packed_res(8) and cfg_pk.packed_res(7)
    assert not cfg_pk.packed_res(6)
    key = jax.random.PRNGKey(13)
    params = discriminator_init(key, cfg)
    if structure == "fixed":
        depth = cfg.depth - 1
    res = 2 ** (depth + 2)
    imgs = _rand(jax.random.fold_in(key, 1), (4, res, res, 3))
    ref = discriminator_apply(cfg, params, imgs, depth=depth, alpha=alpha)
    out = discriminator_apply(cfg_pk, params, imgs, depth=depth, alpha=alpha)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_packed_conv_grads_match():
    """The packed conv must be differentiable with grads matching unpacked."""
    key = jax.random.PRNGKey(9)
    x = _rand(key, (2, 8, 8, 4))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 4, 4)) * 0.3

    def loss_ref(w):
        return jnp.sum(_conv_same(x, w) ** 2)

    def loss_packed(w):
        return jnp.sum(pk.conv_packed_same(pk.space_to_depth(x), w) ** 2)

    g_ref = jax.grad(loss_ref)(w)
    g_pk = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(g_pk, g_ref, rtol=1e-4, atol=1e-4)
