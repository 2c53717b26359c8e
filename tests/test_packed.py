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


def test_packed_conditional_discriminator_matches_unpacked():
    """Conditional D with packed layout: the label planes double the image
    channels BEFORE space_to_depth, so the packed from_rgb consumes 24 lanes
    — an untested-by-the-other-cases combination."""
    from dataclasses import replace

    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_apply,
                                     discriminator_init)

    cfg = DiscriminatorConfig(resolution=256, fmap_base=1024, fmap_max=256,
                              structure="linear", conditional=True,
                              n_classes=5)
    cfg_pk = replace(cfg, packed=True)
    assert cfg_pk.packed_res(8)
    key = jax.random.PRNGKey(17)
    params = discriminator_init(key, cfg)
    depth = 6
    res = 2 ** (depth + 2)
    imgs = _rand(jax.random.fold_in(key, 1), (4, res, res, 3))
    labels = jnp.asarray([0, 2, 4, 1])
    ref = discriminator_apply(cfg, params, imgs, depth=depth, alpha=0.6,
                              labels=labels)
    out = discriminator_apply(cfg_pk, params, imgs, depth=depth, alpha=0.6,
                              labels=labels)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_packed_train_step_on_mesh():
    """The packed execution domain composes with shard_map data parallelism:
    a full fused train step with packed G and D runs on an 8-device mesh and
    matches the packed single-device step (replicated batch, shared rng)."""
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                     MappingConfig, SynthesisConfig,
                                     discriminator_init, generator_init)
    from stylegan_tpu.train import build_train_step, create_train_state

    res = 128
    gen_cfg = GeneratorConfig(
        resolution=res, latent_size=32, dlatent_size=32,
        mapping=MappingConfig(latent_size=32, dlatent_size=32,
                              mapping_fmaps=32, mapping_layers=2,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, dlatent_size=32,
                                  fmap_base=256, fmap_max=64,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=True))
    dis_cfg = DiscriminatorConfig(resolution=res, fmap_base=256, fmap_max=64,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=True)
    assert gen_cfg.synthesis.packed_block(4) and dis_cfg.packed_res(7)
    depth = dis_cfg.depth - 1

    g_tx, d_tx = optax.sgd(0.01), optax.sgd(0.01)
    state = create_train_state(generator_init(jax.random.PRNGKey(0), gen_cfg),
                               discriminator_init(jax.random.PRNGKey(1), dis_cfg),
                               g_tx, d_tx, use_ema=True)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    per = 4
    reals1 = np.random.RandomState(2).randn(per, res, res, 3).astype(np.float32)
    z1 = np.random.RandomState(3).randn(per, 32).astype(np.float32)
    key, alpha = jax.random.PRNGKey(4), jnp.float32(0.7)

    step1 = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=depth,
                             donate=False)
    stepN = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=depth,
                             mesh=mesh, donate=False, shard_rng=False)
    s1, m1 = step1(state, jnp.asarray(reals1), jnp.asarray(z1), key, alpha)
    sN, mN = stepN(state, jnp.asarray(np.tile(reals1, (8, 1, 1, 1))),
                   jnp.asarray(np.tile(z1, (8, 1))), key, alpha)
    np.testing.assert_allclose(float(m1["d_loss"]), float(mN["d_loss"]),
                               rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(sN.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_packed_cfg_knob_flows_from_yaml(tmp_path):
    """ops.packed: 'auto' follows bf16 activations; explicit bool wins."""
    from stylegan_tpu.config import get_default_cfg, resolve_packed
    from stylegan_tpu.models import (discriminator_config_from_cfg,
                                     generator_config_from_cfg)

    cfg = get_default_cfg()
    assert not resolve_packed(cfg)                       # f32 default: off
    cfg.precision.activations = "bfloat16"
    assert resolve_packed(cfg)                           # auto follows bf16
    assert generator_config_from_cfg(cfg).synthesis.packed
    assert discriminator_config_from_cfg(cfg).packed
    cfg.ops.packed = False
    assert not resolve_packed(cfg)                       # explicit off wins
    assert not generator_config_from_cfg(cfg).synthesis.packed
    cfg.precision.activations = "float32"
    cfg.ops.packed = True
    assert generator_config_from_cfg(cfg).synthesis.packed


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


@pytest.mark.parametrize("in_packed", [False, True])
@pytest.mark.parametrize("h", [4, 8, 12])
def test_conv_packed_up_blur_fold(in_packed, h):
    """Blur folded into the upscale conv (conv_packed_up_blur) must equal
    the two-pass form EXACTLY, including the 1-pixel border ring the
    composition alone would get wrong (ops/packed.py border corrections)."""
    key = jax.random.PRNGKey(21)
    x = _rand(key, (2, h, h, 6))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 6, 10)) * 0.3
    bk = make_blur_kernel((1, 2, 1))
    ref = blur2d(_fused_upscale_conv(x, w), bk)
    xin = pk.space_to_depth(x) if in_packed else x
    out = pk.conv_packed_up_blur(xin, w, bk, in_packed=in_packed)
    np.testing.assert_allclose(pk.depth_to_space(out), ref, **TOL)
    # sanity: without the correction the border ring differs (the test has
    # teeth — composition alone is NOT the two-pass math)
    raw = pk.depth_to_space(pk.conv_packed_up(xin, w, in_packed=in_packed,
                                              blur_k=bk))
    assert float(jnp.max(jnp.abs(raw - ref))) > 1e-3


def test_conv_packed_up_blur_grads_match():
    """The fold (composed kernel + border slice-updates) must backprop to
    the same input and WEIGHT gradients as the two-pass form."""
    key = jax.random.PRNGKey(22)
    x = _rand(key, (2, 8, 8, 4))
    w0 = _rand(jax.random.fold_in(key, 1), (3, 3, 4, 4)) * 0.3
    bk = make_blur_kernel((1, 2, 1))
    t = _rand(jax.random.fold_in(key, 2), (2, 16, 16, 4))

    def loss_ref(w, x):
        y = blur2d(_fused_upscale_conv(x, w), bk)
        return jnp.sum((y - t) ** 2)

    def loss_fold(w, x):
        y = pk.depth_to_space(pk.conv_packed_up_blur(
            pk.space_to_depth(x), w, bk, in_packed=True))
        return jnp.sum((y - t) ** 2)

    gw_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(w0, x)
    gw_pk, gx_pk = jax.grad(loss_fold, argnums=(0, 1))(w0, x)
    np.testing.assert_allclose(gw_pk, gw_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gx_pk, gx_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth,alpha", [(5, 1.0), (5, 0.35), (4, 0.5)])
def test_fold_blur_synthesis_matches_unpacked(depth, alpha):
    """End-to-end: packed synthesis WITH the blur fold == unpacked reference
    execution (same rng), through packed-in and unpacked-in upconvs and the
    fade-in blend."""
    from dataclasses import replace

    from stylegan_tpu.models import (SynthesisConfig, synthesis_apply,
                                     synthesis_init)

    cfg = SynthesisConfig(resolution=256, fmap_base=1024,
                          blur_filter=(1, 2, 1), structure="linear")
    cfg_fold = replace(cfg, packed=True, fold_blur=True)
    key = jax.random.PRNGKey(23)
    params = synthesis_init(key, cfg)
    dlat = _rand(jax.random.fold_in(key, 1), (2, cfg.num_layers, 512)) * 0.3
    rng = jax.random.fold_in(key, 2)
    ref = synthesis_apply(cfg, params, dlat, depth=depth, alpha=alpha,
                          rng=rng)
    out = synthesis_apply(cfg_fold, params, dlat, depth=depth, alpha=alpha,
                          rng=rng)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h", [8, 12, 16])
def test_conv_packed_down_blur_fold(h):
    """D-side fold: downconv(blur(x)) as one packed stride-2 conv + border
    fixes must equal the two-pass form exactly (the two-pass downconv
    zero-pads the blurred map; the composition sees its analytic
    extension)."""
    key = jax.random.PRNGKey(31)
    x = _rand(key, (2, h, h, 6))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 6, 10)) * 0.3
    bk = make_blur_kernel((1, 2, 1))
    ref = _fused_downscale_conv(blur2d(x, bk), w)
    xp = pk.space_to_depth(x)
    got = pk.conv_packed_down_blur(xp, w, bk)
    np.testing.assert_allclose(pk.depth_to_space(got), ref, **TOL)
    raw = pk.depth_to_space(pk.conv_packed_down(xp, w, blur_k=bk))
    assert float(jnp.max(jnp.abs(raw - ref))) > 1e-3  # the test has teeth


def test_conv_packed_down_blur_grads_match():
    key = jax.random.PRNGKey(32)
    x = _rand(key, (2, 16, 16, 4))
    w0 = _rand(jax.random.fold_in(key, 1), (3, 3, 4, 4)) * 0.3
    bk = make_blur_kernel((1, 2, 1))
    t = _rand(jax.random.fold_in(key, 2), (2, 8, 8, 4))

    def loss_ref(w, x):
        return jnp.sum((_fused_downscale_conv(blur2d(x, bk), w) - t) ** 2)

    def loss_fold(w, x):
        y = pk.depth_to_space(pk.conv_packed_down_blur(
            pk.space_to_depth(x), w, bk))
        return jnp.sum((y - t) ** 2)

    gw_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(w0, x)
    gw_pk, gx_pk = jax.grad(loss_fold, argnums=(0, 1))(w0, x)
    np.testing.assert_allclose(gw_pk, gw_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gx_pk, gx_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth,alpha", [(6, 1.0), (6, 0.4), (5, 0.4)])
def test_fold_blur_discriminator_matches_unpacked(depth, alpha):
    """End-to-end: packed D WITH the blur fold == unpacked reference
    execution, through both packed stages and the fade-in residual."""
    from dataclasses import replace

    from stylegan_tpu.models import (DiscriminatorConfig,
                                     discriminator_apply, discriminator_init)

    cfg = DiscriminatorConfig(resolution=256, fmap_base=1024, fmap_max=256,
                              blur_filter=(1, 2, 1), structure="linear")
    cfg_fold = replace(cfg, packed=True, fold_blur=True)
    key = jax.random.PRNGKey(33)
    params = discriminator_init(key, cfg)
    res = 2 ** (depth + 2)
    imgs = _rand(jax.random.fold_in(key, 1), (4, res, res, 3))
    ref = discriminator_apply(cfg, params, imgs, depth=depth, alpha=alpha)
    out = discriminator_apply(cfg_fold, params, imgs, depth=depth,
                              alpha=alpha)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h", [8, 16])
def test_fused_conv_blur_unpacked_ops(h):
    """The UNPACKED composed forms (fused_{up,down}scale_conv_blur) equal
    their two-pass references exactly, borders included."""
    key = jax.random.PRNGKey(41)
    bk = make_blur_kernel((1, 2, 1))
    x = _rand(key, (2, h, h, 5))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 5, 7)) * 0.3
    np.testing.assert_allclose(
        pk.fused_upscale_conv_blur(x, w, bk),
        blur2d(_fused_upscale_conv(x, w), bk), **TOL)
    x2 = _rand(jax.random.fold_in(key, 2), (2, 2 * h, 2 * h, 5))
    np.testing.assert_allclose(
        pk.fused_downscale_conv_blur(x2, w, bk),
        _fused_downscale_conv(blur2d(x2, bk), w), **TOL)


def test_fold_blur_unpacked_networks_match():
    """fold_blur="all" (the C>=64 unpacked fused stages) still equals the
    two-pass execution end-to-end in both networks.  ("all" is opt-in: the
    composed 6x6 kernel costs 2.25x the plain conv's MACs and measured a
    net loss on v5e — kept for exactness coverage and non-v5e hardware.)"""
    from dataclasses import replace

    from stylegan_tpu.models import (DiscriminatorConfig, SynthesisConfig,
                                     discriminator_apply, discriminator_init,
                                     synthesis_apply, synthesis_init)

    scfg = SynthesisConfig(resolution=256, fmap_base=1024,
                           blur_filter=(1, 2, 1), structure="linear")
    key = jax.random.PRNGKey(42)
    params = synthesis_init(key, scfg)
    dlat = _rand(jax.random.fold_in(key, 1), (2, scfg.num_layers, 512)) * 0.3
    rng = jax.random.fold_in(key, 2)
    ref = synthesis_apply(scfg, params, dlat, depth=5, alpha=0.6, rng=rng)
    out = synthesis_apply(replace(scfg, fold_blur="all"), params, dlat,
                          depth=5, alpha=0.6, rng=rng)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    dcfg = DiscriminatorConfig(resolution=256, fmap_base=1024, fmap_max=256,
                               blur_filter=(1, 2, 1), structure="linear")
    dparams = discriminator_init(jax.random.fold_in(key, 3), dcfg)
    imgs = _rand(jax.random.fold_in(key, 4), (4, 256, 256, 3))
    dref = discriminator_apply(dcfg, dparams, imgs, depth=6, alpha=1.0)
    dout = discriminator_apply(replace(dcfg, fold_blur="all"), dparams, imgs,
                               depth=6, alpha=1.0)
    np.testing.assert_allclose(dout, dref, rtol=1e-4, atol=1e-4)


def test_fold_blur_under_jit():
    """Regression: fold_blur must TRACE (round 4 chip study found the border
    corrections read blur taps through float(), which dies on tracers —
    make_blur_kernel is built inside the jitted apply, so a jnp construction
    there stages the kernel into the trace).  Every other fold test runs
    eagerly and cannot catch this; this one jits both networks, packed and
    unpacked fold paths, and pins values against the eager two-pass form."""
    from dataclasses import replace

    from stylegan_tpu.models import (DiscriminatorConfig, SynthesisConfig,
                                     discriminator_apply, discriminator_init,
                                     synthesis_apply, synthesis_init)

    key = jax.random.PRNGKey(43)
    for packed in (False, True):
        scfg = SynthesisConfig(resolution=128, fmap_base=1024,
                               blur_filter=(1, 2, 1), structure="linear",
                               packed=packed)
        params = synthesis_init(key, scfg)
        dlat = _rand(jax.random.fold_in(key, 1),
                     (2, scfg.num_layers, 512)) * 0.3
        rng = jax.random.fold_in(key, 2)
        ref = synthesis_apply(scfg, params, dlat, depth=5, alpha=0.6, rng=rng)
        cfg_fold = replace(scfg, fold_blur=True if packed else "all")
        out = jax.jit(lambda p, d: synthesis_apply(
            cfg_fold, p, d, depth=5, alpha=0.6, rng=rng))(params, dlat)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

        dcfg = DiscriminatorConfig(resolution=128, fmap_base=1024,
                                   fmap_max=256, blur_filter=(1, 2, 1),
                                   structure="linear", packed=packed)
        dparams = discriminator_init(jax.random.fold_in(key, 3), dcfg)
        imgs = _rand(jax.random.fold_in(key, 4), (4, 128, 128, 3))
        dref = discriminator_apply(dcfg, dparams, imgs, depth=5, alpha=1.0)
        dcfg_fold = replace(dcfg, fold_blur=True if packed else "all")
        dout = jax.jit(lambda p, x: discriminator_apply(
            dcfg_fold, p, x, depth=5, alpha=1.0))(dparams, imgs)
        np.testing.assert_allclose(dout, dref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("taps", [(1, 4, 6, 4, 1), (1, 1, 2, 4, 2, 1, 1)])
def test_fold_blur_non3tap_falls_back(taps):
    """Non-default ODD blur filters (the reference's blur_filter is user-
    configurable, CustomLayers.py:251-276) must NOT trace into the 3-tap
    border-correction assertion: every folded entry point falls back to the
    exact two-pass form (ADVICE r4: a wider filter under the perf path
    crashed at trace time)."""
    key = jax.random.PRNGKey(33)
    x = _rand(key, (2, 8, 8, 4))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 4, 4)) * 0.3
    bk = make_blur_kernel(taps)

    up_ref = blur2d(_fused_upscale_conv(x, w), bk)
    out = pk.conv_packed_up_blur(pk.space_to_depth(x), w, bk, in_packed=True)
    np.testing.assert_allclose(pk.depth_to_space(out), up_ref, **TOL)
    np.testing.assert_allclose(pk.fused_upscale_conv_blur(x, w, bk), up_ref,
                               **TOL)

    x16 = _rand(jax.random.fold_in(key, 2), (2, 16, 16, 4))
    down_ref = _fused_downscale_conv(blur2d(x16, bk), w)
    dout = pk.conv_packed_down_blur(pk.space_to_depth(x16), w, bk)
    np.testing.assert_allclose(pk.depth_to_space(dout), down_ref, **TOL)
    np.testing.assert_allclose(pk.fused_downscale_conv_blur(x16, w, bk),
                               down_ref, **TOL)


def test_fold_blur_even_tap_unpacked_falls_back_packed_rejects():
    """Even-tap filters shrink H by 1 (torch SAME conv semantics): the
    UNPACKED folded entry points still fall back to the exact two-pass
    form, while the packed blur rejects them with a clear error instead of
    a reshape crash (odd H cannot exist in the packed layout)."""
    key = jax.random.PRNGKey(34)
    x = _rand(key, (2, 8, 8, 4))
    w = _rand(jax.random.fold_in(key, 1), (3, 3, 4, 4)) * 0.3
    bk = make_blur_kernel((1, 3, 3, 1))
    np.testing.assert_allclose(pk.fused_upscale_conv_blur(x, w, bk),
                               blur2d(_fused_upscale_conv(x, w), bk), **TOL)
    x16 = _rand(jax.random.fold_in(key, 2), (2, 16, 16, 4))
    np.testing.assert_allclose(pk.fused_downscale_conv_blur(x16, w, bk),
                               _fused_downscale_conv(blur2d(x16, bk), w),
                               **TOL)
    with pytest.raises(ValueError, match="even tap count"):
        pk.blur_packed(pk.space_to_depth(x), bk)


def test_fold_blur_cfg_flows_without_packed():
    """ops.fold_blur: 'all' must reach the model configs even with packing
    OFF — its whole point is the UNPACKED C>=64 fused stages (ADVICE r4:
    it was silently dropped outside the resolve_packed branch)."""
    from stylegan_tpu.config import get_default_cfg, resolve_packed
    from stylegan_tpu.models import (discriminator_config_from_cfg,
                                     generator_config_from_cfg)

    cfg = get_default_cfg()
    cfg.ops.fold_blur = "all"
    assert not resolve_packed(cfg)                       # f32 default: off
    g = generator_config_from_cfg(cfg)
    d = discriminator_config_from_cfg(cfg)
    assert not g.synthesis.packed and not d.packed
    assert g.synthesis.fold_blur == "all"
    assert d.fold_blur == "all"
    # trainer path: fold_blur applies independently of packed_layout
    from stylegan_tpu.train import StyleGAN
    tr = StyleGAN(structure="linear", resolution=16, num_channels=3,
                  latent_size=32,
                  g_args={"latent_size": 32, "mapping_layers": 1,
                          "fmap_base": 64, "fmap_max": 32},
                  d_args={"fmap_base": 64, "fmap_max": 32},
                  g_opt_args={"learning_rate": 1e-3},
                  d_opt_args={"learning_rate": 1e-3},
                  use_ema=False, packed_layout=False, fold_blur="all")
    assert tr.gen_cfg.synthesis.fold_blur == "all"
    assert tr.dis_cfg.fold_blur == "all"
