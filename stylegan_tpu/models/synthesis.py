"""Synthesis network (reference GSynthesis, GAN.py:103-208 + Blocks.py).

TPU-first structure: `depth` is a *static* argument, so each progressive stage
compiles to its own fixed-shape XLA program; `alpha` is a traced scalar that
blends the straight/residual to_rgb outputs.  Per-layer noise comes from an
explicit PRNG key (folded per layer) or from a pinned list of noise maps (the
reference's NoiseLayer.noise analysis hook, CustomLayers.py:195-198).

Layer epilogue (noise -> lrelu -> [pixelnorm] -> [instancenorm] -> AdaIN) is
bandwidth-bound elementwise work; it is centralized in `epilogue_apply` so the
Pallas-fused kernel can be swapped in on TPU (see stylegan_tpu/ops/pallas).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import (add_noise, conv2d_apply, conv2d_init, instance_norm,
                   leaky_relu, linear_apply, linear_init, make_blur_kernel,
                   pixel_norm, style_modulate, upscale2d)
from ..ops import fused as fused_ops
from ..ops import packed as pk
from .configs import SynthesisConfig

_GAIN = math.sqrt(2)


# --------------------------------------------------------------------------
# Layer epilogue
# --------------------------------------------------------------------------

def epilogue_init(key, cfg: SynthesisConfig, channels: int, dtype=jnp.float32) -> dict:
    p = {}
    k_style, = jax.random.split(key, 1)
    if cfg.use_noise:
        p["noise"] = {"weight": jnp.zeros((channels,), dtype)}
    if cfg.use_styles:
        p["style_mod"] = {"lin": linear_init(
            k_style, cfg.dlatent_size, channels * 2, gain=1.0,
            use_wscale=cfg.use_wscale, dtype=dtype)}
    return p


def epilogue_apply(cfg: SynthesisConfig, params: dict, x: jax.Array,
                   dlatent: Optional[jax.Array], noise: Optional[jax.Array],
                   packed: bool = False) -> jax.Array:
    """Post-conv chain (reference LayerEpilogue, CustomLayers.py:219-248).

    packed=True runs the same chain in the space-to-depth domain (x and noise
    arrive packed; per-channel quantities expand to the packed lanes)."""
    style = None
    if cfg.use_styles:
        style = linear_apply(params["style_mod"]["lin"], dlatent, gain=1.0,
                             use_wscale=cfg.use_wscale)

    if packed:
        if cfg.use_noise:
            x = pk.add_noise_packed(x, params["noise"]["weight"], noise)
        x = leaky_relu(x) if cfg.nonlinearity == "lrelu" else jax.nn.relu(x)
        if cfg.use_pixel_norm:
            x = pk.pixel_norm_packed(x)
        if cfg.use_instance_norm:
            x = pk.instance_norm_packed(x)
        if cfg.use_styles:
            x = pk.style_modulate_packed(x, style)
        return x

    if (fused_ops.use_fused_epilogue() and cfg.use_noise and not
            cfg.use_pixel_norm and cfg.use_instance_norm and cfg.use_styles
            and cfg.nonlinearity == "lrelu"):  # kernel hardcodes lrelu(0.2)
        return fused_ops.fused_epilogue(
            x, params["noise"]["weight"], noise, style)

    if cfg.use_noise:
        x = add_noise(x, params["noise"]["weight"], noise)
    x = leaky_relu(x) if cfg.nonlinearity == "lrelu" else jax.nn.relu(x)
    if cfg.use_pixel_norm:
        x = pixel_norm(x)
    if cfg.use_instance_norm:
        x = instance_norm(x)
    if cfg.use_styles:
        x = style_modulate(x, style)
    return x


def _make_noise(rng, layer_idx: int, batch: int, res: int, dtype) -> jax.Array:
    key = jax.random.fold_in(rng, layer_idx)
    return jax.random.normal(key, (batch, res, res, 1), dtype)


def _layer_noise(cfg, noises, rng, layer_idx, batch, res, dtype,
                 packed: bool = False):
    """Per-layer (B, res, res, 1) noise map, space-to-depth'd when the layer
    runs packed.  Draws are identical between packed/unpacked execution (the
    same full-res map is generated, then repacked), so the two domains
    produce the same samples from the same key."""
    if not cfg.use_noise:
        return None
    if noises is not None:
        n = noises[layer_idx]
    else:
        assert rng is not None, "synthesis needs an rng key when use_noise=True"
        n = _make_noise(rng, layer_idx, batch, res, dtype)
    return pk.space_to_depth(n) if packed else n


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------

def input_block_init(key, cfg: SynthesisConfig, dtype=jnp.float32) -> dict:
    """4x4 stage (reference InputBlock, Blocks.py:17-60)."""
    nf = cfg.nf(1)
    k_epi1, k_conv, k_epi2, k_dense = jax.random.split(key, 4)
    p = {}
    if cfg.const_input_layer:
        p["const"] = jnp.ones((1, 4, 4, nf), dtype)
        p["bias"] = jnp.ones((nf,), dtype)
    else:
        p["dense"] = linear_init(k_dense, cfg.dlatent_size, nf * 16,
                                 gain=_GAIN / 4, use_wscale=cfg.use_wscale,
                                 dtype=dtype)
    p["epi1"] = epilogue_init(k_epi1, cfg, nf, dtype)
    p["conv"] = conv2d_init(k_conv, nf, nf, 3, gain=_GAIN,
                            use_wscale=cfg.use_wscale, dtype=dtype)
    p["epi2"] = epilogue_init(k_epi2, cfg, nf, dtype)
    return p


def input_block_apply(cfg: SynthesisConfig, params: dict,
                      dlatents: jax.Array, rng, noises) -> jax.Array:
    batch = dlatents.shape[0]
    nf = cfg.nf(1)
    dtype = dlatents.dtype
    if cfg.const_input_layer:
        x = jnp.broadcast_to(params["const"].astype(dtype), (batch, 4, 4, nf))
        x = x + params["bias"].astype(dtype)
    else:
        x = linear_apply(params["dense"], dlatents[:, 0], gain=_GAIN / 4,
                         use_wscale=cfg.use_wscale)
        # reference reshapes NCHW (B, nf, 4, 4); transpose to NHWC so the
        # dense weight layout matches converted torch checkpoints
        x = x.reshape(batch, nf, 4, 4).transpose(0, 2, 3, 1)
    n0 = _layer_noise(cfg, noises, rng, 0, batch, 4, dtype)
    x = epilogue_apply(cfg, params["epi1"], x, dlatents[:, 0], n0)
    x = conv2d_apply(params["conv"], x, gain=_GAIN, use_wscale=cfg.use_wscale)
    n1 = _layer_noise(cfg, noises, rng, 1, batch, 4, dtype)
    x = epilogue_apply(cfg, params["epi2"], x, dlatents[:, 1], n1)
    return x


def synthesis_block_init(key, cfg: SynthesisConfig, in_ch: int, out_ch: int,
                         dtype=jnp.float32) -> dict:
    """One growth stage (reference GSynthesisBlock, Blocks.py:63-88)."""
    k0, ke1, k1, ke2 = jax.random.split(key, 4)
    return {
        "conv0_up": conv2d_init(k0, in_ch, out_ch, 3, gain=_GAIN,
                                use_wscale=cfg.use_wscale, dtype=dtype),
        "epi1": epilogue_init(ke1, cfg, out_ch, dtype),
        "conv1": conv2d_init(k1, out_ch, out_ch, 3, gain=_GAIN,
                             use_wscale=cfg.use_wscale, dtype=dtype),
        "epi2": epilogue_init(ke2, cfg, out_ch, dtype),
    }


def synthesis_block_apply(cfg: SynthesisConfig, params: dict, x: jax.Array,
                          dlatents: jax.Array, block_idx: int,
                          rng, noises, in_packed: bool = False) -> jax.Array:
    """block_idx: 0-based index into blocks (resolution 2^(block_idx+3)).

    When cfg.packed_block(block_idx), the whole stage executes in the
    space-to-depth domain and the OUTPUT is returned packed at (res/2)^2 x 4C
    (in_packed says whether x already arrives packed from the prior stage)."""
    batch = x.shape[0]
    res = 2 ** (block_idx + 3)
    dtype = x.dtype
    blur = (make_blur_kernel(cfg.blur_filter) if cfg.blur_filter else None)
    layer0 = 2 * (block_idx + 1)
    packed = cfg.packed_block(block_idx)
    if in_packed and not packed:
        x = pk.depth_to_space(x)
        in_packed = False

    x = conv2d_apply(params["conv0_up"], x, gain=_GAIN,
                     use_wscale=cfg.use_wscale, upscale=True, blur_kernel=blur,
                     in_packed=in_packed, out_packed=packed,
                     fold_blur=cfg.fold_blur)
    n0 = _layer_noise(cfg, noises, rng, layer0, batch, res, dtype, packed)
    x = epilogue_apply(cfg, params["epi1"], x, dlatents[:, 0], n0, packed)
    x = conv2d_apply(params["conv1"], x, gain=_GAIN, use_wscale=cfg.use_wscale,
                     in_packed=packed, out_packed=packed)
    n1 = _layer_noise(cfg, noises, rng, layer0 + 1, batch, res, dtype, packed)
    x = epilogue_apply(cfg, params["epi2"], x, dlatents[:, 1], n1, packed)
    return x


def _block_step(cfg: SynthesisConfig, params: dict, x: jax.Array,
                dlatents2: jax.Array, block_idx: int, rng, noises,
                in_packed: bool) -> jax.Array:
    """synthesis_block_apply, rematerialized when cfg.remat: the block's
    internals are recomputed in the backward pass instead of held in HBM
    (activations at >=512^2 dominate train-step memory)."""
    if not cfg.remat:
        return synthesis_block_apply(cfg, params, x, dlatents2, block_idx,
                                     rng, noises, in_packed=in_packed)

    def fn(p, xx, dl, r):
        return synthesis_block_apply(cfg, p, xx, dl, block_idx, r, noises,
                                     in_packed=in_packed)

    return jax.checkpoint(fn)(params, x, dlatents2, rng)


# --------------------------------------------------------------------------
# Full synthesis network
# --------------------------------------------------------------------------

def synthesis_init(key, cfg: SynthesisConfig, dtype=jnp.float32) -> dict:
    n_blocks = cfg.resolution_log2 - 2
    keys = jax.random.split(key, 2 + 2 * n_blocks)
    params = {"init_block": input_block_init(keys[0], cfg, dtype)}
    to_rgb = [conv2d_init(keys[1], cfg.nf(1), cfg.num_channels, 1, gain=1.0,
                          use_wscale=cfg.use_wscale, dtype=dtype)]
    blocks = []
    for i, res in enumerate(range(3, cfg.resolution_log2 + 1)):
        blocks.append(synthesis_block_init(
            keys[2 + 2 * i], cfg, cfg.nf(res - 2), cfg.nf(res - 1), dtype))
        to_rgb.append(conv2d_init(
            keys[3 + 2 * i], cfg.nf(res - 1), cfg.num_channels, 1, gain=1.0,
            use_wscale=cfg.use_wscale, dtype=dtype))
    params["blocks"] = blocks
    params["to_rgb"] = to_rgb
    return params


def _to_rgb(cfg: SynthesisConfig, params: dict, idx: int, x: jax.Array,
            packed: bool = False) -> jax.Array:
    return conv2d_apply(params["to_rgb"][idx], x, gain=1.0,
                        use_wscale=cfg.use_wscale,
                        in_packed=packed, out_packed=packed)


def synthesis_apply(cfg: SynthesisConfig, params: dict, dlatents: jax.Array,
                    depth: int = 0, alpha=0.0, rng=None,
                    noises: Optional[Sequence[jax.Array]] = None) -> jax.Array:
    """dlatents: (B, num_layers, D) -> images (B, H, W, C) in [-1, 1]-ish.

    `depth`/`structure` are static (each depth compiles separately); `alpha`
    is traced.  Mirrors reference GAN.py:175-208.  With cfg.packed, the
    low-channel stages run space-to-depth packed end-to-end (including the
    to_rgb convs and the fade-in blend); the single depth_to_space at the end
    restores the image layout.
    """
    assert depth < cfg.depth, "Requested output depth cannot be produced"

    x = input_block_apply(cfg, params["init_block"], dlatents[:, 0:2], rng, noises)

    if cfg.structure == "fixed":
        n_blocks = len(params["blocks"])
        for i in range(n_blocks):
            x = _block_step(cfg, params["blocks"][i], x,
                            dlatents[:, 2 * (i + 1):2 * (i + 2)],
                            i, rng, noises,
                            in_packed=(i > 0 and cfg.packed_block(i - 1)))
        packed = n_blocks > 0 and cfg.packed_block(n_blocks - 1)
        out = _to_rgb(cfg, params, len(params["to_rgb"]) - 1, x, packed)
        return pk.depth_to_space(out) if packed else out

    if cfg.structure != "linear":
        raise KeyError(f"Unknown structure: {cfg.structure}")

    if depth == 0:
        return _to_rgb(cfg, params, 0, x)

    # Static alpha == 1.0 (eval/serving, fade complete): the blend
    # 1.0*straight + 0.0*residual is the straight branch (up to 0.0*x
    # zero-sign roundoff), but XLA does NOT dead-code the multiplied-by-zero
    # residual path (verified on the optimized HLO: identical program at
    # constant alpha 1.0 vs 0.5) — so when alpha arrives as a *static*
    # Python scalar 1.0, skip the residual to_rgb + upscale + full-res
    # blend entirely.  Traced alphas (the trainer's fade schedule) are
    # untouched.  Per-layer noise is keyed by layer INDEX, so skipping the
    # branch draws identical samples.
    if not isinstance(alpha, jax.core.Tracer) and \
            not isinstance(alpha, jax.Array) and float(alpha) == 1.0:
        for i in range(depth):
            x = _block_step(cfg, params["blocks"][i], x,
                            dlatents[:, 2 * (i + 1):2 * (i + 2)],
                            i, rng, noises,
                            in_packed=(i > 0 and cfg.packed_block(i - 1)))
        out_packed = cfg.packed_block(depth - 1)
        out = _to_rgb(cfg, params, depth, x, out_packed)
        return pk.depth_to_space(out) if out_packed else out

    for i in range(depth - 1):
        x = _block_step(cfg, params["blocks"][i], x,
                        dlatents[:, 2 * (i + 1):2 * (i + 2)],
                        i, rng, noises,
                        in_packed=(i > 0 and cfg.packed_block(i - 1)))
    # reference computes to_rgb(upscale(x)) (GAN.py:199); a 1x1 conv commutes
    # bit-exactly with nearest upsampling, and conv-first avoids materializing
    # the C-channel map at 2x resolution (4x fewer conv FLOPs + ~C/3 less HBM)
    prev_packed = depth - 1 > 0 and cfg.packed_block(depth - 2)
    out_packed = cfg.packed_block(depth - 1)
    residual = _to_rgb(cfg, params, depth - 1, x, prev_packed)
    if prev_packed:
        residual = pk.depth_to_space(residual)
    # nearest 2x upsample of the (res/2) rgb; straight into the packed domain
    # when the final stage is packed (a pure channel-repeat)
    residual = (pk.upscale_rgb_packed(residual) if out_packed
                else upscale2d(residual))
    x = _block_step(cfg, params["blocks"][depth - 1], x,
                    dlatents[:, 2 * depth:2 * (depth + 1)],
                    depth - 1, rng, noises, in_packed=prev_packed)
    straight = _to_rgb(cfg, params, depth, x, out_packed)
    # alpha arrives as an f32 scalar (precise fade schedule); cast the blend
    # back to the activation dtype so a bf16 pipeline stays bf16 downstream
    out = (alpha * straight + (1.0 - alpha) * residual).astype(straight.dtype)
    return pk.depth_to_space(out) if out_packed else out
