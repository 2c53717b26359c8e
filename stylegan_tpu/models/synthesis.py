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
                   dlatent: Optional[jax.Array], noise: Optional[jax.Array]) -> jax.Array:
    """Post-conv chain (reference LayerEpilogue, CustomLayers.py:219-248)."""
    style = None
    if cfg.use_styles:
        style = linear_apply(params["style_mod"]["lin"], dlatent, gain=1.0,
                             use_wscale=cfg.use_wscale)

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


def _layer_noise(cfg, noises, rng, layer_idx, batch, res, dtype):
    if not cfg.use_noise:
        return None
    if noises is not None:
        return noises[layer_idx]
    assert rng is not None, "synthesis needs an rng key when use_noise=True"
    return _make_noise(rng, layer_idx, batch, res, dtype)


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
                          rng, noises) -> jax.Array:
    """block_idx: 0-based index into blocks (resolution 2^(block_idx+3))."""
    batch = x.shape[0]
    res = x.shape[1] * 2
    dtype = x.dtype
    blur = (make_blur_kernel(cfg.blur_filter) if cfg.blur_filter else None)
    layer0 = 2 * (block_idx + 1)

    x = conv2d_apply(params["conv0_up"], x, gain=_GAIN,
                     use_wscale=cfg.use_wscale, upscale=True, blur_kernel=blur)
    n0 = _layer_noise(cfg, noises, rng, layer0, batch, res, dtype)
    x = epilogue_apply(cfg, params["epi1"], x, dlatents[:, 0], n0)
    x = conv2d_apply(params["conv1"], x, gain=_GAIN, use_wscale=cfg.use_wscale)
    n1 = _layer_noise(cfg, noises, rng, layer0 + 1, batch, res, dtype)
    x = epilogue_apply(cfg, params["epi2"], x, dlatents[:, 1], n1)
    return x


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


def _to_rgb(cfg: SynthesisConfig, params: dict, idx: int, x: jax.Array) -> jax.Array:
    return conv2d_apply(params["to_rgb"][idx], x, gain=1.0,
                        use_wscale=cfg.use_wscale)


def synthesis_apply(cfg: SynthesisConfig, params: dict, dlatents: jax.Array,
                    depth: int = 0, alpha=0.0, rng=None,
                    noises: Optional[Sequence[jax.Array]] = None) -> jax.Array:
    """dlatents: (B, num_layers, D) -> images (B, H, W, C) in [-1, 1]-ish.

    `depth`/`structure` are static (each depth compiles separately); `alpha`
    is traced.  Mirrors reference GAN.py:175-208.
    """
    assert depth < cfg.depth, "Requested output depth cannot be produced"

    x = input_block_apply(cfg, params["init_block"], dlatents[:, 0:2], rng, noises)

    if cfg.structure == "fixed":
        for i in range(len(params["blocks"])):
            x = synthesis_block_apply(cfg, params["blocks"][i], x,
                                      dlatents[:, 2 * (i + 1):2 * (i + 2)],
                                      i, rng, noises)
        return _to_rgb(cfg, params, len(params["to_rgb"]) - 1, x)

    if cfg.structure != "linear":
        raise KeyError(f"Unknown structure: {cfg.structure}")

    if depth == 0:
        return _to_rgb(cfg, params, 0, x)

    for i in range(depth - 1):
        x = synthesis_block_apply(cfg, params["blocks"][i], x,
                                  dlatents[:, 2 * (i + 1):2 * (i + 2)],
                                  i, rng, noises)
    # reference computes to_rgb(upscale(x)) (GAN.py:199); a 1x1 conv commutes
    # bit-exactly with nearest upsampling, and conv-first avoids materializing
    # the C-channel map at 2x resolution (4x fewer conv FLOPs + ~C/3 less HBM)
    residual = upscale2d(_to_rgb(cfg, params, depth - 1, x))
    x = synthesis_block_apply(cfg, params["blocks"][depth - 1], x,
                              dlatents[:, 2 * depth:2 * (depth + 1)],
                              depth - 1, rng, noises)
    straight = _to_rgb(cfg, params, depth, x)
    # alpha arrives as an f32 scalar (precise fade schedule); cast the blend
    # back to the activation dtype so a bf16 pipeline stays bf16 downstream
    return (alpha * straight + (1.0 - alpha) * residual).astype(straight.dtype)
