"""Discriminator (reference Discriminator, GAN.py:300-444 + Blocks.py:91-146).

Mirrored progressive architecture: per-stage from_rgb 1x1 convs, conv->blur->
downscale-conv blocks, and a final minibatch-stddev + conv + dense head.
`depth` is static (one compiled program per stage); `alpha` traced.

Layout note: the final head flattens the 4x4 feature map in *channel-major*
(NCHW) order so dense weights remain interchangeable with converted torch
checkpoints (reference View(-1), Blocks.py:127).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import (avg_pool2d, blur2d, conv2d_apply, conv2d_init, leaky_relu,
                   linear_apply, linear_init, make_blur_kernel,
                   minibatch_stddev)
from ..ops import packed as pk
from .configs import DiscriminatorConfig

_GAIN = math.sqrt(2)


def discriminator_block_init(key, cfg: DiscriminatorConfig, in_ch: int,
                             out_ch: int, dtype=jnp.float32) -> dict:
    k0, k1 = jax.random.split(key)
    return {
        "conv0": conv2d_init(k0, in_ch, in_ch, 3, gain=_GAIN,
                             use_wscale=cfg.use_wscale, dtype=dtype),
        "conv1_down": conv2d_init(k1, in_ch, out_ch, 3, gain=_GAIN,
                                  use_wscale=cfg.use_wscale, dtype=dtype),
    }


def discriminator_block_apply(cfg: DiscriminatorConfig, params: dict,
                              x: jax.Array,
                              res_log2: int = 0) -> jax.Array:
    """conv0 -> act -> blur -> conv1_down -> act (Blocks.py:137-146).

    With cfg.packed, the wide low-channel stages run space-to-depth packed
    (x then arrives packed from the from_rgb/previous block); the output is
    unpacked again once the next stage's channels no longer fit 128 lanes.
    """
    act = leaky_relu if cfg.nonlinearity == "lrelu" else jax.nn.relu
    blur_k = make_blur_kernel(cfg.blur_filter or (1, 2, 1))
    packed = res_log2 > 0 and cfg.packed_res(res_log2)
    if packed:
        emit_packed = cfg.packed_res(res_log2 - 1)
        x = conv2d_apply(params["conv0"], x, gain=_GAIN,
                         use_wscale=cfg.use_wscale,
                         in_packed=True, out_packed=True)
        x = act(x)
        if cfg.fold_blur:
            # blur folded into the stride-2 conv kernel (exact, border-
            # corrected; ops/packed.py:conv_packed_down_blur) — one full-res
            # pass fewer per packed D stage
            x = conv2d_apply(params["conv1_down"], x, gain=_GAIN,
                             use_wscale=cfg.use_wscale, downscale=True,
                             pre_blur_kernel=blur_k, fold_blur=True,
                             in_packed=True, out_packed=True)
            return act(x) if emit_packed else pk.depth_to_space(act(x))
        x = pk.blur_packed(x, blur_k)
        x = conv2d_apply(params["conv1_down"], x, gain=_GAIN,
                         use_wscale=cfg.use_wscale, downscale=True,
                         in_packed=True, out_packed=True)
        x = act(x)
        return x if emit_packed else pk.depth_to_space(x)
    x = conv2d_apply(params["conv0"], x, gain=_GAIN, use_wscale=cfg.use_wscale)
    x = act(x)
    # unlike the generator, the reference D *always* blurs: BlurLayer(None)
    # falls back to [1,2,1] (Blocks.py:143 + CustomLayers.py:254-255).
    # fold_blur="all" composes it into the fused stride-2 kernel where that
    # path is active (res >= 128; conv2d_apply falls back to two-pass both
    # below the threshold and for plain True — the unpacked composed kernel
    # costs 2.25x the MACs, a measured net loss on v5e).
    if cfg.fold_blur:
        x = conv2d_apply(params["conv1_down"], x, gain=_GAIN,
                         use_wscale=cfg.use_wscale, downscale=True,
                         pre_blur_kernel=blur_k, fold_blur=cfg.fold_blur)
        return act(x)
    x = blur2d(x, blur_k)
    x = conv2d_apply(params["conv1_down"], x, gain=_GAIN,
                     use_wscale=cfg.use_wscale, downscale=True)
    return act(x)


def _block_step(cfg: DiscriminatorConfig, params: dict, x: jax.Array,
                res_log2: int) -> jax.Array:
    """discriminator_block_apply, rematerialized when cfg.remat (the high-res
    blocks' activations dominate train-step memory; R1's grad-of-grad holds
    them twice without this)."""
    if not cfg.remat:
        return discriminator_block_apply(cfg, params, x, res_log2=res_log2)
    fn = lambda p, xx: discriminator_block_apply(cfg, p, xx, res_log2=res_log2)
    return jax.checkpoint(fn)(params, x)


def discriminator_top_init(key, cfg: DiscriminatorConfig,
                           dtype=jnp.float32) -> dict:
    """Final block (reference DiscriminatorTop, Blocks.py:91-134)."""
    kc, k0, k1 = jax.random.split(key, 3)
    in_ch = cfg.nf(2)
    return {
        "conv": conv2d_init(kc, in_ch + cfg.mbstd_num_features, in_ch, 3,
                            gain=_GAIN, use_wscale=cfg.use_wscale, dtype=dtype),
        "dense0": linear_init(k0, in_ch * 4 * 4, in_ch, gain=_GAIN,
                              use_wscale=cfg.use_wscale, dtype=dtype),
        "dense1": linear_init(k1, in_ch, 1, gain=1.0,
                              use_wscale=cfg.use_wscale, dtype=dtype),
    }


def discriminator_top_apply(cfg: DiscriminatorConfig, params: dict,
                            x: jax.Array, mbstd_axis: Optional[str] = None,
                            mbstd_chunks: int = 1) -> jax.Array:
    """mbstd_axis / mbstd_chunks pin the minibatch-stddev scope under
    parallelism (see ops.minibatch_stddev and train.steps mbstd_scope)."""
    act = leaky_relu if cfg.nonlinearity == "lrelu" else jax.nn.relu
    if cfg.mbstd_group_size > 1:
        x = minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_num_features,
                             axis_name=mbstd_axis, chunks=mbstd_chunks)
    x = conv2d_apply(params["conv"], x, gain=_GAIN, use_wscale=cfg.use_wscale)
    x = act(x)
    # channel-major flatten for torch-checkpoint weight compatibility
    b = x.shape[0]
    x = x.transpose(0, 3, 1, 2).reshape(b, -1)
    x = linear_apply(params["dense0"], x, gain=_GAIN, use_wscale=cfg.use_wscale)
    x = act(x)
    return linear_apply(params["dense1"], x, gain=1.0, use_wscale=cfg.use_wscale)


def discriminator_init(key, cfg: DiscriminatorConfig, dtype=jnp.float32) -> dict:
    rlog2 = cfg.resolution_log2
    n_blocks = rlog2 - 2
    keys = jax.random.split(key, 2 * n_blocks + 2 + (n_blocks + 1))
    blocks, from_rgb, embeddings = [], [], []
    ki = 0
    in_ch_img = cfg.input_channels
    for res in range(rlog2, 2, -1):
        blocks.append(discriminator_block_init(
            keys[ki], cfg, cfg.nf(res - 1), cfg.nf(res - 2), dtype)); ki += 1
        from_rgb.append(conv2d_init(
            keys[ki], in_ch_img, cfg.nf(res - 1), 1, gain=_GAIN,
            use_wscale=cfg.use_wscale, dtype=dtype)); ki += 1
        if cfg.conditional:
            r = 2 ** res
            embeddings.append({"weight": jax.random.normal(
                keys[2 * n_blocks + 2 + len(embeddings)],
                (cfg.n_classes, cfg.num_channels * r * r), dtype)})
    if cfg.conditional:
        embeddings.append({"weight": jax.random.normal(
            keys[2 * n_blocks + 2 + len(embeddings)],
            (cfg.n_classes, cfg.num_channels * 4 * 4), dtype)})

    params = {
        "blocks": blocks,
        "final_block": discriminator_top_init(keys[ki], cfg, dtype),
    }
    ki += 1
    from_rgb.append(conv2d_init(keys[ki], in_ch_img, cfg.nf(2), 1, gain=_GAIN,
                                use_wscale=cfg.use_wscale, dtype=dtype))
    params["from_rgb"] = from_rgb
    if cfg.conditional:
        params["embeddings"] = embeddings
    return params


def _concat_label_planes(params: dict, emb_idx: int, images: jax.Array,
                         labels: jax.Array) -> jax.Array:
    """Label embedding reshaped to image planes and channel-concatenated
    (reference GAN.py:402-437; torch view is NCHW/C-major)."""
    b, h, w, _ = images.shape
    emb = jnp.take(params["embeddings"][emb_idx]["weight"], labels, axis=0)
    emb = emb.reshape(b, -1, h, w).transpose(0, 2, 3, 1)
    return jnp.concatenate([images, emb.astype(images.dtype)], axis=-1)


def _from_rgb(cfg: DiscriminatorConfig, params: dict, idx: int,
              images: jax.Array, packed: bool) -> jax.Array:
    """1x1 from_rgb conv; with packed=True the image is space-to-depth'd and
    the conv runs (and returns) in the packed domain."""
    if packed:
        return conv2d_apply(params["from_rgb"][idx], pk.space_to_depth(images),
                            gain=_GAIN, use_wscale=cfg.use_wscale,
                            in_packed=True, out_packed=True)
    return conv2d_apply(params["from_rgb"][idx], images, gain=_GAIN,
                        use_wscale=cfg.use_wscale)


def discriminator_apply(cfg: DiscriminatorConfig, params: dict,
                        images: jax.Array, depth: int, alpha=1.0,
                        labels: Optional[jax.Array] = None,
                        mbstd_axis: Optional[str] = None,
                        mbstd_chunks: int = 1) -> jax.Array:
    """images: (B, H, W, C) at resolution 2^(depth+2) -> scores (B, 1)."""
    assert depth < cfg.depth, "Requested output depth cannot be produced"
    if cfg.conditional:
        assert labels is not None, "Conditional discriminator requires labels"
    rlog2 = cfg.resolution_log2

    if cfg.structure == "fixed":
        if cfg.conditional:
            images = _concat_label_planes(params, 0, images, labels)
        x = _from_rgb(cfg, params, 0, images, cfg.packed_res(rlog2))
        for bi, block in enumerate(params["blocks"]):
            x = _block_step(cfg, block, x, res_log2=rlog2 - bi)
        return discriminator_top_apply(cfg, params["final_block"], x,
                                       mbstd_axis, mbstd_chunks)

    if cfg.structure != "linear":
        raise KeyError(f"Unknown structure: {cfg.structure}")

    if depth > 0:
        in_log2 = depth + 2
        if cfg.conditional:
            images = _concat_label_planes(params, cfg.depth - depth - 1,
                                          images, labels)
        # the blend (and the block chain below it) lives at res/2, so the
        # residual from_rgb packs iff the next stage down runs packed
        residual = _from_rgb(cfg, params, cfg.depth - depth,
                             avg_pool2d(images, 2),
                             cfg.packed_res(in_log2 - 1))
        straight = _block_step(
            cfg, params["blocks"][cfg.depth - depth - 1],
            _from_rgb(cfg, params, cfg.depth - depth - 1, images,
                      cfg.packed_res(in_log2)),
            res_log2=in_log2)
        # blend in the activation dtype (alpha is a precise f32 scalar;
        # without the cast it would promote the whole D trunk under bf16)
        x = (alpha * straight + (1.0 - alpha) * residual).astype(straight.dtype)
        for i in range(cfg.depth - depth, len(params["blocks"])):
            x = _block_step(cfg, params["blocks"][i], x, res_log2=rlog2 - i)
    else:
        if cfg.conditional:
            images = _concat_label_planes(params, -1, images, labels)
        x = _from_rgb(cfg, params, -1, images, False)
    return discriminator_top_apply(cfg, params["final_block"], x,
                                   mbstd_axis, mbstd_chunks)
