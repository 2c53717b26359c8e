"""Z -> W mapping network (reference GMapping, GAN.py:37-100).

A stack of equalized-LR dense layers with lrmul=0.01 and leaky-relu, with
optional PixelNorm on the input latents and broadcast of W over the synthesis
layers.  Pure MXU work: the whole network is `mapping_layers` back-to-back
(B, 512) x (512, 512) matmuls that XLA fuses with their bias+lrelu epilogues.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops import leaky_relu, linear_apply, linear_init, pixel_norm
from .configs import MappingConfig

_GAIN = math.sqrt(2)


def mapping_init(key, cfg: MappingConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.mapping_layers)
    dense = {}
    for i, (fin, fout) in enumerate(cfg.layer_dims()):
        dense[f"dense{i}"] = linear_init(
            keys[i], fin, fout, gain=_GAIN, use_wscale=cfg.use_wscale,
            lrmul=cfg.mapping_lrmul, dtype=dtype)
    return {"map": dense}


def mapping_apply(cfg: MappingConfig, params: dict, latents: jax.Array) -> jax.Array:
    """latents: (B, latent_size) -> W: (B, dlatent) or (B, broadcast, dlatent)."""
    x = latents
    if cfg.normalize_latents:
        x = pixel_norm(x)
    act = leaky_relu if cfg.mapping_nonlinearity == "lrelu" else jax.nn.relu
    for i in range(cfg.mapping_layers):
        x = linear_apply(params["map"][f"dense{i}"], x, gain=_GAIN,
                         use_wscale=cfg.use_wscale, lrmul=cfg.mapping_lrmul)
        x = act(x)
    if cfg.dlatent_broadcast is not None:
        x = jnp.broadcast_to(x[:, None, :],
                             (x.shape[0], cfg.dlatent_broadcast, x.shape[-1]))
    return x
