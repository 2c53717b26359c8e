"""Pallas TPU kernel: fused synthesis-layer epilogue.

Computes, in two streaming passes over HBM (vs ~4 for the unfused op chain):

    y   = leaky_relu(x + noise_weight[c] * noise, 0.2)
    out = (y - mean_hw(y)) * rsqrt(var_hw(y) + 1e-5) * (s0 + 1) + s1

i.e. NoiseLayer -> lrelu -> InstanceNorm2d -> StyleMod (reference
CustomLayers.py:183-248) for NHWC activations.  Pass 1 tiles the flattened
spatial dim, computing per-(batch, channel) sums/squares with cross-grid-step
accumulation in VMEM; pass 2 re-streams x and applies the normalization and
AdaIN affine in registers.  The backward pass (custom VJP) re-derives
gradients through the equivalent lax composition, so the op is usable inside
the jitted G train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per spatial tile (flattened H*W); C rides the lane dim.
_TILE_ROWS = 4096


def _noisy_lrelu_f32(x_ref, noise_ref, nw_ref):
    # bf16 VPU arithmetic trips the Mosaic compiler here; cast to f32 right
    # after the (bf16) DMA — compute is f32 on the VPU, traffic stays bf16.
    y = (x_ref[0].astype(jnp.float32)
         + nw_ref[0, 0][None, :] * noise_ref[0].astype(jnp.float32))
    return jnp.where(y >= 0, y, 0.2 * y)


def _stats_kernel(x_ref, noise_ref, nw_ref, sum_ref, sq_ref):
    t = pl.program_id(1)
    y = _noisy_lrelu_f32(x_ref, noise_ref, nw_ref)

    @pl.when(t == 0)
    def _():
        sum_ref[0, 0] = jnp.zeros_like(sum_ref[0, 0])
        sq_ref[0, 0] = jnp.zeros_like(sq_ref[0, 0])

    sum_ref[0, 0] += jnp.sum(y, axis=0)
    sq_ref[0, 0] += jnp.sum(y * y, axis=0)


def _apply_kernel(x_ref, noise_ref, nw_ref, mean_ref, rstd_ref, s0_ref,
                  s1_ref, out_ref):
    y = _noisy_lrelu_f32(x_ref, noise_ref, nw_ref)
    y = (y - mean_ref[0, 0][None, :]) * rstd_ref[0, 0][None, :]
    y = y * (s0_ref[0, 0][None, :] + 1.0) + s1_ref[0, 0][None, :]
    out_ref[0] = y.astype(out_ref.dtype)


def _pallas_epilogue_fwd_impl(x, noise_weight, noise, style):
    b, h, w, c = x.shape
    r = h * w
    xf = x.reshape(b, r, c)
    nf = jnp.broadcast_to(noise.reshape(b, r, 1), (b, r, c)).astype(x.dtype) \
        if noise.shape[-1] == 1 else noise.reshape(b, r, c)
    # NB: we broadcast the (B,R,1) noise to (B,R,C) lanes on the host side of
    # the kernel; XLA fuses the broadcast into the DMA-feeding copy.  For
    # C<=128 this keeps the kernel's tile shapes lane-aligned and simple.
    nw = noise_weight.astype(jnp.float32)

    tile = min(_TILE_ROWS, r)
    assert r % tile == 0, f"spatial size {r} not divisible by tile {tile}"
    n_tiles = r // tile
    grid = (b, n_tiles)

    sums, sqs = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
    )(xf, nf, nw[None, None])

    mean = sums / r                      # (b, 1, c)
    var = sqs / r - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + 1e-5)

    s = style.astype(jnp.float32).reshape(b, 2, c)
    out = pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, c), x.dtype),
    )(xf, nf, nw[None, None], mean, rstd, s[:, 0:1], s[:, 1:2])
    return out.reshape(b, h, w, c)


def _reference_epilogue(x, noise_weight, noise, style):
    # single shared definition — the custom-VJP backward below must
    # differentiate exactly the math the dispatcher falls back to
    from ..fused import _reference_epilogue as ref
    return ref(x, noise_weight, noise, style)


@jax.custom_vjp
def pallas_epilogue(x, noise_weight, noise, style):
    return _pallas_epilogue_fwd_impl(x, noise_weight, noise, style)


def _fwd(x, noise_weight, noise, style):
    return pallas_epilogue(x, noise_weight, noise, style), \
        (x, noise_weight, noise, style)


def _bwd(res, g):
    x, noise_weight, noise, style = res
    _, vjp = jax.vjp(_reference_epilogue, x, noise_weight, noise, style)
    return vjp(g)


pallas_epilogue.defvjp(_fwd, _bwd)


def epilogue_supported(x, noise) -> bool:
    """Pallas path constraints: flattened spatial divisible into tiles and
    per-pixel (broadcastable) noise."""
    b, h, w, c = x.shape
    r = h * w
    return (r % min(_TILE_ROWS, r) == 0 and c <= 512
            and noise.shape == (b, h, w, 1))
