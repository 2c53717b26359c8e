"""Equalized-learning-rate linear and convolution ops (init + apply).

Reproduces the reference's runtime weight-scaling semantics
(reference: models/CustomLayers.py:79-180): parameters are stored at unit-ish
scale and multiplied by a constant ``w_mul`` at apply time so that the
effective learning rate is equalized across layers.  The multiplier is folded
into the op at trace time (a constant for XLA — it fuses into the conv/matmul
epilogue for free).

Layout conventions (TPU-native):
  * linear weights: (in, out)  — feeds jnp.dot directly (MXU)
  * conv kernels:   (kh, kw, in, out) = HWIO, activations NHWC
(The reference stores torch (out, in) / OIHW; converters transpose.)

Fused resampling convolutions mirror the reference exactly, including its
``>= 128`` resolution threshold for switching to the fused form
(CustomLayers.py:142-165).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .precision import get_precision
from .primitives import DIMS, blur2d, downscale2d, upscale2d


def _accum_dtype(x: jax.Array):
    """preferred_element_type for matmuls/convs on `x`.

    f32 inputs keep explicit f32 output (a no-op request).  bf16 inputs get
    None (native bf16 output): the TPU MXU accumulates partial sums in f32
    internally either way, and requesting an f32 *output* from a bf16 conv
    breaks the conv transpose rule under AD (the cotangent arrives f32 while
    the saved activations are bf16 — lax.conv requires matching dtypes).
    """
    return jnp.float32 if x.dtype == jnp.float32 else None


def equalized_scales(gain: float, fan_in: int, lrmul: float,
                     use_wscale: bool) -> tuple[float, float]:
    """Return (init_std, w_mul) per the reference rule (CustomLayers.py:84-91)."""
    he_std = gain * fan_in ** (-0.5)
    if use_wscale:
        return 1.0 / lrmul, he_std * lrmul
    return he_std / lrmul, lrmul


# --------------------------------------------------------------------------
# Linear
# --------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, gain: float = math.sqrt(2),
                use_wscale: bool = False, lrmul: float = 1.0,
                bias: bool = True, dtype=jnp.float32) -> dict:
    init_std, _ = equalized_scales(gain, in_dim, lrmul, use_wscale)
    params = {"weight": jax.random.normal(key, (in_dim, out_dim), dtype) * init_std}
    if bias:
        params["bias"] = jnp.zeros((out_dim,), dtype)
    return params


def linear_apply(params: dict, x: jax.Array, gain: float = math.sqrt(2),
                 use_wscale: bool = False, lrmul: float = 1.0) -> jax.Array:
    in_dim = params["weight"].shape[0]
    _, w_mul = equalized_scales(gain, in_dim, lrmul, use_wscale)
    y = jnp.dot(x, params["weight"] * w_mul,
                precision=get_precision(),
                preferred_element_type=_accum_dtype(x)).astype(x.dtype)
    if "bias" in params:
        # cast the f32 bias down: an f32 bias would promote a bf16 pipeline
        y = y + (params["bias"] * lrmul).astype(y.dtype)
    return y


# --------------------------------------------------------------------------
# Convolution
# --------------------------------------------------------------------------

def conv2d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                gain: float = math.sqrt(2), use_wscale: bool = False,
                lrmul: float = 1.0, bias: bool = True,
                dtype=jnp.float32) -> dict:
    fan_in = in_ch * kernel_size ** 2
    init_std, _ = equalized_scales(gain, fan_in, lrmul, use_wscale)
    params = {"weight": jax.random.normal(
        key, (kernel_size, kernel_size, in_ch, out_ch), dtype) * init_std}
    if bias:
        params["bias"] = jnp.zeros((out_ch,), dtype)
    return params


def _conv_w_mul(params: dict, gain: float, use_wscale: bool, lrmul: float) -> float:
    kh, kw, in_ch, _ = params["weight"].shape
    _, w_mul = equalized_scales(gain, in_ch * kh * kw, lrmul, use_wscale)
    return w_mul


def _conv_same(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    pad = (w.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=DIMS,
        precision=get_precision(),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)


def conv2d_apply(params: dict, x: jax.Array, gain: float = math.sqrt(2),
                 use_wscale: bool = False, lrmul: float = 1.0,
                 upscale: bool = False, downscale: bool = False,
                 blur_kernel: Optional[jax.Array] = None,
                 pre_blur_kernel: Optional[jax.Array] = None,
                 fused_resample_threshold: int = 128,
                 in_packed: bool = False, out_packed: bool = False,
                 fold_blur=False) -> jax.Array:
    """Equalized conv with the reference's optional fused up/down resampling.

    Dispatch mirrors CustomLayers.py:137-180:
      * upscale & output res >= threshold  -> fused transposed conv with the
        4-tap summed kernel; else nearest-upsample then conv.
      * downscale & input res >= threshold -> fused stride-2 conv with the
        4-tap averaged kernel; else conv then 2x2 avgpool.
      * blur_kernel (G path) is applied between conv and bias add; the D's
        non-fused downscale likewise sits between conv and bias add.

    in_packed/out_packed select the space-to-depth packed execution domain
    (ops/packed.py) for the wide low-channel stages — same math, 2-3x faster
    on the MXU.  Packed resampling requires the fused path (res >= threshold,
    guaranteed by the callers' packing rule).
    """
    w = params["weight"] * _conv_w_mul(params, gain, use_wscale, lrmul)
    bias = params.get("bias")
    if bias is not None:
        # cast down so an f32 bias can't promote a bf16 activation pipeline
        bias = (bias * lrmul).astype(x.dtype)

    if in_packed or out_packed:
        return _conv2d_apply_packed(x, w, bias, upscale, downscale,
                                    blur_kernel, pre_blur_kernel,
                                    in_packed, out_packed, fold_blur)

    h, wdt = x.shape[1], x.shape[2]
    intermediate = None
    if blur_kernel is not None:
        intermediate = lambda t: blur2d(t, blur_kernel)

    have_convolution = False
    if upscale and min(h, wdt) * 2 >= fused_resample_threshold:
        if blur_kernel is not None and fold_blur == "all":
            # G path's post-conv blur composed into the transposed kernel
            # (exact, border-corrected; ops/packed.py).  "all"-only: on the
            # UNPACKED fused stages the composed kernel is 6x6 vs 4x4 —
            # 2.25x the MACs of the dominant C>=64 convs — and measured a
            # net loss on the v5e (docs/DESIGN.md round 4); packed stages
            # fold at unchanged kernel footprint, so plain True folds those.
            from .packed import fused_upscale_conv_blur
            x = fused_upscale_conv_blur(x, w, blur_kernel)
            intermediate = None
        else:
            x = _fused_upscale_conv(x, w)
        have_convolution = True
    elif upscale:
        x = upscale2d(x)

    if downscale and min(x.shape[1], x.shape[2]) >= fused_resample_threshold:
        if pre_blur_kernel is not None and fold_blur == "all":
            # D path's pre-conv blur composed into the stride-2 kernel
            from .packed import fused_downscale_conv_blur
            x = fused_downscale_conv_blur(x, w, pre_blur_kernel)
        else:
            if pre_blur_kernel is not None:
                x = blur2d(x, pre_blur_kernel)
            x = _fused_downscale_conv(x, w)
        have_convolution = True
    elif downscale:
        if pre_blur_kernel is not None:
            x = blur2d(x, pre_blur_kernel)
        assert intermediate is None
        intermediate = lambda t: downscale2d(t)

    if not have_convolution and intermediate is None:
        y = _conv_same(x, w)
        if bias is not None:
            y = y + bias
        return y
    if not have_convolution:
        x = _conv_same(x, w)

    if intermediate is not None:
        x = intermediate(x)
    if bias is not None:
        x = x + bias
    return x


def _conv2d_apply_packed(x, w, bias, upscale, downscale, blur_kernel,
                         pre_blur_kernel, in_packed, out_packed,
                         fold_blur=False):
    """Packed-domain dispatch: mirrors the fused-path semantics exactly
    (conv -> [blur] -> bias), with activations space-to-depth packed.

    fold_blur composes the G path's post-conv blur (blur_kernel) or the D
    path's pre-conv blur (pre_blur_kernel) into the resampling conv kernel
    with exact border correction (packed.conv_packed_{up,down}_blur) — same
    math, one full-res pass fewer."""
    from . import packed as pk

    if upscale:
        assert out_packed
        if blur_kernel is not None and fold_blur:
            y = pk.conv_packed_up_blur(x, w, blur_kernel,
                                       in_packed=in_packed)
        else:
            y = pk.conv_packed_up(x, w, in_packed=in_packed)
            if blur_kernel is not None:
                y = pk.blur_packed(y, blur_kernel)
    elif downscale:
        assert in_packed and out_packed
        if pre_blur_kernel is not None and fold_blur:
            y = pk.conv_packed_down_blur(x, w, pre_blur_kernel)
        else:
            if pre_blur_kernel is not None:
                x = pk.blur_packed(x, pre_blur_kernel)
            y = pk.conv_packed_down(x, w)
    else:
        assert in_packed and out_packed and blur_kernel is None
        y = pk.conv_packed_same(x, w)
    if bias is not None:
        y = y + pk.repeat_channel(bias)
    return y


def _fused_upscale_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Transposed conv, stride 2, with the 4-tap-summed 4x4 kernel.

    Equivalent to the reference's F.conv_transpose2d on the padded+shift-summed
    kernel (CustomLayers.py:146-151), expressed as an input-dilated conv
    (conv_transpose(stride=2, pad=1) == lhs-dilated conv with the spatially
    flipped kernel and padding kh-1-p = 2 per side).  A subpixel (4-phase 2x2
    conv + interleave) decomposition was also benchmarked and is ~2x slower on
    TPU than this form — the phase stack/reshape costs extra HBM passes.
    w is HWIO (3, 3, I, O).
    """
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    w4 = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1])  # (4,4,I,O)
    w4 = w4[::-1, ::-1]
    return lax.conv_general_dilated(
        x, w4.astype(x.dtype), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=DIMS,
        precision=get_precision(),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)


def _fused_downscale_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-2 conv with the 4-tap-averaged 4x4 kernel
    (reference CustomLayers.py:158-163)."""
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    w4 = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) * 0.25
    return lax.conv_general_dilated(
        x, w4.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=DIMS,
        precision=get_precision(),
        preferred_element_type=_accum_dtype(x),
    ).astype(x.dtype)
