"""Core StyleGAN ops as pure JAX functions (NHWC, TPU-native).

Every op reproduces the exact math of the reference implementation
(reference: models/CustomLayers.py) but is written for XLA/TPU:

* NHWC layout — channels ride the 128-wide lane dimension so 1x1/3x3 convs
  tile directly onto the MXU, and element-wise epilogues vectorize on the VPU.
* No Python control flow on traced values — resolution/depth decisions are
  static, alpha and psi are traced scalars.
* All ops are differentiable (including twice, for the R1 penalty which
  takes grad-of-grad through the discriminator).

Numerical contracts (checked in tests/test_ops.py against the reference's
torch modules running on CPU):
  pixel_norm         reference CustomLayers.py:17-23
  upscale2d          reference CustomLayers.py:26-45
  downscale2d        reference CustomLayers.py:48-76
  blur2d             reference CustomLayers.py:251-276
  leaky_relu(0.2)    reference GAN.py:67-68
  instance_norm      torch.nn.InstanceNorm2d(affine=False, eps=1e-5)
  minibatch_stddev   reference CustomLayers.py:288-305
  truncation         reference CustomLayers.py:308-323
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .precision import get_precision

# Dimension numbers for NHWC activations with HWIO kernels.
DIMS = ("NHWC", "HWIO", "NHWC")


def pixel_norm(x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """x * rsqrt(mean(x^2, channel) + eps).

    Channel axis is the last axis (works for (B, C) latents and (B, H, W, C)
    feature maps alike; the reference normalizes dim=1 of NCHW which is the
    same channel axis).
    """
    # statistics accumulate in f32: a bf16 mean over many channels loses
    # mantissa bits, and the result multiplies back into x anyway (the rsqrt
    # factor re-casts to x.dtype, so bf16 pipelines stay bf16 downstream)
    xf = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return x * lax.rsqrt(ms + epsilon).astype(x.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * negative_slope)


def upscale2d(x: jax.Array, factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Nearest-neighbour 2x upsample of NHWC, optional gain."""
    assert x.ndim == 4
    if gain != 1.0:
        x = x * gain
    if factor == 1:
        return x
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def avg_pool2d(x: jax.Array, factor: int) -> jax.Array:
    """Average pool with window == stride == factor (NHWC)."""
    out = lax.reduce_window(x, 0.0, lax.add,
                            (1, factor, factor, 1), (1, factor, factor, 1),
                            "VALID")
    return out / (factor * factor)


def downscale2d(x: jax.Array, factor: int = 2, gain: float = 1.0) -> jax.Array:
    """Factor-2 path uses the [sqrt(g)/2, sqrt(g)/2] blur-with-stride which for
    gain=1 is exactly 2x2 average pooling; other factors use avg_pool * gain."""
    assert x.ndim == 4
    if factor == 1:
        return x if gain == 1.0 else x * gain
    if factor == 2:
        # blur kernel [sqrt(gain)/2]x2 outer product, stride 2 == gain * avgpool2
        return avg_pool2d(x, 2) * gain
    out = avg_pool2d(x, factor)
    return out if gain == 1.0 else out * gain


def make_blur_kernel(taps, normalize: bool = True) -> np.ndarray:
    """Outer-product separable blur kernel, shape (k, k).

    Returns a CONCRETE numpy array: blur taps are static configuration, and
    model code builds the kernel inside jitted apply functions — a jnp
    construction there would be staged into the trace, turning the kernel
    into a tracer and breaking the fold-blur border corrections, which read
    individual taps as Python scalars (ops/packed.py)."""
    k = np.asarray(taps, dtype=np.float32)
    k = k[:, None] * k[None, :]
    if normalize:
        k = k / np.sum(k)
    return k


def blur2d(x: jax.Array, kernel2d: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise blur of NHWC with a (k, k) kernel, SAME padding.

    Maps to a grouped conv (feature_group_count = C) which XLA lowers to a
    cheap VPU shift-and-add on TPU.
    """
    c = x.shape[-1]
    k = kernel2d.shape[0]
    kern = jnp.broadcast_to(kernel2d.astype(x.dtype)[:, :, None, None],
                            (k, k, 1, c))
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        x, kern,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=DIMS,
        feature_group_count=c,
        precision=get_precision(),
    )


def instance_norm(x: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Per-sample per-channel spatial normalization, no affine
    (torch.nn.InstanceNorm2d default semantics, biased variance).

    Statistics accumulate in f32 regardless of x.dtype: at 1024^2 the spatial
    mean/var reduce over 1M pixels, where bf16 accumulation drifts badly; the
    normalized output is cast back so bf16 pipelines stay bf16 (the O(B*C)
    f32 statistics are free next to the O(B*H*W*C) elementwise work).
    """
    xf = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + epsilon)).astype(x.dtype)


def _stddev_feature(y: jax.Array, group_size: int, f: int) -> jax.Array:
    """The (B, H, W, f) stddev feature map for one batch (f32 in/out).

    Reference grouping (CustomLayers.py:294-305): reshape (g, B//g, ...) —
    group s's members are strided by B//g across the batch."""
    b, h, w, c = y.shape
    g = min(group_size, b)
    assert b % g == 0, f"batch {b} not divisible by stddev group {g}"
    y = y.reshape(g, b // g, h, w, f, c // f)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)              # (b//g, H, W, f, c//f)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))                  # (b//g, f)
    y = jnp.broadcast_to(y[None, :, None, None, :], (g, b // g, h, w, f))
    return y.reshape(b, h, w, f)


def minibatch_stddev(x: jax.Array, group_size: int = 4,
                     num_new_features: int = 1, *,
                     axis_name: str | None = None,
                     chunks: int = 1) -> jax.Array:
    """Append per-group stddev statistics as extra channels (NHWC).

    Exactly the reference formula (CustomLayers.py:294-305): split the batch
    into groups of min(group_size, B), per-group biased stddev per (feature,
    pixel), eps 1e-8 inside the sqrt, mean over (channels within feature, H,
    W), broadcast back, concat one channel per new feature.

    Scope control under parallelism (both default off — plain shard-local /
    whole-visible-batch semantics):

    * axis_name — inside `shard_map`, compute the statistic over the GLOBAL
      batch: all_gather x over the named axis (x here is the 4x4 D-head
      input — a few KB per sample — so the collective is trivial), apply the
      exact single-device grouping, keep the local rows.  Matches what a
      single device computes on the full batch.
    * chunks — restrict grouping to `chunks` equal contiguous batch chunks.
      Inside a GSPMD program (where the batch axis is globally visible) this
      expresses shard-LOCAL grouping: with chunks = n_data_shards the groups
      align with the contiguous `P('data')` shards, XLA keeps the reduction
      local, and the math equals the shard_map path's per-device statistic.
    """
    assert not (axis_name is not None and chunks > 1), \
        "axis_name (global scope) and chunks (local scope) are exclusive"
    b, h, w, c = x.shape
    f = num_new_features
    # statistics in f32 (the final spatial mean reduces over H*W*c elements —
    # ~1M at 1024^2 — where bf16 accumulation drifts); cast back at the end
    y = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    if axis_name is not None:
        full = jax.lax.all_gather(y, axis_name, axis=0, tiled=True)
        feat = _stddev_feature(full, group_size, f)
        start = jax.lax.axis_index(axis_name) * b
        feat = jax.lax.dynamic_slice_in_dim(feat, start, b, axis=0)
    elif chunks > 1:
        assert b % chunks == 0, f"batch {b} not divisible into {chunks} chunks"
        yc = y.reshape(chunks, b // chunks, h, w, c)
        feat = jax.vmap(lambda t: _stddev_feature(t, group_size, f))(yc)
        feat = feat.reshape(b, h, w, f)
    else:
        feat = _stddev_feature(y, group_size, f)
    return jnp.concatenate([x, feat.astype(x.dtype)], axis=-1)


def truncate_dlatents(dlatents: jax.Array, avg_latent: jax.Array,
                      psi, cutoff: int) -> jax.Array:
    """Truncation trick: lerp(avg, w, psi) on layers < cutoff.

    dlatents: (B, num_layers, D); avg_latent: (D,). psi may be a traced scalar.
    Reference: CustomLayers.py:319-323.
    """
    num_layers = dlatents.shape[1]
    # lerp in f32 (avg_latent is an f32 buffer, psi a precise f32 scalar),
    # cast back so a bf16 W pipeline stays bf16
    interp = (avg_latent + (dlatents - avg_latent) * psi).astype(dlatents.dtype)
    layer_idx = jnp.arange(num_layers)[None, :, None]
    return jnp.where(layer_idx < cutoff, interp, dlatents)


def update_moving_average(avg: jax.Array, new: jax.Array, beta: float) -> jax.Array:
    """avg <- beta * avg + (1 - beta) * new (reference CustomLayers.py:316-317)."""
    return beta * avg + (1.0 - beta) * new


def style_modulate(x: jax.Array, style: jax.Array) -> jax.Array:
    """AdaIN affine modulation: x * (scale + 1) + bias.

    x: (B, H, W, C); style: (B, 2*C) laid out as [scales, biases] per the
    reference's view(-1, 2, C) of the style projection (CustomLayers.py:210-216).
    """
    c = x.shape[-1]
    s = style.reshape(style.shape[0], 2, c)
    scale = s[:, 0][:, None, None, :]
    bias = s[:, 1][:, None, None, :]
    return x * (scale + 1.0) + bias


def add_noise(x: jax.Array, noise_weight: jax.Array, noise: jax.Array) -> jax.Array:
    """x + weight[c] * noise, noise shaped (B, H, W, 1) (CustomLayers.py:191-200)."""
    return x + noise_weight.astype(x.dtype)[None, None, None, :] * noise.astype(x.dtype)
