"""Fused layer-epilogue dispatch.

The synthesis epilogue (noise-add -> leaky-relu -> instance-norm -> AdaIN) is
pure element-wise + per-channel-reduction work: at 1024x1024 x 16ch it moves
~100x more HBM bytes than FLOPs, so fusing the chain into one VMEM pass is the
single biggest kernel win in the model.  XLA already fuses most of it; the
Pallas kernel (ops/pallas/epilogue.py) removes the remaining intermediate
materializations and computes the instance-norm statistics in the same pass.

This module is the dispatch point: `fused_epilogue` uses the Pallas kernel on
TPU when enabled, otherwise the reference-exact lax composition.

Default: OFF.  Measured on the v5e used for bring-up, XLA's own fusion of the
chain runs at ~170 GB/s effective (12 ms for batch-8 1024^2 x 32ch bf16) while
the two-pass Pallas kernel pays an extra noise-broadcast pass (35 ms) — the
lane-broadcast DMA of (tile, 1) noise blocks is pathological in Mosaic
(~900 ms).  Enable with set_fused_epilogue(True) or STYLEGAN_TPU_PALLAS=1 to
re-evaluate on other TPU generations.
"""

from __future__ import annotations

import os

import jax

from .primitives import add_noise, instance_norm, leaky_relu, style_modulate

_USE_FUSED = None  # None = auto (TPU only)


def set_fused_epilogue(enabled):
    """enabled: True | False | None.

    None restores the default policy: OFF unless STYLEGAN_TPU_PALLAS=1 is set
    and the backend is TPU (see module docstring for the measurements behind
    the default)."""
    global _USE_FUSED
    _USE_FUSED = enabled


def use_fused_epilogue() -> bool:
    if _USE_FUSED is not None:
        return _USE_FUSED
    if os.environ.get("STYLEGAN_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("STYLEGAN_TPU_PALLAS"):
        try:
            return jax.default_backend() == "tpu"
        except RuntimeError:
            return False
    return False


def _reference_epilogue(x, noise_weight, noise, style):
    x = add_noise(x, noise_weight, noise)
    x = leaky_relu(x)
    x = instance_norm(x)
    return style_modulate(x, style)


def fused_epilogue(x: jax.Array, noise_weight: jax.Array, noise: jax.Array,
                   style: jax.Array) -> jax.Array:
    """noise-add -> lrelu(0.2) -> instance-norm(eps 1e-5) -> AdaIN.

    x: (B, H, W, C); noise: (B, H, W, 1); noise_weight: (C,); style: (B, 2C).
    """
    if use_fused_epilogue():
        try:
            from .pallas.epilogue import epilogue_supported, pallas_epilogue
            if epilogue_supported(x, noise):
                return pallas_epilogue(x, noise_weight, noise, style)
        except ImportError:
            pass
    return _reference_epilogue(x, noise_weight, noise, style)
