"""Global matmul/conv precision policy.

JAX's default precision runs f32 convolutions through bf16 passes on TPU
(and mirrors that on CPU).  The reference trains in full f32, and the
converted-weights fidelity target (<=1e-2 pixel delta) wants exact f32, so the
framework defaults to Precision.HIGHEST.  Perf-oriented runs flip this to
``"default"`` (bf16 passes on the MXU) or run with bf16 activations outright.
"""

from jax import lax

_PRECISION = lax.Precision.HIGHEST


def set_precision(p):
    """p: lax.Precision, or one of 'default'|'high'|'highest'."""
    global _PRECISION
    if isinstance(p, str):
        p = {"default": lax.Precision.DEFAULT,
             "high": lax.Precision.HIGH,
             "highest": lax.Precision.HIGHEST}[p.lower()]
    _PRECISION = p


def get_precision():
    return _PRECISION
