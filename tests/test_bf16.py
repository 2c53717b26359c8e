"""bf16 numerics: bounded drift of the bf16 activation path vs f32.

The perf path runs bf16 activations with f32 params (train.py precision
knobs).  Normalization statistics (pixel_norm / instance_norm /
minibatch_stddev) must accumulate in f32 — a bf16 mean over up to 1M pixels
at 1024^2 loses most of its mantissa — so the drift of the *whole* generator
stays bounded by per-op rounding, not by accumulated reduction error.
(ops/primitives.py; VERDICT round-1 item 4.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_apply,
                                 generator_init)
from stylegan_tpu.ops import instance_norm, minibatch_stddev, pixel_norm


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b) / (np.abs(b) + 1e-3)


class TestOpStatsF32:
    """Op-level: f32 statistics make a bf16 op track the f32 op *on the same
    (bf16-quantized) input* to output-rounding precision — i.e. the reduction
    itself contributes no accumulated error."""

    def test_instance_norm_large_spatial(self):
        # large spatial extent + nonzero mean is exactly where a bf16 mean
        # accumulation would visibly bias the normalized output
        rs = np.random.RandomState(0)
        x = (rs.randn(1, 256, 256, 8) * 3 + 50).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        ref = instance_norm(xb.astype(jnp.float32))
        got = instance_norm(xb)
        assert got.dtype == jnp.bfloat16
        err = _rel_err(got.astype(jnp.float32), ref)
        assert np.mean(err) < 1e-2 and np.max(err) < 0.2, \
            (np.mean(err), np.max(err))

    def test_pixel_norm_bf16(self):
        rs = np.random.RandomState(1)
        x = (rs.randn(4, 16, 16, 512) + 5).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        ref = pixel_norm(xb.astype(jnp.float32))
        got = pixel_norm(xb)
        assert got.dtype == jnp.bfloat16
        assert np.mean(_rel_err(got.astype(jnp.float32), ref)) < 1e-2

    def test_minibatch_stddev_bf16(self):
        rs = np.random.RandomState(2)
        x = (rs.randn(8, 64, 64, 16) + 10).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        ref = np.asarray(minibatch_stddev(xb.astype(jnp.float32)))[..., -1]
        out = minibatch_stddev(xb)
        assert out.dtype == jnp.bfloat16
        got = np.asarray(out.astype(jnp.float32))[..., -1]
        # the appended stddev channel is a global statistic: it must match
        # the f32 one to bf16 output precision, not drift with H*W
        assert np.mean(_rel_err(got, ref)) < 1e-2


def _gen_cfg(res):
    return GeneratorConfig(
        resolution=res,
        mapping=MappingConfig(latent_size=512,
                              dlatent_broadcast=(int(np.log2(res)) - 1) * 2,
                              mapping_layers=4),
        synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear"))


def _drift(res, batch, depth):
    cfg = _gen_cfg(res)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (batch, 512), jnp.float32)
    key = jax.random.PRNGKey(2)
    out32 = generator_apply(cfg, params, z, depth=depth, alpha=1.0, rng=key,
                            train=False)
    out16 = generator_apply(cfg, params, z.astype(jnp.bfloat16), depth=depth,
                            alpha=1.0, rng=key, train=False)
    assert out16.images.dtype == jnp.bfloat16
    a = np.asarray(out16.images, np.float32)
    b = np.asarray(out32.images)
    return np.mean(np.abs(a - b)), np.max(np.abs(a - b)), b


class TestGeneratorDrift:
    def test_drift_128(self):
        mean_d, max_d, ref = _drift(128, batch=2, depth=5)
        span = ref.max() - ref.min()
        # images span roughly [-1, 1]: whole-network bf16 drift must stay at
        # the few-percent level, not blow up through 12 conv+epilogue layers
        assert mean_d < 0.02 * span, (mean_d, span)
        assert max_d < 0.25 * span, (max_d, span)

    @pytest.mark.slow
    def test_drift_1024(self):
        mean_d, max_d, ref = _drift(1024, batch=1, depth=8)
        span = ref.max() - ref.min()
        assert mean_d < 0.02 * span, (mean_d, span)
        assert max_d < 0.25 * span, (max_d, span)
