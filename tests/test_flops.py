"""Analytic FLOP accounting (utils/flops.py): pinned values + an XLA
cost-analysis cross-check of the generator forward count."""

import jax
import jax.numpy as jnp
import pytest

from stylegan_tpu.utils.flops import (
    device_peak_tflops, discriminator_forward_flops, generator_forward_flops,
    lazy_r1_amortized_flops, mfu_fields, train_step_flops)


class TestPinnedValues:
    def test_generator_1024(self):
        # the FFHQ-1024 generator forward under the implementation-shape
        # convention (fused resampling at res >= 128)
        assert generator_forward_flops(1024) == pytest.approx(64.47e9,
                                                              rel=0.01)

    def test_discriminator_1024(self):
        assert discriminator_forward_flops(1024) == pytest.approx(64.47e9,
                                                                  rel=0.01)

    def test_monotone_in_resolution(self):
        vals = [generator_forward_flops(r) for r in (32, 64, 128, 256, 512)]
        assert all(a < b for a, b in zip(vals, vals[1:]))

    def test_train_step_multipliers(self):
        fg = generator_forward_flops(128)
        fd = discriminator_forward_flops(128)
        assert train_step_flops(128, loss="logistic",
                                with_r1=False) == 3 * fg + 9 * fd
        assert train_step_flops(128, loss="logistic",
                                with_r1=True) == 3 * fg + 15 * fd
        assert train_step_flops(
            128, loss="relativistic-hinge") == 3 * fg + 10 * fd

    def test_lazy_amortized_between_endpoints(self):
        plain = train_step_flops(1024, with_r1=False)
        r1 = train_step_flops(1024, with_r1=True)
        am = lazy_r1_amortized_flops(1024, 16)
        assert plain < am < r1
        assert am == pytest.approx((r1 + 15 * plain) / 16)


class TestMfuFields:
    def test_fields(self):
        out = mfu_fields(100.0, 50e9, 197.0)
        assert out["gflops_per_img"] == 50.0
        assert out["tflops_per_sec"] == 5.0
        assert out["mfu"] == pytest.approx(5.0 / 197.0, abs=1e-4)

    def test_unknown_peak_omits_mfu(self):
        out = mfu_fields(100.0, 50e9, None)
        assert "mfu" not in out

    def test_device_peak_parsing(self):
        class Fake:
            def __init__(self, kind):
                self.device_kind = kind
        assert device_peak_tflops(Fake("TPU v5 lite")) == 197.0
        assert device_peak_tflops(Fake("TPU v5p")) == 459.0
        assert device_peak_tflops(Fake("TPU v4")) == 275.0
        assert device_peak_tflops(Fake("weird accelerator")) is None


class TestXlaCrossCheck:
    def test_generator_forward_matches_xla_cost_analysis(self):
        """XLA's own FLOP count for the unpacked f32 generator forward at
        64^2 (all stages below the fuse threshold) should bracket the
        analytic count: >= the conv-dominated analytic number (XLA also
        counts elementwise work) but within ~40% of it."""
        from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                         SynthesisConfig, generator_apply,
                                         generator_init)
        res = 64
        cfg = GeneratorConfig(
            resolution=res,
            mapping=MappingConfig(mapping_layers=8,
                                  dlatent_broadcast=(res.bit_length() - 2) * 2),
            synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)

        def fwd(p, z):
            return generator_apply(cfg, p, z, depth=cfg.synthesis.depth - 1,
                                   alpha=1.0, rng=jax.random.PRNGKey(1),
                                   train=False).images
        z = jnp.zeros((1, cfg.latent_size), jnp.float32)
        cost = jax.jit(fwd).lower(params, z).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        xla_flops = float(cost["flops"])
        analytic = float(generator_forward_flops(res))
        assert xla_flops / analytic > 0.85, (xla_flops, analytic)
        assert xla_flops / analytic < 1.45, (xla_flops, analytic)
