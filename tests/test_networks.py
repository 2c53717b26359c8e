"""Full-network numerical parity vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_utils import (from_torch_nchw, install_torchvision_stub,
                                   to_torch_nchw)

install_torchvision_stub()
from models.GAN import Discriminator as TorchDiscriminator  # noqa: E402
from models.GAN import Generator as TorchGenerator  # noqa: E402
from models.CustomLayers import NoiseLayer  # noqa: E402

from stylegan_tpu.convert import (discriminator_state_dict_from_params,
                                  generator_state_dict_from_params,
                                  generator_params_from_state_dict)
from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                 MappingConfig, SynthesisConfig,
                                 discriminator_apply, discriminator_init,
                                 generator_apply, generator_init,
                                 mapping_apply, synthesis_apply)

RES = 64


def make_gen_cfg(structure="linear", conditional=False, n_classes=0):
    return GeneratorConfig(
        resolution=RES, conditional=conditional, n_classes=n_classes,
        mapping=MappingConfig(latent_size=1024 if conditional else 512,
                              dlatent_broadcast=(int(np.log2(RES)) - 1) * 2,
                              mapping_layers=4),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure=structure))


def make_torch_gen(cfg):
    return TorchGenerator(
        resolution=cfg.resolution, latent_size=cfg.latent_size,
        conditional=cfg.conditional, n_classes=cfg.n_classes,
        truncation_psi=cfg.truncation_psi,
        truncation_cutoff=cfg.truncation_cutoff,
        mapping_layers=cfg.mapping.mapping_layers,
        blur_filter=list(cfg.synthesis.blur_filter),
        structure=cfg.synthesis.structure)


def load_params_into_torch(module, state_dict):
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state_dict.items()}
    missing, unexpected = module.load_state_dict(sd, strict=False)
    # only blur-kernel buffers may be missing
    for k in missing:
        assert "blur" in k or "intermediate" in k, f"unexpectedly missing {k}"
    assert not unexpected, unexpected


def pin_reference_noise(module, noises_nhwc):
    """Assign fixed noise to every NoiseLayer in reference module order."""
    layers = [m for m in module.modules() if isinstance(m, NoiseLayer)]
    for layer, n in zip(layers, noises_nhwc):
        layer.noise = to_torch_nchw(n)


def make_noises(batch, num_stages, seed=0):
    rs = np.random.RandomState(seed)
    noises = []
    for stage in range(num_stages):
        res = 4 * 2 ** stage
        for _ in range(2):
            noises.append(rs.randn(batch, res, res, 1).astype(np.float32))
    return noises


class TestGeneratorParity:
    @pytest.mark.parametrize("structure,depth,alpha", [
        ("linear", 0, 1.0), ("linear", 2, 0.35), ("linear", 4, 1.0),
        ("fixed", 4, 1.0),
    ])
    def test_eval_forward(self, structure, depth, alpha):
        cfg = make_gen_cfg(structure)
        params = generator_init(jax.random.PRNGKey(0), cfg)
        tg = make_torch_gen(cfg)
        load_params_into_torch(tg, generator_state_dict_from_params(params))
        tg.eval()

        batch = 2
        num_stages = int(np.log2(RES)) - 1
        noises = make_noises(batch, num_stages, seed=3)
        pin_reference_noise(tg, noises)

        z = np.random.RandomState(1).randn(batch, 512).astype(np.float32)
        with torch.no_grad():
            ref = from_torch_nchw(tg(torch.from_numpy(z), depth=depth,
                                     alpha=alpha))
        out = generator_apply(cfg, params, jnp.asarray(z), depth=depth,
                              alpha=alpha, train=False,
                              noises=[jnp.asarray(n) for n in noises])
        np.testing.assert_allclose(np.asarray(out.images), ref,
                                   atol=2e-4, rtol=1e-3)

    def test_synthesis_direct_call(self):
        """The mapping/synthesis sub-network API used by the figure scripts
        (reference generate_mixing_figure.py:22-25)."""
        cfg = make_gen_cfg("linear")
        params = generator_init(jax.random.PRNGKey(4), cfg)
        tg = make_torch_gen(cfg)
        load_params_into_torch(tg, generator_state_dict_from_params(params))
        tg.eval()

        batch, depth = 2, 3
        num_stages = int(np.log2(RES)) - 1
        noises = make_noises(batch, num_stages, seed=5)
        pin_reference_noise(tg, noises)

        z = np.random.RandomState(2).randn(batch, 512).astype(np.float32)
        w = mapping_apply(cfg.mapping, params["g_mapping"], jnp.asarray(z))
        with torch.no_grad():
            w_ref = tg.g_mapping(torch.from_numpy(z)).numpy()
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-5, rtol=1e-4)

        img = synthesis_apply(cfg.synthesis, params["g_synthesis"], w,
                              depth=depth, alpha=1.0,
                              noises=[jnp.asarray(n) for n in noises])
        with torch.no_grad():
            img_ref = from_torch_nchw(
                tg.g_synthesis(torch.from_numpy(w_ref), depth=depth, alpha=1))
        np.testing.assert_allclose(np.asarray(img), img_ref,
                                   atol=2e-4, rtol=1e-3)

    def test_roundtrip_state_dict(self):
        cfg = make_gen_cfg("linear")
        params = generator_init(jax.random.PRNGKey(7), cfg)
        sd = generator_state_dict_from_params(params)
        params2 = generator_params_from_state_dict(params, sd, strict=True)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_mode_truncation_and_avg_update(self):
        """Train branch: avg update from w[0,0] and truncation lerp, with
        style mixing disabled so torch/jax RNG differences don't matter."""
        cfg = GeneratorConfig(
            resolution=RES, style_mixing_prob=None,
            mapping=MappingConfig(dlatent_broadcast=10, mapping_layers=4),
            synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(9), cfg)
        tg = TorchGenerator(resolution=RES, latent_size=512,
                            style_mixing_prob=None, mapping_layers=4,
                            blur_filter=[1, 2, 1], structure="linear")
        load_params_into_torch(tg, generator_state_dict_from_params(params))
        tg.train()
        batch = 2
        num_stages = int(np.log2(RES)) - 1
        noises = make_noises(batch, num_stages, seed=11)
        pin_reference_noise(tg, noises)

        z = np.random.RandomState(3).randn(batch, 512).astype(np.float32)
        with torch.no_grad():
            ref = from_torch_nchw(tg(torch.from_numpy(z), depth=2, alpha=0.7))
            ref_avg = tg.truncation.avg_latent.numpy().copy()
        out = generator_apply(cfg, params, jnp.asarray(z), depth=2, alpha=0.7,
                              rng=jax.random.PRNGKey(0), train=True,
                              noises=[jnp.asarray(n) for n in noises])
        np.testing.assert_allclose(np.asarray(out.images), ref,
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(out.avg_latent), ref_avg,
                                   atol=1e-5, rtol=1e-4)


class TestDiscriminatorParity:
    @pytest.mark.parametrize("structure,depth,alpha", [
        ("linear", 0, 1.0), ("linear", 2, 0.4), ("linear", 4, 1.0),
        ("fixed", 4, 1.0),
    ])
    def test_forward(self, structure, depth, alpha):
        cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure=structure)
        params = discriminator_init(jax.random.PRNGKey(1), cfg)
        td = TorchDiscriminator(resolution=RES, blur_filter=[1, 2, 1],
                                structure=structure)
        sd = discriminator_state_dict_from_params(params)
        sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
        missing, unexpected = td.load_state_dict(sd_t, strict=False)
        assert all("blur" in k for k in missing), missing
        assert not unexpected

        res = 4 * 2 ** depth if structure == "linear" else RES
        x = np.random.RandomState(4).randn(4, res, res, 3).astype(np.float32)
        with torch.no_grad():
            ref = td(to_torch_nchw(x), depth=depth, alpha=alpha).numpy()
        ours = discriminator_apply(cfg, params, jnp.asarray(x), depth=depth,
                                   alpha=alpha)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)

    def test_conditional_forward(self):
        n_classes = 5
        cfg = DiscriminatorConfig(resolution=RES, conditional=True,
                                  n_classes=n_classes, blur_filter=(1, 2, 1),
                                  structure="linear")
        params = discriminator_init(jax.random.PRNGKey(2), cfg)
        td = TorchDiscriminator(resolution=RES, conditional=True,
                                n_classes=n_classes, blur_filter=[1, 2, 1],
                                structure="linear")
        sd = discriminator_state_dict_from_params(params)
        sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}
        missing, unexpected = td.load_state_dict(sd_t, strict=False)
        assert all("blur" in k for k in missing), missing

        depth, alpha = 2, 0.6
        res = 4 * 2 ** depth
        x = np.random.RandomState(5).randn(4, res, res, 3).astype(np.float32)
        labels = np.array([0, 1, 2, 4])
        with torch.no_grad():
            ref = td(to_torch_nchw(x), depth=depth, alpha=alpha,
                     labels_in=torch.from_numpy(labels)).numpy()
        ours = discriminator_apply(cfg, params, jnp.asarray(x), depth=depth,
                                   alpha=alpha, labels=jnp.asarray(labels))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


class TestConditionalGenerator:
    def test_forward(self):
        n_classes = 5
        cfg = make_gen_cfg("linear", conditional=True, n_classes=n_classes)
        params = generator_init(jax.random.PRNGKey(3), cfg)
        tg = make_torch_gen(cfg)
        load_params_into_torch(tg, generator_state_dict_from_params(params))
        tg.eval()
        batch = 2
        num_stages = int(np.log2(RES)) - 1
        noises = make_noises(batch, num_stages, seed=13)
        pin_reference_noise(tg, noises)

        z = np.random.RandomState(6).randn(batch, 512).astype(np.float32)
        labels = np.array([1, 3])
        with torch.no_grad():
            ref = from_torch_nchw(tg(torch.from_numpy(z), depth=2, alpha=1.0,
                                     labels_in=torch.from_numpy(labels)))
        out = generator_apply(cfg, params, jnp.asarray(z), depth=2, alpha=1.0,
                              train=False, labels=jnp.asarray(labels),
                              noises=[jnp.asarray(n) for n in noises])
        np.testing.assert_allclose(np.asarray(out.images), ref,
                                   atol=2e-4, rtol=1e-3)


class TestStaticAlphaOneSpecialization:
    """Static Python alpha == 1.0 skips the dead fade branch (the residual
    to_rgb + upscale + blend XLA provably does not DCE) — output must equal
    the traced-alpha blend exactly up to 0.0*residual zero-sign roundoff."""

    @pytest.mark.parametrize("packed", [False, True])
    def test_matches_traced_alpha(self, packed):
        from dataclasses import replace
        cfg = make_gen_cfg("linear").synthesis
        cfg = replace(cfg, packed=packed)
        params = generator_init(jax.random.PRNGKey(0),
                                make_gen_cfg("linear"))["g_synthesis"]
        dl = jnp.asarray(np.random.RandomState(1).randn(
            2, (int(np.log2(RES)) - 1) * 2, 512).astype(np.float32)) * 0.3
        key = jax.random.PRNGKey(2)
        depth = cfg.depth - 1
        static = jax.jit(
            lambda p, d: synthesis_apply(cfg, p, d, depth=depth, alpha=1.0,
                                         rng=key))(params, dl)
        traced = jax.jit(
            lambda p, d, a: synthesis_apply(cfg, p, d, depth=depth, alpha=a,
                                            rng=key))(params, dl,
                                                      jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(static), np.asarray(traced),
                                   atol=1e-5, rtol=1e-5)

    def test_one_fewer_conv_traced(self):
        cfg = make_gen_cfg("linear").synthesis
        params = generator_init(jax.random.PRNGKey(0),
                                make_gen_cfg("linear"))["g_synthesis"]
        dl = jnp.zeros((2, (int(np.log2(RES)) - 1) * 2, 512))
        key = jax.random.PRNGKey(2)
        depth = cfg.depth - 1

        def count(alpha):
            jaxpr = jax.make_jaxpr(lambda p, d: synthesis_apply(
                cfg, p, d, depth=depth, alpha=alpha, rng=key))(params, dl)
            return str(jaxpr).count("conv_general_dilated")

        # the residual branch's to_rgb conv is gone (its upscale + the
        # full-res blend are not convs but disappear with it)
        assert count(1.0) == count(0.5) - 1
