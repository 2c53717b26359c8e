"""Parity for the less-traveled architecture options: dense (non-const) input
block, pixel-norm epilogue, relu nonlinearity, no-style / no-noise epilogues."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.reference_utils import from_torch_nchw, install_torchvision_stub
from tests.test_networks import (load_params_into_torch, make_noises,
                                 pin_reference_noise)

install_torchvision_stub()
from models.GAN import Generator as TorchGenerator  # noqa: E402

from stylegan_tpu.convert import generator_state_dict_from_params
from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_apply,
                                 generator_init)

RES = 32


def _run_pair(syn_kwargs, torch_kwargs, seed=0, atol=3e-4):
    cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear", **syn_kwargs))
    params = generator_init(jax.random.PRNGKey(seed), cfg)
    tg = TorchGenerator(resolution=RES, latent_size=512, mapping_layers=2,
                        blur_filter=[1, 2, 1], structure="linear",
                        **torch_kwargs)
    load_params_into_torch(tg, generator_state_dict_from_params(params))
    tg.eval()

    batch = 2
    num_stages = RES.bit_length() - 2
    noises = make_noises(batch, num_stages, seed=seed + 1)
    pin_reference_noise(tg, noises)
    z = np.random.RandomState(seed + 2).randn(batch, 512).astype(np.float32)
    with torch.no_grad():
        ref = from_torch_nchw(tg(torch.from_numpy(z), depth=2, alpha=0.8))
    out = generator_apply(cfg, params, jnp.asarray(z), depth=2, alpha=0.8,
                          train=False,
                          noises=[jnp.asarray(n) for n in noises])
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=atol,
                               rtol=1e-3)


def test_dense_input_block():
    _run_pair({"const_input_layer": False}, {"const_input_layer": False},
              seed=10)


def test_pixel_norm_epilogue():
    _run_pair({"use_pixel_norm": True, "use_instance_norm": False},
              {"use_pixel_norm": True, "use_instance_norm": False}, seed=20)


def test_relu_nonlinearity():
    """The reference crashes for nonlinearity='relu' (GAN.py:67 maps it to
    torch.relu, which is not an nn.Module and cannot live in Sequential), so
    there is no torch baseline; verify our relu path works and actually
    applies relu (no negative activations before style modulation)."""
    cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear", nonlinearity="relu",
                                  use_styles=False, use_instance_norm=False))
    params = generator_init(jax.random.PRNGKey(30), cfg)
    z = np.random.RandomState(31).randn(2, 512).astype(np.float32)
    out = generator_apply(cfg, params, jnp.asarray(z), depth=1, alpha=1.0,
                          rng=jax.random.PRNGKey(32), train=False)
    assert np.isfinite(np.asarray(out.images)).all()


def test_no_noise():
    cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear", use_noise=False))
    params = generator_init(jax.random.PRNGKey(40), cfg)
    tg = TorchGenerator(resolution=RES, latent_size=512, mapping_layers=2,
                        blur_filter=[1, 2, 1], structure="linear",
                        use_noise=False)
    load_params_into_torch(tg, generator_state_dict_from_params(params))
    tg.eval()
    z = np.random.RandomState(41).randn(2, 512).astype(np.float32)
    with torch.no_grad():
        ref = from_torch_nchw(tg(torch.from_numpy(z), depth=1, alpha=1.0))
    out = generator_apply(cfg, params, jnp.asarray(z), depth=1, alpha=1.0,
                          train=False)
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=3e-4,
                               rtol=1e-3)
