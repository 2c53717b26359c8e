"""Reference torch Adam optimizer-state import (convert/torch_optim.py).

The real-thing test: build the reference's own torch Generator/Discriminator,
run torch Adam steps to populate exp_avg/exp_avg_sq/step, export
``optimizer.state_dict()`` exactly as the reference trainer writes it
(GAN.py:810-816), import into optax, then drive BOTH optimizers K further
steps with matched synthetic gradients — parameters must stay equal, which
proves the parameter-index -> pytree-leaf order mapping AND the moment layout
translation AND the optax/torch Adam dynamics all line up."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from tests.reference_utils import install_torchvision_stub

install_torchvision_stub()
from models.GAN import Discriminator as TorchDiscriminator  # noqa: E402
from models.GAN import Generator as TorchGenerator  # noqa: E402

from stylegan_tpu.convert.torch_optim import (adam_state_from_torch,
                                              discriminator_param_order,
                                              generator_param_order)
from stylegan_tpu.convert.torch_params import (
    discriminator_params_from_state_dict, discriminator_state_dict_from_params,
    generator_params_from_state_dict, generator_state_dict_from_params)
from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                 MappingConfig, SynthesisConfig,
                                 discriminator_init, generator_init)
from stylegan_tpu.train.state import make_d_optimizer, make_g_optimizer

import jax  # noqa: E402

RES = 32
LR, BETAS, EPS = 0.003, (0.0, 0.99), 1e-8


def torch_optim_sd_as_numpy(optim):
    sd = optim.state_dict()
    return {"state": {k: {kk: (vv.numpy().copy() if torch.is_tensor(vv) else vv)
                          for kk, vv in v.items()}
                      for k, v in sd["state"].items()},
            "param_groups": sd["param_groups"]}


def torch_synthetic_steps(module, optim, n):
    """n Adam steps with gradient = 1e-5 * param + 1e-6 (small enough that the G chain's global-norm clip at 10 stays inactive — the reference applies that clip outside the optimizer) (elementwise, so the
    gradient maps through any layout transpose exactly like the param)."""
    for _ in range(n):
        optim.zero_grad(set_to_none=True)
        for p in module.parameters():
            p.grad = 1e-5 * p.data + 1e-6
        optim.step()


def ours_synthetic_steps(params, opt_state, tx, n, skip=()):
    def grad_of(path_tuple, p):
        return jnp.zeros_like(p) if path_tuple in skip else 1e-5 * p + 1e-6

    for _ in range(n):
        grads = jax.tree_util.tree_map_with_path(
            lambda kp, p: grad_of(
                tuple(getattr(k, "key", str(k)) for k in kp), p), params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    return params, opt_state


class TestGeneratorAdamImport:
    def test_trajectory_continues_exactly(self):
        torch.manual_seed(0)
        tg = TorchGenerator(resolution=RES, latent_size=512,
                            mapping_layers=4, blur_filter=[1, 2, 1],
                            structure="linear")
        optim = torch.optim.Adam(tg.parameters(), lr=LR, betas=BETAS, eps=EPS)
        torch_synthetic_steps(tg, optim, 3)

        cfg = GeneratorConfig(
            resolution=RES,
            mapping=MappingConfig(dlatent_broadcast=(int(np.log2(RES)) - 1) * 2,
                                  mapping_layers=4),
            synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)
        sd = {k: v.detach().numpy().copy() for k, v in tg.state_dict().items()}
        params = generator_params_from_state_dict(params, sd)

        tx = make_g_optimizer(learning_rate=LR, beta_1=BETAS[0],
                              beta_2=BETAS[1], eps=EPS)
        opt_state = tx.init(params)
        opt_state = adam_state_from_torch(
            opt_state, params, torch_optim_sd_as_numpy(optim), "generator")

        # truncation.avg_latent is a torch *buffer* (never optimized); zero
        # its synthetic grad on our side to match
        skip = (("truncation", "avg_latent"),)
        torch_synthetic_steps(tg, optim, 4)
        params, _ = ours_synthetic_steps(params, opt_state, tx, 4, skip=skip)

        ours_sd = generator_state_dict_from_params(params)
        theirs = {k: v.detach().numpy().copy() for k, v in tg.state_dict().items()}
        for k, v in ours_sd.items():
            np.testing.assert_allclose(
                np.asarray(v, np.float32), theirs[k], atol=2e-6, rtol=2e-5,
                err_msg=k)

    def test_param_count_mismatch_raises(self):
        cfg = GeneratorConfig(
            resolution=RES,
            mapping=MappingConfig(dlatent_broadcast=(int(np.log2(RES)) - 1) * 2,
                                  mapping_layers=4),
            synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)
        tx = make_g_optimizer()
        opt_state = tx.init(params)
        bogus = {"state": {0: {"step": 1,
                               "exp_avg": np.zeros((4,), np.float32),
                               "exp_avg_sq": np.zeros((4,), np.float32)}},
                 "param_groups": [{"params": [0]}]}
        with pytest.raises(ValueError, match="wrong file or architecture"):
            adam_state_from_torch(opt_state, params, bogus, "generator")


class TestDiscriminatorAdamImport:
    def test_trajectory_continues_exactly(self):
        torch.manual_seed(1)
        td = TorchDiscriminator(resolution=RES, blur_filter=[1, 2, 1],
                                structure="linear")
        optim = torch.optim.Adam(td.parameters(), lr=LR, betas=BETAS, eps=EPS)
        torch_synthetic_steps(td, optim, 3)

        cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear")
        params = discriminator_init(jax.random.PRNGKey(1), cfg)
        sd = {k: v.detach().numpy().copy() for k, v in td.state_dict().items()}
        params = discriminator_params_from_state_dict(params, sd)

        tx = make_d_optimizer(learning_rate=LR, beta_1=BETAS[0],
                              beta_2=BETAS[1], eps=EPS)
        opt_state = tx.init(params)
        opt_state = adam_state_from_torch(
            opt_state, params, torch_optim_sd_as_numpy(optim),
            "discriminator")

        torch_synthetic_steps(td, optim, 4)
        params, _ = ours_synthetic_steps(params, opt_state, tx, 4)

        ours_sd = discriminator_state_dict_from_params(params,
                                                       blur_filter=None)
        theirs = {k: v.detach().numpy().copy() for k, v in td.state_dict().items()}
        for k, v in ours_sd.items():
            np.testing.assert_allclose(
                np.asarray(v, np.float32), theirs[k], atol=2e-6, rtol=2e-5,
                err_msg=k)


class TestOrderMatchesTorch:
    """The reconstructed parameter order must equal the reference modules'
    actual named_parameters() order — the index mapping depends on it."""

    def test_generator_order(self):
        tg = TorchGenerator(resolution=RES, latent_size=512,
                            mapping_layers=4, blur_filter=[1, 2, 1],
                            structure="linear")
        torch_names = [n for n, _ in tg.named_parameters()]
        cfg = GeneratorConfig(
            resolution=RES,
            mapping=MappingConfig(dlatent_broadcast=(int(np.log2(RES)) - 1) * 2,
                                  mapping_layers=4),
            synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)
        assert generator_param_order(params) == torch_names

    def test_discriminator_order(self):
        td = TorchDiscriminator(resolution=RES, blur_filter=[1, 2, 1],
                                structure="linear")
        torch_names = [n for n, _ in td.named_parameters()]
        cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear")
        params = discriminator_init(jax.random.PRNGKey(1), cfg)
        assert discriminator_param_order(params) == torch_names

    def test_conditional_generator_order(self):
        tg = TorchGenerator(resolution=RES, latent_size=512,
                            mapping_layers=4, blur_filter=[1, 2, 1],
                            structure="linear", conditional=True, n_classes=5)
        torch_names = [n for n, _ in tg.named_parameters()]
        cfg = GeneratorConfig(
            resolution=RES, conditional=True, n_classes=5,
            mapping=MappingConfig(latent_size=1024,
                                  dlatent_broadcast=(int(np.log2(RES)) - 1) * 2,
                                  mapping_layers=4),
            synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)
        assert generator_param_order(params) == torch_names

    def test_conditional_discriminator_order(self):
        td = TorchDiscriminator(resolution=RES, blur_filter=[1, 2, 1],
                                structure="linear", conditional=True,
                                n_classes=5)
        torch_names = [n for n, _ in td.named_parameters()]
        cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear", conditional=True,
                                  n_classes=5)
        params = discriminator_init(jax.random.PRNGKey(1), cfg)
        assert discriminator_param_order(params) == torch_names
