"""W-space projection: inverting a generated image recovers it."""

import jax
import jax.numpy as jnp
import numpy as np

from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_init,
                                 synthesis_apply)
from stylegan_tpu.projection import (ProjectorConfig, build_projection_step,
                                     init_projection, project, pyramid_loss,
                                     w_statistics)


def _tiny_cfg(res=32):
    return GeneratorConfig(
        resolution=res, latent_size=64, dlatent_size=64,
        truncation_psi=-1.0,
        mapping=MappingConfig(latent_size=64, dlatent_size=64,
                              mapping_fmaps=64, mapping_layers=2,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, dlatent_size=64,
                                  fmap_base=256, fmap_max=64,
                                  blur_filter=(1, 2, 1), structure="linear"))


def test_projection_recovers_generated_image():
    cfg = _tiny_cfg()
    key = jax.random.PRNGKey(0)
    params = generator_init(key, cfg)

    # target from a known W (uses the projector's own pinned noises so the
    # optimum is exactly reachable)
    pcfg = ProjectorConfig(num_steps=200, avg_samples=256, pyramid_levels=3,
                           initial_lr=0.05)
    state, w_std, noises = init_projection(jax.random.fold_in(key, 1), cfg,
                                           params, pcfg)
    # a W near the mapping prior (what real projection targets look like; an
    # arbitrary far-off W in an UNTRAINED random generator is not invertible
    # in a few hundred steps)
    from stylegan_tpu.projection import w_statistics
    w_avg, ws = w_statistics(cfg, params, jax.random.fold_in(key, 7), 256)
    w_true = (w_avg + 0.4 * ws * jax.random.normal(
        jax.random.fold_in(key, 2), (1, cfg.num_layers, 64))
        / np.sqrt(64))
    target = synthesis_apply(cfg.synthesis, params["g_synthesis"], w_true,
                             depth=cfg.synthesis.depth - 1, alpha=1.0,
                             noises=noises)[0]

    step = build_projection_step(cfg, params, pcfg, noises)
    loss0 = float(step(state, jnp.asarray(target), jnp.float32(0), w_std)[1])
    dl, img, losses = project(jax.random.fold_in(key, 1), cfg, params,
                              np.asarray(target), pcfg)
    assert dl.shape == (cfg.num_layers, 64)
    assert img.shape == target.shape
    assert losses[-1] < 0.25 * loss0, (loss0, losses[-1])
    # reconstruction should be close in pixel space too, not just "loss went
    # down" — compared against the do-nothing baseline (w_avg init)
    base = synthesis_apply(cfg.synthesis, params["g_synthesis"],
                           jnp.broadcast_to(state.dlatents[None],
                                            (1, cfg.num_layers, 64)),
                           depth=cfg.synthesis.depth - 1, alpha=1.0,
                           noises=noises)[0]
    mse = float(np.mean((img - np.asarray(target)) ** 2))
    mse_base = float(np.mean((np.asarray(base) - np.asarray(target)) ** 2))
    assert mse < 0.4 * mse_base, (mse, mse_base)


def test_w_statistics_shapes():
    cfg = _tiny_cfg()
    params = generator_init(jax.random.PRNGKey(3), cfg)
    w_avg, w_std = w_statistics(cfg, params, jax.random.PRNGKey(4), 128)
    assert w_avg.shape == (64,)
    assert float(w_std) > 0


def test_pyramid_loss_zero_on_identical():
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
    assert float(pyramid_loss(x, x, 3)) == 0.0
    y = x + 0.1
    assert float(pyramid_loss(x, y, 3)) > 0
