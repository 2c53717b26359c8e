"""W-space projection: invert a target image into the generator's W space.

Beyond-reference feature (huangzh13/StyleGAN.pytorch ships no projector; the
algorithm follows the official StyleGAN projector's shape — W(+) optimization
from the mapping average with a ramped lr schedule and annealed latent
perturbation — rebuilt as pure JAX with one jitted update step).

Air-gap note: the official projector scores reconstructions with VGG16 LPIPS
(pretrained weights).  Here the default image loss is a multi-scale
Laplacian-pyramid MSE (reusing metrics/swd.py's pyramid), which needs no
downloaded weights and captures coarse-to-fine structure; pixel MSE is the
finest level.

Usage: `project.py --generator_file ... --target img.png` writes the
projected image plus a `w.npy` dlatent code compatible with
`generate_samples.py --input w.npy`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .metrics.swd import laplacian_pyramid
from .models import GeneratorConfig, synthesis_apply
from .models.mapping import mapping_apply


@dataclass(frozen=True)
class ProjectorConfig:
    num_steps: int = 1000
    w_plus: bool = True            # per-layer W+ (False: one shared W)
    initial_lr: float = 0.1
    lr_rampup: float = 0.05        # fraction of steps
    lr_rampdown: float = 0.25
    initial_noise_factor: float = 0.05   # latent perturbation, annealed
    noise_ramp: float = 0.75
    pyramid_levels: int = 4
    avg_samples: int = 4096        # mapping draws for w_avg / w_std


class ProjectionState(NamedTuple):
    dlatents: jax.Array            # (num_layers|1, D) being optimized
    opt_state: optax.OptState
    key: jax.Array                 # per-step perturbation randomness


def w_statistics(gen_cfg: GeneratorConfig, params: dict, key,
                 n_samples: int = 4096):
    """Mean W and scalar std of the mapping output over random latents
    (the official projector's w_avg / w_std initialization)."""
    z = jax.random.normal(key, (n_samples, gen_cfg.effective_latent_size))
    w = mapping_apply(gen_cfg.mapping, params["g_mapping"],
                      z[:, :gen_cfg.mapping.latent_size])
    if w.ndim == 3:                # broadcast form (B, num_layers, D)
        w = w[:, 0]
    w_avg = jnp.mean(w, axis=0)
    w_std = jnp.sqrt(jnp.sum(jnp.mean(jnp.square(w - w_avg), axis=0)))
    return w_avg, w_std


def pyramid_loss(a: jax.Array, b: jax.Array, levels: int) -> jax.Array:
    """Multi-scale MSE over Laplacian detail levels (finest first) plus the
    low-res residual; coarser levels weighted up so global structure leads."""
    pa = laplacian_pyramid(a.astype(jnp.float32), levels)
    pb = laplacian_pyramid(b.astype(jnp.float32), levels)
    loss = jnp.float32(0)
    for lvl, (xa, xb) in enumerate(zip(pa, pb)):
        loss = loss + (2.0 ** lvl) * jnp.mean(jnp.square(xa - xb))
    return loss


def _lr_schedule(t, cfg: ProjectorConfig):
    """Official projector schedule: cosine rampdown + linear-ish rampup."""
    frac = t / cfg.num_steps
    rampdown = jnp.minimum(1.0, (1.0 - frac) / cfg.lr_rampdown)
    rampdown = 0.5 - 0.5 * jnp.cos(rampdown * jnp.pi)
    rampup = jnp.minimum(1.0, frac / cfg.lr_rampup)
    return cfg.initial_lr * rampdown * rampup


def init_projection(key, gen_cfg: GeneratorConfig, params: dict,
                    cfg: ProjectorConfig):
    """Returns (state, w_std, noises): dlatents start at w_avg; per-layer
    synthesis noise is drawn once and pinned for the whole optimization."""
    k_avg, k_noise, k_state = jax.random.split(key, 3)
    w_avg, w_std = w_statistics(gen_cfg, params, k_avg, cfg.avg_samples)
    rows = gen_cfg.num_layers if cfg.w_plus else 1
    dlatents = jnp.tile(w_avg[None], (rows, 1))
    noises = _pinned_noises(k_noise, gen_cfg)
    tx = optax.scale_by_adam()
    state = ProjectionState(dlatents, tx.init(dlatents), k_state)
    return state, w_std, noises


def _pinned_noises(key, gen_cfg: GeneratorConfig):
    res_log2 = gen_cfg.synthesis.resolution_log2
    noises = []
    for layer in range(gen_cfg.num_layers):
        res = 2 ** (layer // 2 + 2)
        noises.append(jax.random.normal(jax.random.fold_in(key, layer),
                                        (1, res, res, 1), jnp.float32))
    assert res == 2 ** res_log2
    return noises


def build_projection_step(gen_cfg: GeneratorConfig, params: dict,
                          cfg: ProjectorConfig, noises):
    """One jitted projection update: perturb W (annealed), synthesize, score
    against the target, Adam-update the dlatents."""
    depth = gen_cfg.synthesis.depth - 1
    num_layers = gen_cfg.num_layers
    tx = optax.scale_by_adam()
    syn_params = params["g_synthesis"]

    @jax.jit
    def step(state: ProjectionState, target: jax.Array, t, w_std):
        key, k_pert = jax.random.split(state.key)
        frac = t / cfg.num_steps
        noise_scale = (w_std * cfg.initial_noise_factor
                       * jnp.maximum(0.0, 1.0 - frac / cfg.noise_ramp) ** 2)

        def loss_fn(dlatents):
            pert = dlatents + noise_scale * jax.random.normal(
                k_pert, dlatents.shape)
            wall = jnp.broadcast_to(pert[None] if cfg.w_plus
                                    else pert[None, 0:1],
                                    (1, num_layers, dlatents.shape[-1]))
            img = synthesis_apply(gen_cfg.synthesis, syn_params, wall,
                                  depth=depth, alpha=1.0, noises=noises)
            return pyramid_loss(img, target[None], cfg.pyramid_levels)

        loss, grads = jax.value_and_grad(loss_fn)(state.dlatents)
        updates, opt_state = tx.update(grads, state.opt_state, state.dlatents)
        lr = _lr_schedule(t, cfg)
        dlatents = state.dlatents - lr * updates
        return ProjectionState(dlatents, opt_state, key), loss

    return step


def project(key, gen_cfg: GeneratorConfig, params: dict,
            target: jax.Array, cfg: Optional[ProjectorConfig] = None,
            callback=None):
    """Full projection run.  target: (H, W, C) in [-1, 1].

    Returns (dlatents (num_layers, D), final image (H, W, C), losses)."""
    cfg = cfg or ProjectorConfig()
    state, w_std, noises = init_projection(key, gen_cfg, params, cfg)
    step = build_projection_step(gen_cfg, params, cfg, noises)
    target = jnp.asarray(target, jnp.float32)
    losses = []
    for t in range(cfg.num_steps):
        state, loss = step(state, target, jnp.float32(t), w_std)
        if callback is not None and (t % 50 == 0 or t == cfg.num_steps - 1):
            callback(t, float(loss))
        losses.append(loss)
    dl = state.dlatents
    wall = jnp.broadcast_to(dl[None] if cfg.w_plus else dl[None, 0:1],
                            (1, gen_cfg.num_layers, dl.shape[-1]))
    img = synthesis_apply(gen_cfg.synthesis, params["g_synthesis"], wall,
                          depth=gen_cfg.synthesis.depth - 1, alpha=1.0,
                          noises=noises)
    return np.asarray(wall[0]), np.asarray(img[0]), [float(l) for l in losses]
