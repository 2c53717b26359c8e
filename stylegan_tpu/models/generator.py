"""Style-based generator (reference Generator, GAN.py:211-297).

Composes mapping + truncation + synthesis as pure functions.  Training-mode
semantics reproduce the reference exactly, including its idiosyncrasies
(documented at SURVEY.md §7 "hard parts"):

* W moving average updated from the *first batch element only*
  (GAN.py:278: truncation.update(dlatents_in[0, 0])).
* Style-mixing regularization: with prob `style_mixing_prob` draw a cutoff
  uniformly in [1, 2*(depth+1)] and splice a second mapping pass's W above it
  (GAN.py:281-289; python random.randint is inclusive on both ends).
* The truncation lerp is applied in the *training* branch (GAN.py:291-293),
  i.e. inverted relative to official-StyleGAN inference truncation — kept for
  parity.

All randomness is explicit: callers pass a PRNG key; sampling is deterministic
and shard-safe.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import truncate_dlatents, update_moving_average
from .configs import GeneratorConfig
from .mapping import mapping_apply, mapping_init
from .synthesis import synthesis_apply, synthesis_init


class GeneratorOutput(NamedTuple):
    images: jax.Array
    avg_latent: Optional[jax.Array]  # updated W moving average (train mode)


def generator_init(key, cfg: GeneratorConfig, dtype=jnp.float32) -> dict:
    k_map, k_syn, k_emb = jax.random.split(key, 3)
    params = {
        "g_mapping": mapping_init(k_map, cfg.mapping, dtype),
        "g_synthesis": synthesis_init(k_syn, cfg.synthesis, dtype),
    }
    if cfg.use_truncation:
        params["truncation"] = {"avg_latent": jnp.zeros((cfg.dlatent_size,), dtype)}
    if cfg.conditional:
        assert cfg.n_classes > 0, "Conditional generation requires n_classes > 0"
        # torch nn.Embedding default init: N(0, 1)
        params["class_embedding"] = {"weight": jax.random.normal(
            k_emb, (cfg.n_classes, cfg.latent_size), dtype)}
    return params


def embed_labels(params: dict, labels: jax.Array) -> jax.Array:
    return jnp.take(params["class_embedding"]["weight"], labels, axis=0)


def mix_styles(k_cutoff, k_prob, dlatents, dlatents2, depth: int,
               mixing_prob: float) -> jax.Array:
    """Style-mixing splice (reference GAN.py:284-289): with probability
    `mixing_prob`, draw a cutoff uniformly from [1, 2*(depth+1)] (python
    random.randint is inclusive on both ends) and take dlatents2 for layers
    >= cutoff; otherwise cutoff = 2*(depth+1), i.e. no layer in use mixes."""
    num_layers = dlatents.shape[1]
    cur_layers = 2 * (depth + 1)
    cutoff = jax.random.randint(k_cutoff, (), 1, cur_layers + 1)
    do_mix = jax.random.uniform(k_prob, ()) < mixing_prob
    mixing_cutoff = jnp.where(do_mix, cutoff, cur_layers)
    layer_idx = jnp.arange(num_layers)[None, :, None]
    return jnp.where(layer_idx < mixing_cutoff, dlatents, dlatents2)


def generator_apply(cfg: GeneratorConfig, params: dict, latents: jax.Array,
                    depth: int, alpha, rng=None, train: bool = False,
                    labels: Optional[jax.Array] = None,
                    noises=None) -> GeneratorOutput:
    """latents: (B, latent_size) -> images (B, H, W, C).

    `depth`/`train` static; `alpha` traced.  In train mode the updated
    avg_latent is returned (functional counterpart of the reference's in-place
    buffer update); callers must thread it back into params.
    """
    if cfg.conditional:
        assert labels is not None, "Conditional generation requires labels"
        emb = embed_labels(params, labels).astype(latents.dtype)
        latents = jnp.concatenate([latents, emb], axis=1)

    dlatents = mapping_apply(cfg.mapping, params["g_mapping"], latents)

    new_avg = params.get("truncation", {}).get("avg_latent")
    if train:
        if rng is None:
            raise ValueError("train-mode generator_apply needs an rng key")
        rng, k_mix_z, k_mix_p, k_cut = jax.random.split(rng, 4)

        # W moving-average update from dlatents[0, 0] (reference GAN.py:278).
        # Detached, and the truncation lerp below treats the average as a
        # constant (torch buffers carry no grad) — so no gradient flows
        # through the average path.
        if cfg.use_truncation:
            new_avg = update_moving_average(
                params["truncation"]["avg_latent"],
                jax.lax.stop_gradient(dlatents[0, 0]),
                cfg.dlatent_avg_beta)

        # Style mixing regularization (reference GAN.py:281-289)
        if cfg.style_mixing_prob is not None and cfg.style_mixing_prob > 0:
            latents2 = jax.random.normal(k_mix_z, latents.shape, latents.dtype)
            dlatents2 = mapping_apply(cfg.mapping, params["g_mapping"], latents2)
            dlatents = mix_styles(jax.random.fold_in(k_cut, 0), k_mix_p,
                                  dlatents, dlatents2, depth,
                                  cfg.style_mixing_prob)

        # Truncation trick, applied in the training branch (GAN.py:291-293)
        if cfg.use_truncation:
            dlatents = truncate_dlatents(dlatents,
                                         jax.lax.stop_gradient(new_avg),
                                         cfg.truncation_psi,
                                         cfg.truncation_cutoff)

    images = synthesis_apply(cfg.synthesis, params["g_synthesis"], dlatents,
                             depth=depth, alpha=alpha, rng=rng, noises=noises)
    return GeneratorOutput(images=images, avg_latent=new_avg)
