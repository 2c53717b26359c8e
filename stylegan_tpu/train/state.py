"""Training state pytree and optimizer construction.

Optimizers mirror the reference exactly (GAN.py:529-533, 649-652):
  * D: Adam(lr, betas, eps) on discriminator params.
  * G: global-norm clip at 10 *then* Adam — optax.chain order reproduces
    torch's clip_grad_norm_-before-step semantics.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import optax


class TrainState(NamedTuple):
    """Everything carried across steps; a pure pytree, donated into each
    jitted train step."""
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    g_shadow: Optional[Any]  # EMA copy of g_params (None when use_ema=False)


def make_g_optimizer(learning_rate=0.003, beta_1=0.0, beta_2=0.99, eps=1e-8,
                     clip_norm=10.0):
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=eps),
    )


def make_d_optimizer(learning_rate=0.003, beta_1=0.0, beta_2=0.99, eps=1e-8):
    return optax.adam(learning_rate, b1=beta_1, b2=beta_2, eps=eps)


def lazy_reg_adam_correction(opt_args: dict, interval: int) -> dict:
    """StyleGAN2's lazy-regularization hyperparameter correction.

    With the penalty applied as a separate optimizer update every `interval`
    minibatches, the D optimizer takes (interval + 1) steps per `interval`
    minibatches; the official implementation compensates with
    mb_ratio = interval / (interval + 1):
        lr    *= mb_ratio
        betas **= mb_ratio
    so per-image learning rate and moment half-lives match the
    every-step-regularized dynamics.  Returns a corrected copy of the
    make_d_optimizer kwargs (defaults filled from its signature).
    """
    c = interval / (interval + 1)
    out = dict(opt_args)
    out["learning_rate"] = float(out.get("learning_rate", 0.003)) * c
    out["beta_1"] = float(out.get("beta_1", 0.0)) ** c
    out["beta_2"] = float(out.get("beta_2", 0.99)) ** c
    return out


def create_train_state(g_params, d_params, g_tx, d_tx, use_ema: bool) -> TrainState:
    import jax
    import jax.numpy as jnp
    # materialize fresh buffers (not aliases) so the train step can donate
    # the whole state without double-donation
    g_shadow = (jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                       g_params) if use_ema else None)
    return TrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        g_shadow=g_shadow,
    )
