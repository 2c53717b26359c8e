"""GAN loss functions (reference models/Losses.py).

Each loss is a pair of pure functions ``dis_loss`` / ``gen_loss`` taking a
``dis_fn(images) -> scores`` closure (the discriminator forward with params,
depth, alpha, and labels already bound).  They run *inside* the jitted train
step, so the R1 penalty's grad-of-grad nests naturally under the parameter
grad (jax.grad of a function containing jax.grad).

Data-parallel exactness: losses that reduce over the batch accept an
``axis_name``; when set (inside shard_map), batch means become global means
via lax.pmean, so N-chip training computes exactly the single-chip loss.

Formulas (verified against the reference in tests/test_losses.py):
  StandardGAN                 Losses.py:96-133  (BCE-with-logits vs 1/0)
  HingeGAN                    Losses.py:136-151
  RelativisticAverageHingeGAN Losses.py:154-189 (default loss, GAN.py:451)
  LogisticGAN (+R1, gamma=10) Losses.py:192-229
  ConditionalGANLoss          Losses.py:54-89   (BCE, labels routed to D)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mean(x, axis_name=None):
    m = jnp.mean(x)
    if axis_name is not None:
        m = jax.lax.pmean(m, axis_name)
    return m


def _softplus(x):
    return jax.nn.softplus(x)


def _bce_with_logits(logits, target, axis_name=None):
    # mean(softplus(x) - x*t) == BCEWithLogitsLoss
    return _mean(_softplus(logits) - logits * target, axis_name)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _score_pair(dis_fn, reals, fakes):
    """Scores for reals and fakes.

    Default: two separate D forwards.  A naive concat-along-batch forward
    was tried in round 2 and REVERTED: minibatch-stddev groups are *strided*
    across the batch (reshape(g, b//g, ...) — group j holds batch indices
    {j, j + b//g, ...}), so a concatenated real/fake batch mixes reals and
    fakes inside every stddev group, changing D's scores vs the reference.

    Round 3: `ops.minibatch_stddev(chunks=2)` restricts grouping to the two
    contiguous halves, making ONE batch-2B forward compute exactly the two
    separate batch-B statistics — same math, ~half the per-pass fixed cost.
    The train-step builder opts in by attaching a `score_pair(reals, fakes)`
    attribute to dis_fn (steps.py `fuse_scores`); losses route through it
    here so every pair-scoring loss benefits.
    """
    pair = getattr(dis_fn, "score_pair", None)
    if pair is not None:
        return pair(reals, fakes)
    return dis_fn(reals), dis_fn(fakes)


# ---------------------------------------------------------------------------
# standard-gan
# ---------------------------------------------------------------------------

def standard_dis_loss(dis_fn, reals, fakes, axis_name=None):
    r, f = _score_pair(dis_fn, reals, fakes)
    r, f = jnp.squeeze(r), jnp.squeeze(f)
    real_loss = _bce_with_logits(r, 1.0, axis_name)
    fake_loss = _bce_with_logits(f, 0.0, axis_name)
    return (real_loss + fake_loss) / 2


def standard_gen_loss(dis_fn, reals, fakes, axis_name=None):
    # NB: the reference's StandardGAN.gen_loss has a tuple-unpack bug
    # (Losses.py:131 `preds, _, _ = self.dis(...)`) and would crash if
    # selected; we implement the intended non-buggy math.
    f = jnp.squeeze(dis_fn(fakes))
    return _bce_with_logits(f, 1.0, axis_name)


# ---------------------------------------------------------------------------
# hinge
# ---------------------------------------------------------------------------

def hinge_dis_loss(dis_fn, reals, fakes, axis_name=None):
    r, f = _score_pair(dis_fn, reals, fakes)
    return _mean(_relu(1.0 - r), axis_name) + _mean(_relu(1.0 + f), axis_name)


def hinge_gen_loss(dis_fn, reals, fakes, axis_name=None):
    return -_mean(dis_fn(fakes), axis_name)


# ---------------------------------------------------------------------------
# relativistic-hinge (default)
# ---------------------------------------------------------------------------

def relativistic_hinge_dis_loss(dis_fn, reals, fakes, axis_name=None):
    r, f = _score_pair(dis_fn, reals, fakes)
    r_f_diff = r - _mean(f, axis_name)
    f_r_diff = f - _mean(r, axis_name)
    return (_mean(_relu(1.0 - r_f_diff), axis_name)
            + _mean(_relu(1.0 + f_r_diff), axis_name))


def relativistic_hinge_gen_loss(dis_fn, reals, fakes, axis_name=None):
    r, f = _score_pair(dis_fn, reals, fakes)
    r_f_diff = r - _mean(f, axis_name)
    f_r_diff = f - _mean(r, axis_name)
    return (_mean(_relu(1.0 + r_f_diff), axis_name)
            + _mean(_relu(1.0 - f_r_diff), axis_name))


# ---------------------------------------------------------------------------
# logistic (+ R1)
# ---------------------------------------------------------------------------

def r1_penalty(dis_fn, reals, axis_name=None):
    """sum over batch and pixels of ||d D(x)/d x||^2 (Losses.py:197-211).

    Note the reference *sums* (not means) over the batch; reproduced exactly.
    Under data parallelism the sum is psum'd so the penalty matches the
    global-batch value.
    """
    def score_sum(x):
        return jnp.sum(dis_fn(x))
    grads = jax.grad(score_sum)(reals)
    pen = jnp.sum(jnp.square(grads))
    if axis_name is not None:
        pen = jax.lax.psum(pen, axis_name)
    return pen


def logistic_dis_loss(dis_fn, reals, fakes, axis_name=None, r1_gamma=10.0):
    r, f = _score_pair(dis_fn, reals, fakes)
    loss = _mean(_softplus(f), axis_name) + _mean(_softplus(-r), axis_name)
    if r1_gamma != 0.0:
        loss = loss + r1_penalty(dis_fn, jax.lax.stop_gradient(reals),
                                 axis_name) * (r1_gamma * 0.5)
    return loss


def logistic_gen_loss(dis_fn, reals, fakes, axis_name=None):
    return _mean(_softplus(-dis_fn(fakes)), axis_name)


# ---------------------------------------------------------------------------
# wgan / wgan-gp
#
# The reference's StyleGAN wrapper *advertises* wgan/wgan-gp and stores a
# `drift` coefficient for them (GAN.py:464-470, 517) but never implements
# them; implemented here per the ProGAN formulation the reference descends
# from (akanimax/pro_gan_pytorch): D maximizes r - f with a drift penalty
# eps * mean(r^2); GP = lambda * mean((||dD/dx_hat|| - 1)^2) on random
# interpolates, computed with jax.grad nested inside the param grad.
# ---------------------------------------------------------------------------

def wgan_dis_loss(dis_fn, reals, fakes, axis_name=None, drift=0.001):
    r, f = _score_pair(dis_fn, reals, fakes)
    return (_mean(f, axis_name) - _mean(r, axis_name)
            + drift * _mean(jnp.square(r), axis_name))


def wgan_gen_loss(dis_fn, reals, fakes, axis_name=None):
    return -_mean(dis_fn(fakes), axis_name)


def gradient_penalty(dis_fn, reals, fakes, key, axis_name=None):
    """lambda-free GP core: mean((||dD/dx_hat||_2 - 1)^2) over random
    per-sample interpolates."""
    b = reals.shape[0]
    eps_shape = (b,) + (1,) * (reals.ndim - 1)
    eps = jax.random.uniform(key, eps_shape, reals.dtype)
    merged = eps * reals + (1.0 - eps) * fakes
    merged = jax.lax.stop_gradient(merged)

    def score_sum(x):
        return jnp.sum(dis_fn(x))

    grads = jax.grad(score_sum)(merged)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1) + 1e-12)
    return _mean(jnp.square(norms - 1.0), axis_name)


def wgan_gp_dis_loss(dis_fn, reals, fakes, axis_name=None, key=None,
                     drift=0.001, gp_lambda=10.0):
    assert key is not None, "wgan-gp needs a PRNG key for the interpolates"
    loss = wgan_dis_loss(dis_fn, reals, fakes, axis_name, drift)
    return loss + gp_lambda * gradient_penalty(dis_fn, reals, fakes, key,
                                               axis_name)


def wgan_gp_gen_loss(dis_fn, reals, fakes, axis_name=None):
    return -_mean(dis_fn(fakes), axis_name)


# ---------------------------------------------------------------------------
# conditional (BCE with labels routed to D)
# ---------------------------------------------------------------------------

def conditional_dis_loss(dis_fn, reals, fakes, axis_name=None):
    # dis_fn already closes over labels
    return standard_dis_loss(dis_fn, reals, fakes, axis_name)


def conditional_gen_loss(dis_fn, reals, fakes, axis_name=None):
    f = jnp.squeeze(dis_fn(fakes))
    return _bce_with_logits(f, 1.0, axis_name)


# Beyond-reference conditional variants (VERDICT r4 #6): the reference's
# only conditional objective is plain BCE (Losses.py:54-89), which measured
# as its weakest point (docs/conditional_run: own-class SWD worsened over
# 8k steps while the same stack trains unconditional runs cleanly).  The
# label conditioning lives entirely in the networks (G label embedding,
# D label planes — GAN.py:326-369), and the train step closes dis_fn over
# the labels before the loss ever sees it, so the stronger unconditional
# objectives apply verbatim: these entries reuse the exact
# relativistic-hinge / logistic(+R1) functions above with label-aware
# scores.  get_loss gates them behind conditional=True.


# ---------------------------------------------------------------------------
# registry (names match reference GAN.py:535-555)
# ---------------------------------------------------------------------------

LOSSES = {
    "standard-gan": (standard_dis_loss, standard_gen_loss),
    "hinge": (hinge_dis_loss, hinge_gen_loss),
    "relativistic-hinge": (relativistic_hinge_dis_loss,
                           relativistic_hinge_gen_loss),
    "logistic": (logistic_dis_loss, logistic_gen_loss),
    "wgan": (wgan_dis_loss, wgan_gen_loss),
    "wgan-gp": (wgan_gp_dis_loss, wgan_gp_gen_loss),
    "conditional-loss": (conditional_dis_loss, conditional_gen_loss),
    "conditional-relativistic-hinge": (relativistic_hinge_dis_loss,
                                       relativistic_hinge_gen_loss),
    "conditional-logistic": (logistic_dis_loss, logistic_gen_loss),
}

# losses whose dis_loss needs a PRNG key (GP interpolates)
NEEDS_KEY = {"wgan-gp"}

# losses that ARE the logistic objective (R1 knobs — r1_gamma, lazy
# interval, separate-reg — apply to these)
LOGISTIC_LIKE = ("logistic", "conditional-logistic")


def get_loss(name: str, conditional: bool = False):
    name = name.lower()
    if conditional:
        assert name in ("conditional-loss", "conditional-relativistic-hinge",
                        "conditional-logistic"), \
            f"Unknown conditional loss {name}"
    else:
        assert name in ("logistic", "hinge", "standard-gan",
                        "relativistic-hinge", "wgan", "wgan-gp"), \
            f"Unknown loss {name}"
    return LOSSES[name]
