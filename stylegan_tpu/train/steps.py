"""Per-depth jitted train steps (the TPU-native heart of the framework).

Design (SURVEY.md §7): the reference's dynamic per-batch Python
(GAN.py:591-659) becomes one fused, compiled step per (depth, loss) pair —
depth, d_repeats, structure and loss are *static*; alpha is a traced scalar,
so the fade-in changes no programs.  A single step performs:

  reals' = progressive fade-in downsample                (GAN.py:557-589)
  d_repeats x { fake = stop_grad(G(z)); d-grad; Adam }   (GAN.py:591-622)
  g-grad on the same z; clip(10) + Adam; EMA update      (GAN.py:624-659)
  truncation W-average threaded through every G forward  (GAN.py:278)

Data parallelism: `build_train_step(..., mesh=...)` wraps the same body in
`jax.shard_map` over a 1-D 'data' mesh axis — batch sharded, params/state
replicated, gradients pmean'd over ICI, loss reductions made global via the
axis_name so an N-chip step computes exactly the single-chip math.  Minibatch
stddev stays shard-local (group = min(4, per-device batch)), matching the
reference's per-minibatch semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..losses import NEEDS_KEY, get_loss
from ..models import (discriminator_apply, ema_update, generator_apply)
from ..ops import avg_pool2d, upscale2d
from .state import TrainState

AXIS = "data"


def progressive_downsample(reals: jax.Array, total_depth: int, depth: int,
                           alpha, structure: str) -> jax.Array:
    """Fade-in downsampling of real images (reference GAN.py:557-589).

    reals: full-resolution NHWC batch; returns the current-depth resolution
    blended with a 2x-nearest-upsampled half-res version by alpha.
    """
    if structure == "fixed":
        return reals
    factor = 2 ** (total_depth - depth - 1)
    ds = avg_pool2d(reals, factor) if factor > 1 else reals
    if depth > 0:
        prior = upscale2d(avg_pool2d(reals, factor * 2))
        # keep the blend in the activation dtype: a strongly-typed f32 alpha
        # would otherwise promote the whole D pass to f32 under bf16
        return (alpha * ds + (1.0 - alpha) * prior).astype(reals.dtype)
    return ds


def _sync_avg(avg, axis_name):
    """Make the truncation W-average identical on every shard.

    Each shard computes it from its *local* dlatents[0, 0]; the reference
    single-device semantics use the global batch's element 0, which lives on
    shard 0 — broadcast that one so params never diverge across devices."""
    if avg is None:
        return None
    return jax.lax.all_gather(avg, axis_name)[0]


def _with_avg(g_params, avg):
    """Functionally swap the truncation moving-average leaf."""
    if avg is None or "truncation" not in g_params:
        return g_params
    out = dict(g_params)
    out["truncation"] = {"avg_latent": avg}
    return out


def build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, *, depth: int,
                     loss: str = "relativistic-hinge", d_repeats: int = 1,
                     use_ema: bool = True, ema_decay: float = 0.999,
                     conditional: bool = False, drift: float = 0.001,
                     mesh: Optional[Mesh] = None,
                     donate: bool = True, shard_rng: bool = True,
                     r1_gamma: Optional[float] = None,
                     r1_separate_reg: bool = False,
                     mbstd_scope: Optional[str] = None,
                     mbstd_chunks: int = 1,
                     fuse_scores: bool = False,
                     reuse_g_fwd: bool = False,
                     _return_body: bool = False):
    """Returns step(state, reals, z, key, alpha[, labels]) -> (state, metrics).

    reals: (B, R, R, C) at the *final* config resolution (device-side
    progressive downsampling, like the reference); z: (B, latent).

    r1_gamma overrides the logistic loss's R1 coefficient (default 10.0,
    reference Losses.py:195).  The trainer's lazy-R1 mode uses it to compile
    a gamma=0 step (no grad-of-grad at all — the penalty's double backward is
    the dominant cost at high resolution) plus a gamma*interval step applied
    every `interval` D updates, keeping the same time-averaged penalty
    gradient (Karras et al. 2020, "lazy regularization"; see docs/DESIGN.md
    for the optimizer-level caveat).

    r1_separate_reg applies the penalty as a SEPARATE Adam update after the
    main D update — StyleGAN2's lazy-regularization structure (the penalty's
    gradient spike no longer rides through the main loss's second-moment
    estimate).  The caller is expected to pair it with the official
    N/(N+1) lr/beta correction on the D optimizer
    (state.lazy_reg_adam_correction); the trainer does both when
    `r1_separate_reg` is set in the config.
    """
    # `loss` is a registry name, or a (dis_loss_fn, gen_loss_fn) pair — the
    # counterpart of the reference accepting a GANLoss instance (GAN.py:464)
    if isinstance(loss, tuple):
        dis_loss_fn, gen_loss_fn = loss
        loss = "custom"
    else:
        dis_loss_fn, gen_loss_fn = get_loss(loss, conditional)
    from ..losses import LOGISTIC_LIKE
    reg_gamma = None  # separate-pass R1 coefficient (StyleGAN2 lazy-reg)
    if r1_separate_reg:
        assert loss in LOGISTIC_LIKE, \
            "r1_separate_reg only applies to the logistic loss"
        from functools import partial
        from ..losses import logistic_dis_loss
        eff = 10.0 if r1_gamma is None else float(r1_gamma)
        if eff != 0.0:
            reg_gamma = eff
        dis_loss_fn = partial(logistic_dis_loss, r1_gamma=0.0)
    elif r1_gamma is not None:
        assert loss in LOGISTIC_LIKE, \
            "r1_gamma only applies to the logistic loss"
        from functools import partial
        from ..losses import logistic_dis_loss
        dis_loss_fn = partial(logistic_dis_loss, r1_gamma=float(r1_gamma))
    total_depth = dis_cfg.depth
    structure = dis_cfg.structure
    axis_name = AXIS if mesh is not None else None

    # minibatch-stddev scope (VERDICT r2 #5): None keeps the path's natural
    # semantics (shard_map = shard-local groups; single-device / GSPMD =
    # whole-visible-batch).  'global' under shard_map gathers the tiny 4x4
    # head input across the axis so the statistic equals the single-device
    # one; 'local' under GSPMD is expressed by the caller via mbstd_chunks
    # (build_gspmd_train_step sets chunks = n_data_shards).  Pinning a scope
    # keeps D's statistic identical when the adaptive trainer switches
    # between the shard_map and GSPMD steps at depth transitions.
    assert mbstd_scope in (None, "local", "global"), mbstd_scope
    mbstd_axis = AXIS if (mesh is not None and mbstd_scope == "global") \
        else None

    def dis_forward(d_params, images, alpha, labels):
        return discriminator_apply(dis_cfg, d_params, images, depth=depth,
                                   alpha=alpha, labels=labels,
                                   mbstd_axis=mbstd_axis,
                                   mbstd_chunks=mbstd_chunks)

    # fused real/fake scoring (perf knob, exact math): one batch-2B D pass
    # whose minibatch-stddev groups are chunked per half == the two separate
    # batch-B passes, at ~half the per-pass fixed cost (+6% full-step at
    # 1024^2).  Incompatible with the cross-shard mbstd gather ('global'
    # scope) and with GSPMD local chunking (the concat batch would shard
    # into mixed real/fake chunks).  Also skipped when in-loss R1 is active:
    # XLA CSEs the separate-mode D(reals) forward with R1's D(reals) pass,
    # and fusing breaks that CSE for a net slowdown (measured -5%).
    in_loss_r1 = (loss in LOGISTIC_LIKE and not r1_separate_reg
                  and (r1_gamma is None or r1_gamma != 0.0))
    r1_active = in_loss_r1 or reg_gamma is not None
    can_fuse = (fuse_scores and mbstd_axis is None and mbstd_chunks == 1
                and not r1_active)

    def make_dis_fn(d_params, alpha, labels):
        fn = lambda images: dis_forward(d_params, images, alpha, labels)
        if can_fuse:
            def score_pair(reals, fakes):
                b = reals.shape[0]
                both = jnp.concatenate([reals, fakes], axis=0)
                lab = (None if labels is None
                       else jnp.concatenate([labels, labels]))
                s = discriminator_apply(dis_cfg, d_params, both, depth=depth,
                                        alpha=alpha, labels=lab,
                                        mbstd_chunks=2)
                return s[:b], s[b:]
            fn.score_pair = score_pair
        return fn

    def run_dis_loss(dis_fn, reals_cur, fakes, key):
        if loss in NEEDS_KEY:  # wgan-gp: PRNG key for the GP interpolates
            return dis_loss_fn(dis_fn, reals_cur, fakes, axis_name,
                               key=jax.random.fold_in(key, 0x6B), drift=drift)
        if loss == "wgan":
            return dis_loss_fn(dis_fn, reals_cur, fakes, axis_name,
                               drift=drift)
        return dis_loss_fn(dis_fn, reals_cur, fakes, axis_name)

    def gen_forward(g_params, z, key, alpha, labels):
        return generator_apply(gen_cfg, g_params, z, depth=depth, alpha=alpha,
                               rng=key, train=True, labels=labels)

    # ---------------- discriminator update (one repeat) ------------------
    def d_loss(d_params, g_params, z, reals_cur, key, alpha, labels):
        out = gen_forward(g_params, z, key, alpha, labels)
        fakes = jax.lax.stop_gradient(out.images)
        dis_fn = make_dis_fn(d_params, alpha, labels)
        loss_val = run_dis_loss(dis_fn, reals_cur, fakes, key)
        return loss_val, out.avg_latent

    # ---------------- generator update ------------------------------------
    def g_loss(g_params, d_params, z, reals_cur, key, alpha, labels):
        out = gen_forward(g_params, z, key, alpha, labels)
        dis_fn = make_dis_fn(d_params, alpha, labels)
        loss_val = gen_loss_fn(dis_fn, reals_cur, out.images, axis_name)
        return loss_val, out.avg_latent

    d_grad = jax.value_and_grad(d_loss, has_aux=True)
    g_grad = jax.value_and_grad(g_loss, has_aux=True)

    def reg_update(d_params, d_opt_state, reals_cur, alpha, labels):
        """Separate R1 Adam update (StyleGAN2 lazy-reg Dreg phase): gradient
        of 0.5 * gamma * sum||dD/dx||^2 alone, through the same optimizer
        chain as the main update (official behavior — one optimizer, its
        hyperparams mb_ratio-corrected by the caller)."""
        from ..losses import r1_penalty

        def reg_loss(dp):
            dis_fn = make_dis_fn(dp, alpha, labels)
            return r1_penalty(dis_fn, reals_cur, axis_name) * (reg_gamma * 0.5)

        grads = jax.grad(reg_loss)(d_params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state

    def step_body(state: TrainState, reals, z, key, alpha, labels):
        if axis_name is not None:
            if shard_rng:
                # independent randomness per shard (noise, style mixing, GP):
                # a replicated key would duplicate the same draws on every
                # device, unlike the reference's independent per-sample randn
                key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        reals_cur = progressive_downsample(reals, total_depth, depth, alpha,
                                           structure)
        g_params, d_params = state.g_params, state.d_params
        d_opt_state = state.d_opt_state

        if reuse_g_fwd and d_repeats == 1:
            return _reused_fwd_tail(state, reals_cur, z, key, alpha, labels)

        # --- D: d_repeats repeats, fresh per-repeat noise (GAN.py:605-620)
        d_loss_total = 0.0
        for rep in range(d_repeats):
            k_rep = jax.random.fold_in(key, rep)
            (loss_val, new_avg), grads = d_grad(
                d_params, g_params, z, reals_cur, k_rep, alpha, labels)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                new_avg = _sync_avg(new_avg, axis_name)
            updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, updates)
            g_params = _with_avg(g_params, new_avg)
            d_loss_total = d_loss_total + loss_val
        d_loss_mean = d_loss_total / d_repeats
        if reg_gamma is not None:  # StyleGAN2 order: Dmain, then Dreg
            d_params, d_opt_state = reg_update(d_params, d_opt_state,
                                               reals_cur, alpha, labels)

        # --- G (same z, fresh key; GAN.py:624-659)
        k_g = jax.random.fold_in(key, d_repeats)
        (g_loss_val, new_avg), grads = g_grad(
            g_params, d_params, z, reals_cur, k_g, alpha, labels)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_avg = _sync_avg(new_avg, axis_name)
        g_updates, g_opt_state = g_tx.update(grads, state.g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        g_params = _with_avg(g_params, new_avg)

        g_shadow = state.g_shadow
        if use_ema and g_shadow is not None:
            g_shadow = ema_update(g_shadow, g_params, ema_decay)

        new_state = TrainState(g_params=g_params, d_params=d_params,
                               g_opt_state=g_opt_state,
                               d_opt_state=d_opt_state, g_shadow=g_shadow)
        metrics = {"d_loss": d_loss_mean, "g_loss": g_loss_val}
        if axis_name is not None:
            # built-in losses are already global-batch means (replicated), but
            # a custom (dis_loss_fn, gen_loss_fn) pair may ignore axis_name —
            # pmean makes the reported scalars well-defined either way (the
            # replicated out_spec would otherwise report one arbitrary shard)
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics

    def _reused_fwd_tail(state, reals_cur, z, key, alpha, labels):
        """Single-G-forward step (perf knob `reuse_g_fwd`, d_repeats == 1).

        G's forward activations are identical in the D phase (detached
        fakes) and the G phase (G params unchanged in between), so compute
        the forward ONCE via jax.vjp, feed its detached value to the D
        update, then pull the G parameter gradient through the stored vjp
        with the cotangent from the *updated* discriminator — the exact
        gradient of the usual G loss at the same point.  Two documented
        deviations from the reference's two-forward pattern: (1) per-layer
        noise / style-mixing draws are shared between the phases (the
        reference draws independently; same distribution, one draw), and
        (2) this reference's train-mode truncation quirk (GAN.py:291-293)
        reads the W-avg buffer the D phase just updated — here the single
        forward sees the one-step-stale buffer (beta=0.995 makes the
        per-step drift negligible).  Exactness with the quirks disabled is
        pinned by test_reuse_g_fwd_matches_recompute.  Saves a full G
        forward (~12% of the 1024^2 plain step)."""
        g_params, d_params = state.g_params, state.d_params
        k_shared = jax.random.fold_in(key, 0)

        def g_images(gp):
            out = gen_forward(gp, z, k_shared, alpha, labels)
            return out.images, out.avg_latent
        (fakes_val, new_avg), g_vjp = jax.vjp(g_images, g_params)
        fakes = jax.lax.stop_gradient(fakes_val)

        def d_only(dp):
            dis_fn = make_dis_fn(dp, alpha, labels)
            return run_dis_loss(dis_fn, reals_cur, fakes, k_shared)
        d_loss_val, d_grads = jax.value_and_grad(d_only)(d_params)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
            new_avg = _sync_avg(new_avg, axis_name)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state,
                                             d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        if reg_gamma is not None:  # StyleGAN2 order: Dmain, then Dreg
            d_params, d_opt_state = reg_update(d_params, d_opt_state,
                                               reals_cur, alpha, labels)

        def g_img_loss(imgs):
            dis_fn = make_dis_fn(d_params, alpha, labels)
            return gen_loss_fn(dis_fn, reals_cur, imgs, axis_name)
        g_loss_val, img_cot = jax.value_and_grad(g_img_loss)(fakes_val)
        avg_cot = None if new_avg is None else jnp.zeros_like(new_avg)
        (g_grads,) = g_vjp((img_cot, avg_cot))
        if axis_name is not None:
            g_grads = jax.lax.pmean(g_grads, axis_name)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state,
                                             g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        g_params = _with_avg(g_params, new_avg)

        g_shadow = state.g_shadow
        if use_ema and g_shadow is not None:
            g_shadow = ema_update(g_shadow, g_params, ema_decay)
        new_state = TrainState(g_params=g_params, d_params=d_params,
                               g_opt_state=g_opt_state,
                               d_opt_state=d_opt_state, g_shadow=g_shadow)
        metrics = {"d_loss": d_loss_val, "g_loss": g_loss_val}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics

    if conditional:
        def full(state, reals, z, key, alpha, labels):
            return step_body(state, reals, z, key, alpha, labels)
    else:
        def full(state, reals, z, key, alpha):
            return step_body(state, reals, z, key, alpha, None)

    if mesh is not None:
        state_spec = P()  # replicated
        data_spec = P(AXIS)
        if conditional:
            in_specs = (state_spec, data_spec, data_spec, P(), P(), data_spec)
        else:
            in_specs = (state_spec, data_spec, data_spec, P(), P())
        full = jax.shard_map(full, mesh=mesh, in_specs=in_specs,
                             out_specs=(state_spec, P()),
                             check_vma=False)

    if _return_body:
        return full
    return jax.jit(full, donate_argnums=(0,) if donate else ())


def build_gspmd_train_step(gen_cfg, dis_cfg, g_tx, d_tx, *, depth: int,
                           mesh: Mesh, loss: str = "relativistic-hinge",
                           donate: bool = True, **kw):
    """Fused train step over a 2-D ('data', 'spatial') mesh via GSPMD.

    The deep progressive stages train at global batches of 4/2, which caps
    the shard_map data axis at 4/2 chips exactly where the FLOPs live.  This
    variant shards reals over BOTH batch and height and lets XLA's GSPMD
    partitioner place every internal op: convs become spatially partitioned
    with halo exchange, loss reductions and minibatch-stddev reduce over the
    *global* batch automatically (the reference's per-minibatch semantics,
    with no axis_name plumbing), and parameter gradients all-reduce to
    replicated updates.  The traced program is exactly the single-device
    step body — sharding is pure annotation (the scaling-book recipe).

    The mesh must carry axes named 'data' and 'spatial'; batch must divide
    mesh.shape['data'] and the depth's resolution must divide
    4 * mesh.shape['spatial'].  Signature matches build_train_step's
    single-device form: step(state, reals, z, key, alpha[, labels]).

    mbstd_scope (via **kw): None/'global' = groups span the global batch
    (this path's natural semantics — the traced program sees the full batch);
    'local' = groups restricted to contiguous per-data-shard chunks, matching
    the shard_map path's statistic (no cross-shard comms: the chunks align
    with the `P('data')` sharding).
    """
    from jax.sharding import NamedSharding
    assert "data" in mesh.axis_names and "spatial" in mesh.axis_names, \
        f"gspmd mesh needs ('data', 'spatial') axes, got {mesh.axis_names}"
    res = 2 ** (depth + 2)
    n_sp = mesh.shape["spatial"]
    assert res % (n_sp * 4) == 0, \
        (f"depth-{depth} resolution {res} must divide over {n_sp} spatial "
         f"shards with at least 4 rows each")

    mbstd_scope = kw.pop("mbstd_scope", None)
    assert mbstd_scope in (None, "local", "global"), mbstd_scope
    mbstd_chunks = mesh.shape["data"] if mbstd_scope == "local" else 1

    # the raw (un-jitted) single-device step body, jitted here with sharded
    # arguments; GSPMD propagates the shardings through it
    fn = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=depth,
                          loss=loss, mesh=None, _return_body=True,
                          mbstd_chunks=mbstd_chunks, **kw)
    repl = NamedSharding(mesh, P())
    reals_sh = NamedSharding(mesh, P("data", "spatial", None, None))
    z_sh = NamedSharding(mesh, P("data", None))
    conditional = bool(kw.get("conditional", False))
    in_sh = (repl, reals_sh, z_sh, repl, repl)
    if conditional:
        in_sh = in_sh + (NamedSharding(mesh, P("data")),)
    return jax.jit(fn, in_shardings=in_sh, out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def build_d_step(gen_cfg, dis_cfg, d_tx, *, depth: int,
                 loss: str = "relativistic-hinge", d_repeats: int = 1,
                 conditional: bool = False, drift: float = 0.001,
                 mesh: Optional[Mesh] = None):
    """Standalone discriminator update (reference optimize_discriminator,
    GAN.py:591-622) for users running their own loop.  Signature:
    step(d_params, d_opt_state, g_params, reals, z, key, alpha[, labels])
    -> (d_params, d_opt_state, g_avg_latent, loss)."""
    if isinstance(loss, tuple):
        dis_loss_fn, loss = loss[0], "custom"
    else:
        dis_loss_fn, _ = get_loss(loss, conditional)
    total_depth = dis_cfg.depth
    axis_name = AXIS if mesh is not None else None

    def d_loss(d_params, g_params, z, reals_cur, key, alpha, labels):
        out = generator_apply(gen_cfg, g_params, z, depth=depth, alpha=alpha,
                              rng=key, train=True, labels=labels)
        fakes = jax.lax.stop_gradient(out.images)
        dis_fn = lambda imgs: discriminator_apply(
            dis_cfg, d_params, imgs, depth=depth, alpha=alpha, labels=labels)
        if loss in NEEDS_KEY:
            lv = dis_loss_fn(dis_fn, reals_cur, fakes, axis_name,
                             key=jax.random.fold_in(key, 0x6B), drift=drift)
        elif loss == "wgan":
            lv = dis_loss_fn(dis_fn, reals_cur, fakes, axis_name, drift=drift)
        else:
            lv = dis_loss_fn(dis_fn, reals_cur, fakes, axis_name)
        return lv, out.avg_latent

    grad_fn = jax.value_and_grad(d_loss, has_aux=True)

    def body(d_params, d_opt_state, g_params, reals, z, key, alpha, labels):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        reals_cur = progressive_downsample(reals, total_depth, depth, alpha,
                                           dis_cfg.structure)
        loss_total, avg = 0.0, None
        for rep in range(d_repeats):
            (lv, avg), grads = grad_fn(d_params, g_params, z, reals_cur,
                                       jax.random.fold_in(key, rep), alpha,
                                       labels)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                avg = _sync_avg(avg, axis_name)
            updates, d_opt_state = d_tx.update(grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, updates)
            g_params = _with_avg(g_params, avg)
            loss_total = loss_total + lv
        loss_mean = loss_total / d_repeats
        if axis_name is not None:
            loss_mean = jax.lax.pmean(loss_mean, axis_name)
        return d_params, d_opt_state, avg, loss_mean

    if conditional:
        fn = lambda dp, do, gp, r, z, k, a, lab: body(dp, do, gp, r, z, k, a, lab)
    else:
        fn = lambda dp, do, gp, r, z, k, a: body(dp, do, gp, r, z, k, a, None)

    if mesh is not None:
        rep, shd = P(), P(AXIS)
        in_specs = (rep, rep, rep, shd, shd, rep, rep) + ((shd,) if conditional else ())
        fn = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=(rep, rep, rep, rep), check_vma=False)
    return jax.jit(fn)


def build_g_step(gen_cfg, dis_cfg, g_tx, *, depth: int,
                 loss: str = "relativistic-hinge", use_ema: bool = True,
                 ema_decay: float = 0.999, conditional: bool = False,
                 mesh: Optional[Mesh] = None):
    """Standalone generator update (reference optimize_generator,
    GAN.py:624-659).  Signature:
    step(g_params, g_opt_state, g_shadow, d_params, reals, z, key, alpha
         [, labels]) -> (g_params, g_opt_state, g_shadow, loss)."""
    if isinstance(loss, tuple):
        gen_loss_fn = loss[1]
    else:
        _, gen_loss_fn = get_loss(loss, conditional)
    total_depth = dis_cfg.depth
    axis_name = AXIS if mesh is not None else None

    def g_loss(g_params, d_params, z, reals_cur, key, alpha, labels):
        out = generator_apply(gen_cfg, g_params, z, depth=depth, alpha=alpha,
                              rng=key, train=True, labels=labels)
        dis_fn = lambda imgs: discriminator_apply(
            dis_cfg, d_params, imgs, depth=depth, alpha=alpha, labels=labels)
        return gen_loss_fn(dis_fn, reals_cur, out.images, axis_name), out.avg_latent

    grad_fn = jax.value_and_grad(g_loss, has_aux=True)

    def body(g_params, g_opt_state, g_shadow, d_params, reals, z, key, alpha,
             labels):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        reals_cur = progressive_downsample(reals, total_depth, depth, alpha,
                                           dis_cfg.structure)
        (lv, avg), grads = grad_fn(g_params, d_params, z, reals_cur, key,
                                   alpha, labels)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            avg = _sync_avg(avg, axis_name)
        updates, g_opt_state = g_tx.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        g_params = _with_avg(g_params, avg)
        if use_ema and g_shadow is not None:
            g_shadow = ema_update(g_shadow, g_params, ema_decay)
        if axis_name is not None:
            lv = jax.lax.pmean(lv, axis_name)
        return g_params, g_opt_state, g_shadow, lv

    if conditional:
        fn = lambda gp, go, gs, dp, r, z, k, a, lab: body(gp, go, gs, dp, r, z, k, a, lab)
    else:
        fn = lambda gp, go, gs, dp, r, z, k, a: body(gp, go, gs, dp, r, z, k, a, None)

    if mesh is not None:
        rep, shd = P(), P(AXIS)
        in_specs = (rep, rep, rep, rep, shd, shd, rep, rep) + \
            ((shd,) if conditional else ())
        fn = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=(rep, rep, rep, rep), check_vma=False)
    return jax.jit(fn)


def build_sample_fn(gen_cfg, *, depth: int, train_semantics: bool = True):
    """Compiled sampling function for feedback grids and the generate CLIs.

    The reference samples with modules left in train mode (style mixing +
    truncation active, W-average updated on the shadow generator —
    GAN.py:710-793, generate_samples.py:77-104); train_semantics=True
    reproduces that.  Returns fn(params, z, key, alpha[, labels]) ->
    (images, new_avg).
    """
    def fn(params, z, key, alpha, labels=None):
        out = generator_apply(gen_cfg, params, z, depth=depth, alpha=alpha,
                              rng=key, train=train_semantics, labels=labels)
        return out.images, out.avg_latent

    return jax.jit(fn)
