"""Progressive-growing trainer (reference StyleGAN wrapper, GAN.py:447-826).

Host-side orchestration only — all math lives in the per-depth compiled step
(steps.py).  The progressive schedule (per-depth epochs/batch sizes/fade-in)
follows the reference exactly: alpha ramps linearly over the first
``fade_in_percentage`` of a depth's batches (GAN.py:748-753), reals are
fade-blended on device, feedback grids come from the EMA shadow generator in
train-mode sampling (GAN.py:786-793), checkpoints are written per the same
cadence and naming scheme (GAN.py:803-824; `.npz` instead of `.pth`).
"""

from __future__ import annotations

import datetime
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_data_loader
from ..data.loader import device_prefetch
from ..io import checkpoint as ckpt
from ..io.image import save_image_grid
from ..models import (discriminator_init, generator_init)
from ..models.configs import (discriminator_config_from_args,
                              generator_config_from_args)
from .state import (create_train_state, make_d_optimizer, make_g_optimizer)
from .steps import build_sample_fn, build_train_step


class StyleGAN:
    """Generator+Discriminator training wrapper (API mirror of the reference
    StyleGAN class; `device` is replaced by an optional jax Mesh for
    data-parallel training)."""

    def __init__(self, structure, resolution, num_channels, latent_size,
                 g_args, d_args, g_opt_args, d_opt_args, conditional=False,
                 n_classes=0, loss="relativistic-hinge", drift=0.001,
                 d_repeats=1, use_ema=False, ema_decay=0.999,
                 mesh=None, max_devices=None, seed=0,
                 activations_dtype="float32", packed_layout=False,
                 fold_blur="auto",
                 r1_interval=1, r1_gamma=10.0, r1_separate_reg=False,
                 remat_blocks=False,
                 spatial_devices=0, mbstd_scope=None, fuse_scores=False,
                 reuse_g_fwd=False):
        """mesh: a fixed jax Mesh for every step (caller guarantees batch
        divisibility), or None.  max_devices: adaptive data parallelism —
        each step uses the largest mesh (<= max_devices) that its global
        batch divides, so early progressive depths (batch 128) use every
        chip while the deepest stages (batch 4/2) shrink gracefully instead
        of capping the whole run."""
        assert structure in ["fixed", "linear"]
        if conditional:
            assert n_classes > 0, "Conditional GANs require n_classes > 0"

        self.structure = structure
        self.depth = int(np.log2(resolution)) - 1
        self.latent_size = latent_size
        self.d_repeats = d_repeats
        self.conditional = conditional
        self.n_classes = n_classes
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.mesh = mesh
        self.max_devices = max_devices
        # deep-tail scaling: when the (mbstd-capped) data axis leaves chips
        # idle, shard the image height over up to `spatial_devices` of them
        # via the 2-D GSPMD step (steps.build_gspmd_train_step).  0/1 = off.
        self.spatial_devices = int(spatial_devices or 0)
        # minibatch-stddev scope: None = each step's natural semantics
        # (shard_map shard-local / GSPMD global); 'local'|'global' pin ONE
        # semantic across every step so adaptive mesh switches at depth
        # transitions never change D's statistic mid-run (VERDICT r2 #5).
        assert mbstd_scope in (None, "auto", "local", "global"), mbstd_scope
        self.mbstd_scope = None if mbstd_scope == "auto" else mbstd_scope
        # perf knobs (train/steps.py): fused real/fake scoring (exact math)
        # and the single-G-forward step (documented semantic deltas)
        self.fuse_scores = bool(fuse_scores)
        self.reuse_g_fwd = bool(reuse_g_fwd)
        self._mesh_cache = {}
        # bf16 activations / f32 params+optimizer: params stay f32 and are
        # cast at apply time (ops cast weights to the activation dtype);
        # reals and latents enter the step in this dtype.
        self.activations_dtype = jnp.dtype(activations_dtype)
        # a string registry name, or a (dis_loss_fn, gen_loss_fn) pair (the
        # counterpart of the reference accepting a GANLoss instance)
        self.loss_name = loss if isinstance(loss, (str, tuple)) \
            else "relativistic-hinge"
        # drift penalty coefficient; used by wgan/wgan-gp (the reference
        # stores it but never implements those losses — GAN.py:464-470, 517)
        self.drift = drift
        # lazy R1 (beyond-reference, logistic loss only): apply the R1
        # penalty every `r1_interval` updates with gamma scaled by the
        # interval — same time-averaged penalty, but the grad-of-grad (the
        # dominant 1024^2 step cost) is paid 1/interval of the time.
        # interval 1 == the reference's every-step R1, bit-for-bit.
        # r1_gamma is the BASE (per-step-equivalent) coefficient; the
        # interval scaling in _get_step composes with it.
        self.r1_interval = int(r1_interval)
        self.r1_gamma = float(r1_gamma)
        assert self.r1_interval >= 1, \
            f"r1_interval must be >= 1 (got {r1_interval}); R1 itself is " \
            "part of the logistic loss — pick a different loss to disable it"
        if self.r1_interval > 1:
            assert self.loss_name in ("logistic", "conditional-logistic"), \
                "r1_interval > 1 requires the logistic loss"
        # StyleGAN2's full lazy-regularization dynamics: R1 becomes a
        # SEPARATE Adam update after the main D update (steps.reg_update)
        # and the D optimizer hyperparams get the official N/(N+1)
        # lr/beta correction — Adam's second moment no longer sees the
        # folded every-N gradient spike (the DESIGN.md caveat on large N).
        self.r1_separate_reg = bool(r1_separate_reg)
        if self.r1_separate_reg:
            assert self.loss_name in ("logistic", "conditional-logistic"), \
                "r1_separate_reg requires the logistic loss"
            from .state import lazy_reg_adam_correction
            d_opt_args = lazy_reg_adam_correction(dict(d_opt_args),
                                                  self.r1_interval)
        self._update_count = 0

        self.gen_cfg = generator_config_from_args(
            structure, resolution, num_channels, latent_size, conditional,
            n_classes, g_args)
        self.dis_cfg = discriminator_config_from_args(
            structure, resolution, num_channels, conditional, n_classes,
            d_args)
        # 'auto' = OFF in the trainer: the fold is a measured +2.1% on
        # synthesis forward but a net LOSS on the train step (-1.4% G /
        # -7.7% D plain, ~-10% each under R1 — the border corrections'
        # backward outweighs the saved blur pass; docs/DESIGN.md round
        # 4).  Generation CLIs resolve 'auto' to ON (models/configs.py).
        # Applied independently of packed_layout: 'all' targets the
        # UNPACKED C>=64 fused stages too.
        fold = False if fold_blur == "auto" else fold_blur
        if fold:
            from dataclasses import replace
            self.gen_cfg = replace(self.gen_cfg, synthesis=replace(
                self.gen_cfg.synthesis, fold_blur=fold))
            self.dis_cfg = replace(self.dis_cfg, fold_blur=fold)
        if packed_layout:
            # space-to-depth packed execution for the low-channel stages
            # (ops/packed.py) — a layout choice, not an architecture change;
            # params/checkpoints are identical either way.
            from dataclasses import replace
            self.gen_cfg = replace(self.gen_cfg, synthesis=replace(
                self.gen_cfg.synthesis, packed=True))
            self.dis_cfg = replace(self.dis_cfg, packed=True)
        if remat_blocks:
            # rematerialize G/D blocks in backward (jax.checkpoint): lower
            # peak HBM per train step for one extra block forward each
            from dataclasses import replace
            self.gen_cfg = replace(self.gen_cfg, synthesis=replace(
                self.gen_cfg.synthesis, remat=True))
            self.dis_cfg = replace(self.dis_cfg, remat=True)

        key = jax.random.PRNGKey(seed)
        k_g, k_d, self._key = jax.random.split(key, 3)
        g_params = generator_init(k_g, self.gen_cfg)
        d_params = discriminator_init(k_d, self.dis_cfg)

        self.g_tx = make_g_optimizer(**dict(g_opt_args))
        self.d_tx = make_d_optimizer(**dict(d_opt_args))
        self.state = create_train_state(g_params, d_params, self.g_tx,
                                        self.d_tx, use_ema=use_ema)
        self._steps = {}        # depth -> compiled fused train step
        self._sample_fns = {}   # depth -> compiled sampler

    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _mesh_for_batch(self, batch_size: int):
        """Fixed mesh if given; else the largest adaptive mesh the batch
        divides (None = single device).

        Minibatch-stddev groups are shard-local, so the adaptive mesh is
        additionally capped so every shard holds at least one full stddev
        group (per-device batch >= mbstd_group_size).  Without the cap a
        deep stage like batch 8 over 8 chips gives per-shard batch 1, the
        group degenerates to size 1 and the stddev feature collapses to a
        constant — silently removing D's anti-collapse signal vs the
        reference's group=min(4, B) semantics (CustomLayers.py:294)."""
        if self.mesh is not None:
            return self.mesh
        if not self.max_devices or self.max_devices <= 1:
            return None
        from ..parallel.mesh import compatible_mesh_size, create_mesh
        group = max(1, int(getattr(self.dis_cfg, "mbstd_group_size", 1)))
        cap = min(self.max_devices, max(1, batch_size // group))
        n = compatible_mesh_size(cap, [batch_size])
        if n <= 1:
            return None
        if n not in self._mesh_cache:
            self._mesh_cache[n] = create_mesh(n)
        return self._mesh_cache[n]

    def _mesh_for_step(self, batch_size: int, depth: int):
        """Mesh for the fused train step at this (batch, depth): the 1-D
        data mesh, upgraded to a 2-D (data, spatial) mesh when
        spatial_devices is set and the data axis leaves chips idle (the
        deep progressive tail, where batch 4/2 caps data parallelism)."""
        data_mesh = self._mesh_for_batch(batch_size)
        if (self.spatial_devices <= 1 or self.mesh is not None
                or not self.max_devices):
            return data_mesh
        data_n = data_mesh.size if data_mesh is not None else 1
        # cap by REAL device count too: max_devices/--num_devices passes
        # through uncapped, and a silently truncated device list would fail
        # later with an obscure reshape error instead of a clear bound here
        avail = min(self.max_devices, len(jax.devices()))
        budget = min(self.spatial_devices, avail // data_n)
        res = 2 ** (depth + 2)
        sp_n = budget
        while sp_n > 1 and res % (sp_n * 4) != 0:
            sp_n -= 1
        if sp_n <= 1:
            return data_mesh
        key = ("sp", data_n, sp_n)
        if key not in self._mesh_cache:
            import numpy as _np
            from jax.sharding import Mesh
            devs = _np.asarray(jax.devices()[:data_n * sp_n])
            self._mesh_cache[key] = Mesh(devs.reshape(data_n, sp_n),
                                         ("data", "spatial"))
        return self._mesh_cache[key]

    def _ensure_placement(self, mesh):
        """Re-place the train state when the adaptive mesh changes (arrays
        replicated over an 8-device mesh can't feed a 2-device shard_map);
        happens once per depth transition."""
        if getattr(self, "_last_mesh", "unset") is mesh:
            return
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        target = (NamedSharding(mesh, P()) if mesh is not None
                  else jax.devices()[0])
        self.state = jax.device_put(self.state, target)
        self._last_mesh = mesh

    def _get_step(self, depth: int, mesh, with_r1: bool = True):
        """Compiled fused step for (depth, mesh).  Under lazy R1 two
        programs exist per key: the regularized one (gamma * interval) and a
        gamma=0 one with no grad-of-grad at all.  A 2-D (data, spatial)
        mesh selects the GSPMD step (note: its minibatch-stddev groups span
        the global batch — the reference's exact per-minibatch semantics —
        whereas the shard_map data path keeps them shard-local)."""
        lazy = self.r1_interval > 1
        spatial = mesh is not None and "spatial" in mesh.axis_names
        mesh_key = (("gspmd",) + tuple(mesh.devices.shape) if spatial
                    else (mesh.size if mesh is not None else 1))
        key = (depth, mesh_key, with_r1 if lazy else True)
        if key not in self._steps:
            r1_gamma = None
            if lazy:
                r1_gamma = self.r1_gamma * self.r1_interval if with_r1 else 0.0
            elif self.loss_name in ("logistic", "conditional-logistic") \
                    and self.r1_gamma != 10.0:
                r1_gamma = self.r1_gamma  # non-default gamma, every-step R1
            # separate-reg only on programs that actually carry the penalty
            # (the lazy gamma=0 program has no reg pass at all)
            separate = self.r1_separate_reg and (with_r1 or not lazy)
            if separate and r1_gamma is None:
                r1_gamma = self.r1_gamma
            common = dict(depth=depth, loss=self.loss_name,
                          d_repeats=self.d_repeats, use_ema=self.use_ema,
                          ema_decay=self.ema_decay,
                          conditional=self.conditional, drift=self.drift,
                          r1_gamma=r1_gamma, r1_separate_reg=separate,
                          mbstd_scope=self.mbstd_scope,
                          fuse_scores=self.fuse_scores,
                          reuse_g_fwd=self.reuse_g_fwd)
            if spatial:
                from .steps import build_gspmd_train_step
                # fused scoring off under GSPMD: the concat batch would
                # reshard mid-D (correct but slower); steps.py docstring
                common = dict(common, fuse_scores=False)
                self._steps[key] = build_gspmd_train_step(
                    self.gen_cfg, self.dis_cfg, self.g_tx, self.d_tx,
                    mesh=mesh, **common)
            else:
                self._steps[key] = build_train_step(
                    self.gen_cfg, self.dis_cfg, self.g_tx, self.d_tx,
                    mesh=mesh, **common)
        return self._steps[key]

    def _get_sample_fn(self, depth: int):
        if depth not in self._sample_fns:
            self._sample_fns[depth] = build_sample_fn(self.gen_cfg, depth=depth)
        return self._sample_fns[depth]

    # ------------------------------------------------------------------
    # Reference-parity single-network update API (GAN.py:591-659): usable for
    # custom loops, though the fused train_on_batch is the fast path (one
    # compiled program, donated state).
    def optimize_discriminator(self, noise, real_batch, depth, alpha,
                               labels=None):
        from .steps import build_d_step
        mesh = self._mesh_for_batch(real_batch.shape[0])
        if mesh is not None and "spatial" in mesh.axis_names:
            raise NotImplementedError(
                "the split optimize_discriminator/optimize_generator API is "
                "data-parallel only; 2-D (data, spatial) meshes run through "
                "the fused train_on_batch")
        self._ensure_placement(mesh)
        key = ("d", depth, mesh.size if mesh is not None else 1)
        if key not in self._steps:
            self._steps[key] = build_d_step(
                self.gen_cfg, self.dis_cfg, self.d_tx, depth=depth,
                loss=self.loss_name, d_repeats=self.d_repeats,
                conditional=self.conditional, drift=self.drift,
                mesh=mesh)
        args = (self.state.d_params, self.state.d_opt_state,
                self.state.g_params, jnp.asarray(real_batch),
                jnp.asarray(noise), self._next_key(), jnp.float32(alpha))
        if self.conditional:
            args = args + (jnp.asarray(labels),)
        d_params, d_opt_state, avg, loss = self._steps[key](*args)
        g_params = self.state.g_params
        if avg is not None and "truncation" in g_params:
            g_params = dict(g_params)
            g_params["truncation"] = {"avg_latent": avg}
        self.state = self.state._replace(d_params=d_params,
                                         d_opt_state=d_opt_state,
                                         g_params=g_params)
        return float(loss)

    def optimize_generator(self, noise, real_batch, depth, alpha, labels=None):
        from .steps import build_g_step
        mesh = self._mesh_for_batch(real_batch.shape[0])
        if mesh is not None and "spatial" in mesh.axis_names:
            raise NotImplementedError(
                "the split optimize_discriminator/optimize_generator API is "
                "data-parallel only; 2-D (data, spatial) meshes run through "
                "the fused train_on_batch")
        self._ensure_placement(mesh)
        key = ("g", depth, mesh.size if mesh is not None else 1)
        if key not in self._steps:
            self._steps[key] = build_g_step(
                self.gen_cfg, self.dis_cfg, self.g_tx, depth=depth,
                loss=self.loss_name, use_ema=self.use_ema,
                ema_decay=self.ema_decay, conditional=self.conditional,
                mesh=mesh)
        args = (self.state.g_params, self.state.g_opt_state,
                self.state.g_shadow, self.state.d_params,
                jnp.asarray(real_batch), jnp.asarray(noise),
                self._next_key(), jnp.float32(alpha))
        if self.conditional:
            args = args + (jnp.asarray(labels),)
        g_params, g_opt_state, g_shadow, loss = self._steps[key](*args)
        self.state = self.state._replace(g_params=g_params,
                                         g_opt_state=g_opt_state,
                                         g_shadow=g_shadow)
        return float(loss)

    @staticmethod
    def create_grid(samples, scale_factor, img_file):
        """Save a sample grid (reference GAN.py:661-680)."""
        save_image_grid(adjust01(samples), img_file,
                        scale_factor=int(scale_factor))

    # ------------------------------------------------------------------
    def train_on_batch(self, images, depth, alpha, labels=None, fetch=True):
        """One fused D+G update on a batch of full-res reals.

        Single process: `images` is the full global batch.  Multi-host
        (jax.process_count() > 1, after parallel.initialize_distributed):
        `images` is this process's *local shard* of the global batch (the
        loader's per-host stripe; global batch = local * host_count), and the
        trainer requires a fixed mesh spanning all global devices.

        fetch=False returns the loss scalars as device arrays WITHOUT
        blocking on them: through the tunneled backend a per-step float()
        costs a full host round trip (~0.1-0.2 s — 2-3x the 128^2 step's
        own compute), so a loop that defers the fetch to its logging
        cadence pipelines steps back-to-back on the device.  Call float()
        on the returned scalars whenever a number is actually needed."""
        nproc = jax.process_count()
        global_batch = images.shape[0] * nproc
        if self.mesh is not None:
            # fixed meshes may be 2-D ('data', 'spatial'): the batch only
            # has to divide the data axis, height handles the rest
            data_n = (self.mesh.shape["data"]
                      if "spatial" in self.mesh.axis_names else self.mesh.size)
            if global_batch % data_n != 0:
                raise ValueError(
                    f"global batch {global_batch} must divide evenly over "
                    f"the mesh's {data_n}-device data axis (adjust "
                    "sched.batch_sizes or the mesh, or use max_devices= for "
                    "adaptive meshes)")
        if nproc > 1 and self.mesh is None:
            raise ValueError(
                "multi-host training requires a fixed global mesh "
                "(StyleGAN(mesh=create_mesh()) after initialize_distributed)"
                " — adaptive max_devices meshes are single-process only")
        mesh = self._mesh_for_step(global_batch, depth)
        spatial = mesh is not None and "spatial" in mesh.axis_names
        if nproc > 1 and spatial:
            # each host's local images carry their full height, so every
            # spatial shard of a data row must live on that row's process
            di = mesh.axis_names.index("data")
            rows = np.moveaxis(mesh.devices, di, 0).reshape(
                mesh.shape["data"], -1)
            if any(len({d.process_index for d in row}) != 1 for row in rows):
                raise ValueError(
                    "multi-host (data, spatial) meshes need process-aligned "
                    "data rows (reshape jax.devices() so each host's devices "
                    "form whole rows)")
        self._ensure_placement(mesh)
        with_r1 = (self._update_count % self.r1_interval) == 0
        self._update_count += 1
        step = self._get_step(depth, mesh, with_r1)
        key = self._next_key()
        dt = self.activations_dtype
        if nproc > 1:
            from jax.sharding import PartitionSpec as P

            from ..parallel.distributed import global_shard
            # each host draws only its own stripe of the global z
            z_local = jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(key, 0xBEEF),
                                   jax.process_index()),
                (images.shape[0], self.latent_size), dt)
            reals_spec = (P("data", "spatial", None, None) if spatial
                          else P("data"))
            reals = global_shard(mesh, np.asarray(images, dt),
                                 spec=reals_spec)
            z = global_shard(mesh, np.asarray(z_local))
        else:
            z = jax.random.normal(jax.random.fold_in(key, 0xBEEF),
                                  (global_batch, self.latent_size), dt)
            reals = jnp.asarray(images, dt)
        args = (self.state, reals, z, key, jnp.float32(alpha))
        if self.conditional:
            labels_dev = (global_shard(mesh, np.asarray(labels))
                          if nproc > 1 else jnp.asarray(labels))
            args = args + (labels_dev,)
        self.state, metrics = step(*args)
        if not fetch:
            return metrics["d_loss"], metrics["g_loss"]
        return float(metrics["d_loss"]), float(metrics["g_loss"])

    def sample(self, depth, alpha, num_samples=None, z=None, labels=None,
               update_shadow_avg=True):
        """Feedback sampling through the EMA shadow generator, train-mode
        semantics like the reference (GAN.py:786-793)."""
        fn = self._get_sample_fn(depth)
        params = self.state.g_shadow if (self.use_ema and
                                         self.state.g_shadow is not None) \
            else self.state.g_params
        if z is None:
            z = jax.random.normal(self._next_key(),
                                  (num_samples, self.latent_size))
        images, new_avg = fn(params, z, self._next_key(), jnp.float32(alpha),
                             labels)
        if update_shadow_avg and new_avg is not None and self.use_ema \
                and self.state.g_shadow is not None:
            shadow = dict(self.state.g_shadow)
            shadow["truncation"] = {"avg_latent": new_avg}
            self.state = self.state._replace(g_shadow=shadow)
        return np.asarray(images)

    # ------------------------------------------------------------------
    def train(self, dataset, num_workers, epochs, batch_sizes,
              fade_in_percentage, logger, output, num_samples=36,
              start_depth=0, feedback_factor=100, checkpoint_factor=1):
        """Progressive training loop (reference GAN.py:682-826)."""
        assert self.depth <= len(epochs), "epochs not compatible with depth"
        assert self.depth <= len(batch_sizes), \
            "batch_sizes not compatible with depth"
        assert self.depth <= len(fade_in_percentage), \
            "fade_in_percentage not compatible with depth"

        from ..utils.profiling import MetricsWriter
        metrics_writer = MetricsWriter(os.path.join(output, "metrics.jsonl"))
        window_t0 = time.perf_counter()
        window_imgs, window_steps = 0, 0
        abort_file = os.path.join(output, "abort.txt")

        global_time = time.time()
        fixed_input = jax.random.normal(jax.random.PRNGKey(42),
                                        (num_samples, self.latent_size))
        fixed_labels = None
        if self.conditional:
            fixed_labels = jnp.asarray(np.linspace(
                0, self.n_classes - 1, num_samples).astype(np.int64))

        logger.info("Starting the training process ... \n")
        if self.structure == "fixed":
            start_depth = self.depth - 1
        step_count = 1
        for current_depth in range(start_depth, self.depth):
            current_res = 2 ** (current_depth + 2)
            logger.info("Currently working on depth: %d", current_depth + 1)
            logger.info("Current resolution: %d x %d", current_res, current_res)
            ticker = 1
            data = get_data_loader(dataset, batch_sizes[current_depth],
                                   num_workers)
            for epoch in range(1, epochs[current_depth] + 1):
                start = time.time()
                logger.info("Epoch: [%d]", epoch)
                total_batches = len(data)
                fade_point = int((fade_in_percentage[current_depth] / 100)
                                 * epochs[current_depth] * total_batches)

                for i, batch in enumerate(device_prefetch(iter(data)), 1):
                    alpha = ticker / fade_point if ticker <= fade_point else 1
                    if self.conditional:
                        images, labels = batch
                    else:
                        images, labels = batch, None
                    # deferred fetch: losses stay device-side except at the
                    # feedback cadence, so steps pipeline without paying a
                    # host round trip each (2-3x wall at 128^2 through the
                    # tunnel; reference semantics are unchanged — it also
                    # only *reports* at feedback points, GAN.py:758-776)
                    dis_loss, gen_loss = self.train_on_batch(
                        images, current_depth, alpha, labels, fetch=False)
                    window_imgs += len(images)
                    window_steps += 1

                    if i % int(total_batches / feedback_factor + 1) == 0 \
                            or i == 1:
                        # float() blocks until every pipelined step landed,
                        # so window wall time / window images is the honest
                        # throughput (a per-step EMA would average tiny
                        # dispatch times against one big fetch stall)
                        dis_loss, gen_loss = float(dis_loss), float(gen_loss)
                        now = time.perf_counter()
                        ips = (window_imgs / (now - window_t0)
                               if now > window_t0 and i > 1 else None)
                        step_time = ((now - window_t0) / max(1, window_steps)
                                     if i > 1 else None)
                        window_t0, window_imgs, window_steps = now, 0, 0
                        elapsed = str(datetime.timedelta(
                            seconds=time.time() - global_time)).split(".")[0]
                        logger.info(
                            "Elapsed: [%s] Step: %d  Batch: %d  "
                            "D_Loss: %f  G_Loss: %f  imgs/s: %s",
                            elapsed, step_count, i, dis_loss, gen_loss,
                            f"{ips:.1f}" if ips else "n/a")
                        metrics_writer.write(
                            step=step_count, depth=current_depth, epoch=epoch,
                            batch=i, alpha=float(alpha), d_loss=dis_loss,
                            g_loss=gen_loss,
                            step_time=step_time, imgs_per_sec=ips)
                        os.makedirs(os.path.join(output, "samples"),
                                    exist_ok=True)
                        grid_file = os.path.join(
                            output, "samples",
                            f"gen_{current_depth}_{epoch}_{i}.png")
                        samples = self.sample(current_depth, alpha,
                                              z=fixed_input,
                                              labels=fixed_labels)
                        scale = (2 ** (self.depth - current_depth - 1)
                                 if self.structure == "linear" else 1)
                        save_image_grid(
                            adjust01(samples), grid_file, scale_factor=scale)
                    ticker += 1
                    step_count += 1

                elapsed = str(datetime.timedelta(
                    seconds=time.time() - start)).split(".")[0]
                logger.info("Time taken for epoch: %s\n", elapsed)

                if epoch % checkpoint_factor == 0 or epoch == 1 \
                        or epoch == epochs[current_depth]:
                    self.save_checkpoints(output, current_depth, epoch, logger)

                # graceful stop: functional version of the reference's
                # abort.txt polling (dnnlib/submission/run_context.py:60-75)
                if os.path.exists(abort_file):
                    logger.info("abort.txt found — checkpointing and "
                                "stopping.\n")
                    self.save_checkpoints(output, current_depth, epoch, logger)
                    metrics_writer.close()
                    return
        metrics_writer.close()
        logger.info("Training completed.\n")

    # ------------------------------------------------------------------
    def save_checkpoints(self, output, depth, epoch, logger=None):
        save_dir = os.path.join(output, "models")
        os.makedirs(save_dir, exist_ok=True)
        tag = f"{depth}_{epoch}"
        meta = {"depth": depth, "epoch": epoch}
        ckpt.save_params(os.path.join(save_dir, f"GAN_GEN_{tag}.npz"),
                         self.state.g_params, meta)
        ckpt.save_params(os.path.join(save_dir, f"GAN_DIS_{tag}.npz"),
                         self.state.d_params, meta)
        ckpt.save_params(os.path.join(save_dir, f"GAN_GEN_OPTIM_{tag}.npz"),
                         self.state.g_opt_state, meta)
        ckpt.save_params(os.path.join(save_dir, f"GAN_DIS_OPTIM_{tag}.npz"),
                         self.state.d_opt_state, meta)
        if self.use_ema and self.state.g_shadow is not None:
            ckpt.save_params(
                os.path.join(save_dir, f"GAN_GEN_SHADOW_{tag}.npz"),
                self.state.g_shadow, meta)
        if logger:
            logger.info("Saved checkpoints to %s (tag %s)\n", save_dir, tag)

    def load_generator(self, path):
        from ..convert import load_generator_file
        self.state = self.state._replace(
            g_params=load_generator_file(self.state.g_params, path))

    def load_gen_shadow(self, path):
        from ..convert import load_generator_file
        if self.state.g_shadow is not None:
            self.state = self.state._replace(
                g_shadow=load_generator_file(self.state.g_shadow, path))

    def load_discriminator(self, path):
        from ..convert import load_discriminator_file
        self.state = self.state._replace(
            d_params=load_discriminator_file(self.state.d_params, path))

    def load_gen_optim(self, path):
        """Our .npz, or the reference's GAN_GEN_OPTIM_*.pth (torch Adam
        moments translated into optax — reference train.py:40-48)."""
        if path.endswith(".pth"):
            from ..convert.torch_optim import load_adam_state_file
            tree = load_adam_state_file(self.state.g_opt_state,
                                        self.state.g_params, path,
                                        "generator")
        else:
            tree, _ = ckpt.load_params_into(self.state.g_opt_state, path)
        self.state = self.state._replace(g_opt_state=tree)

    def load_dis_optim(self, path):
        if path.endswith(".pth"):
            from ..convert.torch_optim import load_adam_state_file
            tree = load_adam_state_file(self.state.d_opt_state,
                                        self.state.d_params, path,
                                        "discriminator")
        else:
            tree, _ = ckpt.load_params_into(self.state.d_opt_state, path)
        self.state = self.state._replace(d_opt_state=tree)

    # full-train-state checkpointing (one artifact instead of 5 files)
    def save_full_state(self, path, depth, epoch):
        # update_count preserves the lazy-R1 phase across resume (without it
        # a mid-interval resume would re-apply the scaled penalty early)
        ckpt.save_train_state(path, self.state,
                              {"depth": depth, "epoch": epoch,
                               "update_count": self._update_count})

    def restore_full_state(self, path):
        """Restore a save_full_state checkpoint; returns its metadata."""
        self.state, meta = ckpt.load_train_state(path, self.state)
        if meta.get("update_count") is not None:
            self._update_count = int(meta["update_count"])
        return meta


def adjust01(samples):
    """[-1,1] -> [0,1] for the grid writer."""
    return np.clip((np.asarray(samples) + 1.0) / 2.0, 0.0, 1.0)
