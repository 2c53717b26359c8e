"""End-to-end progressive training smoke test on synthetic data, plus
checkpoint save/resume round trip."""

import logging
import os

import numpy as np
import pytest

import jax

from stylegan_tpu.data import SyntheticDataset
from stylegan_tpu.io import checkpoint as ckpt
from stylegan_tpu.train import StyleGAN

RES = 16


def make_trainer(tmp, structure="linear", loss="relativistic-hinge",
                 conditional=False, n_classes=0, use_ema=True, **kw):
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    return StyleGAN(structure=structure, resolution=RES, num_channels=3,
                    latent_size=64, g_args=g_args, d_args=d_args,
                    g_opt_args=opt_args, d_opt_args=opt_args,
                    conditional=conditional, n_classes=n_classes,
                    loss=loss, use_ema=use_ema, seed=0, **kw)


def test_progressive_training_end_to_end(tmp_path):
    out = str(tmp_path / "run")
    os.makedirs(out)
    trainer = make_trainer(out)
    dataset = SyntheticDataset(n=32, resolution=RES)
    logger = logging.getLogger("test")

    trainer.train(dataset=dataset, num_workers=2,
                  epochs=[1, 1, 1], batch_sizes=[8, 8, 8],
                  fade_in_percentage=[50, 50, 50], logger=logger,
                  output=out, num_samples=4, start_depth=0,
                  feedback_factor=2, checkpoint_factor=1)

    samples = os.listdir(os.path.join(out, "samples"))
    assert any(s.startswith("gen_0_") for s in samples)
    assert any(s.startswith("gen_2_") for s in samples)
    models = os.listdir(os.path.join(out, "models"))
    for stem in ["GAN_GEN_2_1", "GAN_DIS_2_1", "GAN_GEN_OPTIM_2_1",
                 "GAN_DIS_OPTIM_2_1", "GAN_GEN_SHADOW_2_1"]:
        assert f"{stem}.npz" in models, models

    # every param finite after training
    for leaf in jax.tree_util.tree_leaves(trainer.state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_resume_roundtrip(tmp_path):
    out = str(tmp_path / "run")
    os.makedirs(out)
    t1 = make_trainer(out)
    dataset = SyntheticDataset(n=16, resolution=RES)
    logger = logging.getLogger("test")
    t1.train(dataset=dataset, num_workers=1, epochs=[1, 1, 1],
             batch_sizes=[8, 8, 8], fade_in_percentage=[50, 50, 50],
             logger=logger, output=out, num_samples=4, start_depth=2,
             feedback_factor=1, checkpoint_factor=1)

    t2 = make_trainer(out)
    mdir = os.path.join(out, "models")
    t2.load_generator(os.path.join(mdir, "GAN_GEN_2_1.npz"))
    t2.load_discriminator(os.path.join(mdir, "GAN_DIS_2_1.npz"))
    t2.load_gen_shadow(os.path.join(mdir, "GAN_GEN_SHADOW_2_1.npz"))
    t2.load_gen_optim(os.path.join(mdir, "GAN_GEN_OPTIM_2_1.npz"))
    t2.load_dis_optim(os.path.join(mdir, "GAN_DIS_OPTIM_2_1.npz"))

    for a, b in zip(jax.tree_util.tree_leaves(t1.state.g_params),
                    jax.tree_util.tree_leaves(t2.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.g_opt_state),
                    jax.tree_util.tree_leaves(t2.state.g_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed trainer can keep training
    d, g = t2.train_on_batch(
        np.random.RandomState(0).randn(8, RES, RES, 3).astype(np.float32),
        depth=2, alpha=1.0)
    assert np.isfinite(d) and np.isfinite(g)


def test_partial_load_shallow_into_deep(tmp_path):
    """A shallow checkpoint loads into a deeper net; missing depth params
    keep their init (reference --start_depth resume, train.py:24-29)."""
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    shallow = StyleGAN(structure="linear", resolution=8, num_channels=3,
                       latent_size=64, g_args=g_args, d_args=d_args,
                       g_opt_args=opt_args, d_opt_args=opt_args, seed=1)
    p = str(tmp_path / "gen.npz")
    ckpt.save_params(p, shallow.state.g_params)

    deep = StyleGAN(structure="linear", resolution=32, num_channels=3,
                    latent_size=64, g_args=g_args, d_args=d_args,
                    g_opt_args=opt_args, d_opt_args=opt_args, seed=2)
    before = np.asarray(deep.state.g_params["g_synthesis"]["blocks"][2]
                        ["conv1"]["weight"]).copy()
    deep.load_generator(p)
    # shared init_block weights were overwritten
    np.testing.assert_array_equal(
        np.asarray(deep.state.g_params["g_synthesis"]["init_block"]["conv"]
                   ["weight"]),
        np.asarray(shallow.state.g_params["g_synthesis"]["init_block"]["conv"]
                   ["weight"]))
    # deeper block keeps its own init
    np.testing.assert_array_equal(
        np.asarray(deep.state.g_params["g_synthesis"]["blocks"][2]["conv1"]
                   ["weight"]), before)


def test_fixed_structure_training(tmp_path):
    """structure='fixed' trains only the final depth (GAN.py:727-728)."""
    out = str(tmp_path / "run_fixed")
    os.makedirs(out)
    trainer = make_trainer(out, structure="fixed")
    dataset = SyntheticDataset(n=16, resolution=RES)
    logger = logging.getLogger("test")
    trainer.train(dataset=dataset, num_workers=1, epochs=[1, 1, 1],
                  batch_sizes=[8, 8, 8], fade_in_percentage=[50, 50, 50],
                  logger=logger, output=out, num_samples=4, start_depth=0,
                  feedback_factor=1, checkpoint_factor=1)
    samples = os.listdir(os.path.join(out, "samples"))
    # only the last depth ran
    assert all(s.startswith("gen_2_") for s in samples) and samples


def test_full_state_resume(tmp_path):
    trainer = make_trainer(str(tmp_path))
    imgs = np.random.RandomState(7).randn(8, RES, RES, 3).astype(np.float32)
    trainer.train_on_batch(imgs, depth=2, alpha=1.0)
    path = str(tmp_path / "full_state")
    trainer.save_full_state(path, depth=2, epoch=3)

    t2 = make_trainer(str(tmp_path))
    meta = t2.restore_full_state(path)
    assert meta["depth"] == 2 and meta["epoch"] == 3
    assert meta["update_count"] == 1  # lazy-R1 phase rides along
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state),
                    jax.tree_util.tree_leaves(t2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_abort_file_stops_training(tmp_path):
    out = str(tmp_path / "run_abort")
    os.makedirs(out)
    with open(os.path.join(out, "abort.txt"), "w") as f:
        f.write("stop")
    trainer = make_trainer(out)
    dataset = SyntheticDataset(n=16, resolution=RES)
    logger = logging.getLogger("test")
    trainer.train(dataset=dataset, num_workers=1, epochs=[5, 5, 5],
                  batch_sizes=[8, 8, 8], fade_in_percentage=[50, 50, 50],
                  logger=logger, output=out, num_samples=4, start_depth=0,
                  feedback_factor=1, checkpoint_factor=1)
    samples = os.listdir(os.path.join(out, "samples"))
    # aborted after the first epoch of the first depth
    assert all(s.startswith("gen_0_1_") for s in samples)


def test_conditional_training_smoke(tmp_path):
    trainer = make_trainer(str(tmp_path), loss="conditional-loss",
                           conditional=True, n_classes=4)
    imgs = np.random.RandomState(1).randn(8, RES, RES, 3).astype(np.float32)
    labels = np.random.RandomState(2).randint(0, 4, size=8)
    d, g = trainer.train_on_batch(imgs, depth=1, alpha=0.5, labels=labels)
    assert np.isfinite(d) and np.isfinite(g)


def test_conditional_variant_losses(tmp_path):
    """Beyond-reference conditional objectives (VERDICT r4 #6) train through
    the full step: relativistic-hinge with labels, and logistic with labels
    including the lazy-R1 program pair (the R1 knobs treat
    conditional-logistic exactly like logistic)."""
    trainer = make_trainer(str(tmp_path / "crh"),
                           loss="conditional-relativistic-hinge",
                           conditional=True, n_classes=4)
    imgs = np.random.RandomState(1).randn(8, RES, RES, 3).astype(np.float32)
    labels = np.random.RandomState(2).randint(0, 4, size=8)
    d, g = trainer.train_on_batch(imgs, depth=1, alpha=0.5, labels=labels)
    assert np.isfinite(d) and np.isfinite(g)

    trainer2 = make_trainer(str(tmp_path / "clog"),
                            loss="conditional-logistic",
                            conditional=True, n_classes=4, r1_interval=2)
    for _ in range(3):
        d, g = trainer2.train_on_batch(imgs, depth=1, alpha=1.0,
                                       labels=labels)
        assert np.isfinite(d) and np.isfinite(g)
    keys = {k for k in trainer2._steps if isinstance(k, tuple) and len(k) == 3}
    assert keys == {(1, 1, True), (1, 1, False)}, keys
    for leaf in jax.tree_util.tree_leaves(trainer2.state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_lazy_r1_trainer(tmp_path):
    """r1_interval > 1 (logistic only): the trainer compiles a regularized
    and an unregularized program per depth, applies R1 on updates 0, N,
    2N, ... and trains stably."""
    trainer = make_trainer(str(tmp_path), loss="logistic", r1_interval=2)
    imgs = np.random.RandomState(3).randn(8, RES, RES, 3).astype(np.float32)
    for _ in range(4):
        d, g = trainer.train_on_batch(imgs, depth=1, alpha=1.0)
        assert np.isfinite(d) and np.isfinite(g)
    keys = {k for k in trainer._steps if isinstance(k, tuple) and len(k) == 3}
    assert keys == {(1, 1, True), (1, 1, False)}, keys
    for leaf in jax.tree_util.tree_leaves(trainer.state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()

    # non-logistic losses must refuse the knob; so must interval < 1
    with pytest.raises(AssertionError):
        make_trainer(str(tmp_path), loss="hinge", r1_interval=4)
    with pytest.raises(AssertionError):
        make_trainer(str(tmp_path), loss="logistic", r1_interval=0)

    # the R1 phase survives a full-state checkpoint round trip (a mid-
    # interval resume must not re-apply the scaled penalty early)
    path = str(tmp_path / "state.ckpt")
    trainer.save_full_state(path, depth=1, epoch=1)
    fresh = make_trainer(str(tmp_path), loss="logistic", r1_interval=2)
    assert fresh._update_count == 0
    fresh.restore_full_state(path)
    assert fresh._update_count == trainer._update_count == 4


def test_bf16_activation_training(tmp_path):
    """bf16 activations / f32 params: the perf path trains stably."""
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    trainer = StyleGAN(structure="linear", resolution=RES, num_channels=3,
                       latent_size=64, g_args=g_args, d_args=d_args,
                       g_opt_args=opt_args, d_opt_args=opt_args,
                       use_ema=True, seed=0, activations_dtype="bfloat16")
    imgs = np.random.RandomState(0).randn(8, RES, RES, 3).astype(np.float32)
    d, g = trainer.train_on_batch(imgs, depth=2, alpha=1.0)
    assert np.isfinite(d) and np.isfinite(g)
    # params remain f32
    leaf = jax.tree_util.tree_leaves(trainer.state.g_params)[0]
    assert np.asarray(leaf).dtype == np.float32


def test_adaptive_mesh_training(tmp_path):
    """max_devices: batch 32 shards over 8 CPU devices, batch 2 falls back to
    single device — both train in the same run (per-depth adaptive meshes)."""
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    trainer = StyleGAN(structure="linear", resolution=RES, num_channels=3,
                       latent_size=64, g_args=g_args, d_args=d_args,
                       g_opt_args=opt_args, d_opt_args=opt_args,
                       use_ema=True, seed=0, max_devices=8)
    rs = np.random.RandomState(0)
    d, g = trainer.train_on_batch(
        rs.randn(32, RES, RES, 3).astype(np.float32), depth=1, alpha=0.5)
    assert np.isfinite(d) and np.isfinite(g)
    assert trainer._mesh_for_batch(32).size == 8
    d, g = trainer.train_on_batch(
        rs.randn(2, RES, RES, 3).astype(np.float32), depth=1, alpha=0.5)
    assert np.isfinite(d) and np.isfinite(g)
    assert trainer._mesh_for_batch(2) is None
    # separate compiled steps cached per (depth, mesh size, r1 phase)
    assert (1, 8, True) in trainer._steps and (1, 1, True) in trainer._steps


def test_spatial_devices_deep_tail(tmp_path):
    """spatial_devices: a batch-2 step (data parallelism capped at 1 by the
    mbstd group) upgrades to a 2-D (data, spatial) GSPMD mesh and trains;
    a batch-32 step at the same depth keeps the plain 1-D data mesh."""
    trainer = make_trainer(str(tmp_path), max_devices=8, spatial_devices=4)
    rs = np.random.RandomState(5)

    d, g = trainer.train_on_batch(
        rs.randn(2, RES, RES, 3).astype(np.float32), depth=2, alpha=1.0)
    assert np.isfinite(d) and np.isfinite(g)
    mesh = trainer._mesh_for_step(2, 2)
    assert mesh is not None and "spatial" in mesh.axis_names
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == \
        {"data": 1, "spatial": 4}

    d, g = trainer.train_on_batch(
        rs.randn(32, RES, RES, 3).astype(np.float32), depth=2, alpha=1.0)
    assert np.isfinite(d) and np.isfinite(g)
    mesh32 = trainer._mesh_for_step(32, 2)
    # batch 32 / group 4 -> full 8-device data mesh, no idle chips to give
    # the spatial axis
    assert mesh32 is not None and mesh32.axis_names == ("data",)
    assert mesh32.size == 8

    for leaf in jax.tree_util.tree_leaves(trainer.state.g_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_adaptive_mesh_respects_stddev_group():
    """The adaptive mesh keeps per-device batch >= mbstd_group_size so the
    shard-local minibatch-stddev statistic never degenerates to group 1."""
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    trainer = StyleGAN(structure="linear", resolution=RES, num_channels=3,
                       latent_size=64, g_args=g_args, d_args=d_args,
                       g_opt_args=opt_args, d_opt_args=opt_args,
                       use_ema=False, seed=0, max_devices=8)
    assert trainer.dis_cfg.mbstd_group_size == 4
    # batch 8 over 8 devices would give per-shard batch 1 -> cap to 2 devices
    m = trainer._mesh_for_batch(8)
    assert m is not None and m.size == 2
    # batch 16 -> at most 4 devices (per-shard batch 4 = one full group)
    assert trainer._mesh_for_batch(16).size == 4
    # batch 4 and 2 -> single device, exactly the reference's group=min(4,B)
    assert trainer._mesh_for_batch(4) is None
    assert trainer._mesh_for_batch(2) is None


def test_separate_reg_trainer(tmp_path):
    """r1_separate_reg in the trainer: StyleGAN2's separate Dreg Adam update
    plus the N/(N+1) lr/beta correction on the D optimizer.  Same-seed
    trainers must diverge from the folded form on the regularized update,
    alternate stably, and refuse non-logistic losses."""
    t_sep = make_trainer(str(tmp_path), loss="logistic", r1_interval=2,
                         r1_separate_reg=True)
    t_fold = make_trainer(str(tmp_path), loss="logistic", r1_interval=2)
    imgs = np.random.RandomState(5).randn(8, RES, RES, 3).astype(np.float32)
    for _ in range(3):  # update 0 regularized, 1 plain, 2 regularized
        d1, g1 = t_sep.train_on_batch(imgs, depth=1, alpha=1.0)
        d2, g2 = t_fold.train_on_batch(imgs, depth=1, alpha=1.0)
        assert np.isfinite(d1) and np.isfinite(g1)
        assert np.isfinite(d2) and np.isfinite(g2)
    diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(
                   jax.tree_util.tree_leaves(t_sep.state.d_params),
                   jax.tree_util.tree_leaves(t_fold.state.d_params)))
    assert diff > 1e-7, diff

    with pytest.raises(AssertionError):
        make_trainer(str(tmp_path), loss="hinge", r1_separate_reg=True)
