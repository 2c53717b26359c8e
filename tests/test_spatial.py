"""Spatially-sharded synthesis (parallel/spatial.py): the H-sharded forward
over a virtual CPU mesh must equal the single-device forward — GSPMD halo
exchange for the 3x3 convs/blurs is a layout choice, not a math change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_apply,
                                 generator_init)
from stylegan_tpu.parallel import (build_spatial_sample_fn,
                                   create_spatial_mesh)

RES = 64  # supports up to 4 spatial shards (res % (n*4) == 0)


def make_cfg(packed=False):
    return GeneratorConfig(
        resolution=RES, latent_size=32, dlatent_size=32, truncation_psi=0.7,
        mapping=MappingConfig(latent_size=32, dlatent_size=32,
                              mapping_fmaps=32, mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, dlatent_size=32,
                                  fmap_base=256, fmap_max=64,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=packed))


@pytest.mark.parametrize("n_shards", [2, 4])
def test_spatial_matches_single_device(n_shards):
    cfg = make_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    depth = cfg.synthesis.depth - 1
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    key = jax.random.PRNGKey(2)

    ref = generator_apply(cfg, params, z, depth=depth, alpha=1.0, rng=key,
                          train=False).images

    mesh = create_spatial_mesh(n_shards)
    fn = build_spatial_sample_fn(cfg, mesh, depth=depth)
    out = fn(params, z, key)
    # output really is H-sharded over the mesh
    assert len(out.sharding.device_set) == n_shards
    # instance-norm spatial statistics become partial-sum + collective under
    # GSPMD, so reductions reassociate: near-equality, not bit-equality
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_spatial_with_packed_layout():
    """Spatial sharding composes with the space-to-depth packed layout (the
    real 1024^2 serving configuration): packed stages (res >= 128) reshape
    the sharded H axis, and GSPMD reshards through it correctly."""
    res = 128
    cfg = GeneratorConfig(
        resolution=res, latent_size=32, dlatent_size=32, truncation_psi=0.7,
        mapping=MappingConfig(latent_size=32, dlatent_size=32,
                              mapping_fmaps=32, mapping_layers=2,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, dlatent_size=32,
                                  fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=True))
    assert cfg.synthesis.packed_block(cfg.synthesis.depth - 2)
    params = generator_init(jax.random.PRNGKey(3), cfg)
    depth = cfg.synthesis.depth - 1
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 32))
    key = jax.random.PRNGKey(5)

    ref = generator_apply(cfg, params, z, depth=depth, alpha=1.0, rng=key,
                          train=False).images
    mesh = create_spatial_mesh(2)
    out = build_spatial_sample_fn(cfg, mesh, depth=depth)(params, z, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_spatial_rejects_too_many_shards():
    mesh = create_spatial_mesh(8)  # res 16 cannot split 8 ways
    with pytest.raises(AssertionError, match="spatial shards"):
        build_spatial_sample_fn(
            GeneratorConfig(
                resolution=16, latent_size=32, dlatent_size=32,
                mapping=MappingConfig(latent_size=32, dlatent_size=32,
                                      mapping_fmaps=32, mapping_layers=2,
                                      dlatent_broadcast=6),
                synthesis=SynthesisConfig(resolution=16, dlatent_size=32,
                                          fmap_base=256, fmap_max=64,
                                          structure="linear")),
            mesh, depth=2)


def test_spatial_hbm_estimate():
    from stylegan_tpu.parallel import spatial_hbm_estimate
    assert spatial_hbm_estimate(1024, 16, 8) == 1024 * 1024 * 16 * 2 / 8


def test_gspmd_train_step_matches_single_device():
    """2-D (data x spatial) GSPMD train step == the single-device step on
    the same inputs — the deep-tail scaling path (batch 2 over 8 chips)
    is a pure layout choice.  Same traced body, so RNG draws, global-batch
    loss means and global mbstd groups are identical by construction;
    only float reassociation from partitioned reductions differs."""
    from jax.sharding import Mesh
    from stylegan_tpu.models import discriminator_init
    from stylegan_tpu.models.configs import DiscriminatorConfig
    from stylegan_tpu.train import (build_gspmd_train_step, build_train_step,
                                    create_train_state)

    cfg = make_cfg()
    dis_cfg = DiscriminatorConfig(resolution=RES, fmap_base=256, fmap_max=64,
                                  blur_filter=(1, 2, 1), structure="linear")
    depth = dis_cfg.depth - 1  # 64^2: 4 spatial shards x 16 rows

    # SGD, not Adam: Adam's rsqrt(v) amplifies float-reassociation noise on
    # near-zero gradients into +-lr sign flips; with SGD the parameter delta
    # IS lr * grad, so this directly asserts gradient fidelity through the
    # partitioned backward (incl. R1's grad-of-grad)
    import optax

    def make_state():
        g_tx, d_tx = optax.sgd(0.01), optax.sgd(0.01)
        from stylegan_tpu.models import generator_init
        return create_train_state(
            generator_init(jax.random.PRNGKey(10), cfg),
            discriminator_init(jax.random.PRNGKey(11), dis_cfg),
            g_tx, d_tx, use_ema=True), g_tx, d_tx

    batch = 2  # the deep-tail case data parallelism cannot spread
    reals = jax.random.normal(jax.random.PRNGKey(12), (batch, RES, RES, 3))
    z = jax.random.normal(jax.random.PRNGKey(13), (batch, 32))
    key, alpha = jax.random.PRNGKey(14), jnp.float32(0.7)

    state, g_tx, d_tx = make_state()
    single = build_train_step(cfg, dis_cfg, g_tx, d_tx, depth=depth,
                              loss="logistic", donate=False)
    ref_state, ref_m = single(state, reals, z, key, alpha)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "spatial"))
    state2, g_tx2, d_tx2 = make_state()
    step = build_gspmd_train_step(cfg, dis_cfg, g_tx2, d_tx2, depth=depth,
                                  mesh=mesh, loss="logistic", donate=False)
    got_state, got_m = step(state2, reals, z, key, alpha)

    np.testing.assert_allclose(float(got_m["d_loss"]),
                               float(ref_m["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(got_m["g_loss"]),
                               float(ref_m["g_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.g_params),
                    jax.tree_util.tree_leaves(ref_state.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_state.d_params),
                    jax.tree_util.tree_leaves(ref_state.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


@pytest.mark.slow
def test_gspmd_train_step_with_packed_layout():
    """The 2-D GSPMD step composes with space-to-depth packed execution
    (the production deep-tail configuration): one logistic+R1 step at 128^2
    — where packing engages — runs finite on a (1, 4) mesh and matches the
    single-device packed step's losses."""
    import optax
    from jax.sharding import Mesh
    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_init,
                                     generator_init)
    from stylegan_tpu.train import (build_gspmd_train_step, build_train_step,
                                    create_train_state)

    res = 128
    cfg = GeneratorConfig(
        resolution=res, latent_size=32, dlatent_size=32, truncation_psi=0.7,
        mapping=MappingConfig(latent_size=32, dlatent_size=32,
                              mapping_fmaps=32, mapping_layers=2,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, dlatent_size=32,
                                  fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=True))
    dis_cfg = DiscriminatorConfig(resolution=res, fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear",
                                  packed=True)
    assert cfg.synthesis.packed_block(cfg.synthesis.depth - 2)
    depth = dis_cfg.depth - 1

    def make_state():
        g_tx, d_tx = optax.sgd(0.01), optax.sgd(0.01)
        return create_train_state(
            generator_init(jax.random.PRNGKey(20), cfg),
            discriminator_init(jax.random.PRNGKey(21), dis_cfg),
            g_tx, d_tx, use_ema=False), g_tx, d_tx

    batch = 2
    reals = jax.random.normal(jax.random.PRNGKey(22), (batch, res, res, 3))
    z = jax.random.normal(jax.random.PRNGKey(23), (batch, 32))
    key, alpha = jax.random.PRNGKey(24), jnp.float32(1.0)

    state, g_tx, d_tx = make_state()
    single = build_train_step(cfg, dis_cfg, g_tx, d_tx, depth=depth,
                              loss="logistic", use_ema=False, donate=False)
    _, ref_m = single(state, reals, z, key, alpha)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(1, 4),
                ("data", "spatial"))
    state2, g_tx2, d_tx2 = make_state()
    step = build_gspmd_train_step(cfg, dis_cfg, g_tx2, d_tx2, depth=depth,
                                  mesh=mesh, loss="logistic", use_ema=False,
                                  donate=False)
    _, got_m = step(state2, reals, z, key, alpha)
    np.testing.assert_allclose(float(got_m["d_loss"]),
                               float(ref_m["d_loss"]), rtol=1e-3)
    np.testing.assert_allclose(float(got_m["g_loss"]),
                               float(ref_m["g_loss"]), rtol=1e-3)


def test_gspmd_step_rejects_bad_mesh():
    from jax.sharding import Mesh
    from stylegan_tpu.models.configs import DiscriminatorConfig
    from stylegan_tpu.train import (build_gspmd_train_step, make_d_optimizer,
                                    make_g_optimizer)
    cfg = make_cfg()
    dis_cfg = DiscriminatorConfig(resolution=RES, fmap_base=256, fmap_max=64,
                                  structure="linear")
    mesh_1d = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    with pytest.raises(AssertionError, match="spatial"):
        build_gspmd_train_step(cfg, dis_cfg, make_g_optimizer(),
                               make_d_optimizer(), depth=dis_cfg.depth - 1,
                               mesh=mesh_1d)


def test_trainer_fixed_2d_mesh_matches_single_device():
    """A fixed ('data', 'spatial') mesh handed straight to StyleGAN: the
    trainer must route train_on_batch through the GSPMD step (train_on_batch
    shards reals over batch AND height) and produce the single-device losses
    — the trainer-level face of build_gspmd_train_step, used by multi-host
    deployments where the adaptive-mesh upgrade path is unavailable
    (tests/multihost_gspmd_worker.py is the 2-process version)."""
    from jax.sharding import Mesh
    from stylegan_tpu.train import StyleGAN

    res, latent = 16, 32
    g_args = {"latent_size": latent, "mapping_layers": 2,
              "fmap_base": 128, "fmap_max": 32, "blur_filter": [1, 2, 1],
              "truncation_psi": 0.7, "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "fmap_base": 128, "fmap_max": 32,
              "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}

    def build(mesh):
        return StyleGAN(structure="linear", resolution=res, num_channels=3,
                        latent_size=latent, g_args=g_args, d_args=d_args,
                        g_opt_args=opt_args, d_opt_args=opt_args,
                        loss="logistic", use_ema=True, seed=0, mesh=mesh)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "spatial"))
    reals = np.random.RandomState(3).randn(2, 8, res, res, 3).astype(
        np.float32)

    ref, got = [], []
    single = build(None)
    sharded = build(mesh)
    for i in range(2):
        ref.append(single.train_on_batch(reals[i], depth=2, alpha=0.5))
        got.append(sharded.train_on_batch(reals[i], depth=2, alpha=0.5))
    assert any("gspmd" in str(k) for k in sharded._steps), \
        f"expected a GSPMD step, got keys {list(sharded._steps)}"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)

    # the split single-net API is data-parallel only on 2-D meshes
    with pytest.raises(NotImplementedError, match="train_on_batch"):
        sharded.optimize_discriminator(
            np.zeros((8, latent), np.float32), reals[0], depth=2, alpha=0.5)

    # batch must divide the data axis, not the full mesh
    with pytest.raises(ValueError, match="data axis"):
        sharded.train_on_batch(reals[0][:3], depth=2, alpha=0.5)
