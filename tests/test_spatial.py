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

RES = 64  # 8 spatial shards x 8 rows at the final stage; 16 rows at 4x4? no:
# the 4x4 base stage needs res % (n*4) == 0 -> use 4 shards for RES 64


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


def test_spatial_rejects_too_many_shards():
    cfg = make_cfg()
    mesh = create_spatial_mesh(8)  # 4x4 base stage cannot split 8 ways at 16
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
