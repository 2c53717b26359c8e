"""AOT serving export (stylegan_tpu/serving.py): jax.export round-trip
fidelity, seed determinism, and the conditional signature — all on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_init)
from stylegan_tpu.serving import (export_generator, load_exported,
                                  make_serving_fn)

RES = 16


def small_cfg(conditional=False, n_classes=0):
    n_lay = (RES.bit_length() - 2) * 2
    lat = 32 + (32 if conditional else 0)
    return GeneratorConfig(
        resolution=RES, latent_size=32, dlatent_size=32,
        conditional=conditional, n_classes=n_classes,
        mapping=MappingConfig(latent_size=lat, dlatent_size=32,
                              mapping_fmaps=32, mapping_layers=2,
                              dlatent_broadcast=n_lay),
        synthesis=SynthesisConfig(resolution=RES, dlatent_size=32,
                                  fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear"))


def test_export_roundtrip_exact():
    cfg = small_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    depth = cfg.synthesis.depth - 1
    blob = export_generator(cfg, params, depth=depth, batch_size=3,
                            platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 1000
    serve = load_exported(blob)

    z = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    seed = jnp.int32(11)
    got = np.asarray(serve(z, seed))
    want = np.asarray(jax.jit(
        make_serving_fn(cfg, params, depth=depth))(z, seed))
    assert got.shape == (3, RES, RES, 3)
    np.testing.assert_array_equal(got, want)


def _with_noise_weights(params):
    """Noise weights init to zero (reference semantics) — give them weight
    so the seed visibly feeds the output."""
    import jax.tree_util as jtu

    def bump(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        return jnp.ones_like(leaf) if "noise" in keys else leaf
    return jtu.tree_map_with_path(bump, params)


def test_export_seed_determinism():
    cfg = small_cfg()
    params = _with_noise_weights(generator_init(jax.random.PRNGKey(0), cfg))
    depth = cfg.synthesis.depth - 1
    serve = load_exported(export_generator(cfg, params, depth=depth,
                                           batch_size=2, platforms=("cpu",)))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    a = np.asarray(serve(z, jnp.int32(5)))
    b = np.asarray(serve(z, jnp.int32(5)))
    c = np.asarray(serve(z, jnp.int32(6)))
    np.testing.assert_array_equal(a, b)       # replayable
    assert np.abs(a - c).max() > 0            # seed actually feeds the noise


def test_export_conditional_signature():
    cfg = small_cfg(conditional=True, n_classes=4)
    params = generator_init(jax.random.PRNGKey(3), cfg)
    depth = cfg.synthesis.depth - 1
    serve = load_exported(export_generator(cfg, params, depth=depth,
                                           batch_size=2, platforms=("cpu",)))
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 32))
    la = np.asarray(serve(z, jnp.int32(1), jnp.asarray([0, 1], jnp.int32)))
    lb = np.asarray(serve(z, jnp.int32(1), jnp.asarray([2, 3], jnp.int32)))
    assert la.shape == (2, RES, RES, 3)
    assert np.abs(la - lb).max() > 0          # labels condition the output

    with pytest.raises(Exception):            # wrong arity is rejected
        serve(z, jnp.int32(1))


def test_export_spatial_multidevice():
    """N-device spatially-sharded artifact: exported via an AbstractMesh
    (no N-device requirement at export time), loaded on the 8-virtual-device
    CPU mesh, output H-sharded and equal to the single-device serve."""
    cfg = small_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    depth = cfg.synthesis.depth - 1
    n = 4
    blob = export_generator(cfg, params, depth=depth, batch_size=2,
                            platforms=("cpu",), spatial_devices=n)
    serve = load_exported(blob)
    assert serve.exported.nr_devices == n

    z = jax.random.normal(jax.random.PRNGKey(6), (2, 32))
    seed = jnp.int32(3)
    out = serve(z, seed)
    assert len(out.sharding.device_set) == n          # really sharded
    want = np.asarray(jax.jit(
        make_serving_fn(cfg, params, depth=depth))(z, seed))
    # instance-norm stats become partial-sum + collective under GSPMD:
    # near-equality, not bit-equality (same bound as tests/test_spatial.py)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


def test_export_spatial_validation():
    cfg = small_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):   # 16px cannot give 4 rows x 8 shards
        export_generator(cfg, params, depth=cfg.synthesis.depth - 1,
                         batch_size=2, platforms=("cpu",), spatial_devices=8)
    ccfg = small_cfg(conditional=True, n_classes=2)
    cparams = generator_init(jax.random.PRNGKey(1), ccfg)
    with pytest.raises(ValueError):   # conditional unsupported on spatial
        export_generator(ccfg, cparams, depth=ccfg.synthesis.depth - 1,
                         batch_size=2, platforms=("cpu",), spatial_devices=4)


def test_exported_wrong_shape_rejected():
    cfg = small_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    depth = cfg.synthesis.depth - 1
    serve = load_exported(export_generator(cfg, params, depth=depth,
                                           batch_size=2, platforms=("cpu",)))
    z_bad = jax.random.normal(jax.random.PRNGKey(5), (4, 32))  # batch 4 != 2
    with pytest.raises(Exception):
        serve(z_bad, jnp.int32(0))
