"""Full-resolution (FFHQ-1024, depth-8) end-to-end parity vs the reference.

Round-1 parity stopped at 64px/depth-4; these tests prove the BASELINE
"<=1e-2 pixel delta on converted FFHQ-1024 weights" target is holdable at
full scale, where behaviors the small tests never reach are live:

  * the >=128-resolution fused up/downscale conv threshold
    (reference CustomLayers.py:142-165) — active for stages 5..8 only,
  * 9-stage accumulation error through 18 conv+epilogue layers,
  * the to_rgb alpha blend at depth 8 (reference GAN.py:195-204),
  * minibatch-stddev + the full mirrored D at 1024^2.

Both convert directions are exercised at real FFHQ-1024 shapes:
  ours -> reference state_dict -> the reference's own torch Generator /
  Discriminator (convert/torch_params.py), and a synthetic official-format
  TF pickle -> our params (convert/tf_pickle.py, the no-TF unpickler).

All tests are marked slow (full CPU forwards at 1024^2).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_utils import (from_torch_nchw, install_torchvision_stub,
                                   to_torch_nchw)

install_torchvision_stub()
from models.GAN import Discriminator as TorchDiscriminator  # noqa: E402
from models.GAN import Generator as TorchGenerator  # noqa: E402

from tests.test_networks import (load_params_into_torch, make_noises,
                                 pin_reference_noise)
from tests.test_tf_convert import build_fake_pickle

from stylegan_tpu.convert import (discriminator_state_dict_from_params,
                                  generator_state_dict_from_params)
from stylegan_tpu.convert.tf_pickle import import_official_generator
from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                 MappingConfig, SynthesisConfig,
                                 discriminator_apply, discriminator_init,
                                 generator_apply, generator_init)

pytestmark = pytest.mark.slow

RES = 1024
DEPTH = 8            # 2^(8+2) = 1024
PIXEL_BAR = 1e-2     # BASELINE.json fidelity target


def make_cfg():
    # FFHQ-1024 preset shapes (configs/sample_ffhq_1024.yaml: 8 mapping
    # layers, latent 512, blur [1,2,1], progressive 'linear' structure)
    return GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(latent_size=512, mapping_layers=8,
                              dlatent_broadcast=(int(np.log2(RES)) - 1) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))


@pytest.fixture(scope="module")
def gen_setup():
    cfg = make_cfg()
    params = generator_init(jax.random.PRNGKey(0), cfg)
    tg = TorchGenerator(resolution=RES, latent_size=512, mapping_layers=8,
                        blur_filter=[1, 2, 1], structure="linear")
    load_params_into_torch(tg, generator_state_dict_from_params(params))
    tg.eval()
    return cfg, params, tg


@pytest.mark.parametrize("alpha,packed", [(1.0, False), (0.35, False),
                                          (1.0, True), (0.35, True)])
def test_generator_1024_parity(gen_setup, alpha, packed):
    """Depth-8 1024^2 G forward: ours vs the reference torch model fed our
    converted weights, pinned noise, same z — end to end through every
    fused->nonfused threshold crossing and the full 9-stage accumulation.
    packed=True proves the space-to-depth perf path holds the same <=1e-2
    bar (the 512/1024 stages run packed at these FFHQ shapes)."""
    cfg, params, tg = gen_setup
    if packed:
        from dataclasses import replace
        cfg = replace(cfg, synthesis=replace(cfg.synthesis, packed=True))
        assert cfg.synthesis.packed_block(DEPTH - 1)
    batch = 1
    noises = make_noises(batch, int(np.log2(RES)) - 1, seed=3)
    pin_reference_noise(tg, noises)

    z = np.random.RandomState(1).randn(batch, 512).astype(np.float32)
    with torch.no_grad():
        ref = from_torch_nchw(tg(torch.from_numpy(z), depth=DEPTH,
                                 alpha=alpha))
    out = generator_apply(cfg, params, jnp.asarray(z), depth=DEPTH,
                          alpha=alpha, train=False,
                          noises=[jnp.asarray(n) for n in noises])
    got = np.asarray(out.images)
    assert got.shape == (batch, RES, RES, 3)
    max_delta = float(np.max(np.abs(got - ref)))
    # the BASELINE bar, plus a tight regression tolerance (f32 HIGHEST
    # precision keeps full-scale accumulation well under the bar)
    assert max_delta <= PIXEL_BAR, f"pixel delta {max_delta} > {PIXEL_BAR}"
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_generator_1024_parity_from_official_pickle(gen_setup, tmp_path):
    """A synthetic official-format TF pickle at real FFHQ-1024 shapes imports
    bit-exactly through the no-TF unpickler, and the imported generator's
    full-res output matches the reference torch model holding the same
    weights — the complete convert pipeline, both directions, at scale."""
    cfg, params, tg = gen_setup
    pkl = build_fake_pickle(tmp_path, params, DEPTH)
    fresh = generator_init(jax.random.PRNGKey(99), cfg)   # different init
    msgs = []
    imported = import_official_generator(pkl, fresh, DEPTH,
                                         report=msgs.append)
    for m in msgs:
        assert "mismatch" not in m, m
        # only the unused lower-lod RGB heads may be absent from the pickle
        assert m.startswith("sd only g_synthesis.to_rgb."), m

    batch = 1
    noises = make_noises(batch, int(np.log2(RES)) - 1, seed=7)
    pin_reference_noise(tg, noises)
    z = np.random.RandomState(2).randn(batch, 512).astype(np.float32)
    with torch.no_grad():
        ref = from_torch_nchw(tg(torch.from_numpy(z), depth=DEPTH, alpha=1.0))
    out = generator_apply(cfg, imported, jnp.asarray(z), depth=DEPTH,
                          alpha=1.0, train=False,
                          noises=[jnp.asarray(n) for n in noises])
    max_delta = float(np.max(np.abs(np.asarray(out.images) - ref)))
    assert max_delta <= PIXEL_BAR, f"pixel delta {max_delta} > {PIXEL_BAR}"


@pytest.mark.parametrize("alpha,packed", [(0.35, False), (0.35, True)])
def test_discriminator_1024_parity(alpha, packed):
    """Depth-8 1024^2 D forward (batch 4 = one full mbstd group): ours vs the
    reference torch model fed our converted weights — exercises the fused
    downscale conv (input res >= 128, stages 1024..128), the from_rgb blend,
    and the stddev head at full scale.  packed=True proves the perf path
    holds the bar too."""
    cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                              structure="linear", packed=packed)
    params = discriminator_init(jax.random.PRNGKey(1), cfg)
    td = TorchDiscriminator(resolution=RES, blur_filter=[1, 2, 1],
                            structure="linear")
    sd = discriminator_state_dict_from_params(params)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
    missing, unexpected = td.load_state_dict(sd_t, strict=False)
    assert all("blur" in k for k in missing), missing
    assert not unexpected
    td.eval()

    x = np.random.RandomState(4).randn(4, RES, RES, 3).astype(np.float32)
    with torch.no_grad():
        ref = td(to_torch_nchw(x), depth=DEPTH, alpha=alpha).numpy()
    ours = np.asarray(discriminator_apply(cfg, params, jnp.asarray(x),
                                          depth=DEPTH, alpha=alpha))
    scale = max(1.0, float(np.max(np.abs(ref))))
    max_delta = float(np.max(np.abs(ours - ref)))
    assert max_delta <= PIXEL_BAR * scale, \
        f"score delta {max_delta} > {PIXEL_BAR * scale}"
    np.testing.assert_allclose(ours, ref, atol=2e-3 * scale, rtol=1e-3)
