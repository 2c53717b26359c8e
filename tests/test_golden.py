"""Golden-output regression: fixed init + fixed latents + pinned noise must
produce byte-stable images across sessions (CPU, Precision.HIGHEST).

Guards future refactors against silent numeric drift: the golden file is
committed; if an intentional math change shifts outputs, regenerate with
  python -m tests.test_golden
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                 MappingConfig, SynthesisConfig,
                                 discriminator_apply, discriminator_init,
                                 generator_apply, generator_init)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "gen_dis_outputs.npz")
RES = 32


def _build():
    gen_cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))
    dis_cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear")
    g_params = generator_init(jax.random.PRNGKey(123), gen_cfg)
    d_params = discriminator_init(jax.random.PRNGKey(456), dis_cfg)
    z = jax.random.normal(jax.random.PRNGKey(789), (2, 512))
    noises = []
    for stage in range(RES.bit_length() - 2):
        r = 4 * 2 ** stage
        for j in range(2):
            noises.append(jax.random.normal(
                jax.random.PRNGKey(1000 + stage * 2 + j), (2, r, r, 1)))
    imgs = generator_apply(gen_cfg, g_params, z, depth=3, alpha=0.6,
                           train=False, noises=noises).images
    scores = discriminator_apply(dis_cfg, d_params, imgs, depth=3, alpha=0.6)
    return np.asarray(imgs), np.asarray(scores)


def test_golden_outputs():
    assert os.path.exists(GOLDEN), \
        "golden file missing — regenerate: python -m tests.test_golden"
    imgs, scores = _build()
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(imgs, z["images"], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(scores, z["scores"], atol=1e-4, rtol=1e-4)


if __name__ == "__main__":
    imgs, scores = _build()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, images=imgs, scores=scores)
    print("golden regenerated:", GOLDEN, imgs.shape, scores.shape)
