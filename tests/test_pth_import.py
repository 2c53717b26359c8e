"""Reference .pth checkpoint interop: torch-saved state_dicts load into our
param trees (the migration path for users of the reference trainer)."""

import numpy as np
import torch

import jax

from stylegan_tpu.convert import (discriminator_state_dict_from_params,
                                  generator_state_dict_from_params,
                                  load_discriminator_file, load_generator_file)
from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                 MappingConfig, SynthesisConfig,
                                 discriminator_init, generator_init)

RES = 32


def gen_cfg():
    return GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(mapping_layers=2,
                              dlatent_broadcast=(RES.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))


def test_generator_pth_roundtrip(tmp_path):
    cfg = gen_cfg()
    src = generator_init(jax.random.PRNGKey(0), cfg)
    sd = generator_state_dict_from_params(src)
    pth = str(tmp_path / "gen.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, pth)

    dst = generator_init(jax.random.PRNGKey(1), cfg)
    out = load_generator_file(dst, pth)
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_discriminator_pth_roundtrip(tmp_path):
    cfg = DiscriminatorConfig(resolution=RES, blur_filter=(1, 2, 1),
                              structure="linear")
    src = discriminator_init(jax.random.PRNGKey(2), cfg)
    sd = discriminator_state_dict_from_params(src)
    pth = str(tmp_path / "dis.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, pth)

    dst = discriminator_init(jax.random.PRNGKey(3), cfg)
    out = load_discriminator_file(dst, pth)
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_with_blur_buffers_ignored(tmp_path):
    """Real reference checkpoints include blur-kernel buffers; they must be
    ignored (our blur is static config, reference convert.py:137)."""
    cfg = gen_cfg()
    src = generator_init(jax.random.PRNGKey(4), cfg)
    sd = generator_state_dict_from_params(src)
    sd["g_synthesis.blocks.0.conv0_up.intermediate.kernel"] = \
        np.ones((1, 1, 3, 3), np.float32)
    pth = str(tmp_path / "gen_with_blur.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                for k, v in sd.items()}, pth)
    dst = generator_init(jax.random.PRNGKey(5), cfg)
    out = load_generator_file(dst, pth)
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
