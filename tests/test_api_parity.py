"""API-parity tests: the reference's 'bring your own loop' surface
(optimize_discriminator / optimize_generator / create_grid), standalone
transform, and utils helpers."""

import os

import numpy as np
from PIL import Image

import jax

from stylegan_tpu.data.transforms import get_transform
from stylegan_tpu.utils import (copy_files_and_create_dirs,
                                list_dir_recursively_with_ignore)
from tests.test_trainer import RES, make_trainer


def test_optimize_discriminator_and_generator(tmp_path):
    trainer = make_trainer(str(tmp_path))
    rs = np.random.RandomState(0)
    reals = rs.randn(8, RES, RES, 3).astype(np.float32)
    noise = rs.randn(8, 64).astype(np.float32)

    d_before = jax.tree_util.tree_leaves(trainer.state.d_params)[0]
    d_loss = trainer.optimize_discriminator(noise, reals, depth=2, alpha=0.5)
    assert np.isfinite(d_loss)
    d_after = jax.tree_util.tree_leaves(trainer.state.d_params)[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))

    g_before = jax.tree_util.tree_leaves(trainer.state.g_params)[0]
    g_loss = trainer.optimize_generator(noise, reals, depth=2, alpha=0.5)
    assert np.isfinite(g_loss)
    g_after = jax.tree_util.tree_leaves(trainer.state.g_params)[0]
    assert not np.allclose(np.asarray(g_before), np.asarray(g_after))
    # EMA shadow moved too
    shadow = jax.tree_util.tree_leaves(trainer.state.g_shadow)[0]
    assert not np.allclose(np.asarray(shadow), np.asarray(g_after))


def test_create_grid(tmp_path):
    samples = np.random.RandomState(1).uniform(-1, 1, (4, 8, 8, 3))
    path = str(tmp_path / "grid.png")
    from stylegan_tpu.train import StyleGAN
    StyleGAN.create_grid(samples, scale_factor=2, img_file=path)
    img = Image.open(path)
    assert img.size[0] >= 2 * (16 + 1)


def test_get_transform():
    t = get_transform((8, 8))
    img = Image.fromarray(np.full((16, 16, 3), 128, np.uint8))
    out = t(img)
    assert out.shape == (8, 8, 3)
    assert abs(float(out.mean()) - ((128 / 255 - 0.5) / 0.5)) < 1e-5


def test_dir_helpers(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src / "keep")
    os.makedirs(src / "skipme")
    (src / "keep" / "a.py").write_text("x = 1")
    (src / "skipme" / "b.py").write_text("y = 2")
    files = list_dir_recursively_with_ignore(str(src), ignores=["skipme"])
    rels = sorted(r for _, r in files)
    assert rels == [os.path.join("keep", "a.py")]
    dst = tmp_path / "dst"
    copy_files_and_create_dirs(
        [(a, os.path.join(str(dst), r)) for a, r in files])
    assert (dst / "keep" / "a.py").read_text() == "x = 1"
