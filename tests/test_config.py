"""Config system tests: defaults, yaml overlay, freeze, unknown-key errors,
and compatibility with every shipped preset *and* every reference preset."""

import glob
import os

import pytest

from stylegan_tpu.config import ConfigNode, get_default_cfg
from tests.conftest import HAS_REFERENCE, REFERENCE


def test_defaults_match_reference_schema():
    c = get_default_cfg()
    assert c.structure == "fixed"
    assert c.loss == "logistic"
    assert c.sched.batch_sizes == [128, 128, 128, 64, 32, 16, 8, 4, 2]
    assert c.model.gen.latent_size == 512
    assert c.model.gen.mapping_layers == 4
    assert c.model.g_optim.learning_rate == 0.003
    assert c.model.g_optim.beta_1 == 0.0
    assert c.num_works == 4


def test_merge_and_freeze(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("loss: 'hinge'\nmodel:\n  gen:\n    mapping_layers: 8\n"
                 "dataset:\n  resolution: 256\n")
    c = get_default_cfg()
    c.merge_from_file(str(p))
    assert c.loss == "hinge"
    assert c.model.gen.mapping_layers == 8
    assert c.dataset.resolution == 256
    c.freeze()
    with pytest.raises(AttributeError):
        c.loss = "logistic"
    with pytest.raises(AttributeError):
        c.model.gen.latent_size = 256


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("not_a_real_key: 1\n")
    c = get_default_cfg()
    with pytest.raises(KeyError):
        c.merge_from_file(str(p))


def test_int_to_float_promotion(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  gen:\n    truncation_psi: -1\n")
    c = get_default_cfg()
    c.merge_from_file(str(p))
    assert c.model.gen.truncation_psi == -1.0
    assert isinstance(c.model.gen.truncation_psi, float)


def test_merge_from_list():
    c = get_default_cfg()
    c.merge_from_list(["loss", "hinge", "dataset.resolution", "64"])
    assert c.loss == "hinge"
    assert c.dataset.resolution == 64
    with pytest.raises(KeyError):
        c.merge_from_list(["bogus.key", "1"])


@pytest.mark.parametrize("path", sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml"))))
def test_all_shipped_presets_load(path):
    c = get_default_cfg()
    c.merge_from_file(path)
    c.freeze()
    assert c.dataset.resolution in (128, 256, 1024)


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
@pytest.mark.parametrize("name", sorted(os.listdir(
    os.path.join(REFERENCE, "configs")) if HAS_REFERENCE else []))
def test_reference_presets_compatible(name):
    """Every YAML the reference ships merges cleanly into our schema."""
    c = get_default_cfg()
    c.merge_from_file(os.path.join(REFERENCE, "configs", name))
    c.freeze()


def test_clone_independent():
    a = get_default_cfg()
    b = a.clone()
    b.loss = "hinge"
    assert a.loss == "logistic"
