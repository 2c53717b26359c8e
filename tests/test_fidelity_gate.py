"""End-to-end CLI test of tools/fidelity_gate.py (VERDICT r3 #5): a
synthetic official-format pickle + randomly-initialized inception weights +
a tiny image dir drive all gate stages in a real subprocess, proving the
one-command chain works the day real assets appear."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

import jax

from tests.test_tf_convert import build_fake_pickle

from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                 SynthesisConfig, generator_init)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = 64
DEPTH = 4

pytestmark = pytest.mark.slow  # subprocess compiles a 64^2 G on CPU


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.pop("PYTHONPATH", None)
    return env


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gate")
    cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(latent_size=512, mapping_layers=8,
                              dlatent_broadcast=(int(np.log2(RES)) - 1) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))
    params = generator_init(jax.random.PRNGKey(0), cfg)
    pkl = build_fake_pickle(tmp, params, DEPTH)

    from stylegan_tpu.metrics import inception_v3_init
    inception = str(tmp / "inception.npz")
    np.savez(inception, **inception_v3_init(jax.random.PRNGKey(1)))

    img_dir = tmp / "reals"
    os.makedirs(img_dir)
    rs = np.random.RandomState(0)
    for i in range(12):
        Image.fromarray(rs.randint(0, 255, (RES, RES, 3), dtype=np.uint8)) \
            .save(img_dir / f"{i}.png")
    return tmp, pkl, inception, str(img_dir)


def test_gate_end_to_end(assets):
    tmp, pkl, inception, img_dir = assets
    out = str(tmp / "gate_out")
    r = subprocess.run(
        [sys.executable, "tools/fidelity_gate.py", "--pickle", pkl,
         "--res", str(RES), "--images", img_dir, "--inception", inception,
         "--out", out, "--num_samples", "12", "--batch", "4",
         "--golden_samples", "1", "--cpu"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    gate = json.load(open(os.path.join(out, "gate.json")))
    assert gate["pass"] is True
    assert gate["stages"]["convert"]["ok"] is True
    assert os.path.exists(gate["stages"]["convert"]["converted_npz"])
    # golden diff ran against the real reference torch model and met the bar
    g = gate["stages"]["golden"]
    assert g["ok"] is True, g
    assert g["pixel_max_abs_diff"] <= 1e-2
    # FID computed on random-init inception weights (a number, not a target)
    assert isinstance(gate["stages"]["fid"]["fid"], float)
    # PPL skipped without --lpips
    assert gate["stages"]["ppl"]["ok"] is None
    # one-line summary on stdout
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["pass"] is True


def test_gate_fails_on_architecture_mismatch(assets, tmp_path):
    """A pickle whose weights don't fit the declared architecture must trip
    the convert stage and exit nonzero — the gate actually gates.  (A
    same-weights numerical corruption cannot trip the golden stage by
    construction: both frameworks would hold the identical bad weights.)
    Here: a 64^2 pickle declared as --res 32."""
    tmp, pkl, inception, img_dir = assets
    out = str(tmp_path / "gate_bad")
    r = subprocess.run(
        [sys.executable, "tools/fidelity_gate.py", "--pickle", pkl,
         "--res", "32", "--out", out, "--skip_golden", "--cpu"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode != 0, r.stdout
    gate = json.load(open(os.path.join(out, "gate.json")))
    assert gate["pass"] is False
    assert gate["stages"]["convert"]["ok"] is False
    assert gate["stages"]["convert"]["issues"]
