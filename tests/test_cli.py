"""CLI contract tests: train.py end-to-end on a toy dataset, then the
generate CLIs consuming its checkpoints — all as real subprocesses."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # the TPU-tunnel sitecustomize (on PYTHONPATH) force-registers the remote
    # TPU backend in every subprocess; drop it so CLI tests run on CPU
    env.pop("PYTHONPATH", None)
    return env


def _run(args, cwd=REPO):
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{' '.join(args)}\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    data_dir = tmp / "data"
    os.makedirs(data_dir)
    rs = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)) \
            .save(data_dir / f"{i}.png")
    out_dir = tmp / "out"
    cfg = tmp / "toy.yaml"
    cfg.write_text(f"""
output_dir: '{out_dir}'
structure: 'linear'
feedback_factor: 1
checkpoint_factor: 1
num_works: 2
num_samples: 4
model:
  gen:
    mapping_layers: 2
dataset:
  img_dir: '{data_dir}'
  folder: False
  resolution: 16
sched:
  epochs: [1, 1, 1]
  batch_sizes: [4, 4, 4]
  fade_in_percentage: [50, 50, 50]
""")
    _run(["train.py", "--config", str(cfg), "--num_devices", "1"])
    return {"cfg": str(cfg), "out": str(out_dir)}


def test_train_cli_outputs(toy_run):
    out = toy_run["out"]
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "src"))
    models = os.listdir(os.path.join(out, "models"))
    assert "GAN_GEN_2_1.npz" in models
    assert "GAN_GEN_SHADOW_2_1.npz" in models
    samples = os.listdir(os.path.join(out, "samples"))
    assert samples, "no feedback grids written"


def test_train_cli_refuses_existing_output(toy_run):
    r = subprocess.run([sys.executable, "train.py", "--config",
                        toy_run["cfg"]], cwd=REPO, env=_env(),
                       capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "already exists" in (r.stderr + r.stdout)


def test_generate_samples_cli(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    outd = str(tmp_path / "gen_samples")
    _run(["generate_samples.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--num_samples", "2",
          "--output_dir", outd, "--seed", "1"])
    assert sorted(os.listdir(outd)) == ["1.png", "2.png"]
    img = Image.open(os.path.join(outd, "1.png"))
    assert img.size == (16, 16)


def test_generate_samples_from_w_code(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_2_1.npz")
    w = np.random.RandomState(2).randn(6, 512).astype(np.float32)
    wfile = str(tmp_path / "w.npy")
    np.save(wfile, w)
    out = str(tmp_path / "from_w.png")
    _run(["generate_samples.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--input", wfile, "--output", out])
    assert os.path.exists(out)


def test_generate_grid_cli(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_2_1.npz")
    outd = str(tmp_path / "grid")
    _run(["generate_grid.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--n_row", "2", "--n_col", "2",
          "--output_dir", outd, "--seed", "3"])
    assert os.path.exists(os.path.join(outd, "grid.png"))


def test_generate_truncation_figure_cli(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_2_1.npz")
    out = str(tmp_path / "trunc.png")
    _run(["generate_truncation_figure.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--output", out, "--out_depth", "2"])
    img = Image.open(out)
    assert img.size == (16 * 6, 16 * 2)  # 6 psis x 2 seeds


def test_mixing_figure_function(toy_run):
    """Mixing figure via the library function (CLI defaults assume a 256
    model; the canvas logic is identical)."""
    import jax
    from stylegan_tpu.config import get_default_cfg
    from stylegan_tpu.io.checkpoint import load_params_into
    from stylegan_tpu.models import generator_config_from_cfg, generator_init
    sys.path.insert(0, REPO)
    from generate_mixing_figure import draw_style_mixing_figure

    opt = get_default_cfg()
    opt.merge_from_file(toy_run["cfg"])
    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    params, _ = load_params_into(
        params, os.path.join(toy_run["out"], "models", "GAN_GEN_2_1.npz"))
    png = os.path.join(toy_run["out"], "mix.png")
    draw_style_mixing_figure(png, gen_cfg, params, out_depth=2,
                             src_seeds=[1, 2], dst_seeds=[3],
                             style_ranges=[range(0, 2)])
    img = Image.open(png)
    assert img.size == (16 * 3, 16 * 2)


@pytest.mark.slow
def test_train_cli_sharded_adaptive_mesh(tmp_path):
    """train.py --num_devices 8 over a virtual 8-CPU-device mesh, with a
    batch schedule that crosses adaptive-mesh transitions (batch 16 -> 4
    devices, 8 -> 2, 4 -> 1 under the mbstd-group cap): exercises the state
    re-placement path (trainer._ensure_placement) end to end through the CLI,
    including checkpoints and feedback grids at every depth."""
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rs = np.random.RandomState(1)
    for i in range(16):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)) \
            .save(data_dir / f"{i}.png")
    out_dir = tmp_path / "out_sharded"
    cfg = tmp_path / "toy8.yaml"
    cfg.write_text(f"""
output_dir: '{out_dir}'
structure: 'linear'
feedback_factor: 1
checkpoint_factor: 1
num_works: 2
num_samples: 4
model:
  gen:
    mapping_layers: 2
dataset:
  img_dir: '{data_dir}'
  folder: False
  resolution: 16
sched:
  epochs: [1, 1, 1]
  batch_sizes: [16, 8, 4]
  fade_in_percentage: [50, 50, 50]
""")
    env = _env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "train.py", "--config", str(cfg),
         "--num_devices", "8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    log = open(os.path.join(out_dir, "log.txt")).read()
    assert "Up to 8" in log
    models = os.listdir(os.path.join(out_dir, "models"))
    for depth in (0, 1, 2):
        assert f"GAN_GEN_{depth}_1.npz" in models
    assert os.listdir(os.path.join(out_dir, "samples"))


def test_train_cli_perf_knobs(tmp_path):
    """train.py with every TPU perf knob in the yaml (bf16 + packed auto +
    lazy R1 + remat, as in configs/sample_ffhq_1024_tpu_perf.yaml): the
    whole progressive run trains and checkpoints through the CLI."""
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rs = np.random.RandomState(2)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), dtype=np.uint8)) \
            .save(data_dir / f"{i}.png")
    out_dir = tmp_path / "out_perf"
    cfg = tmp_path / "toy_perf.yaml"
    cfg.write_text(f"""
output_dir: '{out_dir}'
structure: 'linear'
feedback_factor: 1
checkpoint_factor: 1
num_works: 2
num_samples: 4
loss: 'logistic'
r1_interval: 2
precision:
  activations: 'bfloat16'
ops:
  packed: 'auto'
  remat: True
model:
  gen:
    mapping_layers: 2
dataset:
  img_dir: '{data_dir}'
  folder: False
  resolution: 16
sched:
  epochs: [1, 1, 1]
  batch_sizes: [4, 4, 4]
  fade_in_percentage: [50, 50, 50]
""")
    _run(["train.py", "--config", str(cfg), "--num_devices", "1"])
    models = os.listdir(os.path.join(out_dir, "models"))
    assert "GAN_GEN_2_1.npz" in models and "GAN_GEN_SHADOW_2_1.npz" in models


def test_convert_export_pth_loads_into_reference(toy_run, tmp_path):
    """convert.py --export_pth: our trained .npz becomes a torch state_dict
    the reference Generator accepts with strict=True key/shape matching."""
    import torch
    from reference_utils import install_torchvision_stub
    install_torchvision_stub()
    try:
        from models.GAN import Generator as TorchGenerator
    except ImportError:
        pytest.skip("reference repo not mounted")

    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_2_1.npz")
    out = str(tmp_path / "gen.pth")
    _run(["convert.py", "--config", toy_run["cfg"], "--export_pth",
          "--input_file", gen, "--output_file", out])
    sd = torch.load(out, weights_only=True)
    tg = TorchGenerator(resolution=16, latent_size=512, mapping_layers=2,
                        blur_filter=[1, 2, 1])
    tg.load_state_dict(sd, strict=True)


def test_eval_metrics_cli_ppl(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    r = _run(["eval_metrics.py", "--config", toy_run["cfg"],
              "--generator_file", gen, "--num_samples", "4", "--batch", "2",
              "--metric", "ppl"])
    import json
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert np.isfinite(out["ppl"]) and out["distance"] == "pyramid-l2"


def test_eval_metrics_cli_swd(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    r = _run(["eval_metrics.py", "--config", toy_run["cfg"],
              "--generator_file", gen, "--num_samples", "4", "--batch", "4"])
    import json
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert any(k.startswith("swd_") for k in out)


@pytest.mark.slow
def test_eval_metrics_cli_fid(toy_run, tmp_path):
    """--metric fid end to end with synthetic (random-init) inception weights
    in the documented torchvision npz schema."""
    import jax
    from stylegan_tpu.metrics import inception_v3_init
    weights = str(tmp_path / "inception_v3.npz")
    np.savez(weights, **inception_v3_init(jax.random.PRNGKey(0)))
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    r = _run(["eval_metrics.py", "--config", toy_run["cfg"],
              "--generator_file", gen, "--num_samples", "4", "--batch", "4",
              "--metric", "fid", "--inception_weights", weights])
    import json
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert np.isfinite(out["fid"])

    # without weights the fid path refuses with a pointer to the swd fallback
    r2 = subprocess.run(
        [sys.executable, "eval_metrics.py", "--config", toy_run["cfg"],
         "--generator_file", gen, "--num_samples", "4", "--metric", "fid"],
        cwd=REPO, env=_env(), capture_output=True, text=True, timeout=300)
    assert r2.returncode != 0
    assert "inception_weights" in (r2.stderr + r2.stdout)


def test_project_cli_roundtrip(toy_run, tmp_path):
    """project.py inverts an image and the saved w.npy feeds straight back
    into generate_samples.py --input (beyond-reference feature)."""
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    target = os.path.join(os.path.dirname(toy_run["out"]), "data", "0.png")
    outd = str(tmp_path / "proj")
    r = _run(["project.py", "--config", toy_run["cfg"],
              "--generator_file", gen, "--target", target,
              "--output_dir", outd, "--num_steps", "12"])
    assert os.path.exists(os.path.join(outd, "w.npy"))
    assert os.path.exists(os.path.join(outd, "projected.png"))
    losses = [float(l.rsplit(None, 1)[-1]) for l in r.stdout.splitlines()
              if l.startswith("step ")]
    assert losses and np.isfinite(losses[-1])
    out = str(tmp_path / "reproj.png")
    _run(["generate_samples.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--input",
          os.path.join(outd, "w.npy"), "--output", out])
    assert os.path.exists(out)


def test_generate_video_cli(toy_run, tmp_path):
    gen = os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz")
    walk = str(tmp_path / "walk.gif")
    _run(["generate_video.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--output", walk, "--mode", "walk",
          "--num_points", "2", "--frames_per_step", "3", "--batch", "3"])
    trunc = str(tmp_path / "trunc.gif")
    _run(["generate_video.py", "--config", toy_run["cfg"],
          "--generator_file", gen, "--output", trunc, "--mode", "truncation",
          "--num_frames", "4", "--batch", "2"])
    for path, frames in ((walk, 6), (trunc, 4)):
        img = Image.open(path)
        # PIL merges identical consecutive GIF frames (a barely-trained toy
        # generator can emit near-constant frames), so upper-bound + animated
        assert 1 < getattr(img, "n_frames", 1) <= frames, path


def test_export_generator_cli(toy_run, tmp_path):
    """AOT serving export CLI: artifact written and --check verifies it
    matches the live generator bit-for-bit (stylegan_tpu/serving.py)."""
    art = tmp_path / "gen.jaxexport"
    r = _run(["export_generator.py", "--config", toy_run["cfg"],
              "--generator_file",
              os.path.join(toy_run["out"], "models", "GAN_GEN_SHADOW_2_1.npz"),
              "--output", str(art), "--batch", "2", "--out_depth", "2",
              "--platforms", "cpu", "--check"])
    assert art.exists() and art.stat().st_size > 1000
    assert "Check OK" in r.stdout


def test_packaging_wheel_builds(tmp_path):
    """pyproject packaging: a wheel builds from the repo and contains the
    full stylegan_tpu package tree (fresh-venv install path, README
    'Install'). --no-build-isolation because the env is air-gapped."""
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path), REPO],
        capture_output=True, text=True, timeout=300, env=_env())
    assert r.returncode == 0, r.stdout + r.stderr
    wheels = [f for f in os.listdir(tmp_path) if f.endswith(".whl")]
    assert len(wheels) == 1, wheels
    import zipfile
    names = zipfile.ZipFile(tmp_path / wheels[0]).namelist()
    for mod in ("stylegan_tpu/__init__.py", "stylegan_tpu/losses.py",
                "stylegan_tpu/train/trainer.py",
                "stylegan_tpu/data/native/stylegan_io.cc"):
        assert mod in names, f"{mod} missing from wheel"
