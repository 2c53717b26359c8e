"""One-command real-assets fidelity gate (VERDICT r3 #5).

The moment the air gap opens (an official FFHQ pickle + pretrained
inception/LPIPS weights become available), this single command produces every
BASELINE.md fidelity number with pass/fail:

  python tools/fidelity_gate.py --pickle karras2019stylegan-ffhq-1024x1024.pkl \
      --images /data/ffhq_dir --inception inception_v3.npz [--lpips vgg16.npz]

Stages (each skipped gracefully when its asset is absent):

1. convert   — official TF pickle -> our generator pytree through the no-TF
               restricted unpickler (convert/tf_pickle.py); shape-diff report
               like reference convert.py:123-135; saves converted .npz.
2. golden    — the same pickle's weights loaded into the REFERENCE's own
               torch Generator (tf_vars -> torch state_dict, the
               reference-name translation pinned by tests/test_tf_convert),
               then a fixed-z, pinned-noise forward in both frameworks:
               max abs pixel delta must be <= 1e-2 (BASELINE.json).
               Requires /root/reference (or --reference) + torch.
3. fid       — FID between N generated samples and --images using
               --inception weights (metrics/fid.py), the BASELINE
               "FFHQ-128 FID parity" number.
4. ppl       — PPL with --lpips VGG16 weights (metrics/ppl.py).

Writes <out>/gate.json and prints a one-line JSON summary; exit code 0 iff
every *executed* gate stage passed its target (FID/PPL are recorded, not
thresholded — parity is a comparison against a reference run of the same
command's --images set).

CLI-tested end-to-end with a synthetic official-format pickle and
randomly-initialized metric weights (tests/test_fidelity_gate.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PIXEL_BAR = 1e-2  # BASELINE.json converted-weights fidelity target


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def install_torchvision_stub():
    """The reference's models package transitively imports torchvision; a
    stub satisfies the import (same trick as tests/reference_utils.py)."""
    import types
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    for sub in ("datasets", "transforms", "utils"):
        m = types.ModuleType(f"torchvision.{sub}")
        setattr(tv, sub, m)
        sys.modules[f"torchvision.{sub}"] = m

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub")

    sys.modules["torchvision.datasets"].ImageFolder = _Unavailable
    for name in ("ToTensor", "Normalize", "Compose", "Resize",
                 "RandomHorizontalFlip"):
        setattr(sys.modules["torchvision.transforms"], name, _Unavailable)
    sys.modules["torchvision.utils"].save_image = _Unavailable
    sys.modules["torchvision"] = tv


def make_noises(batch, num_stages, res0=4, seed=3):
    rs = np.random.RandomState(seed)
    noises, res = [], res0
    for _ in range(num_stages):
        noises.append(rs.randn(batch, res, res, 1).astype(np.float32))
        noises.append(rs.randn(batch, res, res, 1).astype(np.float32))
        res *= 2
    return noises


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pickle", required=True,
                    help="official TF pickle (karras2019stylegan-*.pkl)")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--mapping_layers", type=int, default=8)
    ap.add_argument("--images", default=None,
                    help="real-image dir for FID (flat files or folders)")
    ap.add_argument("--inception", default=None,
                    help="InceptionV3 weights .npz for FID")
    ap.add_argument("--lpips", default=None,
                    help="LPIPS VGG16 weights .npz for PPL")
    ap.add_argument("--reference", default="/root/reference",
                    help="reference repo for the golden torch comparison")
    ap.add_argument("--out", default="runs/fidelity_gate")
    ap.add_argument("--num_samples", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--golden_samples", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_golden", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from stylegan_tpu.convert.tf_pickle import (collect_variables,
                                                import_official_generator,
                                                load_tf_networks,
                                                tf_vars_to_state_dict)
    from stylegan_tpu.io.checkpoint import save_params
    from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                     SynthesisConfig, generator_apply,
                                     generator_init)

    RES = args.res
    depth = int(np.log2(RES)) - 2
    cfg = GeneratorConfig(
        resolution=RES,
        mapping=MappingConfig(latent_size=512,
                              mapping_layers=args.mapping_layers,
                              dlatent_broadcast=(int(np.log2(RES)) - 1) * 2),
        synthesis=SynthesisConfig(resolution=RES, blur_filter=(1, 2, 1),
                                  structure="linear"))

    gate = {"pickle": args.pickle, "res": RES, "stages": {},
            "targets": {"pixel_max_abs_diff": PIXEL_BAR,
                        "fid": "parity vs reference on the same --images",
                        "ppl": "recorded"}}
    failures = []
    t0 = time.time()

    # ---- stage 1: convert --------------------------------------------------
    def finish():
        gate["wall_s"] = round(time.time() - t0, 1)
        gate["pass"] = not failures
        gate["failures"] = failures
        with open(os.path.join(args.out, "gate.json"), "w") as f:
            json.dump(gate, f, indent=1)
        summary = {"pass": gate["pass"],
                   **{s: (v.get("pixel_max_abs_diff", v.get("fid",
                          v.get("ppl", v.get("ok")))))
                      for s, v in gate["stages"].items()}}
        print(json.dumps(summary), flush=True)
        sys.exit(0 if gate["pass"] else 1)

    log("stage 1/4: converting official pickle...")
    params = jax.jit(lambda k: generator_init(k, cfg))(jax.random.PRNGKey(0))
    msgs = []
    try:
        params = import_official_generator(args.pickle, params, depth,
                                           report=msgs.append)
    except Exception as e:  # noqa: BLE001 — bad asset -> clean gate failure
        for m in msgs:
            log(f"  {m}")
        gate["stages"]["convert"] = {
            "ok": False, "error": repr(e),
            "issues": [m for m in msgs if m.startswith(("mismatch",
                                                        "pd only"))]}
        failures.append(f"convert: {e!r}")
        finish()
    issues = [m for m in msgs if m.startswith(("mismatch", "pd only"))
              or (m.startswith("sd only")
                  and not m.startswith("sd only g_synthesis.to_rgb."))]
    for m in msgs:
        log(f"  {m}")
    npz = os.path.join(args.out, "converted_generator.npz")
    save_params(npz, params, {"source": os.path.basename(args.pickle)})
    gate["stages"]["convert"] = {
        "ok": not issues, "converted_npz": npz,
        "shape_report_lines": len(msgs), "issues": issues}
    if issues:
        failures.append("convert: shape report has mismatches")

    # ---- stage 2: golden fixed-input pixel diff vs the reference ---------
    if args.skip_golden:
        gate["stages"]["golden"] = {"ok": None, "skipped": "--skip_golden"}
    elif not os.path.isdir(os.path.join(args.reference, "models")):
        gate["stages"]["golden"] = {
            "ok": None, "skipped": f"reference not found at {args.reference}"}
        log("stage 2/4: reference repo unavailable — golden diff skipped")
    else:
        log("stage 2/4: golden pixel diff vs the reference torch model...")
        sys.path.append(args.reference)
        install_torchvision_stub()
        import torch
        from models.GAN import Generator as TorchGenerator
        from models.CustomLayers import NoiseLayer
        tg = TorchGenerator(resolution=RES, latent_size=512,
                            mapping_layers=args.mapping_layers,
                            blur_filter=[1, 2, 1], structure="linear")
        # pickle -> torch via the same reference-name translation the
        # reference's own convert.py performs (pinned by test_tf_convert)
        nets = load_tf_networks(args.pickle)
        sd = tf_vars_to_state_dict(
            collect_variables(nets[2] if len(nets) >= 3 else nets[0]), depth)
        missing, unexpected = tg.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=False)
        for k in missing:  # only non-parameter buffers may be absent
            assert ("blur" in k or "intermediate" in k
                    or "to_rgb" in k or "torgb" in k), f"missing {k}"
        assert not unexpected, unexpected
        tg.eval()

        b = args.golden_samples
        noises = make_noises(b, int(np.log2(RES)) - 1, seed=3)
        layers = [m for m in tg.modules() if isinstance(m, NoiseLayer)]
        for layer, n in zip(layers, noises):
            layer.noise = torch.from_numpy(
                np.transpose(n, (0, 3, 1, 2)).copy())
        z = np.random.RandomState(args.seed + 1).randn(b, 512).astype(
            np.float32)
        with torch.no_grad():
            ref = np.transpose(
                tg(torch.from_numpy(z), depth=depth, alpha=1.0)
                .detach().numpy(), (0, 2, 3, 1))
        ours = np.asarray(generator_apply(
            cfg, params, jnp.asarray(z), depth=depth, alpha=1.0, train=False,
            noises=[jnp.asarray(n) for n in noises]).images)
        delta = float(np.max(np.abs(ours - ref)))
        ok = delta <= PIXEL_BAR
        gate["stages"]["golden"] = {"ok": ok, "pixel_max_abs_diff": delta,
                                    "samples": b, "target": PIXEL_BAR}
        log(f"  max abs pixel diff {delta:.2e} (target <= {PIXEL_BAR})")
        if not ok:
            failures.append(f"golden: pixel diff {delta:.3e} > {PIXEL_BAR}")

    # ---- generated samples for the metric stages -------------------------
    fakes = None
    if (args.images and args.inception) or args.lpips:
        log(f"generating {args.num_samples} samples...")

        @jax.jit
        def sample(z, k):
            return generator_apply(cfg, params, z, depth=depth, alpha=1.0,
                                   rng=k, train=False).images
        key = jax.random.PRNGKey(args.seed)
        chunks = []
        for i in range(0, args.num_samples, args.batch):
            n = min(args.batch, args.num_samples - i)
            key, kz, ks = jax.random.split(key, 3)
            zz = jax.random.normal(kz, (n, cfg.latent_size))
            chunks.append(np.asarray(sample(zz, ks), np.float32))
        fakes = np.concatenate(chunks)[:args.num_samples]

    # ---- stage 3: FID ------------------------------------------------------
    if args.images and args.inception:
        log("stage 3/4: FID vs --images...")
        from stylegan_tpu.config import get_default_cfg
        from stylegan_tpu.data import make_dataset
        from stylegan_tpu.metrics import compute_fid
        dcfg = get_default_cfg().dataset
        dcfg.img_dir = args.images
        dcfg.resolution = RES
        dcfg.folder = False
        dataset = make_dataset(dcfg)
        rs = np.random.RandomState(args.seed)
        idx = rs.choice(len(dataset), size=min(args.num_samples, len(dataset)),
                        replace=len(dataset) < args.num_samples)
        reals = np.stack([dataset.get(int(i), rs) for i in idx])
        fid = compute_fid(np.clip((reals + 1) / 2, 0, 1),
                          np.clip((fakes + 1) / 2, 0, 1),
                          args.inception, batch_size=args.batch)
        gate["stages"]["fid"] = {"ok": True, "fid": round(float(fid), 4),
                                 "num_samples": int(len(idx))}
        log(f"  FID {fid:.3f}")
    else:
        gate["stages"]["fid"] = {
            "ok": None,
            "skipped": "needs --images and --inception weights"}

    # ---- stage 4: PPL ------------------------------------------------------
    if args.lpips:
        log("stage 4/4: PPL (LPIPS-VGG16)...")
        from stylegan_tpu.metrics import (load_lpips_weights, make_lpips_fn,
                                          ppl_samples, ppl_score)
        d = ppl_samples(cfg, params,
                        make_lpips_fn(load_lpips_weights(args.lpips)),
                        num_samples=args.num_samples, batch_size=args.batch,
                        key=jax.random.PRNGKey(args.seed), space="w",
                        sampling="full")
        gate["stages"]["ppl"] = {"ok": True, "ppl": round(ppl_score(d), 4),
                                 "num_samples": args.num_samples}
        log(f"  PPL {gate['stages']['ppl']['ppl']}")
    else:
        gate["stages"]["ppl"] = {"ok": None,
                                 "skipped": "needs --lpips weights"}

    finish()


if __name__ == "__main__":
    main()
