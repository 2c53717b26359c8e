"""Long-horizon training-quality evidence run (VERDICT r2 #8).

Trains the full perf stack (default 128^2, --res selects) — logistic + lazy R1 (interval 16),
space-to-depth packed execution, bf16 activations, EMA — on a structured
synthetic dataset for --steps fused updates (default 10k), tracking the
EMA generator's SWD against held-out reals every --eval_every steps and
archiving sample grids.  Stands in for the reference's trained sample
figures (reference README.md:60-98) while the environment has no real
dataset: the claim evidenced is "the full perf stack trains to improving
sample quality over a long horizon", not dataset-level fidelity.

  python tools/train_quality_run.py --steps 10000 --out runs/quality_128

Outputs: <out>/metrics.jsonl (one line per eval: step, swd levels, losses),
<out>/grid_<step>.png sample grids, <out>/summary.json.
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

def structured_batch(rs: np.random.RandomState, n: int,
                     res: int) -> np.ndarray:
    """Smooth colored gradient-blobs in [-1, 1] NHWC — structured enough
    that SWD separates a learning generator from noise (same family as the
    round-2 runs, so curves are comparable)."""
    yy, xx = np.meshgrid(np.linspace(-1, 1, res), np.linspace(-1, 1, res),
                         indexing="ij")
    out = np.empty((n, res, res, 3), np.float32)
    for i in range(n):
        img = np.zeros((res, res, 3), np.float32)
        # background color gradient
        g = rs.randn(2, 3).astype(np.float32) * 0.3
        img += xx[..., None] * g[0] + yy[..., None] * g[1]
        for _ in range(rs.randint(2, 5)):
            cx, cy = rs.uniform(-0.7, 0.7, 2)
            sig = rs.uniform(0.1, 0.45)
            color = rs.uniform(-1, 1, 3).astype(np.float32)
            blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig ** 2))
            img += blob[..., None] * color
        out[i] = np.tanh(img)
    return out


def save_grid(path: str, images: np.ndarray, cols: int = 6) -> None:
    from PIL import Image
    imgs = np.clip((images + 1) / 2, 0, 1)
    n, h, w, c = imgs.shape
    rows = (n + cols - 1) // cols
    canvas = np.zeros((rows * h, cols * w, c), np.float32)
    for i, im in enumerate(imgs):
        r, cc = divmod(i, cols)
        canvas[r * h:(r + 1) * h, cc * w:(cc + 1) * w] = im
    Image.fromarray((canvas * 255).astype(np.uint8)).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--res", type=int, default=128,
                    help="training resolution (power of two)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--grid_every", type=int, default=2000)
    ap.add_argument("--out", default="runs/quality_128")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--budget_s", type=float, default=None,
                    help="stop cleanly after this many seconds")
    args = ap.parse_args()
    RES = args.res
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.config import get_default_cfg, apply_runtime_knobs
    from stylegan_tpu.metrics import sliced_wasserstein_distance
    from stylegan_tpu.train.trainer import StyleGAN

    opt = get_default_cfg()
    opt.merge_from_list([
        "dataset.resolution", RES,
        "loss", "logistic",
        "r1_interval", 16,
        "precision.activations", "bfloat16",
        "ops.packed", True,
    ])
    apply_runtime_knobs(opt)

    trainer = StyleGAN(
        structure="linear", resolution=RES, num_channels=3,
        latent_size=opt.model.gen.latent_size,
        g_args=opt.model.gen, d_args=opt.model.dis,
        g_opt_args=opt.model.g_optim, d_opt_args=opt.model.d_optim,
        loss="logistic", use_ema=True, ema_decay=0.999,
        seed=args.seed, activations_dtype="bfloat16", packed_layout=True,
        r1_interval=16, fuse_scores=True, reuse_g_fwd=True)
    depth = trainer.depth - 1  # full resolution, no progressive schedule

    rs = np.random.RandomState(args.seed)
    # finite training set (like a real dataset; also keeps host-side data
    # generation off the step's critical path) + horizontal-flip augment
    print("# generating 2048-image training pool...", file=sys.stderr,
          flush=True)
    pool = structured_batch(rs, 2048, RES)
    eval_reals = structured_batch(np.random.RandomState(777), 256, RES)
    save_grid(os.path.join(args.out, "reals.png"), eval_reals[:36])
    sample_fn = trainer._get_sample_fn(depth)
    eval_z = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1234), (256, trainer.latent_size)))

    def eval_swd(step):
        fakes = []
        for i in range(0, 256, 32):
            imgs, _ = sample_fn(trainer.state.g_shadow,
                                jnp.asarray(eval_z[i:i + 32]),
                                jax.random.PRNGKey(9000 + i),
                                jnp.float32(1.0))
            fakes.append(np.asarray(imgs, np.float32))
        fakes = np.concatenate(fakes)
        swd = sliced_wasserstein_distance(
            jnp.asarray(eval_reals), jnp.asarray(fakes),
            key=jax.random.PRNGKey(4321))
        return ({k: round(float(v) * 1e3, 2) for k, v in swd.items()}, fakes)

    t0 = time.time()
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    history = []
    with open(metrics_path, "a") as mf:
        for step in range(args.steps + 1):
            if step % args.eval_every == 0 or step == args.steps:
                swd, fakes = eval_swd(step)
                rec = {"step": step, "elapsed_s": round(time.time() - t0, 1),
                       "swd_x1e3": swd}
                history.append(rec)
                mf.write(json.dumps(rec) + "\n")
                mf.flush()
                print(json.dumps(rec), flush=True)
                if step % args.grid_every == 0 or step == args.steps:
                    save_grid(os.path.join(args.out, f"grid_{step:06d}.png"),
                              fakes[:36])
            if step == args.steps:
                break
            if args.budget_s and time.time() - t0 > args.budget_s:
                print(f"# budget hit at step {step}", flush=True)
                break
            idx = rs.randint(0, len(pool), args.batch)
            reals = pool[idx]
            flip = rs.rand(args.batch) < 0.5
            reals[flip] = reals[flip, :, ::-1]
            # deferred fetch: losses pulled only at the log cadence so the
            # steps pipeline (a per-step float() costs ~2-3x the step's own
            # compute through the tunnel)
            d_loss, g_loss = trainer.train_on_batch(reals, depth, alpha=1.0,
                                                    fetch=False)
            if step % 100 == 0:
                print(f"# step {step}: d={float(d_loss):.4f} "
                      f"g={float(g_loss):.4f} "
                      f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    summary = {
        "steps_completed": history[-1]["step"] if history else 0,
        "swd_avg_first": history[0]["swd_x1e3"].get("avg"),
        "swd_avg_last": history[-1]["swd_x1e3"].get("avg"),
        "wall_s": round(time.time() - t0, 1),
        "config": f"{RES}^2 logistic lazy-R1/16 packed bf16 EMA batch "
                  f"{args.batch}",
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({**summary, "history": history}, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
