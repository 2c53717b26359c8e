"""Progressive-growing quality-evidence run (VERDICT r3 #1).

Drives the reference's *defining* training mode — the full linear schedule
4^2 -> final res with per-depth batch sizes and 50% fade-in
(reference models/GAN.py:682-826, config.py:38-42) — on the full perf stack
(logistic + lazy R1/16, packed, bf16 activations, EMA, fused scoring,
single-G-forward), tracking the EMA generator's SWD at each depth's native
resolution and archiving per-depth sample grids.

Two evidence artifacts beyond the fixed-depth run (tools/train_quality_run.py):

* the generator *grows*: per-depth SWD curves + grids across 6 depth
  transitions with fade-in alpha ramps, ending at a final-depth SWD
  comparable to the fixed-depth run's;
* checkpoint+resume across a depth boundary is *bit-identical*: the run
  saves a full checkpoint at the 64^2 -> 128^2 boundary and records the
  next K step losses; `--verify_resume` restores it in a fresh process
  (fresh compile), replays those K steps from the restored RNG + data
  stream, and requires exact float equality.

  python tools/train_progressive_run.py --out runs/progressive_128
  python tools/train_progressive_run.py --out runs/progressive_128 --verify_resume

Outputs: <out>/metrics.jsonl (one line per eval), <out>/grid_d<depth>_*.png,
<out>/boundary_ckpt.npz + boundary_rng.npz + resume_expected.json,
<out>/resume_check.json (verify mode), <out>/summary.json.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from train_quality_run import save_grid, structured_batch  # noqa: E402


def build_trainer(res, seed):
    from stylegan_tpu.config import get_default_cfg
    from stylegan_tpu.train.trainer import StyleGAN
    opt = get_default_cfg()
    return StyleGAN(
        structure="linear", resolution=res, num_channels=3,
        latent_size=opt.model.gen.latent_size,
        g_args=opt.model.gen, d_args=opt.model.dis,
        g_opt_args=opt.model.g_optim, d_opt_args=opt.model.d_optim,
        loss="logistic", use_ema=True, ema_decay=0.999,
        seed=seed, activations_dtype="bfloat16", packed_layout=True,
        r1_interval=16, fuse_scores=True, reuse_g_fwd=True)


def warm_depth(trainer, depth, batch, res, done_events, log):
    """AOT-compile a depth's train programs (both lazy-R1 variants) and its
    sampler in background threads, stashing the executables in the trainer's
    step cache so the first real step at that depth pays no compile.
    Compiles overlap ~perfectly on this tunneled backend (docs/DESIGN.md)."""
    import jax
    import jax.numpy as jnp
    state_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), trainer.state)
    dt = trainer.activations_dtype
    key_struct = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    reals_s = jax.ShapeDtypeStruct((batch, res, res, 3), dt)
    z_s = jax.ShapeDtypeStruct((batch, trainer.latent_size), dt)
    alpha_s = jax.ShapeDtypeStruct((), jnp.float32)

    def compile_step(with_r1):
        t0 = time.time()
        fn = trainer._get_step(depth, None, with_r1)
        cache_key = (depth, 1, with_r1)
        try:
            compiled = fn.lower(state_struct, reals_s, z_s, key_struct,
                                alpha_s).compile()
            trainer._steps[cache_key] = compiled
            log(f"warm d{depth} r1={with_r1} compiled {time.time()-t0:.0f}s")
        except Exception as e:  # noqa: BLE001 — fall back to lazy jit compile
            log(f"warm d{depth} r1={with_r1} FAILED ({e!r}); lazy compile")

    def compile_sampler():
        t0 = time.time()
        fn = trainer._get_sample_fn(depth)
        shadow_struct = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            trainer.state.g_shadow)
        z32 = jax.ShapeDtypeStruct((32, trainer.latent_size), jnp.float32)
        try:
            fn.lower(shadow_struct, z32, key_struct, alpha_s, None).compile()
            log(f"warm d{depth} sampler compiled {time.time()-t0:.0f}s")
        except Exception as e:  # noqa: BLE001
            log(f"warm d{depth} sampler FAILED ({e!r}); lazy compile")

    threads = [threading.Thread(target=compile_step, args=(True,)),
               threading.Thread(target=compile_step, args=(False,)),
               threading.Thread(target=compile_sampler)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    done_events[depth].set()


def downsample_np(images, factor):
    """Box-downsample NHWC float images by an integer factor (matches the
    step's progressive avg-pool semantics for eval reals)."""
    if factor <= 1:
        return images
    n, h, w, c = images.shape
    return images.reshape(n, h // factor, factor, w // factor, factor,
                          c).mean(axis=(2, 4))


def make_eval_swd(trainer, eval_reals_by_depth, eval_z):
    """Side-effect-free SWD eval: fixed z + explicit keys, reads g_shadow,
    never consumes trainer RNG (required for bit-identical resume replay).
    SWD math runs on the host CPU backend so evals don't pay the tunnel's
    per-dispatch latency."""
    import jax
    import jax.numpy as jnp
    from stylegan_tpu.metrics import sliced_wasserstein_distance
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None

    def eval_swd(depth, alpha):
        fn = trainer._get_sample_fn(depth)
        fakes = []
        for i in range(0, 256, 32):
            imgs, _ = fn(trainer.state.g_shadow,
                         jnp.asarray(eval_z[i:i + 32]),
                         jax.random.PRNGKey(9000 + i),
                         jnp.float32(alpha), None)
            fakes.append(np.asarray(imgs, np.float32))
        fakes = np.concatenate(fakes)
        reals = eval_reals_by_depth[depth]

        def run():
            return sliced_wasserstein_distance(
                jnp.asarray(reals), jnp.asarray(fakes),
                key=jax.random.PRNGKey(4321))
        if cpu is not None:
            with jax.default_device(cpu):
                swd = run()
        else:
            swd = run()
        return {k: round(float(v) * 1e3, 2) for k, v in swd.items()}, fakes
    return eval_swd


def save_rng_sidecar(path, trainer, rs, step_index, depth):
    st = rs.get_state()
    np.savez(path, key=np.asarray(trainer._key),
             rs_keys=st[1], rs_pos=st[2], rs_has_gauss=st[3],
             rs_cached=st[4], step_index=step_index, depth=depth,
             update_count=trainer._update_count)


def load_rng_sidecar(path, trainer, rs):
    d = np.load(path)
    import jax.numpy as jnp
    trainer._key = jnp.asarray(d["key"])
    trainer._update_count = int(d["update_count"])
    rs.set_state(("MT19937", d["rs_keys"], int(d["rs_pos"]),
                  int(d["rs_has_gauss"]), float(d["rs_cached"])))
    return int(d["step_index"]), int(d["depth"])


def draw_batch(pool, rs, batch):
    idx = rs.randint(0, len(pool), batch)
    reals = pool[idx]
    flip = rs.rand(batch) < 0.5
    reals[flip] = reals[flip, :, ::-1]
    return reals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/progressive_128")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--steps_per_depth", default="800,800,1200,1600,2400,5200")
    ap.add_argument("--batches", default="128,128,128,64,32,16")
    ap.add_argument("--fade_pct", type=float, default=50.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pool", type=int, default=2048)
    ap.add_argument("--resume_k", type=int, default=8,
                    help="steps recorded/replayed for the resume proof")
    ap.add_argument("--budget_s", type=float, default=None)
    ap.add_argument("--verify_resume", action="store_true",
                    help="restore the boundary checkpoint in this fresh "
                         "process and replay K steps bit-identically")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    RES = args.res
    n_depths = int(np.log2(RES)) - 1
    steps_per_depth = [int(s) for s in args.steps_per_depth.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    assert len(steps_per_depth) == n_depths and len(batches) == n_depths, \
        (steps_per_depth, batches, n_depths)
    boundary_depth = n_depths - 1  # checkpoint right before the final depth

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    trainer = build_trainer(RES, args.seed)

    rs = np.random.RandomState(args.seed)
    log(f"generating {args.pool}-image training pool...")
    pool = structured_batch(rs, args.pool, RES)
    eval_reals_full = structured_batch(np.random.RandomState(777), 256, RES)
    eval_reals_by_depth = {
        d: downsample_np(eval_reals_full, 2 ** (n_depths - 1 - d))
        for d in range(n_depths)}
    eval_z = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1234), (256, trainer.latent_size)))
    eval_swd = make_eval_swd(trainer, eval_reals_by_depth, eval_z)

    ckpt_path = os.path.join(args.out, "boundary_ckpt.npz")
    rng_path = os.path.join(args.out, "boundary_rng.npz")
    expected_path = os.path.join(args.out, "resume_expected.json")

    def fade_alpha(depth, ticker, steps_d):
        if depth == 0:
            return 1.0
        fade_point = int(args.fade_pct / 100.0 * steps_d)
        return min(1.0, ticker / fade_point) if fade_point > 0 else 1.0

    # ------------------------------------------------------------------
    if args.verify_resume:
        with open(expected_path) as f:
            expected = json.load(f)
        _, meta = trainer.state, trainer.restore_full_state(ckpt_path)
        step_index, depth = load_rng_sidecar(rng_path, trainer, rs)
        assert depth == boundary_depth, (depth, boundary_depth)
        steps_d = steps_per_depth[depth]
        batch = batches[depth]
        log(f"replaying {len(expected['losses'])} steps at depth {depth} "
            f"from the boundary checkpoint (fresh process, fresh compile)")
        replayed = []
        for ticker in range(1, len(expected["losses"]) + 1):
            alpha = fade_alpha(depth, ticker, steps_d)
            reals = draw_batch(pool, rs, batch)
            d_loss, g_loss = trainer.train_on_batch(reals, depth, alpha)
            replayed.append([d_loss, g_loss])
            log(f"replay step {ticker}: d={d_loss:.6f} g={g_loss:.6f}")
        diffs = [max(abs(a[0] - b[0]), abs(a[1] - b[1]))
                 for a, b in zip(expected["losses"], replayed)]
        check = {
            "steps_replayed": len(replayed),
            "expected": expected["losses"],
            "replayed": replayed,
            "max_abs_diff": max(diffs),
            "bit_identical": all(d == 0.0 for d in diffs),
        }
        with open(os.path.join(args.out, "resume_check.json"), "w") as f:
            json.dump(check, f, indent=1)
        print(json.dumps({k: check[k] for k in
                          ("steps_replayed", "max_abs_diff",
                           "bit_identical")}), flush=True)
        sys.exit(0 if check["bit_identical"] else 1)

    # ------------------------------------------------------------------
    # main progressive run
    warm_done = {d: threading.Event() for d in range(n_depths)}
    threading.Thread(target=warm_depth, daemon=True,
                     args=(trainer, 0, batches[0], RES, warm_done, log)
                     ).start()

    t0 = time.time()
    metrics_path = os.path.join(args.out, "metrics.jsonl")
    history = []
    expected_losses = []
    global_step = 0
    aborted = None
    mf = open(metrics_path, "a")

    def do_eval(depth, ticker, alpha, steps_d, grid=False):
        swd, fakes = eval_swd(depth, alpha)
        rec = {"step": global_step, "depth": depth, "res": 2 ** (depth + 2),
               "local_step": ticker, "alpha": round(float(alpha), 4),
               "elapsed_s": round(time.time() - t0, 1), "swd_x1e3": swd}
        history.append(rec)
        mf.write(json.dumps(rec) + "\n")
        mf.flush()
        print(json.dumps(rec), flush=True)
        if grid:
            save_grid(os.path.join(
                args.out, f"grid_d{depth}_{ticker:06d}.png"), fakes[:36])

    for depth in range(n_depths):
        steps_d = steps_per_depth[depth]
        batch = batches[depth]
        res_d = 2 ** (depth + 2)
        eval_every = max(args.resume_k + 1, steps_d // 4)
        log(f"=== depth {depth} ({res_d}^2), {steps_d} steps, batch {batch}")
        # wait for this depth's programs (warmed a depth ahead); fall back
        # to lazy compile if warming is still in flight after the timeout
        warm_done[depth].wait(timeout=900)
        if depth + 1 < n_depths:
            threading.Thread(target=warm_depth, daemon=True,
                             args=(trainer, depth + 1, batches[depth + 1],
                                   RES, warm_done, log)).start()
        if depth == boundary_depth:
            # checkpoint at the depth boundary: full train state + RNG +
            # data-stream state, before the first step of the final depth
            trainer.save_full_state(ckpt_path, depth, 0)
            save_rng_sidecar(rng_path, trainer, rs, global_step, depth)
            log(f"saved boundary checkpoint at step {global_step}")

        for ticker in range(1, steps_d + 1):
            alpha = fade_alpha(depth, ticker, steps_d)
            if ticker == 1 or (ticker % eval_every) == 0:
                do_eval(depth, ticker - 1, alpha, steps_d,
                        grid=(ticker == 1))
            reals = draw_batch(pool, rs, batch)
            # deferred fetch except in the resume-proof window: per-step
            # float() costs a host round trip (~2-3x the step's compute
            # through the tunnel); deferring lets steps pipeline — the r4
            # run spent most of its 4372s wall on these fetches
            in_proof = depth == boundary_depth and ticker <= args.resume_k
            d_loss, g_loss = trainer.train_on_batch(reals, depth, alpha,
                                                    fetch=in_proof)
            if in_proof:
                expected_losses.append([d_loss, g_loss])
                if ticker == args.resume_k:
                    with open(expected_path, "w") as f:
                        json.dump({"losses": expected_losses,
                                   "depth": depth}, f)
            global_step += 1
            if ticker % 200 == 0:
                log(f"d{depth} step {ticker}/{steps_d}: d={float(d_loss):.4f} "
                    f"g={float(g_loss):.4f} ({time.time()-t0:.0f}s)")
            if args.budget_s and time.time() - t0 > args.budget_s:
                aborted = f"budget hit at depth {depth} step {ticker}"
                log(aborted)
                break
        do_eval(depth, steps_d if not aborted else ticker, 1.0, steps_d,
                grid=True)
        if aborted:
            break

    mf.close()
    final = [h for h in history if h["depth"] == n_depths - 1]
    summary = {
        "schedule": {"steps_per_depth": steps_per_depth, "batches": batches,
                     "fade_pct": args.fade_pct},
        "depths_completed": history[-1]["depth"] + 1 if history else 0,
        "total_steps": global_step,
        "final_depth_swd_avg_first": (final[0]["swd_x1e3"].get("avg")
                                      if final else None),
        "final_depth_swd_avg_last": (final[-1]["swd_x1e3"].get("avg")
                                     if final else None),
        "wall_s": round(time.time() - t0, 1),
        "aborted": aborted,
        "config": f"{RES}^2 progressive linear, logistic lazy-R1/16 packed "
                  f"bf16 EMA fuse_scores reuse_g_fwd",
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({**summary, "history": history}, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
