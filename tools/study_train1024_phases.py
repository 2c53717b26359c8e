"""FLOP-normalized per-phase roofline of the 1024^2 train step (VERDICT r4
#2: the 14.8% amortized MFU vs 77% at 128^2 is the largest unexplained
number in the repo — attribute it per phase or land a win).

Strategy: time NESTED PREFIXES of the real step structure (reuse_g_fwd +
logistic, the bench/perf configuration) as separate scan-chained programs,
so adjacent diffs attribute wall time per phase while each prefix keeps
XLA's real fusion context; divide by the phase's model FLOPs
(utils/flops.py convention, backward = 2x forward) for per-phase MFU.

  g_fwd      : G forward only (train mode)                    1 F_G
  d_update   : + D(real)+D(fake) fwd, D bwd, Adam             + 6 F_D
  r1         : same with in-loss R1 (grad-of-grad)            + 6 F_D
  full_plain : + G phase (D fwd on fakes, D bwd-to-images,
               G bwd through the stored vjp, Adam, EMA)       + 2 F_G + 3 F_D
  full_r1    : the complete logistic+R1 step                  (3 F_G + 15 F_D)

As calibration, synth8 times the EVAL forward at the same batch 8 — if
g_fwd's MFU ~= synth8's, the train step's low MFU is batch starvation of
the same conv shapes, not a backward pessimization.

All programs thread their updated state through the scan carry and feed a
dependent scalar to the fetch (round-3 hygiene: anything not feeding the
fetched scalar gets DCE'd and reports pure-forward numbers).

Optionally (--hlo) dumps each program's optimized-HLO conv histogram, to
check the backward convs' lowering (transposed-conv pessimization at
C<=64 was VERDICT r4's named suspect).

Run SOLO on the chip:  python tools/study_train1024_phases.py
"""

import argparse
import collections
import json
import os
import re
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--hlo", action="store_true",
                    help="dump per-program optimized-HLO conv histograms")
    ap.add_argument("--jobs", default="")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import optax
    from stylegan_tpu.losses import logistic_dis_loss, logistic_gen_loss
    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_apply,
                                     ema_update, generator_apply,
                                     discriminator_init, generator_init)
    from stylegan_tpu.ops.precision import set_precision
    from stylegan_tpu.train import (create_train_state, make_d_optimizer,
                                    make_g_optimizer)
    from stylegan_tpu.utils.flops import (device_peak_tflops,
                                          discriminator_forward_flops,
                                          generator_forward_flops)

    set_precision("default")
    res = args.res
    import bench
    gen_cfg = bench._gen_cfg(res)
    dis_cfg = DiscriminatorConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=True)
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()
    depth = dis_cfg.depth - 1
    B, ITERS = args.batch, args.iters

    FG = generator_forward_flops(res)
    FD = discriminator_forward_flops(res)
    peak = device_peak_tflops()

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    t0 = time.time()

    def init_fn(k):
        return create_train_state(
            generator_init(jax.random.fold_in(k, 0), gen_cfg),
            discriminator_init(jax.random.fold_in(k, 1), dis_cfg),
            g_tx, d_tx, use_ema=True)

    inits = {}

    def run_init():
        inits["state"] = jax.jit(init_fn)(jax.random.PRNGKey(1))
        jax.block_until_ready(inits["state"])
        log(f"state init {time.time()-t0:.0f}s")

    init_thread = threading.Thread(target=run_init)
    init_thread.start()

    # ---- phase programs (mirror steps.py::_reused_fwd_tail exactly) ------

    def gen_forward(g_params, z, key, alpha):
        return generator_apply(gen_cfg, g_params, z, depth=depth, alpha=alpha,
                               rng=key, train=True)

    def dis_fn_of(d_params, alpha):
        return lambda imgs: discriminator_apply(dis_cfg, d_params, imgs,
                                                depth=depth, alpha=alpha)

    def make_prog(upto, r1_gamma=0.0):
        """upto: 'g_fwd' | 'd_update' | 'full'."""
        def scan_steps(state, key):
            def body(c, i):
                s, acc = c
                kb = jax.random.fold_in(key, i)
                reals = jax.random.normal(jax.random.fold_in(kb, 0),
                                          (B, res, res, 3), jnp.bfloat16)
                z = jax.random.normal(jax.random.fold_in(kb, 1),
                                      (B, gen_cfg.latent_size), jnp.bfloat16)
                k_shared = jax.random.fold_in(kb, 2)
                alpha = jnp.float32(1.0)
                g_params, d_params = s.g_params, s.d_params

                def g_images(gp):
                    out = gen_forward(gp, z, k_shared, alpha)
                    return out.images, out.avg_latent
                if upto == "g_fwd":
                    # forward only, no vjp residuals kept — the pure G
                    # forward cost at train-step batch
                    imgs, _ = g_images(g_params)
                    return (s, acc + imgs.mean().astype(jnp.float32)), None
                (fakes_val, new_avg), g_vjp = jax.vjp(g_images, g_params)
                fakes = jax.lax.stop_gradient(fakes_val)

                def d_only(dp):
                    return logistic_dis_loss(dis_fn_of(dp, alpha), reals,
                                             fakes, None, r1_gamma=r1_gamma)
                d_loss_val, d_grads = jax.value_and_grad(d_only)(d_params)
                d_updates, d_opt_state = d_tx.update(d_grads, s.d_opt_state,
                                                     d_params)
                d_params = optax.apply_updates(d_params, d_updates)
                if upto == "d_update":
                    s = s._replace(d_params=d_params, d_opt_state=d_opt_state)
                    # fold the fakes into the fetched scalar so the G
                    # forward isn't DCE'd (no cotangent pull — that would
                    # run the G backward and contaminate the phase)
                    return (s, acc + d_loss_val
                            + fakes_val.mean().astype(jnp.float32)), None

                def g_img_loss(imgs):
                    return logistic_gen_loss(dis_fn_of(d_params, alpha),
                                             reals, imgs, None)
                g_loss_val, img_cot = jax.value_and_grad(g_img_loss)(fakes_val)
                avg_cot = (None if new_avg is None
                           else jnp.zeros_like(new_avg))
                (g_grads,) = g_vjp((img_cot, avg_cot))
                g_updates, g_opt_state = g_tx.update(g_grads, s.g_opt_state,
                                                     g_params)
                g_params = optax.apply_updates(g_params, g_updates)
                g_shadow = ema_update(s.g_shadow, g_params, 0.999)
                s = s._replace(g_params=g_params, d_params=d_params,
                              g_opt_state=g_opt_state,
                              d_opt_state=d_opt_state, g_shadow=g_shadow)
                return (s, acc + d_loss_val + g_loss_val), None
            (s, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                       jnp.arange(ITERS))
            return acc
        return scan_steps

    def make_synth8():
        def scan_fwd(state, key):
            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (B, gen_cfg.latent_size), jnp.bfloat16)
                o = generator_apply(gen_cfg, state.g_params, z, depth=depth,
                                    alpha=1.0,
                                    rng=jax.random.fold_in(key, 2 * i + 1),
                                    train=False)
                return c + o.images.mean().astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc
        return scan_fwd

    # phase model-FLOPs per image (utils/flops.py module-docstring
    # multipliers; g_fwd excludes the vjp residual save which is free)
    jobs = {
        "synth8": (make_synth8(), 1 * FG),
        "g_fwd": (make_prog("g_fwd"), 1 * FG),
        "d_update": (make_prog("d_update"), 1 * FG + 6 * FD),
        "d_update_r1": (make_prog("d_update", r1_gamma=10.0),
                        1 * FG + 12 * FD),
        "full_plain": (make_prog("full"), 3 * FG + 9 * FD),
        "full_r1": (make_prog("full", r1_gamma=10.0), 3 * FG + 15 * FD),
    }
    if args.jobs:
        keep = set(args.jobs.split(","))
        jobs = {n: v for n, v in jobs.items() if n in keep}

    struct = jax.eval_shape(init_fn, jax.random.PRNGKey(1))
    compiled, errors = {}, {}

    def compile_job(name, fn):
        try:
            tt = time.time()
            compiled[name] = jax.jit(fn).lower(
                struct, jax.random.PRNGKey(7)).compile()
            log(f"compiled {name} {time.time()-tt:.0f}s")
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)
            log(f"compile FAILED {name}: {e!r}")

    threads = [threading.Thread(target=compile_job, args=(n, fn))
               for n, (fn, _) in jobs.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    init_thread.join()

    hlo_convs = {}
    if args.hlo:
        # conv histogram of each optimized program: window/dilation reveal
        # the backward convs' chosen lowering form
        pat = re.compile(r"convolution\(.*?window={(.*?)}.*?dim_labels=(\S+)",
                         re.S)
        for n, fn in compiled.items():
            try:
                txt = fn.as_text()
            except Exception as e:  # noqa: BLE001
                hlo_convs[n] = repr(e)
                continue
            hist = collections.Counter()
            for line in txt.splitlines():
                if " convolution(" not in line and "convolution(" not in line:
                    continue
                m = re.search(r"window={([^}]*)}", line)
                d = re.search(r"dim_labels=([^ ,]+)", line)
                shp = re.search(r"= (\S+?) convolution", line)
                hist[(m.group(1) if m else "?",
                      d.group(1) if d else "?",
                      shp.group(1) if shp else "?")] += 1
            hlo_convs[n] = [
                {"window": k[0], "dims": k[1], "out": k[2], "count": v}
                for k, v in hist.most_common(24)]

    best = {n: float("inf") for n in compiled}
    for n, fn in compiled.items():
        tt = time.time()
        float(fn(inits["state"], jax.random.PRNGKey(100)))
        log(f"{n} load call {time.time()-tt:.0f}s")
    for r in range(args.rounds):
        for n, fn in compiled.items():
            tt = time.perf_counter()
            float(fn(inits["state"], jax.random.PRNGKey(200 + r)))
            dt = time.perf_counter() - tt
            best[n] = min(best[n], dt)
            log(f"round {r} {n}: {dt*1e3:.0f} ms")

    out = {"batch": B, "iters": ITERS,
           "fg_gflop": round(FG / 1e9, 1), "fd_gflop": round(FD / 1e9, 1)}
    n_img = B * ITERS
    for n in compiled:
        flops = jobs[n][1]
        t_img = best[n] / n_img
        out[n + "_ms_per_img"] = round(t_img * 1e3, 3)
        out[n + "_mfu"] = round(flops / t_img / 1e12 / peak, 4) if peak \
            else None
    # adjacent diffs = per-phase cost + per-phase MFU
    phases = [("d_phase", "d_update", "g_fwd", 6 * FD),
              ("r1_phase", "d_update_r1", "d_update", 6 * FD),
              ("g_phase", "full_plain", "d_update", 2 * FG + 3 * FD),
              ("g_phase_r1prog", "full_r1", "d_update_r1", 2 * FG + 3 * FD)]
    for name, hi, lo, flops in phases:
        if hi in best and lo in best:
            dt_img = (best[hi] - best[lo]) / n_img
            out[name + "_ms_per_img"] = round(dt_img * 1e3, 3)
            if peak and dt_img > 0:
                out[name + "_mfu"] = round(flops / dt_img / 1e12 / peak, 4)
    if errors:
        out["errors"] = errors
    if hlo_convs:
        out["hlo_convs"] = hlo_convs
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
