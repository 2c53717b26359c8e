"""Measure the blur-fold win (VERDICT r3 #4) at FFHQ-1024 shapes.

Interleaved scan-chained comparison (round-3 measurement hygiene; see
tools/study_train128_batch.py) of fold_blur off vs on for:

  * full 1024^2 synthesis forward at batch 128 (the bench headline), and
  * the 1024^2 fused train step at batch 8, logistic gamma=0 and +R1
    (the lazy-R1 program pair).

Run SOLO on the chip:  python tools/study_fold_blur.py
"""

import argparse
import json
import os
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--modes", default="nofold,fold,all",
                    help="comma list of nofold|fold|all to measure")
    ap.add_argument("--synth_batch", type=int, default=128)
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                     MappingConfig, SynthesisConfig,
                                     discriminator_init, generator_apply,
                                     generator_init)
    from stylegan_tpu.ops.precision import set_precision
    from stylegan_tpu.train import (build_train_step, create_train_state,
                                    make_d_optimizer, make_g_optimizer)

    set_precision("default")
    res = 1024

    def gen_cfg(fold):
        return GeneratorConfig(
            resolution=res, truncation_psi=0.7,
            mapping=MappingConfig(mapping_layers=8,
                                  dlatent_broadcast=(res.bit_length() - 2) * 2),
            synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                      structure="linear", packed=True,
                                      fold_blur=fold))

    def dis_cfg(fold):
        return DiscriminatorConfig(resolution=res, blur_filter=(1, 2, 1),
                                   structure="linear", packed=True,
                                   fold_blur=fold)

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    t0 = time.time()
    cfg0 = gen_cfg(False)
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()

    inits = {}
    def init_gen():
        inits["gen"] = jax.jit(lambda k: generator_init(k, cfg0))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(inits["gen"])
        log(f"gen init {time.time()-t0:.0f}s")

    def init_train():
        inits["train"] = jax.jit(lambda k: create_train_state(
            generator_init(jax.random.fold_in(k, 0), cfg0),
            discriminator_init(jax.random.fold_in(k, 1), dis_cfg(False)),
            g_tx, d_tx, use_ema=True))(jax.random.PRNGKey(1))
        jax.block_until_ready(inits["train"])
        log(f"train init {time.time()-t0:.0f}s")

    init_threads = [threading.Thread(target=init_gen)]
    if not args.skip_train:
        init_threads.append(threading.Thread(target=init_train))
    for t in init_threads:
        t.start()

    ITERS_S = 8

    def make_synth(fold):
        cfg = gen_cfg(fold)
        depth = cfg.synthesis.depth - 1

        def scan_fwd(params, key):
            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (args.synth_batch, cfg.latent_size),
                                      jnp.bfloat16)
                o = generator_apply(cfg, params, z, depth=depth, alpha=1.0,
                                    rng=jax.random.fold_in(key, 2 * i + 1),
                                    train=False)
                return c + o.images.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS_S))
            return acc
        struct = jax.eval_shape(lambda k: generator_init(k, cfg0),
                                jax.random.PRNGKey(0))
        return scan_fwd, struct, "gen", args.synth_batch * ITERS_S

    ITERS_T = 2

    def make_train(gfold, dfold, r1_gamma):
        gcfg, dcfg = gen_cfg(gfold), dis_cfg(dfold)
        step = build_train_step(gcfg, dcfg, g_tx, d_tx,
                                depth=dcfg.depth - 1, loss="logistic",
                                donate=False, r1_gamma=r1_gamma,
                                fuse_scores=True, reuse_g_fwd=True)

        def scan_steps(state, key):
            def body(c, i):
                s, acc = c
                reals = jax.random.normal(
                    jax.random.fold_in(key, 3 * i),
                    (args.train_batch, res, res, 3), jnp.bfloat16)
                z = jax.random.normal(jax.random.fold_in(key, 3 * i + 1),
                                      (args.train_batch, gcfg.latent_size),
                                      jnp.bfloat16)
                s, metrics = step(s, reals, z,
                                  jax.random.fold_in(key, 3 * i + 2),
                                  jnp.float32(1.0))
                return (s, acc + metrics["d_loss"]), None
            (s, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                       jnp.arange(ITERS_T))
            return acc

        def init(k):
            return create_train_state(
                generator_init(jax.random.fold_in(k, 0), cfg0),
                discriminator_init(jax.random.fold_in(k, 1), dis_cfg(False)),
                g_tx, d_tx, use_ema=True)
        struct = jax.eval_shape(init, jax.random.PRNGKey(1))
        return scan_steps, struct, "train", args.train_batch * ITERS_T

    # fold modes: nofold = two-pass blur; fold = packed stages only (kernel
    # footprint unchanged); all = also fold the unpacked C>=64 fused stages
    # (composed 6x6 kernel = 2.25x the plain conv's MACs); gfold/dfold =
    # train-step attribution (fold only the G / only the D network)
    MODES = {"nofold": (False, False), "fold": (True, True),
             "all": ("all", "all"), "gfold": (True, False),
             "dfold": (False, True)}
    modes = [m for m in args.modes.split(",") if m]
    jobs = {}
    for m in modes:
        gf, df = MODES[m]
        if m not in ("gfold", "dfold"):
            jobs[f"synth_{m}"] = (lambda f=gf: make_synth(f))
        if not args.skip_train:
            jobs[f"train_plain_{m}"] = (lambda g=gf, d=df: make_train(g, d, 0.0))
            jobs[f"train_r1_{m}"] = (lambda g=gf, d=df: make_train(g, d, 160.0))

    compiled, errors = {}, {}

    def compile_job(name, build):
        try:
            tt = time.time()
            fn, struct, tag, n_imgs = build()
            compiled[name] = (jax.jit(fn).lower(
                struct, jax.random.PRNGKey(7)).compile(), tag, n_imgs)
            log(f"compiled {name} {time.time()-tt:.0f}s")
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)
            log(f"compile FAILED {name}: {e!r}")

    threads = [threading.Thread(target=compile_job, args=(n, b))
               for n, b in jobs.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for t in init_threads:
        t.join()

    best = {n: float("inf") for n in compiled}
    for n, (fn, tag, _) in compiled.items():
        tt = time.time()
        float(fn(inits[tag], jax.random.PRNGKey(100)))
        log(f"{n} load call {time.time()-tt:.0f}s")
    for r in range(args.rounds):
        for n, (fn, tag, n_imgs) in compiled.items():
            tt = time.perf_counter()
            float(fn(inits[tag], jax.random.PRNGKey(200 + r)))
            dt = time.perf_counter() - tt
            best[n] = min(best[n], dt)
            log(f"round {r} {n}: {dt*1e3:.0f} ms")

    out = {}
    for n, (fn, tag, n_imgs) in compiled.items():
        out[n] = round(n_imgs / best[n], 2)
    for base in ("synth", "train_plain", "train_r1"):
        a = out.get(f"{base}_nofold")
        for m in ("fold", "all", "gfold", "dfold"):
            b = out.get(f"{base}_{m}")
            if a and b:
                out[f"{base}_{m}_speedup"] = round(b / a, 4)
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
