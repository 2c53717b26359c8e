"""128^2 train-step batch sweep (VERDICT r3 #3).

The 128^2 fused train step (the reference's per-depth batch is 16,
reference config.py:40-41) is fixed-cost-dominated at batch 16 (G fwd
0.35 ms/img vs the 3.3 ms/img step), so unlike the 1024^2 case — where the
batch knob was a measured dead end (docs/DESIGN.md) — a larger batch may
amortize a large win.  This study measures the step at batch 16/32/64/128
with the round-3 measurement hygiene:

  * every variant is a lax.scan of K steps with fresh inputs inside ONE jit,
    fetching a dependent scalar (per-call block_until_ready lies on this
    tunnel);
  * all variants AOT-compile from concurrent threads (compiles overlap);
  * variants are measured INTERLEAVED in one process over several rounds
    (cross-process variance is +-20%), call 0 discarded as program load;
  * updated params thread through the scan carry so nothing is DCE'd.

Run SOLO (never concurrently with pytest/bench: CLAUDE.md contention rule):

  python tools/study_train128_batch.py [--batches 16,32,64,128] [--rounds 3]

Prints one JSON line per batch and a final summary line.
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
    ap.add_argument("--batches", default="16,32,64,128")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--loss", default="relativistic-hinge")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--work_per_variant", type=int, default=512,
                    help="images per timed call (iters = work/batch)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                     MappingConfig, SynthesisConfig,
                                     discriminator_init, generator_init)
    from stylegan_tpu.ops.precision import set_precision
    from stylegan_tpu.train import (build_train_step, create_train_state,
                                    make_d_optimizer, make_g_optimizer)
    from stylegan_tpu.utils.flops import (device_peak_tflops, mfu_fields,
                                          train_step_flops)

    set_precision("default")
    res = args.res
    batches = [int(b) for b in args.batches.split(",")]

    gen_cfg = GeneratorConfig(
        resolution=res, truncation_psi=0.7,
        mapping=MappingConfig(mapping_layers=8,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=True))
    dis_cfg = DiscriminatorConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=True)
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    t0 = time.time()
    state = jax.jit(lambda k: create_train_state(
        generator_init(jax.random.fold_in(k, 0), gen_cfg),
        discriminator_init(jax.random.fold_in(k, 1), dis_cfg),
        g_tx, d_tx, use_ema=True))(jax.random.PRNGKey(1))
    jax.block_until_ready(state)
    log(f"state init {time.time()-t0:.0f}s")

    step = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx,
                            depth=dis_cfg.depth - 1, loss=args.loss,
                            donate=False, fuse_scores=True, reuse_g_fwd=True)

    def make_scan(batch, iters):
        def scan_steps(st, key):
            def body(c, i):
                s, acc = c
                reals = jax.random.normal(jax.random.fold_in(key, 3 * i),
                                          (batch, res, res, 3), jnp.bfloat16)
                z = jax.random.normal(jax.random.fold_in(key, 3 * i + 1),
                                      (batch, gen_cfg.latent_size),
                                      jnp.bfloat16)
                s, metrics = step(s, reals, z,
                                  jax.random.fold_in(key, 3 * i + 2),
                                  jnp.float32(1.0))
                return (s, acc + metrics["d_loss"]), None
            (s, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)),
                                       jnp.arange(iters))
            return acc
        return scan_steps

    state_struct = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    compiled, errors = {}, {}

    def compile_job(batch):
        iters = max(2, args.work_per_variant // batch)
        try:
            t = time.time()
            fn = jax.jit(make_scan(batch, iters))
            compiled[batch] = (fn.lower(state_struct,
                                        jax.random.PRNGKey(7)).compile(),
                               iters)
            log(f"compiled b{batch} (iters {iters}) {time.time()-t:.0f}s")
        except Exception as e:  # noqa: BLE001
            errors[batch] = repr(e)
            log(f"compile FAILED b{batch}: {e!r}")

    threads = [threading.Thread(target=compile_job, args=(b,))
               for b in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    # program load (call 0), then interleaved rounds
    best = {b: float("inf") for b in compiled}
    for b, (fn, iters) in compiled.items():
        t = time.time()
        float(fn(state, jax.random.PRNGKey(100)))
        log(f"b{b} load call {time.time()-t:.0f}s")
    for r in range(args.rounds):
        for b, (fn, iters) in compiled.items():
            t = time.perf_counter()
            float(fn(state, jax.random.PRNGKey(200 + r)))
            dt = time.perf_counter() - t
            best[b] = min(best[b], dt)
            log(f"round {r} b{b}: {dt*1e3:.0f} ms "
                f"({dt/iters*1e3:.1f} ms/step)")

    peak = device_peak_tflops()
    fpi = float(train_step_flops(res, loss=args.loss))
    results = {}
    for b, (fn, iters) in compiled.items():
        ips = b * iters / best[b]
        rec = {"batch": b, "ms_per_step": round(best[b] / iters * 1e3, 2),
               "imgs_per_sec": round(ips, 1),
               **mfu_fields(ips, fpi, peak)}
        results[b] = rec
        print(json.dumps(rec), flush=True)
    if errors:
        print(json.dumps({"compile_errors": errors}), flush=True)
    if results:
        bb = max(results.values(), key=lambda r: r["imgs_per_sec"])
        print(json.dumps({"metric": f"train_{res}_best_batch_imgs_per_sec",
                          "value": bb["imgs_per_sec"],
                          "best_batch": bb["batch"],
                          "loss": args.loss}), flush=True)


if __name__ == "__main__":
    main()
