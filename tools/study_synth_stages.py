"""Per-stage attribution of the 1024^2 synthesis iteration at batch 128
(VERDICT r3 #4: attack the batch-insensitive component or prove it
floor-bound).

Measures, interleaved in one process (round-3 hygiene: scan-chained ITERS
per call, AOT concurrent compiles, call 0 = program load):

  * synth_d{5..8}: cumulative eval forward to depth d (res 128..1024),
    packed + fold_blur, STATIC alpha=1.0 (the serving path; the fade blend
    is skipped — models/synthesis.py round-4 specialization).  Adjacent
    diffs attribute time per stage.
  * synth_d8_traced: depth 8 with a TRACED alpha (the pre-round-4 bench
    configuration, residual to_rgb + upscale + full-res blend included) —
    the delta vs synth_d8 is the blend-skip win.
  * synth_d8_nonoise (--extras): use_noise=False — the delta attributes
    per-layer threefry noise generation + add.
  * synth_d8_rbg (--extras): the same network driven by an 'rbg'-impl key
    (XLA RngBitGenerator instead of threefry for every noise draw) — the
    candidate fix if threefry is expensive.

Run SOLO on the chip:  python tools/study_synth_stages.py
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--depths", default="5,6,7,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--extras", action="store_true",
                    help="also measure nonoise / rbg depth-8 variants")
    ap.add_argument("--jobs", default="",
                    help="comma list: only compile/measure these job names")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                     SynthesisConfig, generator_apply,
                                     generator_init)
    from stylegan_tpu.ops.precision import set_precision

    set_precision("default")
    res = 1024
    cfg = GeneratorConfig(
        resolution=res, truncation_psi=0.7,
        mapping=MappingConfig(mapping_layers=8,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=True,
                                  fold_blur=True))
    depths = [int(d) for d in args.depths.split(",")]
    ITERS = args.iters

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    t0 = time.time()
    from dataclasses import replace
    cfg_nonoise = replace(
        cfg, synthesis=replace(cfg.synthesis, use_noise=False))
    inits = {}

    def init_gen(tag, icfg):
        inits[tag] = jax.jit(lambda k: generator_init(k, icfg))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(inits[tag])
        log(f"{tag} init {time.time()-t0:.0f}s")

    def init_pinnedB(depth):
        def draw(k):
            return [jax.random.normal(jax.random.fold_in(k, l),
                                      (args.batch, 4 * 2 ** (l // 2),
                                       4 * 2 ** (l // 2), 1), jnp.bfloat16)
                    for l in range(2 * (depth + 1))]
        nz = jax.jit(draw)(jax.random.PRNGKey(40))
        jax.block_until_ready(nz)
        # share the base gen params (init_gen thread fills inits["gen"])
        while "gen" not in inits:
            time.sleep(1)
        inits["gen_pinnedB"] = {"p": inits["gen"], "noises": nz}
        log(f"gen_pinnedB init {time.time()-t0:.0f}s")

    init_threads = [threading.Thread(target=init_gen, args=("gen", cfg))]
    if args.extras:
        init_threads.append(threading.Thread(
            target=init_gen, args=("gen_nonoise", cfg_nonoise)))
        init_threads.append(threading.Thread(
            target=init_pinnedB, args=(max(depths),)))
    for it in init_threads:
        it.start()

    def make_synth(depth, traced_alpha, use_cfg=None, rbg=False,
                   pinned=False, prenoise=False):
        mcfg = use_cfg or cfg
        noises = None
        if pinned == "B":
            # fixed PER-IMAGE (B, r, r, 1) maps (consumption probe) — passed
            # as runtime ARGUMENTS bundled with params: embedding ~716 MB of
            # noise constants in the program blows the remote-compile
            # request limit (HTTP 413)
            pass
        elif pinned:
            # serving pinned-noise mode: one fixed (1, r, r, 1) map per
            # layer, broadcast over the batch in the epilogue add — isolates
            # the RNG cost from the apply cost
            noises = [jax.random.normal(jax.random.PRNGKey(40 + l),
                                        (1, 4 * 2 ** (l // 2),
                                         4 * 2 ** (l // 2), 1), jnp.bfloat16)
                      for l in range(2 * (depth + 1))]

        def scan_fwd(arg, key):
            params = arg["p"] if pinned == "B" else arg

            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (args.batch, mcfg.latent_size),
                                      jnp.bfloat16)
                alpha = jnp.float32(1.0) if traced_alpha else 1.0
                rng = jax.random.fold_in(key, 2 * i + 1)
                nz = arg["noises"] if pinned == "B" else noises
                if prenoise == "barrier":
                    # same upfront draws, but optimization_barrier'd so XLA
                    # must materialize each map ONCE instead of fusing the
                    # threefry chain into every consumer pass of the
                    # epilogue's instance-norm fusion (suspected recompute)
                    nz = [jax.lax.optimization_barrier(jax.random.normal(
                        jax.random.fold_in(rng, l),
                        (args.batch, 4 * 2 ** (l // 2), 4 * 2 ** (l // 2), 1),
                        jnp.bfloat16)) for l in range(2 * (depth + 1))]
                elif prenoise == "flat":
                    # layout probe: draw each map FLAT (B, r*r) — the shape
                    # the standalone RNG bench runs at full speed — then
                    # barrier + reshape to the consumer's (B, r, r, 1)
                    nz = [jax.lax.optimization_barrier(jax.random.normal(
                        jax.random.fold_in(rng, l),
                        (args.batch, (4 * 2 ** (l // 2)) ** 2),
                        jnp.bfloat16)).reshape(
                            args.batch, 4 * 2 ** (l // 2),
                            4 * 2 ** (l // 2), 1)
                          for l in range(2 * (depth + 1))]
                elif prenoise:
                    # the IDENTICAL draws _layer_noise makes inline
                    # (fold_in(rng, layer)), but issued upfront as one
                    # producer block instead of interleaved with the stages
                    nz = [jax.random.normal(
                        jax.random.fold_in(rng, l),
                        (args.batch, 4 * 2 ** (l // 2), 4 * 2 ** (l // 2), 1),
                        jnp.bfloat16) for l in range(2 * (depth + 1))]
                o = generator_apply(mcfg, params, z, depth=depth, alpha=alpha,
                                    rng=rng, train=False, noises=nz)
                return c + o.images.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc
        struct = jax.eval_shape(lambda k: generator_init(k, mcfg),
                                jax.random.PRNGKey(0))
        key_maker = ((lambda s: jax.random.key(s, impl="rbg")) if rbg
                     else jax.random.PRNGKey)
        tag = "gen_nonoise" if use_cfg is cfg_nonoise else "gen"
        if pinned == "B":
            tag = "gen_pinnedB"
            struct = {"p": struct, "noises": [
                jax.ShapeDtypeStruct((args.batch, 4 * 2 ** (l // 2),
                                      4 * 2 ** (l // 2), 1), jnp.bfloat16)
                for l in range(2 * (depth + 1))]}
        return scan_fwd, struct, key_maker, tag

    jobs = {f"synth_d{d}": (lambda d=d: make_synth(d, False))
            for d in depths}
    jobs["synth_d8_traced"] = lambda: make_synth(max(depths), True)
    if args.extras:
        jobs["synth_d8_nonoise"] = lambda: make_synth(
            max(depths), False, use_cfg=cfg_nonoise)
        jobs["synth_d8_rbg"] = lambda: make_synth(max(depths), False,
                                                  rbg=True)
        jobs["synth_d8_pinned"] = lambda: make_synth(max(depths), False,
                                                     pinned=True)
        jobs["synth_d8_prenoise"] = lambda: make_synth(max(depths), False,
                                                       prenoise=True)
        jobs["synth_d8_barrier"] = lambda: make_synth(max(depths), False,
                                                      prenoise="barrier")
        jobs["synth_d8_flatnoise"] = lambda: make_synth(max(depths), False,
                                                        prenoise="flat")
        jobs["synth_d8_pinnedB"] = lambda: make_synth(max(depths), False,
                                                      pinned="B")

    if args.jobs:
        keep = set(args.jobs.split(","))
        jobs = {n: b for n, b in jobs.items() if n in keep}

    compiled, errors = {}, {}

    def compile_job(name, build):
        try:
            tt = time.time()
            fn, struct, key_maker, tag = build()
            compiled[name] = (jax.jit(fn).lower(
                struct, key_maker(7)).compile(), key_maker, tag)
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
    for it in init_threads:
        it.join()

    best = {n: float("inf") for n in compiled}
    for n, (fn, km, tag) in compiled.items():
        tt = time.time()
        float(fn(inits[tag], km(100)))
        log(f"{n} load call {time.time()-tt:.0f}s")
    for r in range(args.rounds):
        for n, (fn, km, tag) in compiled.items():
            tt = time.perf_counter()
            float(fn(inits[tag], km(200 + r)))
            dt = time.perf_counter() - tt
            best[n] = min(best[n], dt)
            log(f"round {r} {n}: {dt*1e3:.0f} ms")

    out = {}
    n_img = args.batch * ITERS
    for n in compiled:
        out[n + "_imgs_per_sec"] = round(n_img / best[n], 2)
        out[n + "_us_per_img"] = round(best[n] / n_img * 1e6, 1)
    # adjacent-depth diffs = per-stage cost (includes the stage's share of
    # noise gen + to_rgb swap; the scan-step tunnel overhead cancels)
    for a, b in zip(depths, depths[1:]):
        ka, kb = f"synth_d{a}", f"synth_d{b}"
        if ka in compiled and kb in compiled:
            out[f"stage_{2**(b+2)}_us_per_img"] = round(
                (best[kb] - best[ka]) / n_img * 1e6, 1)
    dmax = f"synth_d{max(depths)}"
    for name, key in (("synth_d8_traced", "blend_skip_win_us_per_img"),
                      ("synth_d8_nonoise", "noise_cost_us_per_img"),
                      ("synth_d8_rbg", "rbg_win_us_per_img"),
                      ("synth_d8_pinned", "pinned_win_us_per_img"),
                      ("synth_d8_prenoise", "prenoise_win_us_per_img"),
                      ("synth_d8_barrier", "barrier_win_us_per_img"),
                      ("synth_d8_flatnoise", "flatnoise_win_us_per_img"),
                      ("synth_d8_pinnedB", "pinnedB_win_us_per_img")):
        if name in compiled and dmax in compiled:
            out[key] = round((best[name] - best[dmax]) / n_img * 1e6, 1)
    # noise_cost/rbg_win: positive = the baseline threefry path is SLOWER
    for key in ("noise_cost_us_per_img", "rbg_win_us_per_img",
                "pinned_win_us_per_img", "prenoise_win_us_per_img",
                "barrier_win_us_per_img", "flatnoise_win_us_per_img",
                "pinnedB_win_us_per_img"):
        if key in out:
            out[key] = -out[key]
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
