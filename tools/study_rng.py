"""Decompose the per-layer noise-generation cost (stage-study round 4:
~550 us/img of the 1640 us/img FFHQ-1024 eval iteration is noise).

Times, interleaved in one jit'd scan each (fresh fold_in key per step, a
dependent scalar fetched at the end):

  * bits:    raw 16-bit draws for the full noise pyramid
  * uniform: bf16 uniforms
  * normal:  bf16 normals (the production draw; threefry)
  * normal_rbg: same with an 'rbg'-impl key (XLA RngBitGenerator)
  * normal_flat: ONE flat normal draw of the pyramid's total size,
    sliced per layer (fewer-but-larger RNG fusions)

Pyramid = the FFHQ-1024 depth-8 noise set: 2 maps per res 4..1024, batch
--batch.  Run SOLO:  python tools/study_rng.py
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    B = args.batch
    ITERS = args.iters
    resolutions = [4 * 2 ** (l // 2) for l in range(18)]  # 2 per res 4..1024
    total = sum(r * r for r in resolutions)

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    def make(kind, rbg=False):
        from stylegan_tpu.ops import packed as pk

        def scan_fn(key):
            def body(c, i):
                k = jax.random.fold_in(key, i)
                acc = c
                if kind == "normal_s2d":
                    # the packed stages' noise path: draw + space_to_depth
                    # of the 4 packed-layer maps (2x 1024^2 + 2x 512^2 —
                    # 93% of the pyramid's elements)
                    for li, r in enumerate(resolutions):
                        kk = jax.random.fold_in(k, li)
                        v = jax.random.normal(kk, (B, r, r, 1), jnp.bfloat16)
                        if r >= 512:
                            v = pk.space_to_depth(v)
                        acc = acc + v.mean()
                    return acc, None
                if kind == "flat":
                    x = jax.random.normal(k, (B, total), jnp.bfloat16)
                    off = 0
                    for r in resolutions:
                        acc = acc + x[:, off:off + r * r].mean()
                        off += r * r
                    return acc, None
                for li, r in enumerate(resolutions):
                    kk = jax.random.fold_in(k, li)
                    if kind == "bits":
                        v = jax.random.bits(kk, (B, r, r, 1), jnp.uint16)
                        acc = acc + v.astype(jnp.float32).mean()
                    elif kind == "uniform":
                        v = jax.random.uniform(kk, (B, r, r, 1), jnp.bfloat16)
                        acc = acc + v.mean()
                    else:
                        v = jax.random.normal(kk, (B, r, r, 1), jnp.bfloat16)
                        acc = acc + v.mean()
                return acc, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc
        km = ((lambda s: jax.random.key(s, impl="rbg")) if rbg
              else jax.random.PRNGKey)
        return scan_fn, km

    jobs = {
        "bits": make("bits"),
        "uniform": make("uniform"),
        "normal": make("normal"),
        "normal_rbg": make("normal", rbg=True),
        "normal_flat": make("flat"),
        "normal_s2d": make("normal_s2d"),
    }
    compiled, errors = {}, {}

    def compile_job(name, fn, km):
        try:
            tt = time.time()
            compiled[name] = (jax.jit(fn).lower(km(7)).compile(), km)
            log(f"compiled {name} {time.time()-tt:.0f}s")
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)
            log(f"compile FAILED {name}: {e!r}")

    threads = [threading.Thread(target=compile_job, args=(n, f, k))
               for n, (f, k) in jobs.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    best = {n: float("inf") for n in compiled}
    for n, (fn, km) in compiled.items():
        tt = time.time()
        float(fn(km(100)))
        log(f"{n} load {time.time()-tt:.0f}s")
    for r in range(args.rounds):
        for n, (fn, km) in compiled.items():
            tt = time.perf_counter()
            float(fn(km(200 + r)))
            best[n] = min(best[n], time.perf_counter() - tt)
            log(f"round {r} {n}: {(time.perf_counter()-tt)*1e3:.0f} ms")

    n_img = B * ITERS
    out = {n: round(best[n] / n_img * 1e6, 1) for n in compiled}
    out = {f"{n}_us_per_img": v for n, v in out.items()}
    out["pyramid_elems_per_img"] = total
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
