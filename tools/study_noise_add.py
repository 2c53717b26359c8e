"""Isolate the packed noise-ADD cost at the FFHQ-1024 top-stage shape.

Round-4 stage study: per-image noise costs ~530 us/img inside the network
while the RNG pyramid alone is ~125 us/img standalone and broadcast-pinned
noise is nearly free — so the cost sits in CONSUMING per-image maps
(space_to_depth of (B, 2H, 2W, 1) + lane-tile + add into the packed
activation).  This bench times one 1024-stage epilogue-add in several
formulations, as a DEPENDENT chain of K instances inside one jit (fresh
keys per step; scan overhead cancels in the chain):

  cur:       x += w * tile(space_to_depth(normal(B,2H,2W,1)), C)  [prod]
  packdraw:  x += w * tile(normal(B,H,W,4), C)   [draw directly packed]
  viewadd:   view x as (...,C,4), += normal(B,H,W,1,4) broadcast  [no tile]
  control:   x = x * 1.000001 + 0.000001         [pure sweep floor]

Run SOLO:  python tools/study_noise_add.py [--batch 32]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.ops import packed as pk

    B, H, W, C = args.batch, 512, 512, 16  # 1024-stage: (B, 512, 512, 64)
    CP = C * 4

    def log(m):
        print(f"# {m}", file=sys.stderr, flush=True)

    def make(kind):
        def scan_fn(arg, key):
            x0 = arg["x"] if isinstance(arg, dict) else arg

            def body(c, i):
                x = c
                for j in range(args.chain):
                    k = jax.random.fold_in(jax.random.fold_in(key, i), j)
                    if kind == "control":
                        x = x * jnp.bfloat16(1.000001) + jnp.bfloat16(1e-6)
                    elif kind == "constnoise":
                        # same-shape add of a preloaded (B,H,W,4C) map: no
                        # RNG, no broadcast — isolates the add itself
                        x = x + jnp.bfloat16(0.1) * arg["n"]
                    elif kind == "fullnoise":
                        # draw packed (B,H,W,4), EXPAND to full lanes behind
                        # a barrier (one materialized relayout), same-shape
                        # add
                        n = jax.random.normal(k, (B, H, W, 4), jnp.bfloat16)
                        n = jax.lax.optimization_barrier(
                            jnp.tile(n, (1, 1, 1, C)))
                        x = x + jnp.bfloat16(0.1) * n
                    elif kind.startswith("drawonly"):
                        # materialized draw + UNTOUCHED x sweep: attributes
                        # the production cost alone.  _f32 draws in f32 and
                        # casts (bf16 transcendental-lowering suspicion);
                        # _bits draws raw u16.
                        shape = (4, B * H * W)
                        if kind == "drawonly_bits":
                            n = jax.random.bits(k, shape, jnp.uint16)
                        elif kind == "drawonly_f32":
                            n = jax.random.normal(k, shape, jnp.float32)
                        else:
                            n = jax.random.normal(k, shape, jnp.bfloat16)
                        # slice AFTER the barrier so the full draw must be
                        # materialized (slicing the raw draw would let XLA
                        # compute a single threefry element)
                        n = jax.lax.optimization_barrier(n)
                        x = x + n[0, 0].astype(jnp.bfloat16) * \
                            jnp.bfloat16(1e-6)
                    elif kind == "dotnoise":
                        # lane-DENSE production + MXU expansion: draw the
                        # noise transposed (4, BHW) so the RNG writes full
                        # 128-lane tiles, expand via dot((BHW,4),(4,4C)) —
                        # output is x-shaped flat, the add fuses as the
                        # dot's epilogue; no lane-sparse tensor ever exists
                        n = jax.random.normal(k, (4, B * H * W),
                                              jnp.bfloat16)
                        kk = (jnp.bfloat16(0.1) *
                              (jnp.arange(CP) % 4 ==
                               jnp.arange(4)[:, None]).astype(jnp.bfloat16))
                        e = jax.lax.dot_general(
                            n, kk, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        x = x + e.reshape(B, H, W, CP).astype(jnp.bfloat16)
                    elif kind == "convnoise":
                        # lane expansion via the MXU: the noise add is
                        # linear and pre-lrelu, so += conv1x1(n, K) with
                        # K[p, c] = w*(c%4==p) is exact — no lane broadcast
                        # on the VPU at all
                        n = jax.random.normal(k, (B, H, W, 4), jnp.bfloat16)
                        kk = (jnp.bfloat16(0.1) *
                              (jnp.arange(CP) % 4 ==
                               jnp.arange(4)[:, None]).astype(jnp.bfloat16))
                        x = x + jax.lax.conv_general_dilated(
                            n, kk[None, None], (1, 1), "VALID",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
                    elif kind == "cur":
                        n = jax.random.normal(k, (B, 2 * H, 2 * W, 1),
                                              jnp.bfloat16)
                        n = pk.space_to_depth(n)
                        x = x + jnp.bfloat16(0.1) * jnp.tile(n, (1, 1, 1, C))
                    elif kind == "packdraw":
                        n = jax.random.normal(k, (B, H, W, 4), jnp.bfloat16)
                        x = x + jnp.bfloat16(0.1) * jnp.tile(n, (1, 1, 1, C))
                    elif kind == "viewadd":
                        n = jax.random.normal(k, (B, H, W, 1, 4),
                                              jnp.bfloat16)
                        xv = x.reshape(B, H, W, C, 4)
                        x = (xv + jnp.bfloat16(0.1) * n).reshape(
                            B, H, W, CP)
                return x, None
            x, _ = jax.lax.scan(body, x0, jnp.arange(args.iters))
            return x.mean()
        return scan_fn

    kinds = ["control", "cur", "packdraw", "viewadd", "constnoise",
             "fullnoise", "convnoise", "dotnoise", "drawonly",
             "drawonly_f32", "drawonly_bits"]
    xs = jax.ShapeDtypeStruct((B, H, W, CP), jnp.bfloat16)
    structs = {k: ({"x": xs, "n": xs} if k == "constnoise" else xs)
               for k in kinds}
    compiled, errors = {}, {}

    def compile_job(kind):
        try:
            tt = time.time()
            compiled[kind] = jax.jit(make(kind)).lower(
                structs[kind], jax.random.PRNGKey(7)).compile()
            log(f"compiled {kind} {time.time()-tt:.0f}s")
        except Exception as e:  # noqa: BLE001
            errors[kind] = repr(e)
            log(f"compile FAILED {kind}: {e!r}")

    threads = [threading.Thread(target=compile_job, args=(k,))
               for k in kinds]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    x0 = jax.jit(lambda k: jax.random.normal(k, (B, H, W, CP),
                                             jnp.bfloat16))(
        jax.random.PRNGKey(0))
    n0 = jax.jit(lambda k: jax.random.normal(k, (B, H, W, CP),
                                             jnp.bfloat16))(
        jax.random.PRNGKey(1))
    jax.block_until_ready((x0, n0))
    arg = {k: ({"x": x0, "n": n0} if k == "constnoise" else x0)
           for k in kinds}

    best = {k: float("inf") for k in compiled}
    for k, fn in compiled.items():
        tt = time.time()
        float(fn(arg[k], jax.random.PRNGKey(100)))
        log(f"{k} load {time.time()-tt:.0f}s")
    for r in range(args.rounds):
        for k, fn in compiled.items():
            tt = time.perf_counter()
            float(fn(arg[k], jax.random.PRNGKey(200 + r)))
            best[k] = min(best[k], time.perf_counter() - tt)
            log(f"round {r} {k}: {(time.perf_counter()-tt)*1e3:.0f} ms")

    n_adds = args.batch * args.iters * args.chain
    out = {f"{k}_us_per_img_add": round(best[k] / n_adds * 1e6, 1)
           for k in compiled}
    for k in ("cur", "packdraw", "viewadd", "constnoise", "fullnoise",
              "convnoise", "dotnoise", "drawonly", "drawonly_f32",
              "drawonly_bits"):
        if k in out and "control" in out:
            out[f"{k}_minus_control"] = round(
                out[f"{k}_us_per_img_add"] - out["control_us_per_img_add"], 1)
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
