"""One-off: per-request 1024^2 synthesis LATENCY at small batch (serving).

bench.py's headline is throughput at batch 128; a serving deployment also
cares about the latency of a single small request.  This measures the full
generator (mapping + synthesis, eval semantics, packed + bf16 — the
export_generator.py configuration) at batch 1/4/8.

Method (docs/DESIGN.md "measurement hygiene"): K scan-chained calls with
fresh inputs inside ONE jitted program, fetch a dependent scalar, take the
best of N trials after the program-load call.  The tunnel adds ~1.8 ms per
scan STEP, so the per-call number is reported both raw and with that bias
subtracted; on a direct (non-tunneled) TPU the truth is near the corrected
number.  Results are recorded in docs/SERVING.md.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TUNNEL_SCAN_STEP_MS = 1.8  # measured, docs/DESIGN.md
ITERS = 32


def main():
    import jax
    import jax.numpy as jnp

    from stylegan_tpu.models import generator_apply, generator_init
    from stylegan_tpu.ops.precision import set_precision

    sys.path.insert(0, REPO)
    from bench import _gen_cfg  # same flagship config as the throughput bench

    set_precision("default")
    cfg = _gen_cfg(1024)
    depth = cfg.synthesis.depth - 1
    print(f"# backend: {jax.default_backend()} {jax.devices()[0]}",
          flush=True)

    params = jax.jit(lambda k: generator_init(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("# params ready", flush=True)

    results = {}
    for batch in (1, 2, 4, 8):
        def scan_fwd(p, key):
            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (batch, cfg.latent_size), jnp.bfloat16)
                o = generator_apply(cfg, p, z, depth=depth, alpha=1.0,
                                    rng=jax.random.fold_in(key, 2 * i + 1),
                                    train=False)
                return c + o.images.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc

        t0 = time.time()
        fn = jax.jit(scan_fwd).lower(params, jax.random.PRNGKey(7)).compile()
        print(f"# batch {batch}: compiled in {time.time()-t0:.0f}s",
              flush=True)
        best = float("inf")
        for trial in range(4):  # trial 0 = program load
            t0 = time.perf_counter()
            float(fn(params, jax.random.PRNGKey(10 + trial)))
            dt = time.perf_counter() - t0
            if trial:
                best = min(best, dt)
        per_call_ms = best / ITERS * 1e3
        results[batch] = {
            "latency_ms_raw": round(per_call_ms, 2),
            "latency_ms_tunnel_corrected": round(
                per_call_ms - TUNNEL_SCAN_STEP_MS, 2),
            "imgs_per_sec_raw": round(batch / (per_call_ms / 1e3), 1),
        }
        print(json.dumps({"batch": batch, **results[batch]}), flush=True)
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
