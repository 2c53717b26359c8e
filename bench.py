"""Benchmark: 1024x1024 StyleGAN synthesis throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric (BASELINE.md): images/sec/chip for full FFHQ-1024 generation
(mapping + synthesis, eval semantics, bf16 activations / f32 params, NHWC,
space-to-depth packed execution for the low-channel stages — ops/packed.py).
The reference publishes no numbers (SURVEY.md §6); the driver-defined target
is >=3x an A100 running the reference PyTorch implementation.  vs_baseline is
therefore reported against 3 x A100_EST, where A100_EST is our estimate of
the torch reference's A100 1024^2 synthesis throughput (~25 img/s — StyleGAN1
synthesis is ~72 GFLOP/img and the reference runs unfused f32 eager torch).
vs_baseline >= 1.0 means the 3x-A100 target is met.

Secondary metrics: the full fused train step (D+G+EMA) at 128^2 batch 16
(the reference's per-depth batch), and at 1024^2 batch 8 with the
logistic+R1 loss (the expensive grad-of-grad configuration).
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

A100_EST_IMGS_PER_SEC = 25.0
TARGET_MULTIPLIER = 3.0
T_START = time.time()


def _gen_cfg(res, packed=True):
    from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                     SynthesisConfig)
    return GeneratorConfig(
        resolution=res, truncation_psi=0.7,
        mapping=MappingConfig(mapping_layers=8,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=packed))


def main():
    import jax
    import jax.numpy as jnp
    from stylegan_tpu.models import generator_apply, generator_init
    from stylegan_tpu.ops.precision import set_precision

    set_precision("default")
    cfg = _gen_cfg(1024)
    params = generator_init(jax.random.PRNGKey(0), cfg)
    depth = cfg.synthesis.depth - 1

    ITERS = 16  # amortizes the tunnel's ~27ms host-fetch latency to <2ms/iter

    def make_scan(batch):
        # ITERS fresh-latent forwards chained inside ONE jit, one host fetch
        # of a scalar that depends on every image: immune to the async /
        # memoizing dispatch behavior of tunneled backends.
        @jax.jit
        def scan_fwd(params, key):
            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (batch, cfg.latent_size), jnp.bfloat16)
                out = generator_apply(cfg, params, z, depth=depth, alpha=1.0,
                                      rng=jax.random.fold_in(key, 2 * i + 1),
                                      train=False)
                return c + out.images.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc
        return scan_fwd

    def run(batch):
        f = make_scan(batch)
        float(f(params, jax.random.PRNGKey(1)))  # compile + warm
        best_dt = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            float(f(params, jax.random.PRNGKey(10 + trial)))
            best_dt = min(best_dt, time.perf_counter() - t0)
        return batch * ITERS / best_dt

    # largest batch first: throughput has always been monotone in batch on
    # this chip (365 img/s at 32 -> 575 at 128; 256 crashes the compiler),
    # and stopping at the first batch that compiles+runs saves several
    # ~2-minute 1024^2 compiles through the tunnel
    best_bs, best = 0, 0.0
    for batch in (128, 32, 8):
        try:
            best_bs, best = batch, run(batch)
            break
        except Exception:
            continue

    train_ips = _train_throughput(res=128, batch=16, loss="relativistic-hinge")
    train_1024_ips = _train_throughput(res=1024, batch=8, loss="logistic",
                                       iters=2)
    # lazy R1 (r1_interval=16, gamma scaled — same time-averaged penalty):
    # amortized step cost = (t_r1 + 15 * t_plain) / 16, measured from the
    # gamma=0 program (no grad-of-grad) + the every-step number above.
    # Optional metric: skipped when compiles already ate the time budget
    # (tunneled backends spend minutes per 1024^2 compile) so the required
    # metrics always make it out.
    LAZY_N = 16
    lazy_1024_ips = None
    if time.time() - T_START < 720:
        plain_1024_ips = _train_throughput(res=1024, batch=8, loss="logistic",
                                           iters=2, r1_gamma=0.0)
        if train_1024_ips and plain_1024_ips:
            t_amort = (1.0 / train_1024_ips
                       + (LAZY_N - 1) / plain_1024_ips) / LAZY_N
            lazy_1024_ips = 1.0 / t_amort

    result = {
        "metric": "1024x1024 synthesis throughput (1 chip)",
        "value": round(best, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / (TARGET_MULTIPLIER * A100_EST_IMGS_PER_SEC), 3),
        "batch_size": best_bs,
        "train_128_imgs_per_sec": round(train_ips, 3) if train_ips else None,
        "train_1024_imgs_per_sec": (round(train_1024_ips, 3)
                                    if train_1024_ips else None),
        "train_1024_lazy_r1_imgs_per_sec": (round(lazy_1024_ips, 3)
                                            if lazy_1024_ips else None),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "baseline_note": ("vs_baseline = value / (3 x est. 25 img/s torch-A100); "
                          "reference publishes no numbers (BASELINE.md)"),
    }
    print(json.dumps(result))


def _train_throughput(res, batch, loss, iters=4, r1_gamma=None):
    """Full fused train step (D+G+EMA) images/sec at `res` (BASELINE.md).

    res=128/relativistic-hinge is the reference default config; res=1024/
    logistic adds the R1 grad-of-grad penalty (the expensive path);
    r1_gamma=0.0 measures the lazy-R1 off-step program (no grad-of-grad)."""
    import jax
    import jax.numpy as jnp
    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_init,
                                     generator_init)
    from stylegan_tpu.train import (build_train_step, create_train_state,
                                    make_d_optimizer, make_g_optimizer)
    try:
        gen_cfg = _gen_cfg(res)
        dis_cfg = DiscriminatorConfig(resolution=res, blur_filter=(1, 2, 1),
                                      structure="linear", packed=True)
        g_tx, d_tx = make_g_optimizer(), make_d_optimizer()
        state = create_train_state(
            generator_init(jax.random.PRNGKey(0), gen_cfg),
            discriminator_init(jax.random.PRNGKey(1), dis_cfg),
            g_tx, d_tx, use_ema=True)
        depth = dis_cfg.depth - 1
        step = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=depth,
                                loss=loss, donate=False, r1_gamma=r1_gamma)

        @jax.jit
        def scan_steps(state, key):
            def body(c, i):
                st, acc = c
                reals = jax.random.normal(jax.random.fold_in(key, 3 * i),
                                          (batch, res, res, 3), jnp.bfloat16)
                z = jax.random.normal(jax.random.fold_in(key, 3 * i + 1),
                                      (batch, gen_cfg.latent_size),
                                      jnp.bfloat16)
                st, metrics = step(st, reals, z,
                                   jax.random.fold_in(key, 3 * i + 2),
                                   jnp.float32(1.0))
                return (st, acc + metrics["d_loss"]), None
            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                        jnp.arange(iters))
            return acc

        float(scan_steps(state, jax.random.PRNGKey(2)))
        best = float("inf")
        for trial in range(2):
            t0 = time.perf_counter()
            float(scan_steps(state, jax.random.PRNGKey(10 + trial)))
            best = min(best, time.perf_counter() - t0)
        return batch * iters / best
    except Exception:
        return None


if __name__ == "__main__":
    main()
