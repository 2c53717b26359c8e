"""Benchmark: 1024x1024 StyleGAN synthesis throughput on one TPU chip.

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
(Intermediate, strictly-improving JSON lines are printed as metrics land so a
timeout kill still leaves a parseable result in the output tail — the round-2
driver run was killed mid-compile and captured nothing; see VERDICT.md #1.)

Headline metric (BASELINE.md): images/sec/chip for full FFHQ-1024 generation
(mapping + synthesis, eval semantics, bf16 activations / f32 params, NHWC,
space-to-depth packed execution for the low-channel stages — ops/packed.py).
The reference publishes no numbers (SURVEY.md §6); the driver-defined target
is >=3x an A100 running the reference PyTorch implementation (~25 img/s est.),
so vs_baseline = value / 75 and >= 1.0 means the target is met.

Secondary metrics: the full fused train step (D+G+EMA) at 128^2 batch 16
(the reference's per-depth batch), at 1024^2 batch 8 with logistic+R1 (the
expensive grad-of-grad configuration), and the lazy-R1 amortized number.

Robustness design for this tunneled-TPU environment (all empirically
verified, see CLAUDE.md / docs/DESIGN.md):
- The JAX persistent compilation cache WEDGES the axon backend (dispatch
  returns, fetch never completes, cache dir stays empty) — do not enable it.
- Remote compiles are slow (20-220s per program) but PARALLEL compile RPCs
  overlap ~perfectly, so every program is AOT-compiled from concurrent
  threads: wall time ~= slowest compile, not the sum.
- Param/state init must be jitted (one fused program): eager init pays
  ~27ms/dispatch through the tunnel — 40s for the 1024^2 generator alone.
- First execution of a fresh executable costs another ~20-60s (program
  load); steady-state calls are fast.  Warm calls count as trial 0.
- Fresh processes occasionally hang at startup, and the backend has wedged
  mid-run once: the measurement runs in a child process; the parent watches
  a heartbeat file (liveness) and retries while the deadline budget allows —
  each retry RESUMES from the already-measured metrics (state file).  The
  FIRST device query (client init through the relay) is itself a hang mode
  (observed 3x in a row during a tunnel outage) and is deadman-guarded.  The
  known mid-run wedge mode is a device-value FETCH that never returns
  (dispatch succeeds, GIL released, process otherwise healthy) — the
  liveness beat cannot see it, so every blocking fetch in the worker is
  armed with a deadman timer that emits the partial JSON and os._exit(3)s,
  handing control back to the parent's resume path.
- A hard print-deadline (BENCH_DEADLINE_S, default 540s) guarantees whatever
  has been measured is printed with exit 0 before typical driver timeouts.
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

A100_EST_IMGS_PER_SEC = 25.0
TARGET_MULTIPLIER = 3.0
BASE = TARGET_MULTIPLIER * A100_EST_IMGS_PER_SEC
T_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "540"))
STARTUP_STALL_S = 120.0   # no heartbeat this long after spawn => startup hang
RUN_STALL_S = 150.0       # mid-run heartbeat silence => wedged backend

BASELINE_NOTE = ("vs_baseline = value / (3 x est. 25 img/s torch-A100); "
                 "reference publishes no numbers (BASELINE.md)")


# --------------------------------------------------------------------------
# parent: watchdog around the measuring child
# --------------------------------------------------------------------------

def parent():
    last_json = None
    state = tempfile.NamedTemporaryFile(prefix="bench_state_", suffix=".json",
                                        delete=False)
    state.close()
    attempt = 0
    while True:
        attempt += 1
        if DEADLINE_S - (time.time() - T_START) < 90:
            break  # not enough budget left for another attempt
        hb = tempfile.NamedTemporaryFile(prefix="bench_hb_", delete=False)
        hb.close()
        if last_json:  # retry resumes: skip metrics already measured
            with open(state.name, "w") as f:
                f.write(last_json)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", hb.name,
             state.name, str(DEADLINE_S - (time.time() - T_START))],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
        spawn_t = time.time()

        got_line = [last_json]

        def pump():
            for line in proc.stdout:
                line = line.strip()
                if line.startswith("{"):
                    got_line[0] = line
                    print(line, flush=True)  # insurance: land partials early
        t = threading.Thread(target=pump, daemon=True)
        t.start()

        while proc.poll() is None:
            now = time.time()
            if now - T_START > DEADLINE_S - 15:
                proc.kill()
                break
            stall = now - max(os.path.getmtime(hb.name), spawn_t)
            limit = STARTUP_STALL_S if now - spawn_t < STARTUP_STALL_S + 30 \
                else RUN_STALL_S
            if stall > limit:
                print(f"# parent: heartbeat stalled {stall:.0f}s, killing "
                      f"worker (attempt {attempt})", file=sys.stderr,
                      flush=True)
                proc.kill()
                break
            time.sleep(2)
        t.join(timeout=10)
        last_json = got_line[0]
        # a worker can die with NO output at all (observed: silent native
        # crash of the tunnel client ~8 min in — no traceback, no
        # fetch-guard trip, no heartbeat stall); log the rc so the failure
        # mode is diagnosable from the driver's stderr capture
        print(f"# parent: worker attempt {attempt} exited rc="
              f"{proc.returncode} after {time.time()-spawn_t:.0f}s",
              file=sys.stderr, flush=True)
        try:
            os.unlink(hb.name)
        except OSError:
            pass
        if proc.returncode == 0 and last_json is not None:
            break  # clean finish

    if last_json is None:
        last_json = json.dumps({
            "metric": "1024x1024 synthesis throughput (1 chip)",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": "worker hung twice (tunnel startup hang)"})
    try:
        os.unlink(state.name)
    except OSError:
        pass
    print(last_json, flush=True)


# --------------------------------------------------------------------------
# worker: parallel AOT compiles, then serial headline-first measurement
# --------------------------------------------------------------------------

def _gen_cfg(res, packed=True, fold_blur=False):
    # fold_blur=True only on the synthesis (eval) metrics: the blur fold is
    # a measured +2.1% on synthesis forward but a net loss inside the train
    # step (docs/DESIGN.md round 4), matching the 'auto' yaml semantics.
    from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                     SynthesisConfig)
    return GeneratorConfig(
        resolution=res, truncation_psi=0.7,
        mapping=MappingConfig(mapping_layers=8,
                              dlatent_broadcast=(res.bit_length() - 2) * 2),
        synthesis=SynthesisConfig(resolution=res, blur_filter=(1, 2, 1),
                                  structure="linear", packed=packed,
                                  fold_blur=fold_blur))


def worker(hb_path, state_path, budget_s):
    import jax
    import jax.numpy as jnp
    from stylegan_tpu.models import (DiscriminatorConfig, discriminator_init,
                                     generator_apply, generator_init)
    from stylegan_tpu.ops.precision import set_precision
    from stylegan_tpu.train import (build_train_step, create_train_state,
                                    make_d_optimizer, make_g_optimizer)

    deadline = time.time() + float(budget_s) - 30.0

    stop_hb = threading.Event()

    def beat():
        while not stop_hb.is_set():
            os.utime(hb_path, None)
            stop_hb.wait(5)
    threading.Thread(target=beat, daemon=True).start()

    def note(msg):
        print(f"# [{time.time()-T_START:5.0f}s] {msg}", file=sys.stderr,
              flush=True)

    # Deadman around blocking device-value fetches: the one observed mid-run
    # wedge mode is a fetch that never returns while the process stays
    # otherwise healthy (so the liveness heartbeat keeps beating).  Arm a
    # timer before each fetch; on expiry, land the partial JSON on stdout
    # and exit 3 — the parent retries and RESUMES from the state file.
    import contextlib

    @contextlib.contextmanager
    def fetch_guard(limit_s, what, fatal=True):
        """fatal=True: bail for a parent retry (right for startup-phase
        hangs, where a fresh process fixes the tunnel connection and the
        budget still allows recompiles).  fatal=False (mid-run measures):
        land the partial JSON as insurance but KEEP WAITING — late in the
        budget a retry cannot recompile anything anyway, and a merely-slow
        (not wedged) fetch can still complete and upgrade the result; the
        parent's deadline kill bounds the wait either way."""
        def trip():
            note(f"fetch_guard: {what} exceeded {limit_s:.0f}s — "
                 + ("bailing for parent retry" if fatal
                    else "landing partial JSON, waiting on"))
            print(json.dumps(out), flush=True)
            if fatal:
                os._exit(3)
        timer = threading.Timer(limit_s, trip)
        timer.daemon = True
        timer.start()
        try:
            yield
        finally:
            timer.cancel()

    out = {
        "metric": "1024x1024 synthesis throughput (1 chip)",
        "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
        "batch_size": 0, "baseline_note": BASELINE_NOTE,
    }
    # The FIRST device query triggers the tunneled backend's client init —
    # an observed hang mode (seen live: worker stuck here >6 min with the
    # liveness heartbeat still beating, so the parent never intervened).
    # Guard it like any other blocking fetch: bail for a parent retry,
    # which gets a fresh process (fresh tunnel connection, usually fine).
    with fetch_guard(120, "backend init (first device query)"):
        out["backend"] = jax.default_backend()
        dev = jax.devices()[0]
        out["device"] = str(dev)

    # analytic model-FLOP accounting (utils/flops.py; VERDICT r3 #2): every
    # throughput metric carries gflops_per_img / tflops_per_sec / mfu.
    # MFU = model FLOPs / peak bf16 — packed execution's extra MACs are NOT
    # credited, so raw hardware utilization is strictly higher on the
    # packed stages.
    from stylegan_tpu.utils.flops import (device_peak_tflops,
                                          generator_forward_flops,
                                          lazy_r1_amortized_flops, mfu_fields,
                                          train_step_flops)
    peak = device_peak_tflops(dev)
    out["device_kind"] = getattr(dev, "device_kind", "?")
    if peak:
        out["peak_bf16_tflops"] = peak
    FLOPS = {
        "synth": float(generator_forward_flops(1024)),
        "train_128": float(train_step_flops(
            128, loss="relativistic-hinge")),
        "train_1024": float(train_step_flops(
            1024, loss="logistic", with_r1=True)),
        "train_1024_lazy_r1": float(lazy_r1_amortized_flops(1024, 16)),
    }

    def attach_mfu(prefix, imgs_per_sec, flop_key):
        for k, v in mfu_fields(imgs_per_sec, FLOPS[flop_key], peak).items():
            out[f"{prefix}{k}"] = v
    try:
        with open(state_path) as f:
            txt = f.read().strip()
        if txt:
            out.update(json.loads(txt))
            note(f"resuming with prior metrics: "
                 f"{[k for k in out if 'imgs_per_sec' in k or k == 'value']}")
    except (OSError, ValueError):
        pass

    set_precision("default")
    cfg = _gen_cfg(1024, fold_blur=True)  # eval path: fold is a +2.1% win
    ITERS = 16  # amortizes the tunnel's ~1.8ms/scan-step + ~27ms fetch latency

    need_synth = not (out.get("value", 0) > 0 and out.get("batch_size") == 128)
    need_synth8 = out.get("value", 0) == 0
    need_t128 = "train_128_imgs_per_sec" not in out
    need_r1 = "train_1024_imgs_per_sec" not in out
    need_lazy = "train_1024_lazy_r1_imgs_per_sec" not in out

    # ---- stage 0: jitted inits, in parallel (eager init = 27ms/dispatch
    # through the tunnel; one fused program is 3-4x faster).  Inits run
    # CONCURRENTLY with the stage-1 compiles: compiles lower against
    # jax.eval_shape abstract states, so they never wait on init values —
    # on a degraded tunnel (observed: 170s inits + 180s compiles) this
    # halves time-to-first-metric vs the old serial staging. ---------------
    built = {}          # tag -> real arrays (ready when init_done[tag] set)
    init_done = {"gen": threading.Event(), "t128": threading.Event(),
                 "t1024": threading.Event()}

    def gen_init_fn(k):
        return generator_init(k, cfg)

    def build_gen_params():
        built["gen"] = jax.jit(gen_init_fn)(jax.random.PRNGKey(0))
        with fetch_guard(240, "generator init"):
            jax.block_until_ready(built["gen"])
        init_done["gen"].set()

    def train_setup(res):
        gen_cfg = _gen_cfg(res)
        dis_cfg = DiscriminatorConfig(resolution=res, blur_filter=(1, 2, 1),
                                      structure="linear", packed=True)
        g_tx, d_tx = make_g_optimizer(), make_d_optimizer()

        def init(k):
            return create_train_state(
                generator_init(jax.random.fold_in(k, 0), gen_cfg),
                discriminator_init(jax.random.fold_in(k, 1), dis_cfg),
                g_tx, d_tx, use_ema=True)
        return gen_cfg, dis_cfg, g_tx, d_tx, init

    setups = {"t128": train_setup(128), "t1024": train_setup(1024)}

    def build_train(tag):
        st = jax.jit(setups[tag][4])(jax.random.PRNGKey(1))
        with fetch_guard(240, f"train state init {tag}"):
            jax.block_until_ready(st)
        built[tag] = st
        init_done[tag].set()

    init_err = {}

    def guarded_init(fn, tag, *args):
        try:
            fn(*args)
            note(f"init ready: {tag}")
        except Exception as e:  # noqa: BLE001 — fail only this tag's metrics
            init_err[tag] = repr(e)
            note(f"init FAILED {tag}: {e!r}")
            init_done[tag].set()

    init_jobs = []
    if need_synth or need_synth8:
        init_jobs.append(threading.Thread(
            target=guarded_init, args=(build_gen_params, "gen")))
    if need_t128:
        init_jobs.append(threading.Thread(
            target=guarded_init, args=(build_train, "t128", "t128")))
    if need_r1 or need_lazy:
        init_jobs.append(threading.Thread(
            target=guarded_init, args=(build_train, "t1024", "t1024")))
    for t in init_jobs:
        t.start()

    def make_synth(batch):
        depth = cfg.synthesis.depth - 1

        def scan_fwd(params, key):
            def body(c, i):
                z = jax.random.normal(jax.random.fold_in(key, 2 * i),
                                      (batch, cfg.latent_size), jnp.bfloat16)
                o = generator_apply(cfg, params, z, depth=depth, alpha=1.0,
                                    rng=jax.random.fold_in(key, 2 * i + 1),
                                    train=False)
                return c + o.images.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return acc
        arg_struct = jax.eval_shape(gen_init_fn, jax.random.PRNGKey(0))
        return scan_fwd, arg_struct, "gen", batch * ITERS

    def make_train_scan(tag, batch, loss, iters, r1_gamma=None):
        gen_cfg, dis_cfg, g_tx, d_tx, init = setups[tag]
        res = dis_cfg.resolution
        # the full perf-path step configuration (trainer yaml knobs:
        # ops.fuse_scores auto-on under bf16; ops.reuse_g_fwd OPT-IN — it
        # has two documented semantic deltas vs the reference's two-forward
        # pattern, see train/steps.py).  Labeled in the output JSON so the
        # train numbers aren't mistaken for the all-defaults configuration.
        out["train_step_knobs"] = "fuse_scores + reuse_g_fwd (perf path)"
        step = build_train_step(gen_cfg, dis_cfg, g_tx, d_tx,
                                depth=dis_cfg.depth - 1, loss=loss,
                                donate=False, r1_gamma=r1_gamma,
                                fuse_scores=True, reuse_g_fwd=True)

        def scan_steps(state, key):
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
            (s, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                       jnp.arange(iters))
            return acc
        arg_struct = jax.eval_shape(init, jax.random.PRNGKey(1))
        return scan_steps, arg_struct, tag, batch * iters

    # ---- stage 1: AOT-compile everything in parallel threads, overlapped
    # with the stage-0 inits (compiles take abstract arg structs) ----------
    compiled = {}
    errors = {}

    def compile_job(name, build):
        try:
            t0 = time.time()
            fn, arg_struct, arg_tag, n_imgs = build()
            key = jax.random.PRNGKey(7)
            compiled[name] = (jax.jit(fn).lower(arg_struct, key).compile(),
                              arg_tag, n_imgs)
            note(f"compiled {name} in {time.time()-t0:.0f}s")
        except Exception as e:  # noqa: BLE001 — report, never die
            errors[name] = repr(e)
            note(f"compile FAILED {name}: {e!r}")

    jobs = {}
    if need_synth8:
        jobs["synth8"] = lambda: make_synth(8)
    if need_synth:
        jobs["synth128"] = lambda: make_synth(128)
    if need_t128:
        jobs["train128"] = lambda: make_train_scan(
            "t128", 16, "relativistic-hinge", 4)
    if need_r1:
        jobs["train1024_r1"] = lambda: make_train_scan(
            "t1024", 8, "logistic", 2)
    if need_lazy:
        jobs["train1024_plain"] = lambda: make_train_scan(
            "t1024", 8, "logistic", 2, r1_gamma=0.0)

    threads = {n: threading.Thread(target=compile_job, args=(n, b))
               for n, b in jobs.items()}
    for t in threads.values():
        t.start()

    # ---- stage 2: measure serially, headline-first, emit as we go --------
    def emit():
        print(json.dumps(out), flush=True)

    def measure(name, trials=2):
        fn, arg_tag, n_imgs = compiled[name]
        # wait for the matching init thread (runs concurrently with compiles)
        if not init_done[arg_tag].wait(timeout=max(0.0, left())):
            raise RuntimeError(f"init {arg_tag} not ready before deadline")
        if arg_tag in init_err:
            raise RuntimeError(f"init {arg_tag} failed: {init_err[arg_tag]}")
        arg0 = built[arg_tag]
        tw = time.time()
        best = float("inf")
        for trial in range(trials + 1):  # first call = program load, slow
            t0 = time.perf_counter()
            # trial 0 includes the executable load: 5-60s normally, but
            # observed >150s on a degraded tunnel with compiles in flight —
            # scale the guard to the remaining budget instead of bailing
            limit = (min(240.0, max(90.0, left() - 45.0)) if trial == 0
                     else 60)
            with fetch_guard(limit, f"measure {name}", fatal=False):
                float(fn(arg0, jax.random.PRNGKey(10 + trial)))
            dt = time.perf_counter() - t0
            if trial > 0:
                best = min(best, dt)
        note(f"measured {name}: load+{trials} trials in {time.time()-tw:.0f}s"
             f", best {best:.2f}s")
        return n_imgs / best

    def left():
        return deadline - time.time()

    def join(name, budget):
        if name not in threads:
            return False
        threads[name].join(timeout=max(0.0, budget))
        return name in compiled

    def set_headline(v, batch):
        if v > out["value"]:
            out.update(value=round(v, 3), vs_baseline=round(v / BASE, 3),
                       batch_size=batch)
            attach_mfu("", v, "synth")
            emit()

    def try_measure(name):
        """One metric must never sink the rest (e.g. its init thread died)."""
        try:
            return measure(name)
        except Exception as e:  # noqa: BLE001
            errors[name] = repr(e)
            note(f"measure FAILED {name}: {e!r}")
            return None

    if join("synth8", left()):
        v = try_measure("synth8")
        if v:
            set_headline(v, 8)
    if join("synth128", left()):
        v = try_measure("synth128")
        if v:
            set_headline(v, 128)
    if join("train128", left()):
        v = try_measure("train128")
        if v:
            out["train_128_imgs_per_sec"] = round(v, 3)
            attach_mfu("train_128_", v, "train_128")
            # batch 16 IS the best batch: the round-4 sweep (16/32/64/128/
            # 256, tools/study_train128_batch.py) measured a flat-to-
            # declining curve — the step already runs ~77% model-MFU at
            # batch 16, so there is no amortizable fixed cost left
            # (docs/DESIGN.md round 4).
            out["train_128_best_batch_imgs_per_sec"] = round(v, 3)
            out["train_128_best_batch"] = 16
            emit()
    r1_ips = plain_ips = None
    if join("train1024_r1", left()):
        r1_ips = try_measure("train1024_r1")
        if r1_ips:
            out["train_1024_imgs_per_sec"] = round(r1_ips, 3)
            attach_mfu("train_1024_", r1_ips, "train_1024")
            emit()
    if join("train1024_plain", left()):
        plain_ips = try_measure("train1024_plain")
    if r1_ips is None and "train_1024_imgs_per_sec" in out:
        r1_ips = out["train_1024_imgs_per_sec"]  # resumed from prior attempt
    if need_lazy and r1_ips and plain_ips:
        # lazy R1 (r1_interval=16, gamma scaled — same time-averaged
        # penalty): amortized cost = (t_r1 + 15 * t_plain) / 16.
        LAZY_N = 16
        t_amort = (1.0 / r1_ips + (LAZY_N - 1) / plain_ips) / LAZY_N
        out["train_1024_lazy_r1_imgs_per_sec"] = round(1.0 / t_amort, 3)
        attach_mfu("train_1024_lazy_r1_", 1.0 / t_amort, "train_1024_lazy_r1")
        emit()

    # quiet re-measure: earlier numbers were taken while other compile RPCs
    # were still in flight (server-side contention can under-report); if
    # budget allows, re-run the cheap headline metrics and keep the max.
    if all(not t.is_alive() for t in threads.values()) and left() > 60:
        for name, key, batch in (("synth128", "value", 128),
                                 ("train128", "train_128_imgs_per_sec", None)):
            if name in compiled and left() > 30:
                v = try_measure(name)
                if v and v > (out.get(key) or 0.0):
                    out[key] = round(v, 3)
                    if key == "value":
                        out["vs_baseline"] = round(v / BASE, 3)
                        out["batch_size"] = batch
                        attach_mfu("", v, "synth")
                    else:
                        attach_mfu("train_128_", v, "train_128")
                        out["train_128_best_batch_imgs_per_sec"] = round(v, 3)
        emit()
    if errors:
        out["compile_errors"] = [f"{n}: {r}" for n, r in sorted(errors.items())]
        emit()
    stop_hb.set()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        parent()
