"""Worker process for the 2-process GSPMD (data x spatial) multi-host test.

Run as: python multihost_gspmd_worker.py <port> <process_id> <out_dir>

Two processes x 4 virtual CPU devices form one global 2-D mesh
(data=2, spatial=4): each process owns one data row, so its local devices
hold its full images split over height.  The worker drives the real
multi-host GSPMD path end to end — initialize_distributed -> global 2-D
mesh -> build_gspmd_train_step (logistic + R1, the grad-of-grad program) fed
with jax.make_array_from_process_local_data-assembled global arrays — then
dumps its replicated post-step parameters and losses for the parent test to
compare across processes (identical: GSPMD all-reduces parameter gradients
to replicated updates over both DCN-modeled axes).  Trainer-level multi-host
coverage lives in multihost_worker.py; the 2-D-mesh trainer path is covered
single-process in tests/test_spatial.py (a trainer phase here was cut in
round 5 — it doubled the driver dryrun's cost re-proving known semantics).

The reference has no multi-device path at all (SURVEY.md §2.11); this is
the executable proof that the 2-D spatial training step survives process
boundaries, not just the single-process virtual mesh of test_spatial.py.
"""

import json
import os
import sys


def main():
    import time
    t0 = time.time()

    def mark(m):
        print(f"[{time.time() - t0:5.1f}s] {m}", flush=True)

    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")
    # correctness worker on virtual CPU devices: compile fast, not well
    # (bitwise cross-process equality compares two runs of the SAME
    # program, unaffected by the optimization level)
    jax.config.update("jax_disable_most_optimizations", True)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from stylegan_tpu.models import (DiscriminatorConfig, GeneratorConfig,
                                     MappingConfig, SynthesisConfig,
                                     discriminator_init, generator_init)
    from stylegan_tpu.parallel import initialize_distributed
    from stylegan_tpu.train import (build_gspmd_train_step, create_train_state,
                                    make_d_optimizer, make_g_optimizer)

    mark("imports done")
    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 8
    mark("distributed up")

    # jax.devices() is ordered by process, so reshape(2, 4) gives one data
    # row per process — every spatial shard of a host's images stays on
    # that host's own devices (halo exchanges ride the intra-host axis).
    devs = np.asarray(jax.devices()).reshape(2, 4)
    assert all(d.process_index == r for r in range(2) for d in devs[r])
    mesh = Mesh(devs, ("data", "spatial"))

    res, latent = 16, 32  # depth 2: res 16 divides 4 spatial shards x 4 rows
    depth = 2
    gen_cfg = GeneratorConfig(
        resolution=res, latent_size=latent, dlatent_size=latent,
        truncation_psi=0.7,
        mapping=MappingConfig(latent_size=latent, dlatent_size=latent,
                              mapping_fmaps=latent, mapping_layers=2,
                              dlatent_broadcast=6),
        synthesis=SynthesisConfig(resolution=res, dlatent_size=latent,
                                  fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear"))
    dis_cfg = DiscriminatorConfig(resolution=res, fmap_base=128, fmap_max=32,
                                  blur_filter=(1, 2, 1), structure="linear")
    g_tx, d_tx = make_g_optimizer(), make_d_optimizer()
    # identical same-seed init on both hosts, then replicated over the mesh
    state = create_train_state(
        generator_init(jax.random.PRNGKey(0), gen_cfg),
        discriminator_init(jax.random.PRNGKey(1), dis_cfg),
        g_tx, d_tx, use_ema=True)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    step = build_gspmd_train_step(gen_cfg, dis_cfg, g_tx, d_tx, depth=depth,
                                  mesh=mesh, loss="logistic", donate=False)

    reals_sh = NamedSharding(mesh, P("data", "spatial", None, None))
    z_sh = NamedSharding(mesh, P("data", None))
    rng = np.random.RandomState(7)
    losses = []
    for i in range(2):
        # each host contributes only its own stripe of the global batch 16;
        # draws are host-dependent (stripe pid) but deterministic
        reals_l = rng.randn(2, 8, res, res, 3).astype(np.float32)[pid]
        z_l = rng.randn(2, 8, latent).astype(np.float32)[pid]
        reals = jax.make_array_from_process_local_data(reals_sh, reals_l)
        z = jax.make_array_from_process_local_data(z_sh, z_l)
        state, metrics = step(state, reals, z, jax.random.PRNGKey(100 + i),
                              np.float32(0.5))
        losses.append([float(metrics["d_loss"]), float(metrics["g_loss"])])

    def dump(tree, name):
        leaves = jax.tree_util.tree_leaves(tree)
        flat = np.concatenate([np.asarray(l, np.float32).ravel()
                               for l in leaves])
        np.save(os.path.join(out_dir, f"{name}_{pid}.npy"), flat)

    dump(state.g_params, "gspmd_gparams")
    dump(state.d_params, "gspmd_dparams")
    dump(state.g_shadow, "gspmd_shadow")
    with open(os.path.join(out_dir, f"gspmd_losses_{pid}.json"), "w") as f:
        json.dump(losses, f)

    mark("steps-level phase done")
    print(f"gspmd worker {pid} done", flush=True)
    # NB a trainer-level phase (StyleGAN + fixed 2-D mesh, train_on_batch
    # assembling per-host stripes) used to follow here; it was the single
    # most expensive piece of the driver's multichip dryrun (+158 s on a
    # 1-CPU host for one more compile of semantics already proven) and was
    # cut in round 5.  Trainer-level multi-host coverage lives in
    # multihost_worker.py (full StyleGAN + per-host sharded loader across
    # the process boundary, 1-D mesh); the 2-D mesh trainer path is covered
    # single-process in tests/test_spatial.py.


if __name__ == "__main__":
    main()
