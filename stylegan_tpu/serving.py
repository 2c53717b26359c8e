"""AOT serving export: freeze a trained generator into a portable artifact.

Beyond-reference deployment path (the reference's only serving story is "keep
the training repo + checkpoint around and run generate_samples.py",
reference/generate_samples.py:60-92).  Here the generator — weights baked in
as constants — is lowered once to StableHLO via `jax.export` and serialized
to a single self-contained file that any same-or-newer JAX runtime can load
and run on the platforms chosen at export time (TPU serving fleets and CPU
fallback by default) WITHOUT the model code, the config, or the checkpoint:

    # offline, once
    python export_generator.py --config ... --generator_file g.npz \
        --output gen.jaxexport --batch 8
    # serving host
    from stylegan_tpu.serving import load_exported
    serve = load_exported("gen.jaxexport")
    images = serve(z, seed)          # (B, H, W, 3) in [-1, 1]

The serving function is deterministic in (z, seed): per-layer noise derives
from the explicit seed scalar, so replicas agree bit-for-bit and requests
are replayable.  Eval semantics by default (no style mixing, no truncation —
the reference's train-mode sampling quirks are opt-in via train_quirks, see
generate_samples.py's --eval discussion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .models import generator_apply
from .parallel.spatial import SPATIAL_AXIS


def make_serving_fn(gen_cfg, params, *, depth: int, train_quirks: bool = False):
    """Returns serve(z, seed[, labels]) -> images, with `params` closed over
    (they become constants in the exported module).

    z: (B, latent) f32; seed: () int32 — folded into the per-layer noise
    PRNG; labels: (B,) int32, only when gen_cfg.conditional.
    """
    conditional = gen_cfg.conditional

    def serve(z, seed, labels=None):
        key = jax.random.PRNGKey(seed.astype(jnp.uint32))
        out = generator_apply(gen_cfg, params, z, depth=depth, alpha=1.0,
                              rng=key, train=train_quirks,
                              labels=labels if conditional else None)
        return out.images

    if conditional:
        return lambda z, seed, labels: serve(z, seed, labels)
    return lambda z, seed: serve(z, seed)


def export_generator(gen_cfg, params, *, depth: int, batch_size: int,
                     platforms=("tpu", "cpu"),
                     train_quirks: bool = False,
                     spatial_devices: int = 1) -> bytes:
    """Serialize the generator to a portable multi-platform artifact.

    Shapes are static (XLA serving contract): one artifact per (batch, depth).

    spatial_devices > 1 exports a GSPMD spatially-sharded artifact: every
    activation H-sharded over an N-device 'spatial' mesh (halo exchanges on
    the 3x3 convs, same layout as parallel/spatial.py) — per-chip activation
    HBM drops N-fold, so one frozen file serves resolutions/batches a single
    chip cannot hold.  The mesh is abstract at export time (jax.AbstractMesh),
    so an N-chip artifact exports from a 1-chip dev host; the serving host
    needs >= N devices (load_exported rebuilds the mesh and commits inputs).
    """
    from jax import export as jexport

    fn = make_serving_fn(gen_cfg, params, depth=depth,
                         train_quirks=train_quirks)
    z = jax.ShapeDtypeStruct((batch_size, gen_cfg.latent_size), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.int32)
    args = (z, seed)
    if gen_cfg.conditional:
        args += (jax.ShapeDtypeStruct((batch_size,), jnp.int32),)

    if spatial_devices > 1:
        if gen_cfg.conditional:
            raise ValueError("spatial export does not support conditional "
                             "models (same restriction as generate_samples "
                             "--spatial_devices)")
        res = 2 ** (depth + 2)
        if res % (spatial_devices * 4) != 0:
            raise ValueError(
                f"resolution {res} must divide over {spatial_devices} "
                f"spatial shards with at least 4 rows each")
        from jax.sharding import AbstractMesh, NamedSharding, PartitionSpec
        amesh = AbstractMesh((spatial_devices,), (SPATIAL_AXIS,))
        out_sh = NamedSharding(amesh, PartitionSpec(None, SPATIAL_AXIS,
                                                    None, None))
        repl = NamedSharding(amesh, PartitionSpec())
        base = fn
        fn = lambda *a: jax.lax.with_sharding_constraint(base(*a), out_sh)
        args = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl)
                     for a in args)
        jitted = jax.jit(fn, in_shardings=(repl,) * len(args),
                         out_shardings=out_sh)
    else:
        jitted = jax.jit(fn)
    exported = jexport.export(jitted, platforms=list(platforms))(*args)
    return bytes(exported.serialize())


def load_exported(path_or_bytes):
    """Load a serialized artifact; returns serve(z, seed[, labels]).

    Multi-device (spatial) artifacts are handled transparently: the loader
    rebuilds an N-device 'spatial' mesh from `jax.devices()` and commits
    call arguments to the recorded input shardings; the returned images are
    H-sharded over the mesh (np.asarray gathers them to host)."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)

    if exported.nr_devices > 1:
        import numpy as np
        from jax.sharding import Mesh
        n = exported.nr_devices
        devices = jax.devices()
        if len(devices) < n:
            raise RuntimeError(
                f"artifact was exported for {n} devices but this host has "
                f"only {len(devices)}")
        mesh = Mesh(np.asarray(devices[:n]), (SPATIAL_AXIS,))
        in_shardings = exported.in_shardings_jax(mesh)

        def serve(*args):
            args = tuple(jax.device_put(a, s)
                         for a, s in zip(args, in_shardings))
            return exported.call(*args)
    else:
        def serve(*args):
            return exported.call(*args)

    serve.exported = exported  # platforms / shapes introspection
    return serve
