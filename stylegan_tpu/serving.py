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
                     train_quirks: bool = False) -> bytes:
    """Serialize the generator to a portable multi-platform artifact.

    Shapes are static (XLA serving contract): one artifact per (batch, depth).
    """
    from jax import export as jexport

    fn = make_serving_fn(gen_cfg, params, depth=depth,
                         train_quirks=train_quirks)
    z = jax.ShapeDtypeStruct((batch_size, gen_cfg.latent_size), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.int32)
    args = (z, seed)
    if gen_cfg.conditional:
        args += (jax.ShapeDtypeStruct((batch_size,), jnp.int32),)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
    return bytes(exported.serialize())


def load_exported(path_or_bytes):
    """Load a serialized artifact; returns serve(z, seed[, labels])."""
    from jax import export as jexport

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jexport.deserialize(blob)

    def serve(*args):
        return exported.call(*args)

    serve.exported = exported  # platforms / shapes introspection
    return serve
