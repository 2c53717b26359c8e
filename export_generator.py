"""Export a trained generator as a self-contained AOT serving artifact.

Beyond-reference deployment CLI (see stylegan_tpu/serving.py): bakes the
weights into a StableHLO module via jax.export and writes ONE file a serving
host can load without model code or checkpoints:

    python export_generator.py --config configs/sample_ffhq_1024.yaml \
        --generator_file models/GAN_GEN_SHADOW_8_12.npz \
        --output ffhq1024_b8.jaxexport --batch 8 --check

`--check` round-trips the artifact on the current backend and verifies it
matches the live generator bit-for-bit on a probe batch.
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="./configs/sample.yaml")
    p.add_argument("--generator_file", type=str, required=True,
                   help="trained generator weights (.npz, or a reference .pth)")
    p.add_argument("--output", type=str, required=True,
                   help="artifact path (suggested suffix: .jaxexport)")
    p.add_argument("--batch", type=int, default=8,
                   help="static serving batch size (one artifact per batch)")
    p.add_argument("--out_depth", type=int, default=None,
                   help="synthesis depth (default: full config resolution)")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma-separated export platforms")
    p.add_argument("--spatial_devices", type=int, default=1,
                   help="export a GSPMD spatially-sharded artifact for an "
                        "N-device serving mesh (activations H-sharded; "
                        "exports fine from a 1-chip host)")
    p.add_argument("--train_quirks", action="store_true",
                   help="export with the reference's train-mode sampling "
                        "semantics (style mixing + truncation) instead of "
                        "deterministic eval")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and verify it matches the live "
                        "generator on a probe batch")
    return p.parse_args()


def main(args):
    from stylegan_tpu.config import apply_runtime_knobs, get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    apply_runtime_knobs(opt)

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.models import (generator_config_from_cfg,
                                     generator_init)
    from stylegan_tpu.serving import (export_generator, load_exported,
                                      make_serving_fn)

    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    params = load_generator_file(params, args.generator_file)
    depth = (args.out_depth if args.out_depth is not None
             else gen_cfg.synthesis.depth - 1)

    blob = export_generator(
        gen_cfg, params, depth=depth, batch_size=args.batch,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
        train_quirks=args.train_quirks, spatial_devices=args.spatial_devices)
    with open(args.output, "wb") as f:
        f.write(blob)
    res = 2 ** (depth + 2)
    spatial = (f", spatially sharded over {args.spatial_devices} devices"
               if args.spatial_devices > 1 else "")
    print(f"Exported {res}x{res} generator (batch {args.batch}, "
          f"platforms {args.platforms}{spatial}) to {args.output} "
          f"({len(blob) / 1e6:.1f} MB)")

    if args.check:
        serve = load_exported(args.output)
        z = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, gen_cfg.latent_size))
        seed = jnp.int32(7)
        extra = ()
        if gen_cfg.conditional:
            extra = (jnp.zeros((args.batch,), jnp.int32),)
        got = np.asarray(serve(z, seed, *extra))
        live = make_serving_fn(gen_cfg, params, depth=depth,
                               train_quirks=args.train_quirks)
        want = np.asarray(jax.jit(live)(z, seed, *extra))
        if args.spatial_devices > 1:
            # sharded reductions reassociate (instance-norm stats):
            # near-equality; trained weights accumulate a few 1e-4 abs over
            # the stages (<< the 1/255 pixel quantum)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
            print(f"Check OK: sharded artifact matches the live generator "
                  f"to f32 roundoff ({got.shape}).")
        else:
            np.testing.assert_array_equal(got, want)
            print(f"Check OK: artifact output matches the live generator "
                  f"bit-for-bit ({got.shape}).")
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
