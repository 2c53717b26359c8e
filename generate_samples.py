"""Generate single image samples from a trained generator.

CLI mirror of the reference generate_samples.py: random hypersphere-projected
Z samples (z * sqrt(latent)/|z|, reference :97-98), or synthesis from a saved
W code (.npy) via --input.  Like the reference, sampling runs the generator
with train-mode semantics (style mixing + truncation active — the reference
never calls .eval(); see SURVEY.md §7 quirks); pass --eval for deterministic
truncation-free sampling.
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/sample.yaml")
    parser.add_argument("--generator_file", action="store", type=str,
                        required=True,
                        help="pretrained generator weights (.npz, or a reference .pth)")
    parser.add_argument("--num_samples", action="store", type=int, default=300)
    parser.add_argument("--output_dir", action="store", type=str,
                        default="output/")
    parser.add_argument("--input", action="store", type=str, default=None,
                        help="the dlatent code (W) for a certain sample (.npy)")
    parser.add_argument("--output", action="store", type=str,
                        default="output.png")
    parser.add_argument("--eval", action="store_true",
                        help="disable train-mode sampling quirks")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--class_id", type=int, default=None,
                        help="class label for conditional models (the "
                             "reference CLI cannot sample conditional "
                             "generators at all)")
    parser.add_argument("--spatial_devices", type=int, default=1,
                        help="shard each image's feature maps over N devices "
                             "(GSPMD height sharding; serving path, implies "
                             "--eval; see stylegan_tpu/parallel/spatial.py)")
    return parser.parse_args()


def main(args):
    from stylegan_tpu.config import get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    from stylegan_tpu.config import apply_runtime_knobs
    apply_runtime_knobs(opt)  # precision / Pallas / packed-layout knobs

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.io import adjust_dynamic_range, save_single_image
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.models import (generator_apply, generator_init,
                                     generator_config_from_cfg,
                                     synthesis_apply)

    print("Creating generator object ...")
    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    latent_size = opt.model.gen.latent_size
    out_depth = int(np.log2(opt.dataset.resolution)) - 2

    if args.input is None:
        os.makedirs(args.output_dir, exist_ok=True)
        key = jax.random.PRNGKey(args.seed if args.seed is not None else
                                 int.from_bytes(os.urandom(4), "little"))

        labels = None
        if gen_cfg.conditional:
            assert args.class_id is not None, \
                "conditional model: pass --class_id"
            labels = jnp.full((1,), args.class_id, jnp.int32)

        if args.spatial_devices > 1:
            # serving path: one image's activations H-sharded over N chips
            # (eval semantics — the spatial fn is deterministic/truncation-free)
            assert labels is None, \
                "--spatial_devices does not support conditional models yet"
            from stylegan_tpu.parallel import (build_spatial_sample_fn,
                                               create_spatial_mesh)
            mesh = create_spatial_mesh(args.spatial_devices)
            spatial_fn = build_spatial_sample_fn(gen_cfg, mesh,
                                                 depth=out_depth)
            # replicate params over the mesh ONCE — passing host-resident
            # params each call would re-broadcast ~100 MB per sample
            from jax.sharding import NamedSharding, PartitionSpec
            params_repl = jax.device_put(
                params, NamedSharding(mesh, PartitionSpec()))
            sample = lambda z, k: spatial_fn(params_repl, z, k)
        else:
            @jax.jit
            def sample(z, k):
                out = generator_apply(gen_cfg, params, z, depth=out_depth,
                                      alpha=1.0, rng=k, train=not args.eval,
                                      labels=labels)
                return out.images

        print("Generating scale synchronized images ...")
        for img_num in range(1, args.num_samples + 1):
            key, kz, ks = jax.random.split(key, 3)
            point = jax.random.normal(kz, (1, latent_size))
            point = (point / jnp.linalg.norm(point)) * (latent_size ** 0.5)
            img = sample(point, ks)
            img = adjust_dynamic_range(np.asarray(img))
            save_single_image(img, os.path.join(args.output_dir,
                                                f"{img_num}.png"))
        print("Generated %d images at %s" % (args.num_samples,
                                             args.output_dir))
    else:
        code = np.load(args.input)
        dlatent_in = jnp.asarray(code)[None]
        img = synthesis_apply(gen_cfg.synthesis, params["g_synthesis"],
                              dlatent_in, depth=out_depth, alpha=1.0,
                              rng=jax.random.PRNGKey(args.seed or 0))
        img = adjust_dynamic_range(np.asarray(img))
        save_single_image(img, args.output)
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
