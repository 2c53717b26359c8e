"""Generate one n_row x n_col sample grid (reference generate_grid.py mirror)."""

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
                        required=True)
    parser.add_argument("--n_row", action="store", type=int, default=10)
    parser.add_argument("--n_col", action="store", type=int, default=4)
    parser.add_argument("--output_dir", action="store", type=str,
                        default="output/")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--class_id", type=int, default=None,
                        help="class label for conditional models (the "
                             "reference CLI cannot sample conditional "
                             "generators at all)")
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
    from stylegan_tpu.io import adjust_dynamic_range, save_image_grid
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.models import (generator_apply, generator_init,
                                     generator_config_from_cfg)

    print("Creating generator object ...")
    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    latent_size = opt.model.gen.latent_size
    out_depth = int(np.log2(opt.dataset.resolution)) - 2
    key = jax.random.PRNGKey(args.seed if args.seed is not None else
                             int.from_bytes(os.urandom(4), "little"))
    key, kz, ks = jax.random.split(key, 3)

    print("Generating scale synchronized images ...")
    n = args.n_row * args.n_col
    point = jax.random.normal(kz, (n, latent_size))
    point = (point / jnp.linalg.norm(point)) * (latent_size ** 0.5)
    labels = None
    if gen_cfg.conditional:
        assert args.class_id is not None, "conditional model: pass --class_id"
        labels = jnp.full((n,), args.class_id, jnp.int32)
    out = generator_apply(gen_cfg, params, point, depth=out_depth, alpha=1.0,
                          rng=ks, train=True, labels=labels)
    imgs = adjust_dynamic_range(np.asarray(out.images))

    os.makedirs(args.output_dir, exist_ok=True)
    save_image_grid(imgs, os.path.join(args.output_dir, "grid.png"),
                    nrow=args.n_row)
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
