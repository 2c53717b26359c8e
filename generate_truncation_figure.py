"""Truncation-trick psi-sweep figure (reference generate_truncation_figure.py
mirror): rows are seeds, columns are psi in [1, .7, .5, 0, -.5, -1], each W
truncated toward the stored avg_latent buffer before synthesis."""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def draw_truncation_trick_figure(png, gen_cfg, params, out_depth, seeds, psis):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from stylegan_tpu.io import adjust_dynamic_range
    from stylegan_tpu.models import mapping_apply, synthesis_apply

    w = h = 2 ** (out_depth + 2)
    latent_size = gen_cfg.mapping.latent_size
    key = jax.random.PRNGKey(0)

    latents = np.stack([np.random.RandomState(s).randn(latent_size)
                        for s in seeds]).astype(np.float32)
    dlatents = np.asarray(mapping_apply(gen_cfg.mapping, params["g_mapping"],
                                        jnp.asarray(latents)))
    dlatent_avg = np.asarray(params["truncation"]["avg_latent"])

    def to_u8(img):
        return (adjust_dynamic_range(img) * 255).clip(0, 255).astype(np.uint8)

    canvas = Image.new("RGB", (w * len(psis), h * len(seeds)), "white")
    for row, dlatent in enumerate(dlatents):
        row_dl = ((dlatent[None] - dlatent_avg)
                  * np.reshape(psis, [-1, 1, 1]) + dlatent_avg)
        row_images = np.asarray(synthesis_apply(
            gen_cfg.synthesis, params["g_synthesis"],
            jnp.asarray(row_dl.astype(np.float32)), depth=out_depth,
            alpha=1.0, rng=key))
        for col, img in enumerate(row_images):
            canvas.paste(Image.fromarray(to_u8(img), "RGB"),
                         (col * w, row * h))
    canvas.save(png)


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/sample.yaml")
    parser.add_argument("--generator_file", action="store", type=str,
                        required=True)
    parser.add_argument("--output", default="figure08-truncation-trick.png")
    parser.add_argument("--out_depth", type=int, default=5)
    return parser.parse_args()


def main(args):
    from stylegan_tpu.config import get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    from stylegan_tpu.config import apply_runtime_knobs
    apply_runtime_knobs(opt)  # precision / Pallas / packed-layout knobs

    import jax
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.models import generator_config_from_cfg, generator_init

    print("Creating generator object ...")
    gen_cfg = generator_config_from_cfg(opt)
    assert gen_cfg.use_truncation, \
        "truncation figure needs a config with truncation_psi > 0"
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    draw_truncation_trick_figure(args.output, gen_cfg, params,
                                 out_depth=args.out_depth, seeds=[91, 388],
                                 psis=[1, 0.7, 0.5, 0, -0.5, -1])
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
