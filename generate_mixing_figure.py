"""Style-mixing figure (reference generate_mixing_figure.py mirror).

Seeded source/destination latents -> W via the mapping network, splice the
source W rows given by style_ranges into the destination W, synthesize, and
paste the canvas.  Uses the same np.random.RandomState(seed) latents and the
same default seeds/style ranges as the reference (:70-76) so figures are
comparable.
"""

import argparse
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def draw_style_mixing_figure(png, gen_cfg, params, out_depth, src_seeds,
                             dst_seeds, style_ranges):
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from stylegan_tpu.io import adjust_dynamic_range
    from stylegan_tpu.models import mapping_apply, synthesis_apply

    n_col, n_row = len(src_seeds), len(dst_seeds)
    w = h = 2 ** (out_depth + 2)
    latent_size = gen_cfg.mapping.latent_size

    def synth(dl, key):
        return synthesis_apply(gen_cfg.synthesis, params["g_synthesis"],
                               jnp.asarray(dl), depth=out_depth, alpha=1.0,
                               rng=key)

    key = jax.random.PRNGKey(0)
    src_latents = np.stack([np.random.RandomState(s).randn(latent_size)
                            for s in src_seeds]).astype(np.float32)
    dst_latents = np.stack([np.random.RandomState(s).randn(latent_size)
                            for s in dst_seeds]).astype(np.float32)
    src_dl = np.asarray(mapping_apply(gen_cfg.mapping, params["g_mapping"],
                                      jnp.asarray(src_latents)))
    dst_dl = np.asarray(mapping_apply(gen_cfg.mapping, params["g_mapping"],
                                      jnp.asarray(dst_latents)))
    src_images = np.asarray(synth(src_dl, key))
    dst_images = np.asarray(synth(dst_dl, key))

    def to_u8(img):
        return (adjust_dynamic_range(img) * 255).clip(0, 255).astype(np.uint8)

    canvas = Image.new("RGB", (w * (n_col + 1), h * (n_row + 1)), "white")
    for col, img in enumerate(src_images):
        canvas.paste(Image.fromarray(to_u8(img), "RGB"), ((col + 1) * w, 0))
    for row, img in enumerate(dst_images):
        canvas.paste(Image.fromarray(to_u8(img), "RGB"), (0, (row + 1) * h))
        row_dl = np.stack([dst_dl[row]] * n_col)
        # clamp the hardcoded reference ranges (:98, sized for the 14-layer
        # 256^2 model) to this model's layer count so shallow models render
        # instead of indexing out of bounds; in-bounds behavior identical
        rows = [i for i in style_ranges[row] if i < row_dl.shape[1]]
        row_dl[:, rows] = src_dl[:, rows]
        row_images = np.asarray(synth(row_dl, key))
        for col, mimg in enumerate(row_images):
            canvas.paste(Image.fromarray(to_u8(mimg), "RGB"),
                         ((col + 1) * w, (row + 1) * h))
    canvas.save(png)


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/sample_race_256.yaml")
    parser.add_argument("--generator_file", action="store", type=str,
                        required=True)
    parser.add_argument("--output", default="figure03-style-mixing.png")
    parser.add_argument("--out_depth", type=int, default=6)
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
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    draw_style_mixing_figure(
        args.output, gen_cfg, params, out_depth=args.out_depth,
        src_seeds=[639, 1995, 687, 615, 1999], dst_seeds=[888, 888, 888],
        style_ranges=[range(0, 2)] * 1 + [range(2, 8)] * 1 + [range(8, 14)] * 1)
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
