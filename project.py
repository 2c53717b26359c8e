"""Project a target image into the generator's W(+) space.

Beyond-reference CLI (the reference has no projector): optimizes a W+ code
so the generator reconstructs the target, then writes the reconstruction and
a `w.npy` dlatent code that plugs straight into
`generate_samples.py --input w.npy`.

Example:
    python project.py --config configs/sample.yaml \
        --generator_file out/models/GAN_GEN_SHADOW_8_4.npz \
        --target photo.png --output_dir projected/ --num_steps 1000
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
    parser.add_argument("--generator_file", type=str, required=True,
                        help="trained generator weights (.npz or .pth)")
    parser.add_argument("--target", type=str, required=True,
                        help="image to project (any PIL-readable format)")
    parser.add_argument("--output_dir", type=str, default="projected/")
    parser.add_argument("--num_steps", type=int, default=1000)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--w_plus", dest="w_plus", action="store_true",
                        default=True, help="per-layer W+ (default)")
    parser.add_argument("--no_w_plus", dest="w_plus", action="store_false",
                        help="optimize a single shared W instead of W+")
    parser.add_argument("--pyramid_levels", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def load_target(path: str, resolution: int, channels: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    img = img.convert("RGB" if channels == 3 else "L")
    img = img.resize((resolution, resolution), Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr * 2.0 - 1.0          # [-1, 1], HWC


def main(args):
    from stylegan_tpu.config import apply_runtime_knobs, get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    apply_runtime_knobs(opt)  # precision / Pallas / packed-layout knobs

    import jax
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.io import adjust_dynamic_range, save_single_image
    from stylegan_tpu.models import generator_config_from_cfg, generator_init
    from stylegan_tpu.projection import ProjectorConfig, project

    gen_cfg = generator_config_from_cfg(opt)
    assert not gen_cfg.conditional, \
        "projection targets unconditional generators"
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    target = load_target(args.target, opt.dataset.resolution,
                         opt.dataset.channels)
    pcfg = ProjectorConfig(num_steps=args.num_steps, w_plus=args.w_plus,
                           initial_lr=args.lr,
                           pyramid_levels=args.pyramid_levels)

    def progress(t, loss):
        print(f"step {t:5d}/{args.num_steps}  loss {loss:.5f}")

    dlatents, image, losses = project(jax.random.PRNGKey(args.seed), gen_cfg,
                                      params, target, pcfg, callback=progress)

    os.makedirs(args.output_dir, exist_ok=True)
    w_path = os.path.join(args.output_dir, "w.npy")
    np.save(w_path, dlatents)
    save_single_image(adjust_dynamic_range(image),
                      os.path.join(args.output_dir, "projected.png"))
    save_single_image(adjust_dynamic_range(target),
                      os.path.join(args.output_dir, "target.png"))
    print(f"final loss {losses[-1]:.5f}")
    print(f"Saved {w_path} (usable with generate_samples.py --input) and "
          f"projected.png to {args.output_dir}")
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
