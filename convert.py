"""Convert official TF StyleGAN weights to this framework's checkpoint format.

CLI mirror of the reference convert.py, but with NO TensorFlow dependency:
the official .pkl's numpy arrays are extracted by a restricted unpickler
(stylegan_tpu/convert/tf_pickle.py) without ever executing the pickle's
embedded graph-building code.

  python convert.py --config configs/sample_ffhq_1024.yaml \
      --input_file karras2019stylegan-ffhq-1024x1024.pkl \
      --output_file ffhq_1024_gen.npz

The reverse direction (beyond the reference): --export_pth turns one of our
`.npz` checkpoints into a torch state_dict `.pth` directly loadable by the
reference's Generator/Discriminator, so work done here ports back.

  python convert.py --config ... --export_pth --input_file gen.npz \
      --output_file gen.pth [--network dis]
"""

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/sample.yaml")
    parser.add_argument("--input_file", action="store", type=str,
                        required=True,
                        help="pretrained weights pickle from the official "
                             "tensorflow repo")
    parser.add_argument("--output_file", action="store", type=str,
                        required=True, help="path to the output weights (.npz)")
    parser.add_argument("--use_current", action="store_true",
                        help="convert the snapshot generator G instead of "
                             "the averaged Gs")
    parser.add_argument("--export_pth", action="store_true",
                        help="reverse direction: our .npz checkpoint -> a "
                             "reference-loadable torch state_dict .pth")
    parser.add_argument("--network", choices=["gen", "dis"], default="gen",
                        help="which network an --export_pth input holds")
    return parser.parse_args()


def main():
    args = parse_arguments()

    from stylegan_tpu.config import get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()

    import jax
    from stylegan_tpu.convert.tf_pickle import import_official_generator
    from stylegan_tpu.io.checkpoint import save_params
    from stylegan_tpu.models import generator_config_from_cfg, generator_init

    if args.export_pth:
        return export_pth(args, opt)

    print("Creating generator object ...")
    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    out_depth = gen_cfg.synthesis.depth - 1

    print("Importing TF weights from:", args.input_file)
    params = import_official_generator(args.input_file, params, out_depth,
                                       use_averaged=not args.use_current)
    save_params(args.output_file, params,
                metadata={"source": os.path.basename(args.input_file),
                          "resolution": gen_cfg.resolution})
    print("Saved:", args.output_file)
    print("Done.")


def export_pth(args, opt):
    """Our .npz -> reference torch state_dict .pth (the reverse of import)."""
    import jax
    import torch
    from stylegan_tpu.convert import (load_discriminator_file,
                                      load_generator_file)
    from stylegan_tpu.convert.torch_params import (
        discriminator_state_dict_from_params,
        generator_state_dict_from_params)
    from stylegan_tpu.models import (discriminator_config_from_cfg,
                                     discriminator_init,
                                     generator_config_from_cfg,
                                     generator_init)

    print("Loading checkpoint:", args.input_file)
    if args.network == "gen":
        cfg = generator_config_from_cfg(opt)
        params = load_generator_file(
            generator_init(jax.random.PRNGKey(0), cfg), args.input_file)
        sd = generator_state_dict_from_params(
            params, blur_filter=cfg.synthesis.blur_filter)
    else:
        cfg = discriminator_config_from_cfg(opt)
        params = load_discriminator_file(
            discriminator_init(jax.random.PRNGKey(0), cfg), args.input_file)
        sd = discriminator_state_dict_from_params(
            params, blur_filter=cfg.blur_filter or (1, 2, 1))
    torch.save({k: torch.from_numpy(np_ascontig(v)) for k, v in sd.items()},
               args.output_file)
    print(f"Saved reference-loadable {args.network} state_dict "
          f"({len(sd)} tensors): {args.output_file}")
    print("Done.")


def np_ascontig(a):
    import numpy as np
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


if __name__ == "__main__":
    main()
