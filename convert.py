"""Convert official TF StyleGAN weights to this framework's checkpoint format.

CLI mirror of the reference convert.py, but with NO TensorFlow dependency:
the official .pkl's numpy arrays are extracted by a restricted unpickler
(stylegan_tpu/convert/tf_pickle.py) without ever executing the pickle's
embedded graph-building code.

  python convert.py --config configs/sample_ffhq_1024.yaml \
      --input_file karras2019stylegan-ffhq-1024x1024.pkl \
      --output_file ffhq_1024_gen.npz
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


if __name__ == "__main__":
    main()
