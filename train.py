"""Training entry point.

CLI contract mirrors the reference train.py (same flags, same yaml configs):
  python train.py --config configs/sample.yaml [--start_depth N]
      [--generator_file G.npz] [--gen_shadow_file S.npz]
      [--discriminator_file D.npz] [--gen_optim_file GO.npz]
      [--dis_optim_file DO.npz]

Differences by design: checkpoints are .npz param trees (io/checkpoint.py),
and multi-device TPU data parallelism is automatic (all visible devices form
a 1-D mesh; batch sizes are global).
"""

import argparse
import os
import shutil
import sys

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="StyleGAN TPU-native implementation.")
    parser.add_argument("--config", default="./configs/sample.yaml")
    parser.add_argument("--start_depth", action="store", type=int, default=0,
                        help="Starting depth for training the network")
    parser.add_argument("--generator_file", action="store", type=str,
                        default=None, help="pretrained Generator file")
    parser.add_argument("--gen_shadow_file", action="store", type=str,
                        default=None, help="pretrained gen_shadow file")
    parser.add_argument("--discriminator_file", action="store", type=str,
                        default=None, help="pretrained Discriminator file")
    parser.add_argument("--gen_optim_file", action="store", type=str,
                        default=None, help="saved state of generator optimizer")
    parser.add_argument("--dis_optim_file", action="store", type=str,
                        default=None,
                        help="saved state of discriminator optimizer")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="limit the data-parallel mesh size")
    parser.add_argument("--resume", type=str, default=None,
                        help="full train-state checkpoint (from "
                             "save_full_state) to restore G, D, EMA and both "
                             "optimizers in one shot")
    return parser.parse_args()


def main():
    args = parse_arguments()

    from stylegan_tpu.config import get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()

    output_dir = opt.output_dir
    if os.path.exists(output_dir):
        raise FileExistsError(
            f"output_dir '{output_dir}' already exists — refusing to "
            "clobber a previous run (pick a new dir or remove it)")
    os.makedirs(output_dir)

    # snapshot sources + config for reproducibility
    from stylegan_tpu.utils import make_logger, snapshot_sources
    snapshot_sources(REPO_ROOT, os.path.join(output_dir, "src"))
    shutil.copy2(args.config, output_dir)
    logger = make_logger("project", opt.output_dir, "log")

    import jax

    from stylegan_tpu.parallel import resolve_max_devices
    # Adaptive data parallelism: each depth uses the largest mesh its global
    # batch divides (early depths at batch 128 use every chip; the deepest
    # stages at batch 4/2 shrink gracefully instead of capping the whole run).
    # Precedence: --num_devices flag > parallel.data_axis yaml knob > all
    # visible devices.
    max_devices = resolve_max_devices(opt.parallel, args.num_devices)
    logger.info("Up to %d %s device(s), per-depth adaptive data parallelism.",
                max_devices, jax.default_backend())

    # precision / kernel knobs (stylegan_tpu/config.py TPU-native additions)
    from stylegan_tpu.config import apply_runtime_knobs, resolve_fuse_scores
    packed = apply_runtime_knobs(opt)
    if opt.precision.activations == "bfloat16":
        logger.info("bf16 activations / default MXU precision")
    if packed:
        logger.info("packed (space-to-depth) execution for low-channel stages")

    from stylegan_tpu.data import make_dataset
    dataset = make_dataset(opt.dataset, conditional=opt.conditional)

    from stylegan_tpu.train import StyleGAN
    style_gan = StyleGAN(structure=opt.structure,
                         conditional=opt.conditional,
                         n_classes=opt.n_classes,
                         resolution=opt.dataset.resolution,
                         num_channels=opt.dataset.channels,
                         latent_size=opt.model.gen.latent_size,
                         g_args=opt.model.gen,
                         d_args=opt.model.dis,
                         g_opt_args=opt.model.g_optim,
                         d_opt_args=opt.model.d_optim,
                         loss=opt.loss,
                         drift=opt.drift,
                         d_repeats=opt.d_repeats,
                         use_ema=opt.use_ema,
                         ema_decay=opt.ema_decay,
                         max_devices=max_devices,
                         seed=opt.seed,
                         activations_dtype=opt.precision.activations,
                         packed_layout=packed,
                         fold_blur=getattr(opt.ops, "fold_blur", "auto"),
                         r1_interval=getattr(opt, "r1_interval", 1),
                         r1_gamma=getattr(opt, "r1_gamma", 10.0),
                         r1_separate_reg=getattr(opt, "r1_separate_reg",
                                                 False),
                         remat_blocks=getattr(opt.ops, "remat", False),
                         spatial_devices=getattr(opt.parallel, "spatial", 0),
                         mbstd_scope=getattr(opt, "mbstd_scope", None),
                         fuse_scores=resolve_fuse_scores(opt),
                         reuse_g_fwd=getattr(opt.ops, "reuse_g_fwd", False))

    start_depth = args.start_depth
    if args.resume is not None:
        logger.info("Restoring full train state from: %s", args.resume)
        meta = style_gan.restore_full_state(args.resume)
        if args.start_depth == 0 and meta.get("depth") is not None:
            start_depth = int(meta["depth"])
            logger.info("Resuming at depth %d (from checkpoint metadata)",
                        start_depth)

    # resume from checkpoints (partial, depth-filtered loads — reference
    # train.py:24-29 semantics)
    if args.generator_file is not None:
        logger.info("Restoring generator params <- %s", args.generator_file)
        style_gan.load_generator(args.generator_file)
    else:
        logger.info("No generator checkpoint given; starting with fresh "
                    "initialization.")
    if args.discriminator_file is not None:
        logger.info("Restoring discriminator params <- %s",
                    args.discriminator_file)
        style_gan.load_discriminator(args.discriminator_file)
    if args.gen_shadow_file is not None and opt.use_ema:
        logger.info("Restoring EMA shadow generator <- %s",
                    args.gen_shadow_file)
        style_gan.load_gen_shadow(args.gen_shadow_file)
    if args.gen_optim_file is not None:
        logger.info("Restoring generator optimizer state <- %s",
                    args.gen_optim_file)
        style_gan.load_gen_optim(args.gen_optim_file)
    if args.dis_optim_file is not None:
        logger.info("Restoring discriminator optimizer state <- %s",
                    args.dis_optim_file)
        style_gan.load_dis_optim(args.dis_optim_file)

    style_gan.train(dataset=dataset,
                    num_workers=opt.num_works,
                    epochs=opt.sched.epochs,
                    batch_sizes=opt.sched.batch_sizes,
                    fade_in_percentage=opt.sched.fade_in_percentage,
                    logger=logger,
                    output=output_dir,
                    num_samples=opt.num_samples,
                    start_depth=start_depth,
                    feedback_factor=opt.feedback_factor,
                    checkpoint_factor=opt.checkpoint_factor)


if __name__ == "__main__":
    main()
