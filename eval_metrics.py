"""Evaluate a trained generator against the training set.

Metrics:
  swd (default) — Sliced Wasserstein Distance over a Laplacian pyramid
      (ProGAN metric; no pretrained features, works air-gapped).
  fid — Frechet Inception Distance; requires --inception_weights, a local
      `.npz` of torchvision inception_v3 state_dict tensors (see
      stylegan_tpu/metrics/fid.py for the one-line conversion recipe).
  is — Inception Score (mean/std over 10 splits); same weights file, must
      include the fc classifier head.
  ppl — Perceptual Path Length (latent-space smoothness); LPIPS-VGG16 with
      --lpips_weights, else a pyramid-L2 fallback that needs no weights.
      --ppl_space w|z, --ppl_sampling full|end.

  python eval_metrics.py --config configs/sample_ffhq_128.yaml \
      --generator_file out/models/GAN_GEN_SHADOW_5_32.npz --num_samples 256
  python eval_metrics.py --config ... --generator_file ... \
      --metric fid --inception_weights /weights/inception_v3.npz

The reference ships no metric tooling (SURVEY.md §5); this fills that gap for
quantitative tracking alongside the qualitative sample grids.
"""

import argparse
import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/sample.yaml")
    parser.add_argument("--generator_file", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=256)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--metric", choices=["swd", "fid", "is", "ppl"],
                        default="swd")
    parser.add_argument("--inception_weights", type=str, default=None,
                        help="torchvision-schema inception_v3 .npz "
                             "(required for --metric fid / is)")
    parser.add_argument("--lpips_weights", type=str, default=None,
                        help="vgg16+lin lpips .npz for --metric ppl "
                             "(omit to use the pyramid-L2 fallback)")
    parser.add_argument("--ppl_space", choices=["w", "z"], default="w")
    parser.add_argument("--ppl_sampling", choices=["full", "end"],
                        default="full")
    parser.add_argument("--class_id", type=int, default=None,
                        help="conditional models: restrict --metric ppl to "
                             "one class (default: labels sampled uniformly "
                             "over n_classes from --seed)")
    return parser.parse_args()


def main():
    args = parse_arguments()
    from stylegan_tpu.config import get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    from stylegan_tpu.config import apply_runtime_knobs
    apply_runtime_knobs(opt)  # precision / Pallas / packed-layout knobs

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.data import make_dataset
    from stylegan_tpu.metrics import sliced_wasserstein_distance
    from stylegan_tpu.models import (generator_apply, generator_init,
                                     generator_config_from_cfg)

    # pure argument validation — fail before any dataset IO or generation
    if args.metric in ("fid", "is") and not args.inception_weights:
        raise SystemExit(
            f"--metric {args.metric} requires --inception_weights "
            "<inception_v3.npz>; without pretrained weights use the "
            "air-gap-safe default --metric swd")

    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    params = load_generator_file(params, args.generator_file)
    out_depth = gen_cfg.synthesis.depth - 1

    if args.metric == "ppl":
        from stylegan_tpu.metrics import (load_lpips_weights, make_lpips_fn,
                                          make_pyramid_distance, ppl_samples,
                                          ppl_score)
        if args.lpips_weights:
            dist_fn, dist_name = (make_lpips_fn(
                load_lpips_weights(args.lpips_weights)), "lpips-vgg16")
        else:
            dist_fn, dist_name = make_pyramid_distance(), "pyramid-l2"
        # conditional: labels sampled uniformly per batch (seed-determined)
        # unless --class_id pins a single class
        labels = n_classes = None
        if opt.conditional:
            if args.class_id is not None:
                if not 0 <= args.class_id < opt.n_classes:
                    sys.exit(f"--class_id {args.class_id} out of range for "
                             f"n_classes={opt.n_classes}")
                labels = jnp.full((args.batch,), args.class_id, jnp.int32)
            else:
                n_classes = opt.n_classes
        d = ppl_samples(gen_cfg, params, dist_fn,
                        num_samples=args.num_samples, batch_size=args.batch,
                        key=jax.random.PRNGKey(args.seed),
                        space=args.ppl_space, sampling=args.ppl_sampling,
                        labels=labels, n_classes=n_classes)
        result = {"ppl": round(ppl_score(d), 4),
                  "distance": dist_name, "space": args.ppl_space,
                  "sampling": args.ppl_sampling,
                  "num_samples": args.num_samples}
        if opt.conditional:
            result["labels"] = (f"class {args.class_id}"
                                if args.class_id is not None
                                else f"uniform over {opt.n_classes}")
        print(json.dumps(result))
        return

    # real samples (IS scores generated images only — no dataset needed)
    reals = None
    if args.metric != "is":
        dataset = make_dataset(opt.dataset, conditional=opt.conditional)
        rs = np.random.RandomState(args.seed)
        idx = rs.choice(len(dataset), size=args.num_samples, replace=False)
        reals = np.stack([dataset.get(int(i), rs)[0]
                          if opt.conditional else dataset.get(int(i), rs)
                          for i in idx])

    # generated samples
    key = jax.random.PRNGKey(args.seed)

    @jax.jit
    def sample(z, k, labels=None):
        return generator_apply(gen_cfg, params, z, depth=out_depth, alpha=1.0,
                               rng=k, train=True, labels=labels).images

    fakes = []
    for i in range(0, args.num_samples, args.batch):
        n = min(args.batch, args.num_samples - i)
        key, kz, ks, kl = jax.random.split(key, 4)
        z = jax.random.normal(kz, (n, gen_cfg.latent_size))
        labels = (jax.random.randint(kl, (n,), 0, opt.n_classes)
                  if opt.conditional else None)
        fakes.append(np.asarray(sample(z, ks, labels)))
    fakes = np.concatenate(fakes)[:args.num_samples]

    if args.metric == "is":
        from stylegan_tpu.metrics import compute_inception_score
        mean, std = compute_inception_score(
            np.clip((fakes + 1) / 2, 0, 1), args.inception_weights,
            batch_size=args.batch)
        print(json.dumps({"inception_score": round(mean, 4),
                          "inception_score_std": round(std, 4),
                          "num_samples": args.num_samples}))
        return

    if args.metric == "fid":
        from stylegan_tpu.metrics import compute_fid
        # datasets / generator produce [-1, 1]; FID's pipeline takes [0, 1]
        fid = compute_fid(np.clip((reals + 1) / 2, 0, 1),
                          np.clip((fakes + 1) / 2, 0, 1),
                          args.inception_weights, batch_size=args.batch)
        print(json.dumps({"fid": round(fid, 4),
                          "num_samples": args.num_samples}))
        return

    swd = sliced_wasserstein_distance(jnp.asarray(reals), jnp.asarray(fakes),
                                      key=jax.random.PRNGKey(args.seed + 1))
    print(json.dumps({f"swd_x1e3_{k}": round(v * 1e3, 3)
                      for k, v in swd.items()}))


if __name__ == "__main__":
    main()
