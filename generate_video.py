"""Latent-walk / truncation-sweep snapshot videos.

Beyond-reference CLI (the reference has no video tooling):
  --mode walk        smooth loop through random latent endpoints (slerp in Z,
                     mapped to W), per-layer noise pinned for temporal
                     coherence;
  --mode truncation  a fixed seed swept through psi 1 -> -1 -> 1 against the
                     stored W average.

Writes an animated GIF with PIL (no extra dependencies); also writes an mp4
when imageio+ffmpeg happen to be importable.
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
    parser.add_argument("--generator_file", type=str, required=True)
    parser.add_argument("--output", type=str, default="video.gif")
    parser.add_argument("--mode", choices=["walk", "truncation"],
                        default="walk")
    parser.add_argument("--num_points", type=int, default=6,
                        help="walk: number of latent endpoints in the loop")
    parser.add_argument("--frames_per_step", type=int, default=24,
                        help="walk: frames between consecutive endpoints")
    parser.add_argument("--num_frames", type=int, default=96,
                        help="truncation: frames in the psi sweep")
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--batch", type=int, default=8,
                        help="frames synthesized per compiled call")
    parser.add_argument("--out_depth", type=int, default=None,
                        help="output resolution depth (default: full)")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def slerp(a: np.ndarray, b: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Spherical interpolation between latent vectors, batched over t."""
    a_n = a / np.linalg.norm(a)
    b_n = b / np.linalg.norm(b)
    omega = np.arccos(np.clip(np.dot(a_n, b_n), -1.0, 1.0))
    if omega < 1e-6:
        return a[None] + t[:, None] * (b - a)[None]
    so = np.sin(omega)
    return (np.sin((1.0 - t)[:, None] * omega) / so * a[None]
            + np.sin(t[:, None] * omega) / so * b[None])


def walk_dlatents(gen_cfg, params, args):
    import jax.numpy as jnp
    from stylegan_tpu.models import mapping_apply
    rng = np.random.RandomState(args.seed)
    pts = rng.randn(args.num_points, gen_cfg.mapping.latent_size)
    pts = np.concatenate([pts, pts[:1]], axis=0)          # close the loop
    t = np.arange(args.frames_per_step) / args.frames_per_step
    zs = np.concatenate([slerp(pts[i], pts[i + 1], t)
                         for i in range(args.num_points)]).astype(np.float32)
    return np.asarray(mapping_apply(gen_cfg.mapping, params["g_mapping"],
                                    jnp.asarray(zs)))


def truncation_dlatents(gen_cfg, params, args):
    import jax.numpy as jnp
    from stylegan_tpu.models import mapping_apply
    assert "truncation" in params, \
        "truncation mode needs a checkpoint with an avg_latent buffer"
    z = np.random.RandomState(args.seed).randn(
        1, gen_cfg.mapping.latent_size).astype(np.float32)
    dl = np.asarray(mapping_apply(gen_cfg.mapping, params["g_mapping"],
                                  jnp.asarray(z)))[0]
    avg = np.asarray(params["truncation"]["avg_latent"])
    psis = np.cos(np.linspace(0, 2 * np.pi, args.num_frames))  # 1 -> -1 -> 1
    return (dl[None] - avg) * psis[:, None, None] + avg


def main(args):
    from stylegan_tpu.config import apply_runtime_knobs, get_default_cfg
    opt = get_default_cfg()
    opt.merge_from_file(args.config)
    opt.freeze()
    apply_runtime_knobs(opt)  # precision / Pallas / packed-layout knobs

    import jax
    import jax.numpy as jnp
    from stylegan_tpu.convert import load_generator_file
    from stylegan_tpu.io import adjust_dynamic_range
    from stylegan_tpu.models import (generator_config_from_cfg,
                                     generator_init, synthesis_apply)

    gen_cfg = generator_config_from_cfg(opt)
    params = generator_init(jax.random.PRNGKey(0), gen_cfg)
    print("Loading the generator weights from:", args.generator_file)
    params = load_generator_file(params, args.generator_file)

    out_depth = (gen_cfg.synthesis.depth - 1 if args.out_depth is None
                 else args.out_depth)
    if args.mode == "walk":
        dlatents = walk_dlatents(gen_cfg, params, args)
    else:
        dlatents = truncation_dlatents(gen_cfg, params, args)
    if dlatents.ndim == 2:   # (F, D) -> broadcast to all layers
        dlatents = np.repeat(dlatents[:, None], gen_cfg.num_layers, axis=1)
    elif dlatents.shape[1] == 1:
        dlatents = np.repeat(dlatents, gen_cfg.num_layers, axis=1)
    n_frames = len(dlatents)
    print(f"{n_frames} frames at depth {out_depth} ({args.mode})")

    # pinned per-layer noise: identical across frames for temporal coherence
    nkey = jax.random.PRNGKey(args.seed + 1)
    noises = [jax.random.normal(jax.random.fold_in(nkey, l),
                                (1, 2 ** (l // 2 + 2), 2 ** (l // 2 + 2), 1),
                                jnp.float32)
              for l in range(gen_cfg.num_layers)]

    @jax.jit
    def synth(dl):
        return synthesis_apply(gen_cfg.synthesis, params["g_synthesis"], dl,
                               depth=out_depth, alpha=1.0, noises=noises)

    frames = []
    bs = args.batch
    pad = (-n_frames) % bs
    dl_all = np.concatenate([dlatents, dlatents[:pad]]) if pad else dlatents
    for i in range(0, len(dl_all), bs):
        imgs = np.asarray(synth(jnp.asarray(dl_all[i:i + bs], np.float32)))
        frames.extend(np.asarray(adjust_dynamic_range(f) * 255)
                      .clip(0, 255).astype(np.uint8) for f in imgs)
    frames = frames[:n_frames]

    from PIL import Image
    pil = [Image.fromarray(f if f.shape[-1] == 3 else f[..., 0])
           for f in frames]
    out = args.output
    os.makedirs(os.path.dirname(os.path.abspath(out)) or ".", exist_ok=True)
    if not out.endswith(".gif"):
        out = os.path.splitext(out)[0] + ".gif"
    pil[0].save(out, save_all=True, append_images=pil[1:],
                duration=int(1000 / args.fps), loop=0)
    print("Wrote", out)
    try:  # optional mp4 if an ffmpeg-backed imageio is available
        import imageio
        mp4 = os.path.splitext(args.output)[0] + ".mp4"
        imageio.mimwrite(mp4, frames, fps=args.fps)
        print("Wrote", mp4)
    except Exception:
        pass
    print("Done.")


if __name__ == "__main__":
    main(parse_arguments())
