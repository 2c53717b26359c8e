"""Perceptual Path Length (Karras et al. 2019, arXiv:1812.04948 §4.1).

PPL measures latent-space smoothness: the expected perceptual distance
between images generated from infinitesimally perturbed latent
interpolations,

    PPL = E[ (1/eps^2) * d(G(lerp(t)), G(lerp(t + eps))) ],  eps = 1e-4,

with slerp in Z space or lerp in W space, t ~ U(0,1) ("full") or t = 0
("end").  The reference repo ships no metric code at all (SURVEY.md §5 "No
FID/IS/PPL anywhere"); this module completes the FID/IS/PPL trio.

The perceptual distance d is pluggable because this environment is
air-gapped:

  * with `--lpips_weights` — LPIPS over a VGG16 backbone (the paper's
    metric), weights from a local `.npz` holding the torchvision `vgg16`
    `features.*` conv tensors plus the lpips linear calibration heads.
    Convert once, anywhere torch + torchvision + lpips exist:

        import torch, torchvision, lpips, numpy as np
        vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
        net = lpips.LPIPS(net="vgg")
        d = {f"features.{k}": v.numpy()
             for k, v in vgg.features.state_dict().items()}
        for i, lin in enumerate(net.lins):
            d[f"lin{i}.weight"] = lin.model[-1].weight.data.numpy()
        np.savez("lpips_vgg16.npz", **d)

  * without weights — a Laplacian-pyramid L2 distance (multi-scale,
    zero-dependency; the same pyramid the SWD metric uses).  Not comparable
    to published LPIPS-PPL numbers, but a consistent smoothness measure for
    tracking a training run.

Images are center-cropped to the face region and downsampled to 256 before
the distance, as in the official implementation.

The LPIPS-VGG16 forward is pinned against a real torch execution of the
graph (tests/torch_metric_refs.py TorchLPIPSVgg: same random weights into
both, distances match to 1e-5).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .swd import laplacian_pyramid

EPSILON = 1e-4

# torchvision vgg16.features conv layer indices and the relu taps LPIPS uses
_VGG_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_CHANNELS = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
                 10: (128, 256), 12: (256, 256), 14: (256, 256),
                 17: (256, 512), 19: (512, 512), 21: (512, 512),
                 24: (512, 512), 26: (512, 512), 28: (512, 512)}
_LPIPS_TAPS = (2, 7, 14, 21, 28)      # relu1_2, 2_2, 3_3, 4_3, 5_3
_POOL_AFTER = (2, 7, 14, 21)          # maxpool follows these taps
_LPIPS_DIMS = (64, 128, 256, 512, 512)
# LPIPS input scaling (lpips.ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


# ---------------------------------------------------------------------------
# latent interpolation
# ---------------------------------------------------------------------------

def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation along the last axis (paper appendix).

    Degenerate (near-parallel) pairs fall back to lerp instead of dividing
    by sin(omega) ~ 0 — rare with gaussian draws, but one NaN distance
    would poison the whole PPL percentile reduction."""
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    dot = jnp.clip(jnp.sum(a_n * b_n, axis=-1, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > 1e-6
    so_safe = jnp.where(safe, so, 1.0)
    spherical = (jnp.sin((1.0 - t) * omega) / so_safe) * a \
        + (jnp.sin(t * omega) / so_safe) * b
    return jnp.where(safe, spherical, lerp(a, b, t))


def lerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    return a + (b - a) * t


# ---------------------------------------------------------------------------
# LPIPS (VGG16) distance
# ---------------------------------------------------------------------------

def lpips_vgg_init(key) -> Dict[str, np.ndarray]:
    """Random weights with the exact expected schema/shapes (pipeline
    tests; real PPL needs the converted weights from the module recipe)."""
    params = {}
    for idx in _VGG_CONVS:
        cin, cout = _VGG_CHANNELS[idx]
        key, k = jax.random.split(key)
        std = float(np.sqrt(2.0 / (cin * 9)))
        params[f"features.{idx}.weight"] = np.asarray(
            jax.random.normal(k, (cout, cin, 3, 3)) * std, np.float32)
        params[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)
    for i, dim in enumerate(_LPIPS_DIMS):
        key, k = jax.random.split(key)
        params[f"lin{i}.weight"] = np.asarray(
            jnp.abs(jax.random.normal(k, (1, dim, 1, 1))) / dim, np.float32)
    return params


def load_lpips_weights(path: str) -> Dict[str, np.ndarray]:
    """Load and schema-check an lpips_vgg16 `.npz` (see module recipe)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    missing, bad = [], []
    for idx in _VGG_CONVS:
        cin, cout = _VGG_CHANNELS[idx]
        for leaf, shape in ((f"features.{idx}.weight", (cout, cin, 3, 3)),
                            (f"features.{idx}.bias", (cout,))):
            if leaf not in flat:
                missing.append(leaf)
            elif tuple(flat[leaf].shape) != shape:
                bad.append(f"{leaf}: {flat[leaf].shape} != {shape}")
    for i, dim in enumerate(_LPIPS_DIMS):
        k = f"lin{i}.weight"
        if k not in flat:
            missing.append(k)
        elif tuple(np.squeeze(flat[k]).shape) != (dim,):
            bad.append(f"{k}: {flat[k].shape} squeezes to "
                       f"{np.squeeze(flat[k]).shape} != ({dim},)")
    if missing or bad:
        raise ValueError("lpips weights file does not match the vgg16+lin "
                         f"schema; missing={missing[:5]} bad={bad[:5]} "
                         f"(+{max(0, len(missing) + len(bad) - 10)} more)")
    return flat


def make_lpips_fn(params: Dict[str, np.ndarray]):
    """Returns a jitted fn(img_a, img_b) -> (B,) LPIPS distances.

    Inputs are NHWC in [-1, 1] (generator output range == lpips input
    convention)."""
    convs = {idx: (jnp.asarray(np.transpose(
                       params[f"features.{idx}.weight"], (2, 3, 1, 0)),
                       jnp.float32),
                   jnp.asarray(params[f"features.{idx}.bias"], jnp.float32))
             for idx in _VGG_CONVS}
    lins = [jnp.asarray(np.squeeze(params[f"lin{i}.weight"]), jnp.float32)
            for i in range(len(_LPIPS_DIMS))]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def features(x):
        x = (x - shift) / scale
        taps = []
        for idx in _VGG_CONVS:
            w, b = convs[idx]
            x = lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            x = jax.nn.relu(x)
            if idx in _LPIPS_TAPS:
                taps.append(x)
            if idx in _POOL_AFTER:
                x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
        return taps

    @jax.jit
    def distance(img_a, img_b):
        d = jnp.zeros((img_a.shape[0],), jnp.float32)
        for ta, tb, lin in zip(features(jnp.asarray(img_a, jnp.float32)),
                               features(jnp.asarray(img_b, jnp.float32)),
                               lins):
            na = ta * lax.rsqrt(jnp.sum(jnp.square(ta), -1, keepdims=True)
                                + 1e-10)
            nb = tb * lax.rsqrt(jnp.sum(jnp.square(tb), -1, keepdims=True)
                                + 1e-10)
            # lpips: per-channel lin weights on squared diffs, spatial mean
            d = d + jnp.mean(jnp.sum(jnp.square(na - nb) * lin, axis=-1),
                             axis=(1, 2))
        return d

    return distance


def make_pyramid_distance(levels: int = 4):
    """Zero-dependency fallback distance: L2 over a Laplacian pyramid,
    level-weighted so coarse structure counts like fine detail."""

    @jax.jit
    def distance(img_a, img_b):
        d = jnp.zeros((img_a.shape[0],), jnp.float32)
        pa = laplacian_pyramid(jnp.asarray(img_a, jnp.float32), levels)
        pb = laplacian_pyramid(jnp.asarray(img_b, jnp.float32), levels)
        for la, lb in zip(pa, pb):
            d = d + jnp.mean(jnp.square(la - lb), axis=(1, 2, 3))
        return d / levels

    return distance


# ---------------------------------------------------------------------------
# PPL harness
# ---------------------------------------------------------------------------

def crop_and_resize(images: jax.Array) -> jax.Array:
    """Official PPL pipeline: unconditionally center-crop the face region
    (with cell = side//8: rows 3..7 cells, cols 2..6 cells), then
    area-downsample to 256 if still larger.  The official implementation
    crops at EVERY resolution, not just >256 — keep that so PPL numbers at
    <=256 stay comparable to published ones.  Only guard: images smaller
    than 8px (toy tests) skip the crop, which would be empty."""
    b, h, w, c = images.shape
    if h >= 8:
        ch, cw = h // 8, w // 8
        images = images[:, ch * 3: ch * 7, cw * 2: cw * 6, :]
        h, w = images.shape[1], images.shape[2]
    if h > 256:
        f = h // 256
        images = jnp.mean(images.reshape(b, 256, f, w // f, f, c),
                          axis=(2, 4))
    return images


def ppl_samples(gen_cfg, params, distance_fn, *, num_samples: int,
                batch_size: int, key, space: str = "w",
                sampling: str = "full", labels=None,
                n_classes: Optional[int] = None) -> np.ndarray:
    """Per-pair scaled perceptual distances (the PPL integrand).

    space 'z': slerp in latent Z, each endpoint mapped separately.
    space 'w': lerp in W (broadcast to all layers).  Both eval-mode, no
    truncation/mixing (train=False), matching the official metric.

    Conditional models: pass `labels` to pin every pair to fixed classes, or
    `n_classes` to sample labels uniformly per batch (deterministic in
    `key`) so the score covers the whole model, not just one class."""
    from ..models import generator_apply
    from ..models.mapping import mapping_apply
    from ..models.synthesis import synthesis_apply
    assert space in ("z", "w") and sampling in ("full", "end")
    assert labels is None or n_classes is None, \
        "pass fixed `labels` or `n_classes` to sample them, not both"
    depth = gen_cfg.synthesis.depth - 1
    eps = EPSILON

    @jax.jit
    def batch_distances(k):
        labels_b = labels
        kz1, kz2, kt, kn, kl = jax.random.split(k, 5)
        if n_classes is not None:
            labels_b = jax.random.randint(kl, (batch_size,), 0, n_classes)
        z1 = jax.random.normal(kz1, (batch_size, gen_cfg.latent_size))
        z2 = jax.random.normal(kz2, (batch_size, gen_cfg.latent_size))
        t = (jax.random.uniform(kt, (batch_size, 1))
             if sampling == "full" else jnp.zeros((batch_size, 1)))
        if space == "z":
            za, zb = slerp(z1, z2, t), slerp(z1, z2, t + eps)
            ia = generator_apply(gen_cfg, params, za, depth=depth, alpha=1.0,
                                 rng=kn, train=False, labels=labels_b).images
            ib = generator_apply(gen_cfg, params, zb, depth=depth, alpha=1.0,
                                 rng=kn, train=False, labels=labels_b).images
        else:
            zin1, zin2 = z1, z2
            if gen_cfg.conditional:
                from ..models.generator import embed_labels
                emb = embed_labels(params, labels_b)
                zin1 = jnp.concatenate([z1, emb], axis=1)
                zin2 = jnp.concatenate([z2, emb], axis=1)
            w1 = mapping_apply(gen_cfg.mapping, params["g_mapping"], zin1)
            w2 = mapping_apply(gen_cfg.mapping, params["g_mapping"], zin2)
            if w1.ndim == 2:  # no broadcast configured: expand to all layers
                w1 = jnp.repeat(w1[:, None, :], gen_cfg.num_layers, 1)
                w2 = jnp.repeat(w2[:, None, :], gen_cfg.num_layers, 1)
            wa = lerp(w1, w2, t[:, :, None])
            wb = lerp(w1, w2, (t + eps)[:, :, None])
            ia = synthesis_apply(gen_cfg.synthesis, params["g_synthesis"], wa,
                                 depth=depth, alpha=1.0, rng=kn)
            ib = synthesis_apply(gen_cfg.synthesis, params["g_synthesis"], wb,
                                 depth=depth, alpha=1.0, rng=kn)
        ia, ib = crop_and_resize(ia), crop_and_resize(ib)
        return distance_fn(ia, ib) * (1.0 / eps ** 2)

    out = []
    for i in range((num_samples + batch_size - 1) // batch_size):
        out.append(np.asarray(batch_distances(jax.random.fold_in(key, i))))
    return np.concatenate(out)[:num_samples]


def ppl_score(distances: np.ndarray) -> float:
    """Official reduction: mean after clipping away the lowest/highest 1%."""
    d = np.asarray(distances, np.float64)
    lo, hi = np.percentile(d, 1), np.percentile(d, 99)
    keep = d[(d >= lo) & (d <= hi)]
    return float(keep.mean()) if keep.size else float(d.mean())
