"""Analytic model-FLOP accounting for MFU reporting (VERDICT r3 #2).

Counts the *semantic* work of the reference architecture (StyleGAN.pytorch
models/Blocks.py + CustomLayers.py), independent of execution layout: the
space-to-depth packed execution (ops/packed.py) deliberately performs up to
4x the MACs on the C<=32 stages to win MXU utilization, and those extra MACs
are NOT counted here — so `mfu` is model-FLOP utilization (the honest,
layout-independent number), while raw hardware utilization on packed stages
is strictly higher.

Conventions (matched to the implementation's own lowering choices, and to
docs/DESIGN.md's quoted ~72 GFLOP/img for the FFHQ-1024 generator forward):

* conv: FLOPs = 2 * H_out * W_out * kh * kw * Cin * Cout per image.
* fused up/down-scale convs count the transposed/strided form (the expanded
  4x4 kernel = 4 taps per output pixel upscaling, 16 per output pixel
  downscaling) when the stage resolution >= 128 — the same threshold the
  implementation (ops/linear.py:118-158) and the reference
  (CustomLayers.py:124-178) use to pick the fused kernel — and the unfused
  resample+3x3 form (9 taps at the larger resolution) below it.  This makes
  the count "model FLOPs as the programs actually compute them" (modulo
  packing waste); FFHQ-1024 G forward = 64.5 GFLOP/img under it (DESIGN.md's
  earlier ~72 figure counted the unfused 9-tap form everywhere).
* blur: depthwise 3x3 = 2 * H * W * C * 9.
* dense: 2 * in * out; per-layer style mods are dense dlatent -> 2C.
* backward = 2x forward (grad wrt inputs + grad wrt weights), the standard
  MFU convention (e.g. PaLM appendix B).

Train-step multipliers (per image of batch, d_repeats=1, the bench/perf
configuration with ops.fuse_scores + ops.reuse_g_fwd; see
train/steps.py for the step structure):

  D phase: G fwd (shared with G phase via jax.vjp)           1 F_G
           D fwd on reals+fakes                              2 F_D
           D bwd                                             4 F_D
  G phase: D fwd on fakes (updated D params)                 1 F_D
           (+1 F_D more for relativistic losses: the gen
            loss re-scores reals too, Losses.py:106-119)
           D bwd to the fake images                          2 F_D
           G bwd through the stored vjp                      2 F_G

  logistic gamma=0:            3 F_G +  9 F_D
  logistic + in-loss R1:       3 F_G + 15 F_D   (R1's grad-of-grad: inner
                               input-grad 2 F_D + differentiating through
                               that composite ~4 F_D; the D(real) forward is
                               CSE'd with the main loss's)
  relativistic-hinge:          3 F_G + 10 F_D

Lazy R1 at interval N amortizes: (r1_step + (N-1) * plain_step) / N.
"""

from __future__ import annotations

import math
from typing import Optional


def _nf(stage: int, fmap_base: int = 8192, fmap_decay: float = 1.0,
        fmap_max: int = 512) -> int:
    return min(int(fmap_base / (2.0 ** (stage * fmap_decay))), fmap_max)


_FUSE_THRESHOLD = 128  # resolution threshold, ops/linear.py:118 /
#                        reference CustomLayers.py:124-178


def generator_forward_flops(resolution: int, *, latent_size: int = 512,
                            dlatent_size: int = 512, mapping_layers: int = 8,
                            mapping_fmaps: int = 512, num_channels: int = 3,
                            fmap_base: int = 8192, fmap_decay: float = 1.0,
                            fmap_max: int = 512) -> int:
    """Per-image forward FLOPs of the full generator (mapping + synthesis +
    to_rgb) at full depth.  Default args = the reference FFHQ configuration;
    1024 -> 64.5 GFLOP."""
    def nf(s):
        return _nf(s, fmap_base, fmap_decay, fmap_max)
    rlog2 = int(math.log2(resolution))
    f = 0
    # mapping network
    for i in range(mapping_layers):
        fin = latent_size if i == 0 else mapping_fmaps
        fout = dlatent_size if i == mapping_layers - 1 else mapping_fmaps
        f += 2 * fin * fout
    # input block: conv3x3 at 4x4 + 2 style denses
    c1 = nf(1)
    f += 2 * 16 * 9 * c1 * c1 + 2 * (2 * dlatent_size * 2 * c1)
    # growth blocks: upscale-conv, blur, conv3x3, 2 style denses
    for r in range(3, rlog2 + 1):
        h = 2 ** r
        cin, cout = nf(r - 2), nf(r - 1)
        up_taps = 4 if h >= _FUSE_THRESHOLD else 9
        f += 2 * h * h * up_taps * cin * cout
        f += 2 * h * h * cout * 9              # blur
        f += 2 * h * h * 9 * cout * cout       # conv1
        f += 2 * (2 * dlatent_size * 2 * cout)
    f += 2 * resolution * resolution * nf(rlog2 - 1) * num_channels  # to_rgb
    return f


def discriminator_forward_flops(resolution: int, *, num_channels: int = 3,
                                fmap_base: int = 8192, fmap_decay: float = 1.0,
                                fmap_max: int = 512,
                                mbstd_num_features: int = 1) -> int:
    """Per-image forward FLOPs of the discriminator at full depth."""
    def nf(s):
        return _nf(s, fmap_base, fmap_decay, fmap_max)
    rlog2 = int(math.log2(resolution))
    f = 2 * resolution * resolution * num_channels * nf(rlog2 - 1)  # from_rgb
    for r in range(rlog2, 2, -1):
        h = 2 ** r
        cin, cout = nf(r - 1), nf(r - 2)
        f += 2 * h * h * 9 * cin * cin          # conv0
        f += 2 * h * h * cin * 9                # blur
        down_taps = 16 if h >= _FUSE_THRESHOLD else 9 * 4
        f += 2 * (h // 2) * (h // 2) * down_taps * cin * cout  # conv1_down
    c2 = nf(2)
    f += 2 * 16 * 9 * (c2 + mbstd_num_features) * c2   # top conv
    f += 2 * (c2 * 16) * c2 + 2 * c2 * 1               # top denses
    return f


def train_step_flops(resolution: int, *, loss: str = "logistic",
                     with_r1: bool = True, **arch) -> int:
    """Per-image FLOPs of the fused train step in the bench/perf
    configuration (fuse_scores + reuse_g_fwd, d_repeats=1).  See the module
    docstring for the multiplier derivation."""
    fg = generator_forward_flops(resolution, **{
        k: v for k, v in arch.items() if k != "mbstd_num_features"})
    fd = discriminator_forward_flops(resolution, **{
        k: v for k, v in arch.items()
        if k in ("num_channels", "fmap_base", "fmap_decay", "fmap_max",
                 "mbstd_num_features")})
    if loss == "logistic":
        d_mult = 15 if with_r1 else 9
    elif loss in ("relativistic-hinge", "relativistic-average-hinge"):
        d_mult = 10
    else:  # standard-gan / hinge: gen loss scores fakes only
        d_mult = 9
    return 3 * fg + d_mult * fd


def lazy_r1_amortized_flops(resolution: int, interval: int, **arch) -> float:
    """Amortized per-image FLOPs of lazy R1 at the given interval."""
    r1 = train_step_flops(resolution, loss="logistic", with_r1=True, **arch)
    plain = train_step_flops(resolution, loss="logistic", with_r1=False,
                             **arch)
    return (r1 + (interval - 1) * plain) / interval


# Peak dense bf16 TFLOP/s per chip, from Google's published specs.
PEAK_BF16_TFLOPS = (
    ("v6e", 918.0), ("v6 lite", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0), ("v5 lite", 197.0), ("v5litepod", 197.0),
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
)


def device_peak_tflops(device=None) -> Optional[float]:
    """Peak bf16 TFLOP/s for a jax device (None = devices()[0]); returns
    None when the device kind is unrecognized (mfu is then omitted)."""
    import jax
    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for tag, peak in PEAK_BF16_TFLOPS:
        if tag.replace(" ", "") in kind:
            return peak
    return None


def mfu_fields(imgs_per_sec: float, flops_per_img: float,
               peak_tflops: Optional[float]) -> dict:
    """The JSON fields bench.py attaches to each throughput metric."""
    tps = imgs_per_sec * flops_per_img / 1e12
    out = {"gflops_per_img": round(flops_per_img / 1e9, 2),
           "tflops_per_sec": round(tps, 2)}
    if peak_tflops:
        out["mfu"] = round(tps / peak_tflops, 4)
    return out
