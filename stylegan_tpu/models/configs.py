"""Static model configuration dataclasses.

These are frozen/hashable so they can be closed over by jitted step functions
(depth and architecture are static; alpha/psi are traced).  Field names and
defaults mirror the reference network constructors:
  MappingConfig       -> reference GAN.py:39-41 (GMapping)
  SynthesisConfig     -> reference GAN.py:105-109 (GSynthesis)
  GeneratorConfig     -> reference GAN.py:213-216 (Generator)
  DiscriminatorConfig -> reference GAN.py:302-306 (Discriminator)
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


def _nf(stage: int, fmap_base: int, fmap_decay: float, fmap_max: int) -> int:
    return min(int(fmap_base / (2.0 ** (stage * fmap_decay))), fmap_max)


@dataclass(frozen=True)
class MappingConfig:
    latent_size: int = 512
    dlatent_size: int = 512
    dlatent_broadcast: Optional[int] = None
    mapping_layers: int = 8
    mapping_fmaps: int = 512
    mapping_lrmul: float = 0.01
    mapping_nonlinearity: str = "lrelu"
    use_wscale: bool = True
    normalize_latents: bool = True

    def layer_dims(self) -> Tuple[Tuple[int, int], ...]:
        dims = []
        for i in range(self.mapping_layers):
            fin = self.latent_size if i == 0 else self.mapping_fmaps
            fout = (self.dlatent_size if i == self.mapping_layers - 1
                    else self.mapping_fmaps)
            dims.append((fin, fout))
        return tuple(dims)


@dataclass(frozen=True)
class SynthesisConfig:
    dlatent_size: int = 512
    num_channels: int = 3
    resolution: int = 1024
    fmap_base: int = 8192
    fmap_decay: float = 1.0
    fmap_max: int = 512
    use_styles: bool = True
    const_input_layer: bool = True
    use_noise: bool = True
    nonlinearity: str = "lrelu"
    use_wscale: bool = True
    use_pixel_norm: bool = False
    use_instance_norm: bool = True
    blur_filter: Optional[Tuple[int, ...]] = None
    structure: str = "linear"
    # Execution-layout knob (not an architecture change): run the wide
    # low-channel stages space-to-depth packed (ops/packed.py).  Same math,
    # 2-3x faster convs on TPU; off by default for bit-level reference parity.
    packed: bool = False
    # Fold the G path's post-upscale-conv blur into the packed conv kernel
    # with exact border correction (ops/packed.py:conv_packed_up_blur): the
    # composed taps reuse the same packed kernel slots, so the full-res blur
    # pass disappears for free.  Bit-equivalent to the two-pass form up to
    # f32 roundoff (tests/test_packed.py).  True folds PACKED stages only;
    # "all" also folds the unpacked C>=64 fused stages (exact too, but the
    # composed 6x6 kernel is 2.25x the MACs of the 4x4 it replaces —
    # measured a net loss on v5e, docs/DESIGN.md round 4).
    fold_blur: Union[bool, str] = False
    # Rematerialize each growth block in the backward pass (jax.checkpoint):
    # trades one extra block forward for not holding its activations live,
    # cutting train-step peak HBM so larger batches fit at high resolution.
    remat: bool = False

    @property
    def resolution_log2(self) -> int:
        r = int(math.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    @property
    def depth(self) -> int:
        """Number of stages == log2(res) - 1 (reference GAN.py:145)."""
        return self.resolution_log2 - 1

    @property
    def num_layers(self) -> int:
        return self.resolution_log2 * 2 - 2

    def nf(self, stage: int) -> int:
        return _nf(stage, self.fmap_base, self.fmap_decay, self.fmap_max)

    def packed_block(self, block_idx: int) -> bool:
        """Whether growth block `block_idx` (output res 2^(block_idx+3)) runs
        in the packed domain: packed lanes must not exceed the 128-wide MXU
        contraction (beyond that packing's 4x MAC overhead wins), and the
        fused-resample path must be active (res >= 128)."""
        res = 2 ** (block_idx + 3)
        return (self.packed and res >= 128
                and self.nf(block_idx + 2) * 4 <= 128)


@dataclass(frozen=True)
class GeneratorConfig:
    resolution: int = 1024
    latent_size: int = 512
    dlatent_size: int = 512
    conditional: bool = False
    n_classes: int = 0
    truncation_psi: float = 0.7
    truncation_cutoff: int = 8
    dlatent_avg_beta: float = 0.995
    style_mixing_prob: Optional[float] = 0.9
    mapping: MappingConfig = field(default_factory=MappingConfig)
    synthesis: SynthesisConfig = field(default_factory=SynthesisConfig)

    @property
    def num_layers(self) -> int:
        return (int(math.log2(self.resolution)) - 1) * 2

    @property
    def use_truncation(self) -> bool:
        # psi <= 0 disables the truncation module (reference GAN.py:246-252;
        # yaml convention: truncation_psi: -1. means off)
        return self.truncation_psi > 0

    @property
    def effective_latent_size(self) -> int:
        """Mapping input doubles when a class embedding is concatenated
        (reference GAN.py:233-236)."""
        return self.latent_size * 2 if self.conditional else self.latent_size


@dataclass(frozen=True)
class DiscriminatorConfig:
    resolution: int = 1024
    num_channels: int = 3
    conditional: bool = False
    n_classes: int = 0
    fmap_base: int = 8192
    fmap_decay: float = 1.0
    fmap_max: int = 512
    nonlinearity: str = "lrelu"
    use_wscale: bool = True
    mbstd_group_size: int = 4
    mbstd_num_features: int = 1
    blur_filter: Optional[Tuple[int, ...]] = None
    structure: str = "linear"
    # space-to-depth packed execution for the high-res low-channel stages
    # (see SynthesisConfig.packed)
    packed: bool = False
    # fold the per-block blur into the stride-2 downscale conv kernel
    # (exact, border-corrected; True = packed stages only, "all" adds the
    # unpacked fused stages; see SynthesisConfig.fold_blur)
    fold_blur: Union[bool, str] = False
    # rematerialize each block in the backward pass (see SynthesisConfig.remat)
    remat: bool = False

    @property
    def resolution_log2(self) -> int:
        r = int(math.log2(self.resolution))
        assert self.resolution == 2 ** r and self.resolution >= 4
        return r

    @property
    def depth(self) -> int:
        return self.resolution_log2 - 1

    def nf(self, stage: int) -> int:
        return _nf(stage, self.fmap_base, self.fmap_decay, self.fmap_max)

    def packed_res(self, res_log2: int) -> bool:
        """Whether the D stage consuming resolution 2^res_log2 runs packed:
        its trunk channels nf(res_log2-1) must pack within 128 lanes and the
        fused downscale path must be active (input res >= 128)."""
        return (self.packed and 2 ** res_log2 >= 128
                and self.nf(res_log2 - 1) * 4 <= 128)

    @property
    def input_channels(self) -> int:
        """Image channels doubled by the label embedding planes when
        conditional (reference GAN.py:326-329)."""
        return self.num_channels * 2 if self.conditional else self.num_channels


def generator_config_from_args(structure, resolution, num_channels,
                               latent_size, conditional, n_classes,
                               g_args) -> GeneratorConfig:
    """GeneratorConfig from a g_args mapping — the counterpart of the
    reference passing cfg.model.gen as Generator(**g_args) kwargs
    (train.py:84-99).  Recognized keys mirror Generator's kwargs."""
    g = dict(g_args)
    blur = g.get("blur_filter", [1, 2, 1])
    blur = tuple(blur) if blur else None
    latent = int(g.get("latent_size", latent_size))
    eff_latent = latent * 2 if conditional else latent
    num_layers = (int(math.log2(resolution)) - 1) * 2
    return GeneratorConfig(
        resolution=int(resolution),
        latent_size=latent,
        conditional=bool(conditional),
        n_classes=int(n_classes),
        truncation_psi=float(g.get("truncation_psi", 0.7)),
        truncation_cutoff=int(g.get("truncation_cutoff", 8)),
        dlatent_avg_beta=float(g.get("dlatent_avg_beta", 0.995)),
        style_mixing_prob=g.get("style_mixing_prob", 0.9),
        mapping=MappingConfig(
            latent_size=eff_latent,
            dlatent_broadcast=num_layers,
            mapping_layers=int(g.get("mapping_layers", 8)),
        ),
        synthesis=SynthesisConfig(
            resolution=int(resolution),
            num_channels=int(num_channels),
            blur_filter=blur,
            structure=str(structure),
        ),
    )


def discriminator_config_from_args(structure, resolution, num_channels,
                                   conditional, n_classes,
                                   d_args) -> DiscriminatorConfig:
    d = dict(d_args)
    blur = d.get("blur_filter", [1, 2, 1])
    blur = tuple(blur) if blur else None
    return DiscriminatorConfig(
        resolution=int(resolution),
        num_channels=int(num_channels),
        conditional=bool(conditional),
        n_classes=int(n_classes),
        use_wscale=bool(d.get("use_wscale", True)),
        blur_filter=blur,
        structure=str(structure),
    )


def generator_config_from_cfg(cfg) -> GeneratorConfig:
    """Build a GeneratorConfig from a full yacs-style cfg (including the
    ops.packed execution-layout knob)."""
    from ..config import resolve_packed
    from dataclasses import replace
    g = generator_config_from_args(
        cfg.structure, cfg.dataset.resolution, cfg.dataset.channels,
        cfg.model.gen.latent_size, cfg.conditional, cfg.n_classes,
        cfg.model.gen)
    # fold_blur propagates independently of the packed layout: 'all' targets
    # exactly the UNPACKED C>=64 fused stages (plain True no-ops there), so
    # gating it on resolve_packed would silently drop it when packing is off.
    fold = getattr(cfg.ops, "fold_blur", "auto")
    g = replace(g, synthesis=replace(
        g.synthesis, fold_blur=(True if fold == "auto" else fold)))
    if resolve_packed(cfg):
        g = replace(g, synthesis=replace(g.synthesis, packed=True))
    if getattr(cfg.ops, "remat", False):
        g = replace(g, synthesis=replace(g.synthesis, remat=True))
    return g


def discriminator_config_from_cfg(cfg) -> DiscriminatorConfig:
    from ..config import resolve_packed
    from dataclasses import replace
    d = discriminator_config_from_args(
        cfg.structure, cfg.dataset.resolution, cfg.dataset.channels,
        cfg.conditional, cfg.n_classes, cfg.model.dis)
    fold = getattr(cfg.ops, "fold_blur", "auto")
    d = replace(d, fold_blur=(True if fold == "auto" else fold))
    if resolve_packed(cfg):
        d = replace(d, packed=True)
    if getattr(cfg.ops, "remat", False):
        d = replace(d, remat=True)
    return d
