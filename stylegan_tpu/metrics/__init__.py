"""Evaluation metrics.

The reference ships no metric code (SURVEY.md §5: "No FID/IS/PPL metric code
anywhere").  We provide Sliced Wasserstein Distance over a Laplacian pyramid —
the ProGAN paper's metric — because it needs no pretrained feature extractor
(FID's InceptionV3 weights are unavailable in air-gapped TPU pods).
"""

from .swd import sliced_wasserstein_distance

__all__ = ["sliced_wasserstein_distance"]
