"""Evaluation metrics.

The reference ships no metric code (SURVEY.md §5: "No FID/IS/PPL metric code
anywhere").  We provide:

* Sliced Wasserstein Distance over a Laplacian pyramid — the ProGAN paper's
  metric — which needs no pretrained feature extractor and therefore works
  in air-gapped TPU pods (swd.py).
* FID and Inception Score behind a local-weights flag: a torchvision-schema
  InceptionV3 implemented in JAX + the Frechet / IS math, usable the moment
  converted pretrained weights exist on disk (fid.py).
"""

from .fid import (compute_fid, compute_inception_score, fid_from_features,
                  frechet_distance, inception_score_from_probs,
                  inception_v3_init, load_inception_weights, make_feature_fn,
                  make_probs_fn)
from .ppl import (load_lpips_weights, lpips_vgg_init, make_lpips_fn,
                  make_pyramid_distance, ppl_samples, ppl_score)
from .swd import sliced_wasserstein_distance

__all__ = ["sliced_wasserstein_distance", "compute_fid", "fid_from_features",
           "frechet_distance", "inception_v3_init", "load_inception_weights",
           "make_feature_fn", "compute_inception_score",
           "inception_score_from_probs", "make_probs_fn",
           "load_lpips_weights", "lpips_vgg_init", "make_lpips_fn",
           "make_pyramid_distance", "ppl_samples", "ppl_score"]
