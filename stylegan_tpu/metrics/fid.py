"""Frechet Inception Distance behind a local-weights flag.

Neither the reference nor its upstream ships metric code (SURVEY.md §5), but
the BASELINE target names FFHQ-128 FID parity — this module makes FID
measurable the moment InceptionV3 weights exist locally.  This environment is
air-gapped (no torchvision, no downloads), so:

  * the InceptionV3 feature extractor is implemented here in JAX/NHWC with
    the exact torchvision `inception_v3` architecture (BasicConv2d = conv ->
    BN(eps=1e-3) -> relu; Mixed_5b..7c blocks; 2048-d pool3 features), and
  * weights load from a local `.npz` whose keys are the torchvision
    state_dict names verbatim (Conv2d_1a_3x3.conv.weight, Mixed_5b.branch1x1
    .bn.running_mean, ...).  Convert once, anywhere torch + torchvision
    exist:

      sd = torchvision.models.inception_v3(weights="IMAGENET1K_V1").state_dict()
      np.savez("inception_v3.npz", **{k: v.numpy() for k, v in sd.items()})

  * without weights, eval_metrics.py falls back to SWD (metrics/swd.py), the
    pretrained-feature-free ProGAN metric.

Input pipeline reproduces pytorch-fid: images in [0, 1], bilinear resize to
299x299 (half-pixel centers == torch align_corners=False), scale to [-1, 1],
features = global-avg-pooled Mixed_7c output.  FID = ||mu1-mu2||^2 +
tr(S1 + S2 - 2 sqrtm(S1 S2)), computed in float64 on host.

Conv layouts are NHWC/HWIO at apply time (TPU-native); the torchvision OIHW
kernels are transposed once at load.

Numerics are pinned against a real torch execution of the inception_v3 graph
(tests/torch_metric_refs.py + tests/test_metrics.py TestTorchExtractorParity:
same random weights into both, features/probs match at 299 and through the
128->299 resize path).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# architecture table (torchvision inception_v3 layer names and shapes)
# ---------------------------------------------------------------------------

def _conv_spec(name, cin, cout, kh, kw, stride=1, pad=(0, 0)):
    return (name, cin, cout, kh, kw, stride, pad)


def _stem_specs():
    return [
        _conv_spec("Conv2d_1a_3x3", 3, 32, 3, 3, 2),
        _conv_spec("Conv2d_2a_3x3", 32, 32, 3, 3),
        _conv_spec("Conv2d_2b_3x3", 32, 64, 3, 3, 1, (1, 1)),
        # maxpool 3x3 s2 between 2b/3b and 4a/5b (handled in apply)
        _conv_spec("Conv2d_3b_1x1", 64, 80, 1, 1),
        _conv_spec("Conv2d_4a_3x3", 80, 192, 3, 3),
    ]


def _inception_a(prefix, cin, pool_features):
    return [
        _conv_spec(f"{prefix}.branch1x1", cin, 64, 1, 1),
        _conv_spec(f"{prefix}.branch5x5_1", cin, 48, 1, 1),
        _conv_spec(f"{prefix}.branch5x5_2", 48, 64, 5, 5, 1, (2, 2)),
        _conv_spec(f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1),
        _conv_spec(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3, 1, (1, 1)),
        _conv_spec(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3, 1, (1, 1)),
        _conv_spec(f"{prefix}.branch_pool", cin, pool_features, 1, 1),
    ]


def _inception_b(prefix, cin):
    return [
        _conv_spec(f"{prefix}.branch3x3", cin, 384, 3, 3, 2),
        _conv_spec(f"{prefix}.branch3x3dbl_1", cin, 64, 1, 1),
        _conv_spec(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 3, 1, (1, 1)),
        _conv_spec(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 3, 2),
    ]


def _inception_c(prefix, cin, c7):
    return [
        _conv_spec(f"{prefix}.branch1x1", cin, 192, 1, 1),
        _conv_spec(f"{prefix}.branch7x7_1", cin, c7, 1, 1),
        _conv_spec(f"{prefix}.branch7x7_2", c7, c7, 1, 7, 1, (0, 3)),
        _conv_spec(f"{prefix}.branch7x7_3", c7, 192, 7, 1, 1, (3, 0)),
        _conv_spec(f"{prefix}.branch7x7dbl_1", cin, c7, 1, 1),
        _conv_spec(f"{prefix}.branch7x7dbl_2", c7, c7, 7, 1, 1, (3, 0)),
        _conv_spec(f"{prefix}.branch7x7dbl_3", c7, c7, 1, 7, 1, (0, 3)),
        _conv_spec(f"{prefix}.branch7x7dbl_4", c7, c7, 7, 1, 1, (3, 0)),
        _conv_spec(f"{prefix}.branch7x7dbl_5", c7, 192, 1, 7, 1, (0, 3)),
        _conv_spec(f"{prefix}.branch_pool", cin, 192, 1, 1),
    ]


def _inception_d(prefix, cin):
    return [
        _conv_spec(f"{prefix}.branch3x3_1", cin, 192, 1, 1),
        _conv_spec(f"{prefix}.branch3x3_2", 192, 320, 3, 3, 2),
        _conv_spec(f"{prefix}.branch7x7x3_1", cin, 192, 1, 1),
        _conv_spec(f"{prefix}.branch7x7x3_2", 192, 192, 1, 7, 1, (0, 3)),
        _conv_spec(f"{prefix}.branch7x7x3_3", 192, 192, 7, 1, 1, (3, 0)),
        _conv_spec(f"{prefix}.branch7x7x3_4", 192, 192, 3, 3, 2),
    ]


def _inception_e(prefix, cin):
    return [
        _conv_spec(f"{prefix}.branch1x1", cin, 320, 1, 1),
        _conv_spec(f"{prefix}.branch3x3_1", cin, 384, 1, 1),
        _conv_spec(f"{prefix}.branch3x3_2a", 384, 384, 1, 3, 1, (0, 1)),
        _conv_spec(f"{prefix}.branch3x3_2b", 384, 384, 3, 1, 1, (1, 0)),
        _conv_spec(f"{prefix}.branch3x3dbl_1", cin, 448, 1, 1),
        _conv_spec(f"{prefix}.branch3x3dbl_2", 448, 384, 3, 3, 1, (1, 1)),
        _conv_spec(f"{prefix}.branch3x3dbl_3a", 384, 384, 1, 3, 1, (0, 1)),
        _conv_spec(f"{prefix}.branch3x3dbl_3b", 384, 384, 3, 1, 1, (1, 0)),
        _conv_spec(f"{prefix}.branch_pool", cin, 192, 1, 1),
    ]


def all_conv_specs():
    specs = list(_stem_specs())
    specs += _inception_a("Mixed_5b", 192, 32)
    specs += _inception_a("Mixed_5c", 256, 64)
    specs += _inception_a("Mixed_5d", 288, 64)
    specs += _inception_b("Mixed_6a", 288)
    for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        specs += _inception_c(name, 768, c7)
    specs += _inception_d("Mixed_7a", 768)
    specs += _inception_e("Mixed_7b", 1280)
    specs += _inception_e("Mixed_7c", 2048)
    return specs


# ---------------------------------------------------------------------------
# params: flat dict keyed by torchvision state_dict names
# ---------------------------------------------------------------------------

def inception_v3_init(key) -> Dict[str, np.ndarray]:
    """Random params with the exact torchvision key schema and shapes
    (for pipeline tests; real FID needs converted pretrained weights)."""
    params = {}
    for name, cin, cout, kh, kw, _, _ in all_conv_specs():
        key, k = jax.random.split(key)
        # He init with the relu gain so the ~94-conv feature path keeps unit
        # activation scale (pipeline tests need non-degenerate features)
        std = math.sqrt(2.0 / (cin * kh * kw))
        params[f"{name}.conv.weight"] = np.asarray(
            jax.random.normal(k, (cout, cin, kh, kw)) * std, np.float32)
        params[f"{name}.bn.weight"] = np.ones((cout,), np.float32)
        params[f"{name}.bn.bias"] = np.zeros((cout,), np.float32)
        params[f"{name}.bn.running_mean"] = np.zeros((cout,), np.float32)
        params[f"{name}.bn.running_var"] = np.ones((cout,), np.float32)
    # classifier head (fc) — FID ignores it, Inception Score needs it
    key, k = jax.random.split(key)
    params["fc.weight"] = np.asarray(
        jax.random.normal(k, (1000, 2048)) * math.sqrt(1.0 / 2048), np.float32)
    params["fc.bias"] = np.zeros((1000,), np.float32)
    return params


def load_inception_weights(path: str, need_fc: bool = False) \
        -> Dict[str, np.ndarray]:
    """Load a torchvision-schema `.npz`; verifies every conv/BN tensor the
    feature path needs is present with the right shape.  FID uses pool3
    features only (fc / AuxLogits keys ignored); need_fc=True additionally
    requires the (1000, 2048) classifier head (Inception Score)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    missing, bad = [], []
    if need_fc:
        if "fc.weight" not in flat or "fc.bias" not in flat:
            missing.append("fc.weight/fc.bias")
        else:
            if tuple(flat["fc.weight"].shape) != (1000, 2048):
                bad.append(
                    f"fc.weight: {flat['fc.weight'].shape} != (1000, 2048)")
            if tuple(flat["fc.bias"].shape) != (1000,):
                bad.append(f"fc.bias: {flat['fc.bias'].shape} != (1000,)")
    for name, cin, cout, kh, kw, _, _ in all_conv_specs():
        wk = f"{name}.conv.weight"
        if wk not in flat:
            missing.append(wk)
        elif tuple(flat[wk].shape) != (cout, cin, kh, kw):
            bad.append(f"{wk}: {flat[wk].shape} != {(cout, cin, kh, kw)}")
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            bk = f"{name}.bn.{leaf}"
            if bk not in flat:
                missing.append(bk)
            elif tuple(flat[bk].shape) != (cout,):
                bad.append(f"{bk}: {flat[bk].shape} != {(cout,)}")
    if missing or bad:
        raise ValueError(
            "inception weights file does not match the torchvision "
            f"inception_v3 schema; missing={missing[:5]} bad={bad[:5]} "
            f"(+{max(0, len(missing) + len(bad) - 10)} more)")
    return flat


def _prepare(params: Dict[str, np.ndarray]):
    """Fold BN into per-channel scale/shift and transpose kernels to HWIO."""
    folded = {}
    for name, *_ in all_conv_specs():
        w = jnp.asarray(np.transpose(params[f"{name}.conv.weight"],
                                     (2, 3, 1, 0)), jnp.float32)
        gamma = jnp.asarray(params[f"{name}.bn.weight"], jnp.float32)
        beta = jnp.asarray(params[f"{name}.bn.bias"], jnp.float32)
        mean = jnp.asarray(params[f"{name}.bn.running_mean"], jnp.float32)
        var = jnp.asarray(params[f"{name}.bn.running_var"], jnp.float32)
        scale = gamma * lax.rsqrt(var + _BN_EPS)
        folded[name] = (w, scale, beta - mean * scale)
    return folded


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _specs_by_name():
    return {s[0]: s for s in all_conv_specs()}


_SPECS = _specs_by_name()


def _bconv(folded, name, x):
    """BasicConv2d: conv (folded BN scale) -> shift -> relu."""
    _, _, _, _, _, stride, pad = _SPECS[name]
    w, scale, shift = folded[name]
    y = lax.conv_general_dilated(
        x, w * scale[None, None, None, :], (stride, stride),
        [(pad[0], pad[0]), (pad[1], pad[1])], dimension_numbers=_DIMS)
    return jax.nn.relu(y + shift)


def _maxpool3s2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1), "VALID")


def _avgpool3s1p1(x):
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                          [(0, 0), (1, 1), (1, 1), (0, 0)])
    # count_include_pad=True (torch default for nn.AvgPool2d used here)
    return s / 9.0


def _block_a(folded, p, x):
    b1 = _bconv(folded, f"{p}.branch1x1", x)
    b5 = _bconv(folded, f"{p}.branch5x5_2",
                _bconv(folded, f"{p}.branch5x5_1", x))
    b3 = _bconv(folded, f"{p}.branch3x3dbl_3",
                _bconv(folded, f"{p}.branch3x3dbl_2",
                       _bconv(folded, f"{p}.branch3x3dbl_1", x)))
    bp = _bconv(folded, f"{p}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(folded, p, x):
    b3 = _bconv(folded, f"{p}.branch3x3", x)
    bd = _bconv(folded, f"{p}.branch3x3dbl_3",
                _bconv(folded, f"{p}.branch3x3dbl_2",
                       _bconv(folded, f"{p}.branch3x3dbl_1", x)))
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _block_c(folded, p, x):
    b1 = _bconv(folded, f"{p}.branch1x1", x)
    b7 = x
    for leaf in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
        b7 = _bconv(folded, f"{p}.{leaf}", b7)
    bd = x
    for leaf in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5"):
        bd = _bconv(folded, f"{p}.{leaf}", bd)
    bp = _bconv(folded, f"{p}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(folded, p, x):
    b3 = _bconv(folded, f"{p}.branch3x3_2",
                _bconv(folded, f"{p}.branch3x3_1", x))
    b7 = x
    for leaf in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                 "branch7x7x3_4"):
        b7 = _bconv(folded, f"{p}.{leaf}", b7)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _block_e(folded, p, x):
    b1 = _bconv(folded, f"{p}.branch1x1", x)
    b3 = _bconv(folded, f"{p}.branch3x3_1", x)
    b3 = jnp.concatenate([_bconv(folded, f"{p}.branch3x3_2a", b3),
                          _bconv(folded, f"{p}.branch3x3_2b", b3)], axis=-1)
    bd = _bconv(folded, f"{p}.branch3x3dbl_2",
                _bconv(folded, f"{p}.branch3x3dbl_1", x))
    bd = jnp.concatenate([_bconv(folded, f"{p}.branch3x3dbl_3a", bd),
                          _bconv(folded, f"{p}.branch3x3dbl_3b", bd)], axis=-1)
    bp = _bconv(folded, f"{p}.branch_pool", _avgpool3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def make_feature_fn(params: Dict[str, np.ndarray]):
    """Returns a jitted fn: images01 (B, H, W, 3) in [0, 1] -> (B, 2048)."""
    folded = _prepare(params)

    @jax.jit
    def features(images01):
        x = jnp.asarray(images01, jnp.float32)
        if x.shape[1] != 299 or x.shape[2] != 299:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 "bilinear")
        x = x * 2.0 - 1.0  # pytorch-fid normalize_input
        for name in ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3"):
            x = _bconv(folded, name, x)
        x = _maxpool3s2(x)
        x = _bconv(folded, "Conv2d_3b_1x1", x)
        x = _bconv(folded, "Conv2d_4a_3x3", x)
        x = _maxpool3s2(x)
        for p, pf in [("Mixed_5b", 32), ("Mixed_5c", 64), ("Mixed_5d", 64)]:
            x = _block_a(folded, p, x)
        x = _block_b(folded, "Mixed_6a", x)
        for p in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = _block_c(folded, p, x)
        x = _block_d(folded, "Mixed_7a", x)
        x = _block_e(folded, "Mixed_7b", x)
        x = _block_e(folded, "Mixed_7c", x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)

    return features


# ---------------------------------------------------------------------------
# Frechet distance
# ---------------------------------------------------------------------------

def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu (D,), sigma (D, D)) in float64."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + tr(S1 + S2 - 2 sqrtm(S1 S2)).

    tr(sqrtm(S1 S2)) is computed via the symmetric form sqrtm(S1)^T S2
    sqrtm(S1): both factors are PSD, so the trace equals the sum of the
    square roots of that symmetric product's eigenvalues — no non-symmetric
    sqrtm (scipy) needed.
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    s1 = np.asarray(sigma1, np.float64) + eps * np.eye(len(mu1))
    s2 = np.asarray(sigma2, np.float64) + eps * np.eye(len(mu2))

    # sqrtm of the symmetric PSD s1 via eigendecomposition
    w, v = np.linalg.eigh(s1)
    sq1 = (v * np.sqrt(np.clip(w, 0, None))) @ v.T
    m = sq1 @ s2 @ sq1
    ev = np.linalg.eigvalsh((m + m.T) / 2.0)
    tr_sqrt = float(np.sum(np.sqrt(np.clip(ev, 0, None))))

    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


def fid_from_features(real_features, fake_features) -> float:
    mu_r, s_r = compute_statistics(real_features)
    mu_f, s_f = compute_statistics(fake_features)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def compute_fid(reals01, fakes01, weights_path: str,
                batch_size: int = 32) -> float:
    """End-to-end FID between two [0, 1] NHWC image sets."""
    feats = make_feature_fn(load_inception_weights(weights_path))

    def run(images):
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(feats(images[i:i + batch_size])))
        return np.concatenate(out)

    return fid_from_features(run(np.asarray(reals01)),
                             run(np.asarray(fakes01)))


# ---------------------------------------------------------------------------
# Inception Score (Salimans et al. 2016) — reuses the same network + weights
# ---------------------------------------------------------------------------

def make_probs_fn(params: Dict[str, np.ndarray]):
    """Returns a jitted fn: images01 (B, H, W, 3) in [0, 1] -> class
    probabilities (B, 1000) via the torchvision fc head on pool3 features."""
    feature_fn = make_feature_fn(params)
    fc_w = jnp.asarray(np.transpose(params["fc.weight"]), jnp.float32)
    fc_b = jnp.asarray(params["fc.bias"], jnp.float32)

    @jax.jit
    def probs(images01):
        logits = feature_fn(images01) @ fc_w + fc_b
        return jax.nn.softmax(logits, axis=-1)

    return probs


def inception_score_from_probs(probs: np.ndarray,
                               splits: int = 10) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))), mean/std over `splits` chunks."""
    p = np.asarray(probs, np.float64)
    n = len(p)
    splits = max(1, min(splits, n))
    scores = []
    for chunk in np.array_split(p, splits):
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = np.sum(chunk * (np.log(chunk + 1e-16)
                             - np.log(marginal + 1e-16)), axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))


def compute_inception_score(fakes01, weights_path: str, batch_size: int = 32,
                            splits: int = 10) -> Tuple[float, float]:
    """End-to-end Inception Score of a [0, 1] NHWC image set."""
    probs_fn = make_probs_fn(load_inception_weights(weights_path,
                                                    need_fc=True))
    out = []
    for i in range(0, len(fakes01), batch_size):
        out.append(np.asarray(probs_fn(fakes01[i:i + batch_size])))
    return inception_score_from_probs(np.concatenate(out), splits)
