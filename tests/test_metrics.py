"""SWD metric sanity: zero for identical sets, monotone with distribution
shift, pyramid shapes correct."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylegan_tpu.metrics import sliced_wasserstein_distance
from stylegan_tpu.metrics.swd import laplacian_pyramid


def test_pyramid_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    pyr = laplacian_pyramid(x, 3)
    assert [p.shape[1] for p in pyr] == [32, 16, 8]


def test_pyramid_reconstructs():
    """Sum of (upsampled) pyramid levels reconstructs the input."""
    from stylegan_tpu.ops import blur2d, make_blur_kernel, upscale2d
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3)
                    .astype(np.float32))
    pyr = laplacian_pyramid(x, 2)
    k = make_blur_kernel([1, 4, 6, 4, 1])
    recon = pyr[0] + blur2d(upscale2d(pyr[1]), k)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(x), atol=1e-5)


def test_identical_sets_near_zero():
    x = jnp.asarray(np.random.RandomState(1).randn(8, 32, 32, 3)
                    .astype(np.float32))
    out = sliced_wasserstein_distance(x, x, key=jax.random.PRNGKey(0),
                                      n_patches=512, n_proj=32)
    # same images, same patch RNG per side differs — small but not huge
    assert out["avg"] < 0.2


def test_detects_distribution_shift():
    rs = np.random.RandomState(2)
    real = jnp.asarray(rs.randn(8, 32, 32, 3).astype(np.float32))
    similar = jnp.asarray(rs.randn(8, 32, 32, 3).astype(np.float32))
    shifted = jnp.asarray((rs.randn(8, 32, 32, 3) * 3 + 2).astype(np.float32))
    d_close = sliced_wasserstein_distance(real, similar,
                                          key=jax.random.PRNGKey(1),
                                          n_patches=512, n_proj=32)["avg"]
    d_far = sliced_wasserstein_distance(real, shifted,
                                        key=jax.random.PRNGKey(1),
                                        n_patches=512, n_proj=32)["avg"]
    assert d_far > d_close


# ---------------------------------------------------------------------------
# FID (metrics/fid.py)
# ---------------------------------------------------------------------------

class TestFrechetMath:
    def test_identical_statistics_are_zero(self):
        from stylegan_tpu.metrics import frechet_distance
        rs = np.random.RandomState(0)
        mu = rs.randn(16)
        a = rs.randn(64, 16)
        sigma = np.cov(a, rowvar=False)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_diagonal_gaussian_closed_form(self):
        """For diagonal covariances the Frechet distance has the closed form
        |mu1-mu2|^2 + sum((sqrt(v1) - sqrt(v2))^2)."""
        from stylegan_tpu.metrics import frechet_distance
        rs = np.random.RandomState(1)
        mu1, mu2 = rs.randn(8), rs.randn(8)
        v1, v2 = rs.uniform(0.5, 2.0, 8), rs.uniform(0.5, 2.0, 8)
        got = frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2), eps=0.0)
        want = np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(v1) -
                                                  np.sqrt(v2)) ** 2)
        assert abs(got - want) < 1e-8

    def test_fid_from_features_orders_distributions(self):
        from stylegan_tpu.metrics import fid_from_features
        rs = np.random.RandomState(2)
        real = rs.randn(256, 16)
        close = rs.randn(256, 16) * 1.05
        far = rs.randn(256, 16) * 3 + 2
        assert fid_from_features(real, far) > fid_from_features(real, close)


class TestInceptionPipeline:
    @pytest.fixture(scope="class")
    def weights(self):
        from stylegan_tpu.metrics import inception_v3_init
        return inception_v3_init(jax.random.PRNGKey(0))

    def test_feature_shape_and_determinism(self, weights):
        from stylegan_tpu.metrics import make_feature_fn
        fn = make_feature_fn(weights)
        x = np.random.RandomState(3).uniform(0, 1, (2, 64, 64, 3)) \
            .astype(np.float32)
        f1 = np.asarray(fn(x))
        f2 = np.asarray(fn(x))
        assert f1.shape == (2, 2048)
        assert np.all(np.isfinite(f1))
        np.testing.assert_array_equal(f1, f2)

    def test_weights_file_roundtrip_and_validation(self, weights, tmp_path):
        from stylegan_tpu.metrics import (load_inception_weights,
                                          make_feature_fn)
        path = str(tmp_path / "inception.npz")
        np.savez(path, **weights)
        loaded = load_inception_weights(path)
        fn_a = make_feature_fn(weights)
        fn_b = make_feature_fn(loaded)
        x = np.random.RandomState(4).uniform(0, 1, (1, 32, 32, 3)) \
            .astype(np.float32)
        np.testing.assert_array_equal(np.asarray(fn_a(x)), np.asarray(fn_b(x)))

        bad = dict(weights)
        bad["Mixed_7c.branch1x1.conv.weight"] = np.zeros((1, 1, 1, 1),
                                                         np.float32)
        bad_path = str(tmp_path / "bad.npz")
        np.savez(bad_path, **bad)
        with pytest.raises(ValueError, match="schema"):
            load_inception_weights(bad_path)

    def test_inception_score_math(self):
        """Closed-form checks of the IS formula: one-hot predictions spread
        uniformly over K classes score exactly K; identical predictions
        score exactly 1."""
        from stylegan_tpu.metrics import inception_score_from_probs
        k, n = 10, 40
        onehot = np.zeros((n, 1000))
        onehot[np.arange(n), np.arange(n) % k] = 1.0
        mean, std = inception_score_from_probs(onehot, splits=1)
        assert abs(mean - k) < 1e-6 and std == 0.0

        same = np.tile(np.full((1, 1000), 1.0 / 1000), (n, 1))
        mean, _ = inception_score_from_probs(same, splits=4)
        assert abs(mean - 1.0) < 1e-9

    def test_compute_inception_score_end_to_end(self, weights, tmp_path):
        """Whole IS pipeline on synthetic weights: finite, >= 1 (Jensen),
        and deterministic."""
        from stylegan_tpu.metrics import compute_inception_score
        path = str(tmp_path / "inception.npz")
        np.savez(path, **weights)
        rs = np.random.RandomState(6)
        fakes = rs.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
        m1, s1 = compute_inception_score(fakes, path, batch_size=4, splits=2)
        m2, _ = compute_inception_score(fakes, path, batch_size=4, splits=2)
        assert np.isfinite(m1) and np.isfinite(s1)
        assert m1 >= 1.0 - 1e-9
        assert m1 == m2

        # fc head is required: a weights file without it must be rejected
        no_fc = {k: v for k, v in weights.items()
                 if not k.startswith("fc.")}
        nf_path = str(tmp_path / "nofc.npz")
        np.savez(nf_path, **no_fc)
        with pytest.raises(ValueError, match="schema"):
            compute_inception_score(fakes, nf_path, batch_size=4)

    def test_ppl_interpolation_math(self):
        """slerp endpoints reproduce the inputs; slerp stays on the sphere
        for unit vectors; the score reduction clips the 1% tails."""
        from stylegan_tpu.metrics.ppl import lerp, ppl_score, slerp
        rs = np.random.RandomState(7)
        a = rs.randn(4, 16).astype(np.float32)
        b = rs.randn(4, 16).astype(np.float32)
        np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), a, atol=1e-5)
        np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), b, atol=1e-5)
        a_u = a / np.linalg.norm(a, axis=-1, keepdims=True)
        b_u = b / np.linalg.norm(b, axis=-1, keepdims=True)
        mid = np.asarray(slerp(a_u, b_u, 0.5))
        np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(lerp(a, b, 0.5)), (a + b) / 2,
                                   atol=1e-6)

        # one huge outlier among 200 values must be clipped away
        d = np.ones(200)
        d[0] = 1e9
        assert abs(ppl_score(d) - 1.0) < 1e-9

        # degenerate (parallel / antiparallel) pairs fall back to lerp
        # instead of dividing by sin(0)
        same = np.asarray(slerp(a, a, 0.3))
        assert np.isfinite(same).all()
        np.testing.assert_allclose(same, a, atol=1e-5)
        anti = np.asarray(slerp(a, -a, 0.5))
        assert np.isfinite(anti).all()

    def test_ppl_crop_and_resize(self):
        from stylegan_tpu.metrics.ppl import crop_and_resize
        big = jnp.arange(2 * 1024 * 1024 * 3, dtype=jnp.float32) \
            .reshape(2, 1024, 1024, 3)
        out = crop_and_resize(big)
        assert out.shape == (2, 256, 256, 3)
        # the crop is unconditional (official pipeline): 32 -> 16x16 face box
        small = jnp.zeros((2, 32, 32, 3))
        assert crop_and_resize(small).shape == (2, 16, 16, 3)
        # sub-8px toy images skip the (empty) crop
        tiny = jnp.zeros((2, 4, 4, 3))
        assert crop_and_resize(tiny).shape == (2, 4, 4, 3)
        # crop box matches the official c=side//8 arithmetic: rows 3c..7c,
        # cols 2c..6c of the original image
        ramp = np.arange(2 * 32 * 32 * 3, dtype=np.float32) \
            .reshape(2, 32, 32, 3)
        np.testing.assert_allclose(
            np.asarray(crop_and_resize(jnp.asarray(ramp))),
            ramp[:, 12:28, 8:24, :])

    def test_lpips_schema_and_distance(self, tmp_path):
        """LPIPS pipeline on synthetic weights: d(x, x) == 0, d(x, y) > 0,
        and the schema check rejects malformed files."""
        from stylegan_tpu.metrics import (load_lpips_weights, lpips_vgg_init,
                                          make_lpips_fn)
        weights = lpips_vgg_init(jax.random.PRNGKey(3))
        path = str(tmp_path / "lpips.npz")
        np.savez(path, **weights)
        fn = make_lpips_fn(load_lpips_weights(path))
        rs = np.random.RandomState(8)
        x = rs.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        y = rs.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
        d_same = np.asarray(fn(x, x))
        d_diff = np.asarray(fn(x, y))
        assert np.allclose(d_same, 0.0, atol=1e-9)
        assert (d_diff > 0).all()

        bad = {k: v for k, v in weights.items() if k != "lin4.weight"}
        bad_path = str(tmp_path / "bad.npz")
        np.savez(bad_path, **bad)
        with pytest.raises(ValueError, match="schema"):
            load_lpips_weights(bad_path)

    def test_ppl_end_to_end_smoke(self):
        """Whole PPL harness on a tiny generator, both spaces, pyramid
        distance: finite, non-negative, deterministic."""
        from stylegan_tpu.metrics import (make_pyramid_distance, ppl_samples,
                                          ppl_score)
        from stylegan_tpu.models import (GeneratorConfig, MappingConfig,
                                         SynthesisConfig, generator_init)
        res = 32
        cfg = GeneratorConfig(
            resolution=res, latent_size=32, dlatent_size=32,
            truncation_psi=0.7,
            mapping=MappingConfig(latent_size=32, dlatent_size=32,
                                  mapping_fmaps=32, mapping_layers=2,
                                  dlatent_broadcast=(res.bit_length() - 2) * 2),
            synthesis=SynthesisConfig(resolution=res, dlatent_size=32,
                                      fmap_base=64, fmap_max=32,
                                      blur_filter=(1, 2, 1),
                                      structure="linear"))
        params = generator_init(jax.random.PRNGKey(0), cfg)
        dist = make_pyramid_distance()
        for space in ("w", "z"):
            d1 = ppl_samples(cfg, params, dist, num_samples=8, batch_size=4,
                             key=jax.random.PRNGKey(1), space=space)
            d2 = ppl_samples(cfg, params, dist, num_samples=8, batch_size=4,
                             key=jax.random.PRNGKey(1), space=space)
            assert d1.shape == (8,)
            assert np.isfinite(d1).all() and (d1 >= 0).all()
            np.testing.assert_array_equal(d1, d2)
            assert np.isfinite(ppl_score(d1))

    def test_compute_fid_end_to_end(self, weights, tmp_path):
        """The whole FID pipeline on synthetic weights: same set -> ~0,
        disjoint distributions -> clearly larger."""
        from stylegan_tpu.metrics import compute_fid
        path = str(tmp_path / "inception.npz")
        np.savez(path, **weights)
        rs = np.random.RandomState(5)
        real = rs.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
        fake = np.clip(real * 0.2 + 0.8, 0, 1)  # brightness-shifted copies
        same = compute_fid(real, real, path, batch_size=4)
        diff = compute_fid(real, fake, path, batch_size=4)
        assert abs(same) < 1e-6
        assert diff > max(10.0 * abs(same), 1e-4)


class TestTorchExtractorParity:
    """Pin the JAX metric feature extractors against real torch executions
    of the torchvision-inception_v3 / LPIPS-VGG16 graphs (independent torch
    reimplementations in tests/torch_metric_refs.py), one random weight set
    loaded into both (VERDICT r2 #4)."""

    def test_inception_features_parity_299(self):
        import torch
        from stylegan_tpu.metrics.fid import (inception_v3_init,
                                              make_feature_fn)
        from torch_metric_refs import (TorchInceptionV3Features,
                                       load_inception_npz)
        params = inception_v3_init(jax.random.PRNGKey(0))
        model = TorchInceptionV3Features()
        load_inception_npz(model, params)
        imgs = np.random.RandomState(0).rand(2, 299, 299, 3).astype(np.float32)
        ours = np.asarray(make_feature_fn(params)(imgs))
        with torch.no_grad():
            ref = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_inception_features_parity_resize_128(self):
        """The FFHQ-128 FID path: in-graph bilinear 128->299 resize must
        match torch F.interpolate(align_corners=False) + inception."""
        import torch
        from stylegan_tpu.metrics.fid import (inception_v3_init,
                                              make_feature_fn)
        from torch_metric_refs import (TorchInceptionV3Features,
                                       load_inception_npz)
        params = inception_v3_init(jax.random.PRNGKey(1))
        model = TorchInceptionV3Features()
        load_inception_npz(model, params)
        imgs = np.random.RandomState(1).rand(2, 128, 128, 3).astype(np.float32)
        ours = np.asarray(make_feature_fn(params)(imgs))
        with torch.no_grad():
            ref = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)

    def test_inception_probs_parity(self):
        """Inception Score's class-probability head (fc + softmax)."""
        import torch
        from stylegan_tpu.metrics.fid import inception_v3_init, make_probs_fn
        from torch_metric_refs import (TorchInceptionV3Features,
                                       load_inception_npz)
        params = inception_v3_init(jax.random.PRNGKey(2))
        model = TorchInceptionV3Features()
        load_inception_npz(model, params)
        imgs = np.random.RandomState(2).rand(2, 299, 299, 3).astype(np.float32)
        ours = np.asarray(make_probs_fn(params)(imgs))
        with torch.no_grad():
            ref = model.probs(
                torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-3)

    def test_lpips_distance_parity(self):
        import torch
        from stylegan_tpu.metrics import lpips_vgg_init, make_lpips_fn
        from torch_metric_refs import TorchLPIPSVgg, load_lpips_npz
        params = lpips_vgg_init(jax.random.PRNGKey(3))
        model = TorchLPIPSVgg()
        load_lpips_npz(model, params)
        rs = np.random.RandomState(3)
        a = (rs.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
        b = (rs.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
        ours = np.asarray(make_lpips_fn(params)(a, b))
        with torch.no_grad():
            ref = model(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                        torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-3)
