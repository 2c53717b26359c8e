"""Numerical parity of core ops vs the reference torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from stylegan_tpu import ops
from tests.reference_utils import (copy_conv, copy_linear, from_torch_nchw,
                                   to_torch_nchw)

from models.CustomLayers import (BlurLayer, Downscale2d, EqualizedConv2d,
                                 EqualizedLinear, NoiseLayer, PixelNormLayer,
                                 StddevLayer, StyleMod, Truncation, Upscale2d)

RTOL, ATOL = 1e-5, 1e-5


def rnd(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def assert_close(a, b, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestPixelNorm:
    def test_matches_reference_2d(self):
        x = rnd(4, 512)
        ref = PixelNormLayer()(torch.from_numpy(x)).numpy()
        assert_close(ops.pixel_norm(jnp.asarray(x)), ref)

    def test_matches_reference_4d(self):
        x = rnd(2, 8, 8, 16, seed=1)
        ref = from_torch_nchw(PixelNormLayer()(to_torch_nchw(x)))
        assert_close(ops.pixel_norm(jnp.asarray(x)), ref)


class TestResample:
    def test_upscale2d(self):
        x = rnd(2, 5, 7, 3)
        ref = from_torch_nchw(Upscale2d(factor=2)(to_torch_nchw(x)))
        assert_close(ops.upscale2d(jnp.asarray(x)), ref)

    def test_upscale2d_gain(self):
        x = rnd(2, 4, 4, 3, seed=2)
        ref = from_torch_nchw(Upscale2d(factor=2, gain=2.0)(to_torch_nchw(x)))
        assert_close(ops.upscale2d(jnp.asarray(x), gain=2.0), ref)

    def test_downscale2d_factor2(self):
        x = rnd(2, 8, 8, 3, seed=3)
        ref = from_torch_nchw(Downscale2d(factor=2)(to_torch_nchw(x)))
        assert_close(ops.downscale2d(jnp.asarray(x)), ref)

    def test_downscale2d_factor4(self):
        x = rnd(2, 8, 8, 3, seed=4)
        ref = from_torch_nchw(Downscale2d(factor=4)(to_torch_nchw(x)))
        assert_close(ops.downscale2d(jnp.asarray(x), factor=4), ref)


class TestBlur:
    def test_default_121(self):
        x = rnd(2, 16, 16, 8, seed=5)
        ref = from_torch_nchw(BlurLayer()(to_torch_nchw(x)))
        k = ops.make_blur_kernel([1, 2, 1])
        assert_close(ops.blur2d(jnp.asarray(x), k), ref)


class TestInstanceNorm:
    def test_matches_torch(self):
        x = rnd(3, 8, 8, 16, seed=6)
        ref = from_torch_nchw(torch.nn.InstanceNorm2d(16)(to_torch_nchw(x)))
        assert_close(ops.instance_norm(jnp.asarray(x)), ref)


class TestMinibatchStddev:
    @pytest.mark.parametrize("batch", [4, 8, 2])
    def test_matches_reference(self, batch):
        x = rnd(batch, 4, 4, 8, seed=7)
        ref = from_torch_nchw(StddevLayer(4, 1)(to_torch_nchw(x)))
        assert_close(ops.minibatch_stddev(jnp.asarray(x)), ref, atol=1e-4)


class TestTruncation:
    def test_forward(self):
        avg = rnd(512, seed=8)
        w = rnd(2, 18, 512, seed=9)
        t = Truncation(torch.from_numpy(avg.copy()), max_layer=8, threshold=0.7)
        ref = t(torch.from_numpy(w)).numpy()
        ours = ops.truncate_dlatents(jnp.asarray(w), jnp.asarray(avg), 0.7, 8)
        assert_close(ours, ref)

    def test_update(self):
        avg = rnd(512, seed=10)
        new = rnd(512, seed=11)
        t = Truncation(torch.from_numpy(avg.copy()), beta=0.995)
        t.update(torch.from_numpy(new))
        ours = ops.update_moving_average(jnp.asarray(avg), jnp.asarray(new), 0.995)
        assert_close(ours, t.avg_latent.numpy())


class TestEqualizedLinear:
    @pytest.mark.parametrize("use_wscale,lrmul", [(True, 1.0), (True, 0.01),
                                                  (False, 1.0), (False, 0.5)])
    def test_matches_reference(self, use_wscale, lrmul):
        in_dim, out_dim = 512, 256
        p = ops.linear_init(jax.random.PRNGKey(0), in_dim, out_dim,
                            use_wscale=use_wscale, lrmul=lrmul)
        ref = EqualizedLinear(in_dim, out_dim, use_wscale=use_wscale, lrmul=lrmul)
        copy_linear(ref, p)
        x = rnd(4, in_dim, seed=12)
        expected = ref(torch.from_numpy(x)).detach().numpy()
        ours = ops.linear_apply(p, jnp.asarray(x), use_wscale=use_wscale, lrmul=lrmul)
        assert_close(ours, expected)

    def test_gain1(self):
        p = ops.linear_init(jax.random.PRNGKey(1), 512, 32, gain=1.0, use_wscale=True)
        ref = EqualizedLinear(512, 32, gain=1.0, use_wscale=True)
        copy_linear(ref, p)
        x = rnd(4, 512, seed=13)
        assert_close(ops.linear_apply(p, jnp.asarray(x), gain=1.0, use_wscale=True),
                     ref(torch.from_numpy(x)).detach().numpy())


class TestEqualizedConv2d:
    def _pair(self, in_ch, out_ch, k, seed=0, **kw):
        p = ops.conv2d_init(jax.random.PRNGKey(seed), in_ch, out_ch, k,
                            use_wscale=True)
        ref = EqualizedConv2d(in_ch, out_ch, k, use_wscale=True, **kw)
        copy_conv(ref, p)
        return p, ref

    def test_plain_3x3(self):
        p, ref = self._pair(8, 16, 3)
        x = rnd(2, 16, 16, 8, seed=14)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        assert_close(ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True),
                     expected, atol=1e-4)

    def test_plain_1x1(self):
        p, ref = self._pair(8, 3, 1, seed=1)
        x = rnd(2, 16, 16, 8, seed=15)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        assert_close(ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True),
                     expected, atol=1e-4)

    def test_upscale_nonfused(self):
        """res < 128 -> nearest-upsample + conv (+blur intermediate)."""
        blur = BlurLayer([1, 2, 1])
        p, ref = self._pair(8, 16, 3, seed=2, upscale=True, intermediate=blur)
        x = rnd(2, 16, 16, 8, seed=16)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        k = ops.make_blur_kernel([1, 2, 1])
        ours = ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True,
                                upscale=True, blur_kernel=k)
        assert_close(ours, expected, atol=1e-4)

    def test_upscale_fused(self):
        """output res >= 128 -> fused conv_transpose path."""
        blur = BlurLayer([1, 2, 1])
        p, ref = self._pair(4, 8, 3, seed=3, upscale=True, intermediate=blur)
        x = rnd(1, 64, 64, 4, seed=17)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        k = ops.make_blur_kernel([1, 2, 1])
        ours = ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True,
                                upscale=True, blur_kernel=k)
        assert_close(ours, expected, atol=1e-4)

    def test_downscale_nonfused(self):
        p, ref = self._pair(8, 16, 3, seed=4, downscale=True)
        x = rnd(2, 16, 16, 8, seed=18)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        ours = ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True, downscale=True)
        assert_close(ours, expected, atol=1e-4)

    def test_downscale_fused(self):
        p, ref = self._pair(4, 8, 3, seed=5, downscale=True)
        x = rnd(1, 128, 128, 4, seed=19)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        ours = ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True, downscale=True)
        assert_close(ours, expected, atol=1e-4)

    def test_fused_matches_torch_at_low_threshold(self):
        """Force the fused path at low res and compare against torch's
        conv_transpose2d construction directly."""
        import torch.nn.functional as F
        p = ops.conv2d_init(jax.random.PRNGKey(7), 4, 8, 3, use_wscale=True)
        x = rnd(1, 32, 32, 4, seed=20)
        ours = ops.conv2d_apply(p, jnp.asarray(x), use_wscale=True,
                                upscale=True, fused_resample_threshold=1)
        # torch reference construction (CustomLayers.py:146-151)
        _, w_mul = ops.equalized_scales(2 ** 0.5, 4 * 9, 1.0, True)
        w = torch.from_numpy(
            np.transpose(np.asarray(p["weight"]), (3, 2, 0, 1)).copy()) * w_mul
        w = w.permute(1, 0, 2, 3)
        w = F.pad(w, [1, 1, 1, 1])
        w = w[:, :, 1:, 1:] + w[:, :, :-1, 1:] + w[:, :, 1:, :-1] + w[:, :, :-1, :-1]
        y = F.conv_transpose2d(to_torch_nchw(x), w, stride=2, padding=1)
        y = y + torch.from_numpy(np.asarray(p["bias"])).view(1, -1, 1, 1)
        assert_close(ours, from_torch_nchw(y), atol=1e-4)


class TestStyleMod:
    def test_matches_reference(self):
        latent, ch = 512, 16
        p = ops.linear_init(jax.random.PRNGKey(3), latent, ch * 2, gain=1.0,
                            use_wscale=True)
        ref = StyleMod(latent, ch, use_wscale=True)
        copy_linear(ref.lin, p)
        x = rnd(2, 8, 8, ch, seed=21)
        w = rnd(2, latent, seed=22)
        expected = from_torch_nchw(ref(to_torch_nchw(x), torch.from_numpy(w)))
        style = ops.linear_apply(p, jnp.asarray(w), gain=1.0, use_wscale=True)
        ours = ops.style_modulate(jnp.asarray(x), style)
        assert_close(ours, expected, atol=1e-4)


class TestNoise:
    def test_matches_reference_with_pinned_noise(self):
        ch = 8
        weight = rnd(ch, seed=23)
        noise = rnd(2, 4, 4, 1, seed=24)
        ref = NoiseLayer(ch)
        with torch.no_grad():
            ref.weight.copy_(torch.from_numpy(weight))
        ref.noise = to_torch_nchw(noise)
        x = rnd(2, 4, 4, ch, seed=25)
        expected = from_torch_nchw(ref(to_torch_nchw(x)))
        ours = ops.add_noise(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(noise))
        assert_close(ours, expected)


class TestLeakyRelu:
    def test_matches_torch(self):
        x = rnd(4, 32, seed=26)
        expected = torch.nn.LeakyReLU(0.2)(torch.from_numpy(x)).numpy()
        assert_close(ops.leaky_relu(jnp.asarray(x)), expected)
