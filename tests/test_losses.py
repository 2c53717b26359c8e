"""Loss-function parity vs reference models/Losses.py, using a shared toy
discriminator (same weights in torch and JAX) so R1's double-backprop is
exercised end to end."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from stylegan_tpu import losses

from models import Losses as RefLosses


class _ToyTorchDis(torch.nn.Module):
    """Deterministic nonlinear scorer so gradients are nontrivial."""

    def __init__(self, w):
        super().__init__()
        self.w = torch.nn.Parameter(torch.from_numpy(w))

    def forward(self, x, height=None, alpha=None, labels_in=None):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        h = torch.tanh(flat @ self.w)
        return (h * h).sum(dim=1, keepdim=True) - h.sum(dim=1, keepdim=True)


def _toy_jax_dis(w):
    w = jnp.asarray(w)

    def dis_fn(x):
        b = x.shape[0]
        flat = x.reshape(b, -1)
        h = jnp.tanh(jnp.dot(flat, w, precision=jax.lax.Precision.HIGHEST))
        return (jnp.sum(h * h, axis=1, keepdims=True)
                - jnp.sum(h, axis=1, keepdims=True))
    return dis_fn


def _setup(seed=0, n=6, d=12, k=4):
    rs = np.random.RandomState(seed)
    w = rs.randn(d, k).astype(np.float32)
    reals = rs.randn(n, d).astype(np.float32)
    fakes = rs.randn(n, d).astype(np.float32)
    return w, reals, fakes


def _check(name, ref_loss_cls, ours_dis, ours_gen, atol=1e-5, rtol=1e-5):
    w, reals, fakes = _setup()
    tdis = _ToyTorchDis(w)
    ref = ref_loss_cls(tdis)
    jdis = _toy_jax_dis(w)

    ref_d = ref.dis_loss(torch.from_numpy(reals), torch.from_numpy(fakes),
                         0, 1.0).item()
    ref_g = ref.gen_loss(torch.from_numpy(reals), torch.from_numpy(fakes),
                         0, 1.0).item()
    our_d = float(ours_dis(jdis, jnp.asarray(reals), jnp.asarray(fakes)))
    our_g = float(ours_gen(jdis, jnp.asarray(reals), jnp.asarray(fakes)))
    np.testing.assert_allclose(our_d, ref_d, atol=atol, rtol=rtol)
    np.testing.assert_allclose(our_g, ref_g, atol=atol, rtol=rtol)


def test_hinge():
    _check("hinge", RefLosses.HingeGAN,
           losses.hinge_dis_loss, losses.hinge_gen_loss)


def test_relativistic_hinge():
    _check("relativistic-hinge", RefLosses.RelativisticAverageHingeGAN,
           losses.relativistic_hinge_dis_loss,
           losses.relativistic_hinge_gen_loss)


def test_standard_dis():
    # gen side: reference StandardGAN.gen_loss crashes on its own unpack bug
    # (Losses.py:131); we only parity-check dis_loss and sanity-check gen.
    w, reals, fakes = _setup()
    tdis = _ToyTorchDis(w)
    ref = RefLosses.StandardGAN(tdis)
    jdis = _toy_jax_dis(w)
    ref_d = ref.dis_loss(torch.from_numpy(reals), torch.from_numpy(fakes),
                         0, 1.0).item()
    our_d = float(losses.standard_dis_loss(jdis, jnp.asarray(reals),
                                           jnp.asarray(fakes)))
    np.testing.assert_allclose(our_d, ref_d, atol=1e-5, rtol=1e-5)
    g = float(losses.standard_gen_loss(jdis, jnp.asarray(reals),
                                       jnp.asarray(fakes)))
    assert np.isfinite(g)


def test_logistic_with_r1():
    _check("logistic", RefLosses.LogisticGAN,
           losses.logistic_dis_loss, losses.logistic_gen_loss,
           atol=1e-4, rtol=1e-4)


def test_conditional():
    w, reals, fakes = _setup()
    tdis = _ToyTorchDis(w)
    ref = RefLosses.ConditionalGANLoss(tdis)
    labels = torch.zeros(reals.shape[0], dtype=torch.int64)
    jdis = _toy_jax_dis(w)
    ref_d = ref.dis_loss(torch.from_numpy(reals), torch.from_numpy(fakes),
                         labels, 0, 1.0).item()
    ref_g = ref.gen_loss(torch.from_numpy(reals), torch.from_numpy(fakes),
                         labels, 0, 1.0).item()
    our_d = float(losses.conditional_dis_loss(jdis, jnp.asarray(reals),
                                              jnp.asarray(fakes)))
    our_g = float(losses.conditional_gen_loss(jdis, jnp.asarray(reals),
                                              jnp.asarray(fakes)))
    np.testing.assert_allclose(our_d, ref_d, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(our_g, ref_g, atol=1e-5, rtol=1e-5)


def test_r1_matches_manual():
    """R1 penalty == sum_b ||dD/dx||^2 computed by finite torch autograd."""
    w, reals, _ = _setup(seed=1)
    tdis = _ToyTorchDis(w)
    x = torch.from_numpy(reals).requires_grad_(True)
    logit = tdis(x)
    grads = torch.autograd.grad(logit, x,
                                grad_outputs=torch.ones_like(logit),
                                create_graph=True)[0]
    expected = (grads * grads).sum().item()
    jdis = _toy_jax_dis(w)
    ours = float(losses.r1_penalty(jdis, jnp.asarray(reals)))
    np.testing.assert_allclose(ours, expected, atol=1e-4, rtol=1e-5)


def test_registry():
    for name in ["standard-gan", "hinge", "relativistic-hinge", "logistic"]:
        d, g = losses.get_loss(name)
        assert callable(d) and callable(g)
    d, g = losses.get_loss("conditional-loss", conditional=True)
    assert callable(d) and callable(g)


def test_conditional_variant_registry():
    """Beyond-reference conditional variants (VERDICT r4 #6): the label
    conditioning lives in the networks (dis_fn closes over labels), so the
    registry entries ARE the unconditional objective functions — and they
    are gated behind conditional=True."""
    d, g = losses.get_loss("conditional-relativistic-hinge", conditional=True)
    assert d is losses.relativistic_hinge_dis_loss
    assert g is losses.relativistic_hinge_gen_loss
    d, g = losses.get_loss("conditional-logistic", conditional=True)
    assert d is losses.logistic_dis_loss
    assert g is losses.logistic_gen_loss
    import pytest
    with pytest.raises(AssertionError):
        losses.get_loss("conditional-relativistic-hinge", conditional=False)
    with pytest.raises(AssertionError):
        losses.get_loss("relativistic-hinge", conditional=True)
    assert "conditional-logistic" in losses.LOGISTIC_LIKE
    assert "logistic" in losses.LOGISTIC_LIKE
