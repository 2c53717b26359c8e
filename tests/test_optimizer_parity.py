"""Optimizer-dynamics parity: optax chain(clip_by_global_norm(10), adam) must
take the same step as torch clip_grad_norm_ + Adam with the reference
hyperparameters (lr 0.003, betas (0, 0.99), eps 1e-8) — multi-step."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from stylegan_tpu.train.state import make_d_optimizer, make_g_optimizer


def _run_torch(params_np, grads_seq, clip=None):
    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    opt = torch.optim.Adam(ps, lr=0.003, betas=(0.0, 0.99), eps=1e-8)
    for grads in grads_seq:
        opt.zero_grad()
        for p, g in zip(ps, grads):
            p.grad = torch.from_numpy(g.copy())
        if clip is not None:
            torch.nn.utils.clip_grad_norm_(ps, max_norm=clip)
        opt.step()
    return [p.detach().numpy() for p in ps]


def _run_optax(tx, params_np, grads_seq):
    params = [jnp.asarray(p) for p in params_np]
    state = tx.init(params)
    for grads in grads_seq:
        updates, state = tx.update([jnp.asarray(g) for g in grads], state,
                                   params)
        import optax
        params = optax.apply_updates(params, updates)
    return [np.asarray(p) for p in params]


def _data(seed, steps=3):
    rs = np.random.RandomState(seed)
    params = [rs.randn(4, 6).astype(np.float32),
              rs.randn(10).astype(np.float32)]
    grads_seq = [[rs.randn(*p.shape).astype(np.float32) * 3 for p in params]
                 for _ in range(steps)]
    return params, grads_seq


def test_d_optimizer_matches_torch_adam():
    params, grads_seq = _data(0)
    expected = _run_torch(params, grads_seq)
    got = _run_optax(make_d_optimizer(), params, grads_seq)
    for a, b in zip(got, expected):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_g_optimizer_matches_torch_clip_plus_adam():
    params, grads_seq = _data(1)
    # gradients large enough that the global-norm clip at 10 actually bites
    grads_seq = [[g * 5 for g in gs] for gs in grads_seq]
    expected = _run_torch(params, grads_seq, clip=10.0)
    got = _run_optax(make_g_optimizer(), params, grads_seq)
    for a, b in zip(got, expected):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)
