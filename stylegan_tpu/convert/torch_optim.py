"""Importing the reference's torch Adam optimizer state (.pth) into optax.

The reference resumes mid-flight runs from `GAN_{GEN,DIS}_OPTIM_*.pth`
(reference train.py:40-48, GAN.py:810-816) — torch ``optimizer.state_dict()``
archives keyed by *parameter index*:

  {"state": {i: {"step", "exp_avg", "exp_avg_sq"}, ...},
   "param_groups": [{"params": [0..N-1], ...}]}

where index i is the i-th entry of ``model.parameters()`` — nn.Module
attribute-registration order.  This module reconstructs that order for the
reference Generator/Discriminator (GAN.py:211-379 registration sequence),
maps each index onto our pytree leaf through torch_params' name/layout
translation (Adam moments are elementwise, so they transform exactly like
the parameter: dense transpose, conv OIHW->HWIO), and rebuilds the optax
``ScaleByAdamState`` (count=step, mu=exp_avg, nu=exp_avg_sq).  optax's Adam
and torch's are update-for-update identical for our hyperparameters
(tests/test_optimizer_parity.py), so a resumed run continues the reference's
optimizer trajectory exactly.
"""

from __future__ import annotations

import warnings

import numpy as np

from .torch_params import (_discriminator_entries, _from_torch_layout,
                           _generator_entries)

# buffers: present in the params state_dict but NOT in model.parameters()
_GEN_BUFFERS = ("truncation.avg_latent",)


def generator_param_order(params) -> list:
    """Reference Generator ``parameters()`` order (GAN.py:235-252): the
    conditional class_embedding is registered *before* g_mapping /
    g_synthesis; within g_synthesis our entry insertion order already
    matches the reference's module nesting (init_block, blocks, to_rgb;
    weight before bias, noise before style_mod)."""
    names = [n for n in _generator_entries(params) if n not in _GEN_BUFFERS]
    emb = [n for n in names if n.startswith("class_embedding.")]
    rest = [n for n in names if not n.startswith("class_embedding.")]
    return emb + rest


def discriminator_param_order(params) -> list:
    """Reference Discriminator ``parameters()`` order (GAN.py:369-379):
    embeddings -> blocks -> final_block -> from_rgb (ModuleList assignment
    order, which differs from the forward-pass order our entries use)."""
    names = list(_discriminator_entries(params))
    groups = ("embeddings.", "blocks.", "final_block.", "from_rgb.")
    out = []
    for g in groups:
        out.extend(n for n in names if n.startswith(g))
    leftover = [n for n in names if not n.startswith(groups)]
    assert not leftover, f"unmapped discriminator params: {leftover}"
    return out


def _as_int(x) -> int:
    """torch saves Adam's step as an int (<=1.11) or a singleton tensor."""
    return int(np.asarray(x).reshape(()))


def adam_state_from_torch(opt_state, params, optim_sd: dict,
                          network: str):
    """Return a copy of an optax opt_state (from make_{g,d}_optimizer(...)
    .init(params)) with its ScaleByAdamState replaced by the torch Adam
    moments in ``optim_sd``.

    params: OUR pytree the optimizer state belongs to (used for leaf
    identity + layout translation).  network: 'generator'|'discriminator'.
    Leaves without a torch counterpart (e.g. the non-parameter
    truncation.avg_latent rides in the G pytree) keep their existing
    (zero-initialized) moments.
    """
    import jax.numpy as jnp
    import optax

    if network == "generator":
        entries = _generator_entries(params)
        order = generator_param_order(params)
    elif network == "discriminator":
        entries = _discriminator_entries(params)
        order = discriminator_param_order(params)
    else:
        raise ValueError(network)

    state = optim_sd["state"]
    groups = optim_sd.get("param_groups", [])
    indices = (list(groups[0]["params"]) if groups
               else sorted(state, key=_as_int))
    if len(indices) != len(order):
        raise ValueError(
            f"torch optimizer has {len(indices)} params, the reference "
            f"{network} registers {len(order)} — wrong file or architecture "
            "mismatch")

    mu_by_name, nu_by_name, steps, missing = {}, {}, [], []
    for idx, name in zip(indices, order):
        st = state.get(idx, state.get(str(idx)))
        if st is None:  # param never stepped (torch lazily creates state)
            missing.append(name)
            continue
        kind = entries[name][0]
        mu_by_name[name] = _from_torch_layout(kind, st["exp_avg"])
        nu_by_name[name] = _from_torch_layout(kind, st["exp_avg_sq"])
        steps.append(_as_int(st["step"]))
    count = max(steps) if steps else 0
    # optax's ScaleByAdamState has ONE step count for the whole tree; torch
    # keeps one per param.  If they disagree (lazily-stepped params, groups
    # changed mid-run), the resumed bias correction silently diverges from
    # torch's — surface it instead of collapsing quietly.
    if steps and min(steps) != count:
        warnings.warn(
            f"torch {network} optimizer has unequal per-param Adam steps "
            f"(min {min(steps)}, max {max(steps)}); optax carries a single "
            f"count — resuming uses max, so bias correction for the "
            f"lagging params will differ from torch's", stacklevel=2)
    if missing and steps:
        warnings.warn(
            f"torch {network} optimizer has no state for param(s) "
            f"{missing}: their moments resume at zero but share the "
            f"advanced count {count}, diverging from torch's per-param "
            f"bias correction", stacklevel=2)

    # build mu/nu pytrees congruent with params (identity-tagged walk, like
    # torch_params._load_into_tree)
    id_to_name = {id(arr): name for name, (_, arr) in entries.items()}

    def build(node, table):
        if isinstance(node, dict):
            return {k: build(v, table) for k, v in node.items()}
        if isinstance(node, list):
            return [build(v, table) for v in node]
        name = id_to_name.get(id(node))
        if name is not None and name in table:
            v = table[name]
            assert v.shape == np.asarray(node).shape, \
                f"moment shape mismatch for {name}"
            return jnp.asarray(v, jnp.asarray(node).dtype)
        return jnp.zeros_like(jnp.asarray(node))

    new_adam_fields = {
        "count": jnp.asarray(count, jnp.int32),
        "mu": build(params, mu_by_name),
        "nu": build(params, nu_by_name),
    }

    replaced = [0]

    def swap(node):
        if isinstance(node, optax.ScaleByAdamState):
            replaced[0] += 1
            return optax.ScaleByAdamState(**new_adam_fields)
        if isinstance(node, tuple):
            vals = [swap(c) for c in node]
            return (type(node)(*vals) if hasattr(node, "_fields")
                    else tuple(vals))
        return node

    out = swap(opt_state)
    if replaced[0] != 1:
        raise ValueError(
            f"expected exactly one ScaleByAdamState in the optimizer state, "
            f"found {replaced[0]}")
    return out


def load_adam_state_file(opt_state, params, path: str, network: str):
    """Load a reference GAN_*_OPTIM_*.pth into an optax optimizer state."""
    try:
        import torch
    except ImportError as e:
        raise ImportError(
            "Importing .pth optimizer state requires torch (CPU)") from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {"state": {k: {kk: (vv.numpy() if hasattr(vv, "numpy") else vv)
                        for kk, vv in v.items()}
                    for k, v in sd["state"].items()},
          "param_groups": sd.get("param_groups", [])}
    return adam_state_from_torch(opt_state, params, sd, network)
