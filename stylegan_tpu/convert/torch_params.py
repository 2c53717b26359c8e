"""Bidirectional conversion between our parameter pytrees and the reference's
torch ``state_dict`` naming/layout.

Name scheme (reference state_dict keys, produced by its nn.Module nesting):
  g_mapping.map.dense{i}.{weight,bias}
  g_synthesis.init_block.{const,bias}
  g_synthesis.init_block.epi{1,2}.top_epi.noise.weight
  g_synthesis.init_block.epi{1,2}.style_mod.lin.{weight,bias}
  g_synthesis.init_block.conv.{weight,bias}
  g_synthesis.blocks.{i}.{conv0_up,conv1}.{weight,bias}
  g_synthesis.blocks.{i}.epi{1,2}...
  g_synthesis.to_rgb.{i}.{weight,bias}
  truncation.avg_latent
  class_embedding.weight
  blocks.{i}.{conv0,conv1_down}.{weight,bias}     (discriminator)
  from_rgb.{i}.{weight,bias}
  final_block.{conv,dense0,dense1}.{weight,bias}
  embeddings.{i}.weight

Layout transforms:
  dense   torch (out, in)      <-> ours (in, out)          transpose
  conv    torch OIHW           <-> ours HWIO               (2,3,1,0)/(3,2,0,1)
  const   torch (1, C, 4, 4)   <-> ours (1, 4, 4, C)       (0,2,3,1)/(0,3,1,2)
  1-D / embeddings: unchanged

Blur kernels are registered *buffers* in the reference (CustomLayers.py:263)
and are not parameters here (static from config).  Imports skip them
(matching the reference's own strict=False load, convert.py:137); exports
synthesize them from the blur filter (`_blur_buffer`) so the resulting
state_dict loads with strict=True.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# flatten / unflatten our pytrees with reference names
# ---------------------------------------------------------------------------


def _epilogue_entries(prefix, epi):
    out = {}
    if "noise" in epi:
        out[f"{prefix}.top_epi.noise.weight"] = ("1d", epi["noise"]["weight"])
    if "style_mod" in epi:
        lin = epi["style_mod"]["lin"]
        out[f"{prefix}.style_mod.lin.weight"] = ("dense", lin["weight"])
        if "bias" in lin:
            out[f"{prefix}.style_mod.lin.bias"] = ("1d", lin["bias"])
    return out


def _conv_entries(prefix, conv):
    out = {f"{prefix}.weight": ("conv", conv["weight"])}
    if "bias" in conv:
        out[f"{prefix}.bias"] = ("1d", conv["bias"])
    return out


def _dense_entries(prefix, lin):
    out = {f"{prefix}.weight": ("dense", lin["weight"])}
    if "bias" in lin:
        out[f"{prefix}.bias"] = ("1d", lin["bias"])
    return out


def _generator_entries(params):
    e = {}
    for name, lin in params["g_mapping"]["map"].items():
        e.update(_dense_entries(f"g_mapping.map.{name}", lin))
    syn = params["g_synthesis"]
    ib = syn["init_block"]
    if "const" in ib:
        e["g_synthesis.init_block.const"] = ("const", ib["const"])
        e["g_synthesis.init_block.bias"] = ("1d", ib["bias"])
    if "dense" in ib:
        e.update(_dense_entries("g_synthesis.init_block.dense", ib["dense"]))
    e.update(_epilogue_entries("g_synthesis.init_block.epi1", ib["epi1"]))
    e.update(_conv_entries("g_synthesis.init_block.conv", ib["conv"]))
    e.update(_epilogue_entries("g_synthesis.init_block.epi2", ib["epi2"]))
    for i, blk in enumerate(syn["blocks"]):
        p = f"g_synthesis.blocks.{i}"
        e.update(_conv_entries(f"{p}.conv0_up", blk["conv0_up"]))
        e.update(_epilogue_entries(f"{p}.epi1", blk["epi1"]))
        e.update(_conv_entries(f"{p}.conv1", blk["conv1"]))
        e.update(_epilogue_entries(f"{p}.epi2", blk["epi2"]))
    for i, conv in enumerate(syn["to_rgb"]):
        e.update(_conv_entries(f"g_synthesis.to_rgb.{i}", conv))
    if "truncation" in params:
        e["truncation.avg_latent"] = ("1d", params["truncation"]["avg_latent"])
    if "class_embedding" in params:
        e["class_embedding.weight"] = ("emb", params["class_embedding"]["weight"])
    return e


def _discriminator_entries(params):
    e = {}
    for i, blk in enumerate(params["blocks"]):
        e.update(_conv_entries(f"blocks.{i}.conv0", blk["conv0"]))
        e.update(_conv_entries(f"blocks.{i}.conv1_down", blk["conv1_down"]))
    for i, conv in enumerate(params["from_rgb"]):
        e.update(_conv_entries(f"from_rgb.{i}", conv))
    fb = params["final_block"]
    e.update(_conv_entries("final_block.conv", fb["conv"]))
    e.update(_dense_entries("final_block.dense0", fb["dense0"]))
    e.update(_dense_entries("final_block.dense1", fb["dense1"]))
    if "embeddings" in params:
        for i, emb in enumerate(params["embeddings"]):
            e[f"embeddings.{i}.weight"] = ("emb", emb["weight"])
    return e


def _to_torch_layout(kind, arr):
    a = np.asarray(arr)
    if kind == "dense":
        return a.T
    if kind == "conv":
        return np.transpose(a, (3, 2, 0, 1))
    if kind == "const":
        return np.transpose(a, (0, 3, 1, 2))
    return a


def _from_torch_layout(kind, a):
    a = np.asarray(a, dtype=np.float32)
    if kind == "dense":
        return a.T
    if kind == "conv":
        return np.transpose(a, (2, 3, 1, 0))
    if kind == "const":
        return np.transpose(a, (0, 2, 3, 1))
    return a


def _state_dict_from_entries(entries):
    return {k: _to_torch_layout(kind, v) for k, (kind, v) in entries.items()}


def _load_entries(entries, state_dict, strict=False):
    """Returns {name: new array} for our pytree, reference-style partial load:
    keys missing from state_dict keep the existing value (train.py:24-29)."""
    out, missing = {}, []
    for k, (kind, cur) in entries.items():
        if k in state_dict:
            v = _from_torch_layout(kind, state_dict[k])
            assert v.shape == np.asarray(cur).shape, \
                f"shape mismatch for {k}: {v.shape} vs {np.asarray(cur).shape}"
            out[k] = v
        else:
            missing.append(k)
            out[k] = np.asarray(cur)
    if strict and missing:
        raise KeyError(f"Missing keys in state_dict: {missing}")
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _blur_buffer(blur_filter):
    """The reference BlurLayer's registered buffer (CustomLayers.py:251-263):
    normalized outer product of the 1-D filter, shape (1, 1, k, k).  A
    config-derived constant, not a learned weight — included in exports so
    `load_state_dict(strict=True)` sees a complete reference state_dict."""
    f = np.asarray(blur_filter, np.float32)
    k = f[:, None] * f[None, :]
    return (k / k.sum())[None, None]


def generator_state_dict_from_params(params, blur_filter=None) -> dict:
    """Our generator pytree -> reference-style state_dict (numpy arrays).

    blur_filter (e.g. (1, 2, 1)) additionally emits each growth block's
    `conv0_up.intermediate.kernel` blur buffer (Blocks.py:70-76)."""
    sd = _state_dict_from_entries(_generator_entries(params))
    if blur_filter:
        k = _blur_buffer(blur_filter)
        for i in range(len(params["g_synthesis"]["blocks"])):
            sd[f"g_synthesis.blocks.{i}.conv0_up.intermediate.kernel"] = k
    return sd


def discriminator_state_dict_from_params(params, blur_filter=(1, 2, 1)) -> dict:
    """blur_filter emits each block's `blur.kernel` buffer — the reference D
    always blurs, defaulting to (1, 2, 1) (Blocks.py:138-143)."""
    sd = _state_dict_from_entries(_discriminator_entries(params))
    if blur_filter:
        k = _blur_buffer(blur_filter)
        for i in range(len(params["blocks"])):
            sd[f"blocks.{i}.blur.kernel"] = k
    return sd


def generator_params_from_state_dict(params, state_dict, strict=False):
    """Return a new generator pytree with leaves loaded from a reference
    state_dict (partial/key-filtered like reference train.py:24-29)."""
    return _load_into_tree(params, _generator_entries, state_dict, strict)


def discriminator_params_from_state_dict(params, state_dict, strict=False):
    return _load_into_tree(params, _discriminator_entries, state_dict, strict)


def _load_into_tree(params, entries_fn, state_dict, strict):
    import jax.numpy as jnp

    entries = entries_fn(params)
    values = _load_entries(entries, state_dict, strict)

    # Rebuild the tree by re-walking with the same entry generator: we tag
    # leaves by object identity.
    id_to_name = {id(arr): name for name, (_, arr) in entries.items()}

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        name = id_to_name.get(id(node))
        if name is None:
            return node
        return jnp.asarray(values[name])

    return walk(params)
