"""Checkpointing.

Two layers:

* ``save_params`` / ``load_params`` — single-pytree `.npz` files with dotted
  path keys, atomic (write temp + rename).  These are the framework's
  checkpoint artifacts (the counterpart of the reference's per-net `.pth`
  state_dicts, GAN.py:803-824) and what the generate CLIs consume.  Loading
  supports the reference's key-filtered partial restore so a shallow-depth
  checkpoint loads into a deeper network (train.py:24-29, --start_depth).

* ``save_train_state`` / ``load_train_state`` — full TrainState (G, D, both
  optimizer states, EMA shadow, step metadata) via Orbax when available,
  falling back to npz.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):          # DictKey
            parts.append(str(k.key))
        elif hasattr(k, "idx"):        # SequenceKey
            parts.append(str(k.idx))
        elif hasattr(k, "name"):       # GetAttrKey (namedtuples, optax states)
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return ".".join(parts)


def flatten_tree(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_path_str(path)] = np.asarray(leaf)
    return flat


def unflatten_like(template, flat: dict, partial: bool = True):
    """Rebuild a tree shaped like `template` from dotted-key arrays.

    partial=True: missing keys keep the template value (reference-style
    resume of a shallow checkpoint into a deeper net — intentional, silent);
    shape mismatches also keep the template value but emit a warning, because
    they indicate a *config* mismatch (wrong fmap_base / latent_size / ...)
    that would otherwise masquerade as a successfully restored model.
    """
    mismatched = []

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            out = [walk(getattr(node, f), f"{prefix}.{f}" if prefix else f)
                   for f in node._fields]
            return type(node)(*out)
        if isinstance(node, (list, tuple)):
            out = [walk(v, f"{prefix}.{i}" if prefix else str(i))
                   for i, v in enumerate(node)]
            return tuple(out) if isinstance(node, tuple) else out
        if prefix in flat:
            v = flat[prefix]
            if np.asarray(node).shape == v.shape:
                return jnp.asarray(v)
            if not partial:
                raise ValueError(f"shape mismatch at {prefix}")
            mismatched.append(
                f"{prefix}: checkpoint {v.shape} vs model "
                f"{np.asarray(node).shape}")
            return node
        if not partial:
            raise KeyError(f"missing key {prefix}")
        return node

    out = walk(template, "")
    if mismatched:
        import warnings
        shown = "; ".join(mismatched[:8])
        more = f" (+{len(mismatched) - 8} more)" if len(mismatched) > 8 else ""
        warnings.warn(
            f"checkpoint restore kept {len(mismatched)} initialized leaves "
            f"due to shape mismatches (config mismatch?): {shown}{more}",
            stacklevel=2)
    return out


# ---------------------------------------------------------------------------
# npz params files
# ---------------------------------------------------------------------------

def save_params(path: str, tree, metadata: Optional[dict] = None):
    flat = flatten_tree(tree)
    if metadata is not None:
        flat["__metadata__"] = np.frombuffer(
            json.dumps(metadata).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_params(path: str):
    """Returns (flat dict, metadata or None)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if "__metadata__" in flat:
        meta = json.loads(flat.pop("__metadata__").tobytes().decode())
    return flat, meta


def load_params_into(template, path: str, partial: bool = True):
    flat, meta = load_params(path)
    return unflatten_like(template, flat, partial=partial), meta


# ---------------------------------------------------------------------------
# full train-state checkpoints
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, state, step_meta: dict,
                     use_orbax: bool = True):
    """Writes one checkpoint directory (orbax) or npz file set."""
    if use_orbax:
        try:
            import orbax.checkpoint as ocp
            path = os.path.abspath(ckpt_dir)
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, state._asdict(), force=True)
            with open(path + ".meta.json", "w") as f:
                json.dump(step_meta, f)
            return
        except Exception:
            pass  # fall back to npz
    save_params(ckpt_dir + ".npz", state._asdict(), metadata=step_meta)


def load_train_state(ckpt_dir: str, state_template):
    """Restore a TrainState saved by save_train_state."""
    from ..train.state import TrainState
    path = os.path.abspath(ckpt_dir)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, state_template._asdict())
        meta = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return TrainState(**restored), meta
    tree, meta = load_params_into(state_template._asdict(), path + ".npz")
    return TrainState(**tree), meta
