"""Loading the reference's native `.pth` checkpoints.

A user migrating from the reference brings torch `state_dict` files written by
its trainer (GAN.py:803-824) or by its convert.py.  These are zip-format
torch serialization archives; torch (CPU) reads them, and the name/layout
translation in torch_params.py maps them onto our pytrees.  All loaders here
accept either `.pth` (torch) or `.npz` (native) transparently.
"""

from __future__ import annotations

import numpy as np


def _load_torch_state_dict(path: str) -> dict:
    try:
        import torch
    except ImportError as e:
        raise ImportError(
            "Loading .pth checkpoints requires torch (CPU) for "
            "deserialization; convert to .npz on a machine with torch "
            "installed") from e
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def load_generator_file(params, path: str):
    """Generator params from .npz (native) or .pth (reference format)."""
    if path.endswith(".pth"):
        from .torch_params import generator_params_from_state_dict
        return generator_params_from_state_dict(
            params, _load_torch_state_dict(path), strict=False)
    from ..io.checkpoint import load_params_into
    tree, _ = load_params_into(params, path)
    return tree


def load_discriminator_file(params, path: str):
    if path.endswith(".pth"):
        from .torch_params import discriminator_params_from_state_dict
        return discriminator_params_from_state_dict(
            params, _load_torch_state_dict(path), strict=False)
    from ..io.checkpoint import load_params_into
    tree, _ = load_params_into(params, path)
    return tree
