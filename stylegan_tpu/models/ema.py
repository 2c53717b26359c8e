"""Exponential moving average of generator parameters.

Functional counterpart of the reference's per-parameter Python loop
(reference models/__init__.py:13-40): shadow <- beta*shadow + (1-beta)*param
over *trainable parameters only* — the truncation avg_latent buffer is a
non-trainable statistic and is excluded, matching the reference where
named_parameters() excludes buffers.

Runs inside the jitted G train step as a fused tree-map (no host loop).
"""

from __future__ import annotations

import jax


def _is_buffer_path(path) -> bool:
    return any(getattr(k, "key", None) == "avg_latent" for k in path)


def ema_update(shadow_params, params, beta: float):
    """Returns the updated shadow tree. beta=0 copies params (init)."""
    def upd(path, s, p):
        if _is_buffer_path(path):
            return s
        return beta * s + (1.0 - beta) * p
    return jax.tree_util.tree_map_with_path(upd, shadow_params, params)
