"""Helpers for golden-parity tests against the reference torch implementation.

The reference's models/GAN.py transitively imports torchvision (via its data
package), which is not installed here; a minimal stub satisfies the import so
the torch Generator/Discriminator can be instantiated for numerical parity.
"""

import sys
import types

import numpy as np
import torch


def install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    datasets = types.ModuleType("torchvision.datasets")
    transforms = types.ModuleType("torchvision.transforms")
    utils = types.ModuleType("torchvision.utils")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision stub: not available in tests")

    datasets.ImageFolder = _Unavailable
    for name in ["ToTensor", "Normalize", "Compose", "Resize",
                 "RandomHorizontalFlip"]:
        setattr(transforms, name, _Unavailable)
    utils.save_image = _Unavailable

    tv.datasets = datasets
    tv.transforms = transforms
    tv.utils = utils
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.datasets"] = datasets
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.utils"] = utils


def to_torch_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def from_torch_nchw(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def copy_linear(torch_layer, jax_params):
    """Overwrite a reference EqualizedLinear's weights from our (in,out) params."""
    with torch.no_grad():
        torch_layer.weight.copy_(
            torch.from_numpy(np.asarray(jax_params["weight"]).T.copy()))
        if "bias" in jax_params and torch_layer.bias is not None:
            torch_layer.bias.copy_(
                torch.from_numpy(np.asarray(jax_params["bias"]).copy()))


def copy_conv(torch_layer, jax_params):
    """Overwrite a reference EqualizedConv2d's weights from our HWIO params."""
    with torch.no_grad():
        w = np.asarray(jax_params["weight"])  # (kh, kw, I, O)
        torch_layer.weight.copy_(
            torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy()))
        if "bias" in jax_params and torch_layer.bias is not None:
            torch_layer.bias.copy_(
                torch.from_numpy(np.asarray(jax_params["bias"]).copy()))
