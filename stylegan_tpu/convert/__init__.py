"""Weight conversion: reference .pth checkpoints and official TF pickles."""

from .torch_params import (generator_params_from_state_dict,
                           generator_state_dict_from_params,
                           discriminator_params_from_state_dict,
                           discriminator_state_dict_from_params)
from .pth_files import load_discriminator_file, load_generator_file

__all__ = [
    "generator_params_from_state_dict",
    "generator_state_dict_from_params",
    "discriminator_params_from_state_dict",
    "discriminator_state_dict_from_params",
    "load_discriminator_file", "load_generator_file",
]
