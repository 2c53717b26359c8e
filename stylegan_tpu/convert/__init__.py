"""Weight conversion: reference .pth checkpoints and official TF pickles."""

from .torch_params import (generator_params_from_state_dict,
                           generator_state_dict_from_params,
                           discriminator_params_from_state_dict,
                           discriminator_state_dict_from_params)

__all__ = [
    "generator_params_from_state_dict",
    "generator_state_dict_from_params",
    "discriminator_params_from_state_dict",
    "discriminator_state_dict_from_params",
]
