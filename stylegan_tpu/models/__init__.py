"""Network definitions: mapping, synthesis, generator, discriminator, EMA."""

from .configs import (DiscriminatorConfig, GeneratorConfig, MappingConfig,
                      SynthesisConfig, discriminator_config_from_cfg,
                      generator_config_from_cfg)
from .discriminator import discriminator_apply, discriminator_init
from .generator import GeneratorOutput, generator_apply, generator_init
from .mapping import mapping_apply, mapping_init
from .synthesis import synthesis_apply, synthesis_init
from .ema import ema_update

__all__ = [
    "DiscriminatorConfig", "GeneratorConfig", "MappingConfig",
    "SynthesisConfig", "discriminator_config_from_cfg",
    "generator_config_from_cfg",
    "discriminator_apply", "discriminator_init",
    "GeneratorOutput", "generator_apply", "generator_init",
    "mapping_apply", "mapping_init",
    "synthesis_apply", "synthesis_init",
    "ema_update",
]
