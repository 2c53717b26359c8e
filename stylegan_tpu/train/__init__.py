"""Training: state, per-depth compiled steps, progressive trainer."""

from .state import (TrainState, create_train_state, make_d_optimizer,
                    make_g_optimizer)
from .steps import (build_d_step, build_g_step, build_sample_fn,
                    build_gspmd_train_step, build_train_step,
                    progressive_downsample)
from .trainer import StyleGAN

__all__ = [
    "TrainState", "create_train_state", "make_d_optimizer", "make_g_optimizer",
    "build_d_step", "build_g_step", "build_sample_fn", "build_train_step",
    "build_gspmd_train_step",
    "progressive_downsample", "StyleGAN",
]
