"""TPU-native StyleGAN op library (JAX/XLA, NHWC)."""

from .primitives import (DIMS, add_noise, avg_pool2d, blur2d, downscale2d,
                         instance_norm, leaky_relu, make_blur_kernel,
                         minibatch_stddev, pixel_norm, style_modulate,
                         truncate_dlatents, update_moving_average, upscale2d)
from .linear import (conv2d_apply, conv2d_init, equalized_scales,
                     linear_apply, linear_init)

__all__ = [
    "DIMS", "add_noise", "avg_pool2d", "blur2d", "downscale2d",
    "instance_norm", "leaky_relu", "make_blur_kernel", "minibatch_stddev",
    "pixel_norm", "style_modulate", "truncate_dlatents",
    "update_moving_average", "upscale2d",
    "conv2d_apply", "conv2d_init", "equalized_scales",
    "linear_apply", "linear_init",
]
