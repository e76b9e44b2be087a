from .grid_sample import grid_sample_1d, grid_sample_2d, grid_sample_3d
from .compositing import raw2alpha, alpha2weights
from .resize import resize_bilinear_ac, max_pool3d_same
from .encoding import positional_encoding, position_encoder

__all__ = [
    "grid_sample_1d",
    "grid_sample_2d",
    "grid_sample_3d",
    "raw2alpha",
    "alpha2weights",
    "resize_bilinear_ac",
    "max_pool3d_same",
    "positional_encoding",
    "position_encoder",
]
