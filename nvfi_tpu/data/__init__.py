from .blender import (
    load_blender_data,
    load_blender_data_dynamic,
    load_blender_data_segm,
    load_blender_data_nosegm,
)
from .synthetic import make_synthetic_scene, write_blender_dataset
from .sampler import SimpleSampler, RayImportanceSampler, PatchSampler
