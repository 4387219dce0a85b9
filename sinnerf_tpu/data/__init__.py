"""Dataset registry, mirroring ``datasets/__init__.py`` of the reference
(same keys as ``opt.py:10-13`` choices, plus the eval-only ``llff``)."""

from sinnerf_tpu.data.blender import BlenderProj, BlenderRot3D
from sinnerf_tpu.data.dtu import DTUProj
from sinnerf_tpu.data.llff import LLFFEval, LLFFProj
from sinnerf_tpu.data.sampler import SamplerConfig, sample_batch, sample_item

dataset_dict = {
    "blender_ray_patch_1image_rot3d": BlenderRot3D,
    "blender_ray_patch_1image_proj": BlenderProj,
    "llff_ray_patch_1image_proj": LLFFProj,
    "dtu_proj": DTUProj,
    "llff": LLFFEval,
}

__all__ = [
    "BlenderProj",
    "BlenderRot3D",
    "DTUProj",
    "LLFFEval",
    "LLFFProj",
    "SamplerConfig",
    "dataset_dict",
    "sample_batch",
    "sample_item",
]
