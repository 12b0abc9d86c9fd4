"""Prior extraction: depth render -> density/features -> voxelized city prior."""

from .extraction import extract_voxels, write_ply
from .voxelize import hit_quantile_filter, voxel_downsample, voxel_keys
