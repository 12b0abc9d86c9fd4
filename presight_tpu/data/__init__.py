"""Data layer: cameras, dataparser, chunked pixel datasets, prefetch."""

from .cameras import CameraParams, generate_camera_rays, generate_rays
