from .camera import Camera, look_at
from .legacy import legacy_quad_frame
from .pipeline import (
    RenderConfig,
    RENDER_DEFAULT,
    RENDER_DEPTH_DEBUG,
    RENDER_LEGACY_QUAD,
    RENDER_NONE,
    RENDER_VELOCITY_SPHERES,
    default_view,
    domain_crop,
    make_bucket_renderer,
    make_renderer,
    render_frame,
    render_frame_buckets,
)
from .splat import extract_band_slot_splats, surface_band_uncovered
from .ssfr import SSFRParams
from .background import BackgroundScene
from .image import write_png

__all__ = [
    "Camera",
    "RenderConfig",
    "SSFRParams",
    "BackgroundScene",
    "look_at",
    "default_view",
    "domain_crop",
    "make_bucket_renderer",
    "make_renderer",
    "render_frame",
    "render_frame_buckets",
    "write_png",
    "RENDER_DEFAULT",
    "RENDER_VELOCITY_SPHERES",
    "RENDER_DEPTH_DEBUG",
    "RENDER_LEGACY_QUAD",
    "RENDER_NONE",
    "legacy_quad_frame",
    "extract_band_slot_splats",
    "surface_band_uncovered",
]
