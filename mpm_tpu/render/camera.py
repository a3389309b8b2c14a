"""Camera model for the headless renderer.

The reference uses Godot's dual-camera rig (main + fluid depth camera,
rendering/objects/main_camera.tscn:54-69) with standard perspective
projection; the SSFR shaders work in view space with linear depth
(compositor_effects/shaders/linearize_fluid_depth.glsl:32-34). Headless we
keep everything in view space directly: +x right, +y up, camera looks down
-z; "linear depth" is -z_view, matching the reference's linearized values.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera. fov_y in degrees (Godot default 75,
    project.godot camera defaults); image size (width, height)."""

    width: int = 1280
    height: int = 720
    fov_y_deg: float = 75.0
    near: float = 0.05
    far: float = 4000.0  # Godot default camera far (bilateral_blur guard 3990)

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def focal_px(self) -> float:
        """Pixels per unit tan: (height/2) / tan(fov/2)."""
        return (self.height / 2.0) / math.tan(math.radians(self.fov_y_deg) / 2.0)


def look_at(eye, target, up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """World->view rotation+translation matrix [4,4] (right-handed, -z fwd)."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    rot = np.stack([right, true_up, -fwd])  # rows: view axes
    view = np.eye(4, dtype=np.float32)
    view[:3, :3] = rot
    view[:3, 3] = -rot @ eye
    return view


def world_to_view(pos: jax.Array, view: jax.Array) -> jax.Array:
    """[3, N] lane-major world -> view coordinates (a [3,3]x[3,N] matmul —
    MXU-friendly with particles in lanes)."""
    return view[:3, :3] @ pos + view[:3, 3][:, None]


def view_to_screen(view_pos: jax.Array, cam: Camera):
    """View-space [3, N] -> (pixel x, pixel y, linear depth), each [N].
    Depth is -z_view (positive in front of the camera). Pixel origin:
    top-left, y down — matching image storage order."""
    depth = -view_pos[2]
    safe = jnp.where(depth > 1e-6, depth, 1e-6)
    f = cam.focal_px
    px = cam.width / 2.0 + f * view_pos[0] / safe
    py = cam.height / 2.0 - f * view_pos[1] / safe
    return px, py, depth


def screen_to_view_dir(cam: Camera, crop=None) -> jax.Array:
    """Per-pixel unit ray direction in view space, [H, W, 3]. `crop` =
    (y0, x0, ch, cw): rays for that static sub-rectangle only (pixel
    centers keep their FULL-frame coordinates — a crop changes which rays
    are computed, never their directions)."""
    f = cam.focal_px
    y0, x0, h, w = crop if crop is not None else (0, 0, cam.height, cam.width)
    xs = (jnp.arange(w, dtype=jnp.float32) + (0.5 + x0) - cam.width / 2.0) / f
    ys = -(jnp.arange(h, dtype=jnp.float32) + (0.5 + y0) - cam.height / 2.0) / f
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    d = jnp.stack([xg, yg, -jnp.ones_like(xg)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def view_pos_from_depth(cam: Camera, linear_depth: jax.Array,
                        crop=None) -> jax.Array:
    """Reconstruct view-space position from per-pixel linear depth [H, W]
    (the reference reconstructs from uv + linear depth,
    fluid_render_fixed_depth.glsl:54-69). `crop` = (y0, x0, ch, cw) when
    `linear_depth` is a static sub-rectangle of the frame."""
    f = cam.focal_px
    h, w = linear_depth.shape
    y0, x0 = (crop[0], crop[1]) if crop is not None else (0, 0)
    xs = (jnp.arange(w, dtype=jnp.float32) + (0.5 + x0) - cam.width / 2.0) / f
    ys = -(jnp.arange(h, dtype=jnp.float32) + (0.5 + y0) - cam.height / 2.0) / f
    xg, yg = jnp.meshgrid(xs, ys, indexing="xy")
    z = -linear_depth
    return jnp.stack([xg * linear_depth, yg * linear_depth, z], axis=-1)


def crop_for_aabb(
    cam: Camera,
    view: np.ndarray,  # [4, 4] world->view (host numpy; static cameras only)
    lo,  # world AABB min corner (e.g. (0, 0, 0))
    hi,  # world AABB max corner (e.g. SimConfig.dres)
    margin: int = 16,  # >= dilation max_radius_px + a few px (normals roll)
    align_x: int = 128,  # lane alignment (Pallas blur needs cw % 128 == 0)
    align_y: int = 8,  # sublane alignment
):
    """Conservative static screen crop (y0, x0, ch, cw) of a world AABB, or
    None when cropping buys nothing (projection covers the frame) or is
    unsafe (a corner at/behind the near plane — the camera is inside or
    clipping the box, so the corner-hull bound no longer contains the
    projection).

    Central projection maps the AABB into the convex hull of its projected
    corners whenever the whole box is strictly in front of the camera, so
    the corner bbox + margin bounds every splat CENTER pixel; the margin
    then covers the sphere-impostor dilation radius and the normals' 1-px
    neighborhood. Fluid positions are clamped to the domain (SimConfig.dres
    — the physics extent, CLAUDE.md invariants), so the domain AABB is a
    sound bound for any scene/dynamics under a static camera. The image-
    space SSFR passes (dilation O(R^2), blur, shade+refraction) then run on
    the crop only — at the official bench camera the 64^3 domain projects
    to 43% of the 1080p frame (ARCHITECTURE.md "Render roofline")."""
    view = np.asarray(view, np.float32)
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    corners = np.array(
        [[c[0], c[1], c[2]] for c in
         ((x, y, z) for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
          for z in (lo[2], hi[2]))], np.float32)
    v = view[:3, :3] @ corners.T + view[:3, 3][:, None]
    depth = -v[2]
    if float(depth.min()) <= max(cam.near, 1e-3) * 2.0:
        return None
    f = cam.focal_px
    px = cam.width / 2.0 + f * v[0] / depth
    py = cam.height / 2.0 - f * v[1] / depth
    x0 = max(0, int(np.floor(px.min())) - margin)
    x1 = min(cam.width, int(np.ceil(px.max())) + margin)
    y0 = max(0, int(np.floor(py.min())) - margin)
    y1 = min(cam.height, int(np.ceil(py.max())) + margin)
    if x1 <= x0 or y1 <= y0:  # box fully offscreen: nothing to crop to
        return None
    cw = min(cam.width, -((x1 - x0) // -align_x) * align_x)
    x0 = max(0, min(x0, cam.width - cw))
    ch = min(cam.height, -((y1 - y0) // -align_y) * align_y)
    y0 = max(0, min(y0, cam.height - ch))
    if cw >= cam.width and ch >= cam.height:
        return None
    return (y0, x0, ch, cw)


def ndc_depth_to_linear(ndc_depth: jax.Array, cam: Camera) -> jax.Array:
    """Parity utility for the reference's linearize pass
    (linearize_fluid_depth.glsl:32-34): Godot reverse-z NDC depth -> linear
    view depth, lin = 1 / (d * inv_proj[2].w + inv_proj[3].w) with
    inv_proj[2].w = (1/near - 1/far), inv_proj[3].w = 1/far."""
    a = 1.0 / cam.near - 1.0 / cam.far
    b = 1.0 / cam.far
    return 1.0 / (ndc_depth * a + b)


def linear_depth_to_ndc(linear_depth: jax.Array, cam: Camera) -> jax.Array:
    a = 1.0 / cam.near - 1.0 / cam.far
    b = 1.0 / cam.far
    return (1.0 / linear_depth - b) / a
