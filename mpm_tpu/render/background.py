"""Procedural background scene + sky for headless rendering.

The reference composites the fluid over a rendered Godot scene: a panorama
sky, a floor and static colored primitives placed specifically so refraction,
reflection and depth compositing can be judged (main/test_scenes/test1.tscn,
included in main_3d.tscn:41-42 — SURVEY.md §4 "visual test scene"). Headless
we ray-trace the analogous scene: ground plane with a checker pattern, a few
colored boxes/spheres, and a procedural gradient-and-sun sky that also serves
as the reflection cubemap (the reference ships PNG cubemap faces,
screen_space_fluid_rendering.gd:71-83; user-supplied cubemap arrays are
supported via `cubemap_sampler`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, screen_to_view_dir


@dataclasses.dataclass(frozen=True)
class Sphere:
    center: tuple[float, float, float]
    radius: float
    color: tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Box:
    lo: tuple[float, float, float]
    hi: tuple[float, float, float]
    color: tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class BackgroundScene:
    """Analogue of test1.tscn: floor + colored primitives."""

    floor_y: float = 2.0  # the sim domain's lower wall
    floor_color_a: tuple[float, float, float] = (0.55, 0.55, 0.6)
    floor_color_b: tuple[float, float, float] = (0.35, 0.35, 0.4)
    checker: float = 8.0
    spheres: tuple[Sphere, ...] = (
        Sphere((85.0, 10.0, 40.0), 8.0, (0.8, 0.2, 0.2)),
        Sphere((-20.0, 8.0, 20.0), 6.0, (0.2, 0.7, 0.2)),
    )
    boxes: tuple[Box, ...] = (
        Box((70.0, 2.0, 70.0), (90.0, 18.0, 90.0), (0.9, 0.7, 0.2)),
        Box((-30.0, 2.0, -20.0), (-14.0, 14.0, -4.0), (0.25, 0.35, 0.9)),
    )


def sky_color(dirs: jax.Array) -> jax.Array:
    """Procedural sky: horizon-to-zenith gradient + sun disc. dirs [..., 3]
    world space, y up. Doubles as the reflection cubemap."""
    y = jnp.clip(dirs[..., 1], -1.0, 1.0)
    horizon = np.asarray([0.75, 0.85, 0.95], np.float32)
    zenith = np.asarray([0.25, 0.45, 0.75], np.float32)
    ground = np.asarray([0.35, 0.33, 0.3], np.float32)
    t = jnp.clip(y, 0.0, 1.0)[..., None]
    sky = horizon * (1.0 - t) + zenith * t
    below = jnp.clip(-y, 0.0, 1.0)[..., None]
    col = sky * (1.0 - below) + ground * below
    sun_dir = np.asarray([0.35, 0.65, 0.2], np.float32)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    cos_sun = jnp.sum(dirs * sun_dir, axis=-1)
    sun = jnp.clip((cos_sun - 0.998) / 0.002, 0.0, 1.0)[..., None]
    return col + sun * np.asarray([6.0, 5.5, 4.5], np.float32)


def make_cubemap_sampler(faces: jax.Array | None = None):
    """Return dirs->rgb sampler. `faces` may be a user cubemap
    [6, F, F, 3] in Godot face order (+x, -x, +y, -y, +z, -z); None uses the
    procedural sky."""
    if faces is None:
        return sky_color

    f = faces.shape[1]

    def sample(dirs: jax.Array) -> jax.Array:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
        # face selection by dominant axis
        is_x = (ax >= ay) & (ax >= az)
        is_y = (~is_x) & (ay >= az)
        face = jnp.where(
            is_x,
            jnp.where(x > 0, 0, 1),
            jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
        )
        ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
        u = jnp.where(
            is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x))
        )
        v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
        uu = (u / jnp.maximum(ma, 1e-9) + 1.0) * 0.5 * (f - 1)
        vv = (v / jnp.maximum(ma, 1e-9) + 1.0) * 0.5 * (f - 1)
        ui = jnp.clip(uu.astype(jnp.int32), 0, f - 1)
        vi = jnp.clip(vv.astype(jnp.int32), 0, f - 1)
        return faces[face, vi, ui]

    return sample


def render_background(
    cam: Camera,
    view: jax.Array,  # [4,4] world->view
    scene: BackgroundScene = BackgroundScene(),
):
    """Ray-trace the background. Returns (color [H,W,3], linear depth [H,W])."""
    rot = view[:3, :3]
    eye = -rot.T @ view[:3, 3]
    dirs_v = screen_to_view_dir(cam)  # [H,W,3]
    dirs = dirs_v @ rot  # to world (R^T per pixel)

    big = np.float32(cam.far)
    t_best = jnp.full(dirs.shape[:2], big)
    c_best = sky_color(dirs)

    # floor plane y = floor_y
    denom = dirs[..., 1]
    t_floor = (scene.floor_y - eye[1]) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1e-6)
    hit_f = (t_floor > 0) & (jnp.abs(denom) > 1e-6)
    p = eye + dirs * t_floor[..., None]
    check = ((jnp.floor(p[..., 0] / scene.checker) + jnp.floor(p[..., 2] / scene.checker)) % 2.0) < 1.0
    fcol = jnp.where(
        check[..., None],
        np.asarray(scene.floor_color_a, np.float32),
        np.asarray(scene.floor_color_b, np.float32),
    )
    take = hit_f & (t_floor < t_best)
    t_best = jnp.where(take, t_floor, t_best)
    c_best = jnp.where(take[..., None], fcol, c_best)

    for s in scene.spheres:
        oc = eye - np.asarray(s.center, np.float32)
        b = jnp.sum(dirs * oc, axis=-1)
        c = jnp.sum(oc * oc) - s.radius * s.radius
        disc = b * b - c
        t_hit = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit = (disc > 0) & (t_hit > 0) & (t_hit < t_best)
        # simple lambert from above
        pth = eye + dirs * t_hit[..., None]
        n = (pth - np.asarray(s.center, np.float32)) / s.radius
        lam = 0.35 + 0.65 * jnp.clip(n[..., 1], 0.0, 1.0)
        t_best = jnp.where(hit, t_hit, t_best)
        c_best = jnp.where(hit[..., None], np.asarray(s.color, np.float32) * lam[..., None], c_best)

    for box in scene.boxes:
        lo = np.asarray(box.lo, np.float32)
        hi = np.asarray(box.hi, np.float32)
        inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-6, dirs, 1e-6)
        t0 = (lo - eye) * inv
        t1 = (hi - eye) * inv
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        hit = (tmax > jnp.maximum(tmin, 0.0)) & (tmin > 0) & (tmin < t_best)
        t_best = jnp.where(hit, tmin, t_best)
        c_best = jnp.where(hit[..., None], np.asarray(box.color, np.float32) * 0.85, c_best)

    # depth = view-space -z = t * (-dirs_v.z)
    depth = t_best * (-dirs_v[..., 2])
    return c_best, depth


def load_cubemap(source) -> "jax.Array":
    """Load a 6-face PNG cubemap into the [6, F, F, 3] float array the SSFR
    sampler consumes (Godot face order +x, -x, +y, -y, +z, -z) — the
    headless analogue of the reference's image-array cubemap
    (screen_space_fluid_rendering.gd:71-83, assets/cubemap/
    Cubemap_Sky_04-{1..6}.png).

    `source` is either an explicit 6-path sequence in face order, or a
    directory containing `<stem>-1.png .. <stem>-6.png` (the reference's
    naming) or `{px,nx,py,ny,pz,nz}.png`."""
    import glob
    import os

    import jax.numpy as jnp

    from .image import read_png_rgb

    if isinstance(source, (list, tuple)):
        paths = list(source)
    else:
        godot = sorted(glob.glob(os.path.join(source, "*-[1-6].png")))
        named = [
            os.path.join(source, f"{n}.png")
            for n in ("px", "nx", "py", "ny", "pz", "nz")
        ]
        if len(godot) == 6:
            paths = godot
        elif all(os.path.exists(p) for p in named):
            paths = named
        else:
            raise FileNotFoundError(
                f"no 6-face cubemap found in {source!r} (expected *-1..6.png "
                "or px/nx/py/ny/pz/nz.png)"
            )
    faces = [np.asarray(read_png_rgb(p), np.float32) / 255.0 for p in paths]
    shapes = {f.shape for f in faces}
    if len(shapes) != 1 or faces[0].shape[0] != faces[0].shape[1]:
        raise ValueError(f"cubemap faces must be square and equal: {shapes}")
    return jnp.asarray(np.stack(faces))
