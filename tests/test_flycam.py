"""Fly camera (R11): pose-integration semantics matching the reference's
main_camera.gd:92-132, the scripted key source, and the CLI wiring."""

import glob
import math
import os

import numpy as np

from mpm_tpu.render.camera import look_at
from mpm_tpu.render.flycam import FlyCamera, ScriptKeys, yaw_pitch_from_forward


def make_cam(**kw):
    return FlyCamera(eye=(32.0, 60.0, 87.0), target=(32.0, 24.0, 32.0), **kw)


def test_initial_pose_matches_look_at():
    """At t=0 the fly camera's view must equal look_at(eye, target) — the
    yaw/pitch decomposition is exact for zero-roll poses."""
    cam = make_cam()
    # look_at computes in f32, the fly camera in f64 — ~1e-3 agreement
    np.testing.assert_allclose(
        cam.view(), look_at((32.0, 60.0, 87.0), (32.0, 24.0, 32.0)),
        atol=1e-3)


def test_yaw_pitch_roundtrip():
    for fwd in [(0, 0, -1), (1, 0, 0), (0.3, 0.5, -0.2), (-0.7, -0.1, 0.7)]:
        yaw, pitch = yaw_pitch_from_forward(fwd)
        cy, sy = math.cos(math.radians(yaw)), math.sin(math.radians(yaw))
        cp, sp = math.cos(math.radians(pitch)), math.sin(math.radians(pitch))
        rec = np.array([-sy * cp, sp, -cy * cp])
        np.testing.assert_allclose(
            rec, np.asarray(fwd, float) / np.linalg.norm(fwd), atol=1e-6)


def test_move_is_basis_times_input_normalized():
    """position += normalize(basis @ (x,0,z)) * speed * dt
    (main_camera.gd:128-132); diagonal input must NOT move faster."""
    cam = make_cam(speed=10.0)
    cam.yaw, cam.pitch = 0.0, 0.0
    p0 = cam.pos.copy()
    cam.apply_keys("w", dt=0.5)  # forward = -z at zero yaw
    np.testing.assert_allclose(cam.pos - p0, [0.0, 0.0, -5.0], atol=1e-9)
    cam2 = make_cam(speed=10.0)
    cam2.yaw, cam2.pitch = 0.0, 0.0
    p0 = cam2.pos.copy()
    cam2.apply_keys("wd", dt=0.5)  # diagonal: normalized, still 5 units
    assert abs(np.linalg.norm(cam2.pos - p0) - 5.0) < 1e-9


def test_pitch_clamp_and_yaw_wrap():
    """pitch clamps at 89.9 deg, yaw resets past 360 — the reference's
    _unhandled_input clamping (main_camera.gd:110-118)."""
    cam = make_cam(look_rate=50.0)
    for _ in range(10):
        cam.apply_keys("i", dt=1 / 60)
    assert cam.pitch == 89.9
    cam.yaw = 0.0
    for _ in range(10):
        cam.apply_keys("j", dt=1 / 60)  # +50 deg/frame yaw left
    assert abs(cam.yaw) <= 360.0


def test_moving_while_pitched_follows_basis():
    """Looking 30 deg down, 'w' must move forward AND down along the view
    axis (the reference flies along the camera basis, not the ground)."""
    cam = make_cam(speed=1.0)
    cam.yaw, cam.pitch = 0.0, -30.0
    p0 = cam.pos.copy()
    cam.apply_keys("w", dt=1.0)
    d = cam.pos - p0
    assert d[1] < -0.4 and d[2] < -0.8  # down + forward


def test_script_keys_schedule():
    src = ScriptKeys("w:3,wl:2,.:1,+:1")
    seq = [src.poll() for _ in range(8)]
    assert seq == ["w", "w", "w", "wl", "wl", "", "+", ""]


def test_speed_modifier():
    cam = make_cam(speed=8.0)
    cam.apply_keys("+", dt=1 / 60)
    assert cam.speed == 10.0
    cam.apply_keys("-", dt=1 / 60)
    assert cam.speed == 8.0


def test_cli_render_fly_script(tmp_path):
    """End-to-end: a scripted flight renders frames with a moving camera
    and a deterministic trajectory (fixed 60 Hz delta)."""
    from mpm_tpu.__main__ import main

    out = tmp_path / "frames"
    main([
        "render", "fluid_3d_cpu", "--frames", "3", "--mode", "bucketed",
        "--substeps", "1", "--out", str(out),
        "--width", "160", "--height", "90",
        "--render-mode", "velocity_spheres",
        "--fly-script", "w:1,wi:1,l:1", "--fly-speed", "30",
    ])
    pngs = sorted(glob.glob(os.path.join(str(out), "*.png")))
    assert len(pngs) == 3
    # the camera moved: the first and last frames must differ
    from mpm_tpu.render.image import read_png_rgb

    assert not np.array_equal(read_png_rgb(pngs[0]), read_png_rgb(pngs[-1]))


# -- steerable collider (SpherePointer) --------------------------------------
# the reference's LMB mouse-ray-onto-plane sphere collider
# (MLSMPM3DFluidMultithreadGPU.cs:618-642; plane = y=0 WorldBoundaryShape3D,
# MLSMPM3DFluidMultithreadGPU.tscn:58-66; force in g2p.glsl:122-129)


def _pointer_config():
    from mpm_tpu.core.params import SimConfig

    return SimConfig(grid_res=(32, 32, 32), num_particles=8, substeps=1,
                     bin_capacity=8)


def test_sphere_pointer_ray_plane_math():
    from mpm_tpu.render.flycam import SpherePointer

    cam = FlyCamera(eye=(10.0, 10.0, 10.0), target=(10.0, 0.0, 0.0))
    # fwd = (0, -.707, -.707): crosshair ray hits y=5 at (10, 5, 5)
    ptr = SpherePointer(_pointer_config(), plane_y=5.0, radius=4.0)
    ptr.update(cam, "p")
    np.testing.assert_allclose(ptr.center, [10.0, 5.0, 5.0], atol=1e-6)
    assert ptr.active == 1.0
    it = ptr.interaction()
    assert float(it.active) == 1.0 and float(it.radius) == 4.0


def test_sphere_pointer_gates_on_key():
    from mpm_tpu.render.flycam import SpherePointer

    cam = FlyCamera(eye=(10.0, 10.0, 10.0), target=(10.0, 0.0, 0.0))
    ptr = SpherePointer(_pointer_config(), plane_y=5.0)
    c0 = ptr.center.copy()
    ptr.update(cam, "w")  # not pressed: sphere stays put, inactive
    assert ptr.active == 0.0
    np.testing.assert_array_equal(ptr.center, c0)
    assert float(ptr.interaction().active) == 0.0
    # SPACE works like 'p' (the interactive binding)
    ptr.update(cam, "w ")
    assert ptr.active == 1.0


def test_sphere_pointer_keeps_last_position_when_plane_unreachable():
    from mpm_tpu.render.flycam import SpherePointer

    ptr = SpherePointer(_pointer_config(), plane_y=5.0)
    cam = FlyCamera(eye=(10.0, 10.0, 10.0), target=(10.0, 0.0, 0.0))
    ptr.update(cam, "p")
    hit = ptr.center.copy()
    up = FlyCamera(eye=(10.0, 10.0, 10.0), target=(10.0, 20.0, 10.0 - 1e-5))
    up.pitch = 60.0  # looking up: plane y=5 is behind the camera
    ptr.update(up, "p")
    np.testing.assert_array_equal(ptr.center, hit)
    assert ptr.active == 1.0  # still pushing from the last position


def test_sphere_pointer_clamps_to_domain():
    from mpm_tpu.render.flycam import SpherePointer

    ptr = SpherePointer(_pointer_config(), plane_y=5.0)
    # shallow ray: hits the plane far outside the 32-unit domain
    cam = FlyCamera(eye=(16.0, 6.0, 16.0), target=(500.0, 5.0, 16.0))
    ptr.update(cam, "p")
    assert 0.0 <= ptr.center[0] <= 32.0
    np.testing.assert_allclose(ptr.center[1], 5.0)


def _fly_checkpoint_pos(tmp_path, name, script):
    from mpm_tpu.__main__ import main
    from mpm_tpu.utils import checkpoint

    out = tmp_path / name
    ck = tmp_path / (name + "_ck")
    main([
        "render", "fluid_3d_cpu", "--frames", "2", "--mode", "bucketed",
        "--substeps", "1", "--out", str(out),
        "--width", "96", "--height", "64",
        "--render-mode", "velocity_spheres",
        "--fly-script", script,
        "--fly-plane-y", "16", "--fly-sphere-radius", "30",
        "--fly-sphere-strength", "2.0",
        "--checkpoint-every", "2", "--checkpoint-dir", str(ck),
    ])
    files = sorted(glob.glob(os.path.join(str(ck), "*.npz")))
    state, _, _, _ = checkpoint.load(files[-1])
    return np.asarray(state.pos)


def test_cli_fly_collider_displaces_fluid(tmp_path):
    """Scripted session: holding 'p' (the LMB analogue) pushes the fluid —
    the checkpointed trajectories with and without the push must diverge
    (VERDICT r4 missing #3: live input driving the collider)."""
    pos_pushed = _fly_checkpoint_pos(tmp_path, "push", "p:2")
    pos_idle = _fly_checkpoint_pos(tmp_path, "idle", ".:2")
    assert pos_pushed.shape == pos_idle.shape
    moved = np.abs(pos_pushed - pos_idle).max()
    assert moved > 0.01, f"collider push had no effect (max delta {moved})"
