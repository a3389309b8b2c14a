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
