"""FreeLookController physics tests against camera.gd behaviors."""

import numpy as np

from godotgaussiansplatting_tpu.viewer.controller import (FreeLookController,
                                                          InputState)


def test_fly_accelerates_and_drags_to_stop():
    c = FreeLookController()
    start = c.camera.position.copy()
    for _ in range(30):
        c.update(1 / 60, InputState(forward=True), mode=c.NONE)
    moved = c.camera.position - start
    # reset pose faces Godot +Z (yaw 180): forward (-local z) = world +Z
    assert moved[2] > 0.05
    assert abs(moved[0]) < 1e-4 and abs(moved[1]) < 1e-4
    v1 = np.linalg.norm(c.velocity)
    assert v1 > 0
    for _ in range(240):
        c.update(1 / 60, InputState(), mode=c.NONE)
    assert np.linalg.norm(c.velocity) < 1e-3  # drag brings it to rest


def test_shift_runs_faster():
    def dist(shift):
        c = FreeLookController()
        s = c.camera.position.copy()
        for _ in range(30):
            c.update(1 / 60, InputState(forward=True, shift=shift), c.NONE)
        return np.linalg.norm(c.camera.position - s)
    assert dist(True) > dist(False) * 1.5


def test_pitch_clamp():
    c = FreeLookController()
    c.update(1 / 60, InputState(mouse_dy=-10000), mode=c.FREE_LOOK)
    assert c.pitch == 70.0
    c.update(1 / 60, InputState(mouse_dy=10000), mode=c.FREE_LOOK)
    assert c.pitch == -80.0


def test_orbit_preserves_distance():
    c = FreeLookController()
    c.orbit_position = np.array([0.0, 0.0, 5.0], np.float32)
    c.camera.position = np.array([0.0, 0.0, 2.0], np.float32)
    c.target_position = c.camera.position.copy()
    d0 = np.linalg.norm(c.camera.position - c.orbit_position)
    for _ in range(20):
        c.update(1 / 60, InputState(mouse_dx=12, mouse_dy=4), mode=c.ORBIT)
    d1 = np.linalg.norm(c.camera.position - c.orbit_position)
    assert abs(d1 - d0) < 1e-3
    # camera keeps facing the orbit point
    fwd = -c.camera.basis[:, 2]
    to_orbit = c.orbit_position - c.camera.position
    to_orbit /= np.linalg.norm(to_orbit)
    assert float(fwd @ to_orbit) > 0.999


def test_zoom_steps_and_min_distance():
    c = FreeLookController()
    c.orbit_position = np.array([0.0, 0.0, 3.0], np.float32)
    c.target_position = np.array([0.0, 0.0, 0.0], np.float32)
    c.zoom(1)
    assert abs(np.linalg.norm(c.target_position - c.orbit_position) - 2.75) < 1e-5
    for _ in range(50):
        c.zoom(1)
    # never closer than the 0.75 floor
    assert np.linalg.norm(c.target_position - c.orbit_position) >= 0.75 - 1e-5


def test_focus_and_reset():
    c = FreeLookController()
    c.set_focused_position(np.array([1.0, 2.0, 3.0], np.float32))
    assert np.allclose(c.orbit_position, [1, 2, 3])
    assert np.allclose(c.target_position,
                       c.orbit_position + c.camera.basis[:, 2] * 2.0)
    c.reset()
    assert np.allclose(c.target_position, 0)
    assert c.yaw == 180.0


def test_orbit_entry_swing():
    """camera.gd:36-42,130-138: entering orbit swings the camera to face the
    orbit point over ~0.4s with cubic easing (no snap)."""
    from godotgaussiansplatting_tpu.viewer.controller import (
        FreeLookController, InputState)
    c = FreeLookController()
    c.orbit_position = np.array([2.0, 0.0, 2.0], np.float32)
    c.camera = c.camera.with_yaw_pitch(180.0, 0.0)
    yaw0 = c.yaw
    c.start_orbit()
    assert c.orbit_time == 0.0     # not aligned -> interpolation runs
    c.update(0.1, InputState(), mode="orbit", fps=60.0)
    mid_yaw = c.yaw
    assert mid_yaw != yaw0          # moving...
    for _ in range(8):
        c.update(0.1, InputState(), mode="orbit", fps=60.0)
    # converged: camera now faces the orbit point
    fwd = -c.camera.basis[:, 2]
    to_orbit = c.orbit_position - c.camera.position
    to_orbit = to_orbit / np.linalg.norm(to_orbit)
    assert float(fwd @ to_orbit) > 0.999


def test_orbit_entry_skips_when_aligned():
    from godotgaussiansplatting_tpu.viewer.controller import (
        FreeLookController)
    c = FreeLookController()
    # default pose already faces the default orbit point (0, 0, 2)
    c.start_orbit()
    assert c.orbit_time == 1.0
