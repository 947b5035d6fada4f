"""App layer tests: driver loop, screenshot, checkpoint, timing queries."""

import os

import numpy as np
import pytest

from loupiote_tpu.app import Driver, EditorCommand, Queries, load_session, save_session
from loupiote_tpu.config import BlitMode, RenderConfig
from loupiote_tpu.errors import FileNotFound

CORNELL = "/root/reference/assets/cornell-box.glb"


@pytest.fixture(scope="module")
def driver():
    d = Driver(size=(64, 64), config=RenderConfig(downsample_factor=0.5))
    d.load_gltf_path(CORNELL)
    d.load_blue_noise()  # generated (no PNG asset in the mount)
    d.upload_scene()
    return d


def test_driver_defaults(driver):
    # app.rs:63-68: denoised mode, camera at (-10,1,0) toward (1,0.35,0).
    assert driver.settings.blit_mode == BlitMode.DENOISED_PATHTRACE
    np.testing.assert_allclose(driver.camera_controller.origin, [-10, 1, 0])
    assert driver.stats["meshes"] == 5
    assert driver.stats["bvh_nodes"] > 0


def test_driver_step_and_fps(driver):
    driver.settings.blit_mode = BlitMode.PATHTRACE
    driver.step(dt=0.016)
    assert driver.fps > 0
    assert driver.queries.labels() == ["raytrace"]
    assert driver.queries.values()[0] > 0
    assert driver.queries.frame_ms > 0


def test_per_pass_timing_labels(driver):
    """Reference parity: the performance window shows per-pass timings with
    labels like "ray generation", "primary intersection", "shading 0",
    "asvgf" (renderer.rs:444-448,457,515; performance_info.rs:23-47)."""
    driver.settings.blit_mode = BlitMode.DENOISED_PATHTRACE
    driver.step(dt=0.016)  # populate denoiser state
    out = driver.measure_passes()
    labels = driver.queries.labels()
    assert len(labels) >= 4
    assert "ray generation" in labels
    assert "primary intersection" in labels
    assert "shading 0" in labels
    assert "asvgf" in labels
    assert out.get("method") in ("trace", "replay")
    assert all(ms >= 0 for ms in out.values() if isinstance(ms, float))
    driver.settings.blit_mode = BlitMode.PATHTRACE


def test_accumulation_gated_by_camera(driver):
    driver.settings.accumulate = True
    driver.step(dt=0.016)  # camera static -> accumulates
    fc1 = int(driver.renderer.state.frame_count)
    driver.step(dt=0.016)
    assert int(driver.renderer.state.frame_count) == fc1 + 1
    # Moving camera resets accumulation (app.rs:308-310).
    driver.camera_controller.rotation_enabled = True
    driver.camera_controller.rotate(0.5, 0.0)
    driver.step(dt=0.016)
    assert int(driver.renderer.state.frame_count) <= 2
    driver.camera_controller.rotation_enabled = False
    driver.settings.accumulate = False


def test_toggle_command(driver):
    acc = driver.settings.accumulate
    driver.run_command(EditorCommand.TOGGLE_ACCUMULATION)
    assert driver.settings.accumulate == (not acc)
    driver.run_command(EditorCommand.TOGGLE_ACCUMULATION)


def test_screenshot(tmp_path, driver):
    driver.settings.blit_mode = BlitMode.PATHTRACE
    driver.step(dt=0.016)
    out = str(tmp_path / "shot.png")
    driver.save_screenshot(out)
    from PIL import Image

    img = np.asarray(Image.open(out))
    # Window resolution, not the 0.5x internal render size
    # (renderer.rs:727-811 readback parity).
    w, h = driver.renderer.window_size
    assert img.shape == (h, w, 4)


def test_checkpoint_roundtrip(tmp_path, driver):
    driver.settings.blit_mode = BlitMode.PATHTRACE
    driver.settings.accumulate = True
    driver.step(dt=0.016)
    driver.step(dt=0.016)
    path = str(tmp_path / "ckpt")
    save_session(path, driver.renderer)
    before = np.asarray(driver.renderer.state.accum).copy()
    fc = int(driver.renderer.state.frame_count)

    d2 = Driver(size=(64, 64), config=RenderConfig(downsample_factor=0.5))
    load_session(path, d2.renderer)
    np.testing.assert_array_equal(np.asarray(d2.renderer.state.accum), before)
    assert int(d2.renderer.state.frame_count) == fc
    driver.settings.accumulate = False


def test_missing_file_error(driver):
    with pytest.raises(FileNotFound):
        driver.load_gltf_path("/nonexistent.glb")


def test_flythrough(tmp_path, driver):
    driver.settings.blit_mode = BlitMode.PATHTRACE
    frames = driver.run_flythrough(
        [np.array([-10, 1, 0], np.float32), np.array([-8, 1, 0], np.float32)],
        frames_per_leg=3, out_dir=str(tmp_path / "fly"))
    assert len(frames) == 3
    assert os.path.exists(tmp_path / "fly" / "frame_0002.png")


def test_queries_scope():
    q = Queries(max_queries=2)
    q.start_frame()
    with q.scope("a"):
        pass
    with q.scope("b"):
        pass
    with q.scope("c"):  # over budget: dropped (QueriesOptions::new(10) cap)
        pass
    q.resolve()
    q.end_frame()
    assert q.labels() == ["a", "b"]


def test_checkpoint_roundtrip_orbax(tmp_path, driver):
    from loupiote_tpu.app.checkpoint import (load_session_orbax,
                                             save_session_orbax)

    driver.settings.blit_mode = BlitMode.PATHTRACE
    driver.settings.accumulate = True
    driver.step(dt=0.016)
    driver.step(dt=0.016)
    path = str(tmp_path / "ckpt_orbax")
    save_session_orbax(path, driver.renderer)
    before = np.asarray(driver.renderer.state.accum).copy()
    fc = int(driver.renderer.state.frame_count)

    d2 = Driver(size=(64, 64), config=RenderConfig(downsample_factor=0.5))
    load_session_orbax(path, d2.renderer)
    np.testing.assert_array_equal(np.asarray(d2.renderer.state.accum), before)
    assert int(d2.renderer.state.frame_count) == fc
    driver.settings.accumulate = False


def test_typed_error_paths(driver, tmp_path):
    """The reference's Error variants actually fire here
    (errors.rs:1-20): AccelBuild on bad geometry,
    TextureToBufferReadFail on readback-write failure."""
    import numpy as np

    from loupiote_tpu.accel.bvh import build_bvh
    from loupiote_tpu.errors import AccelBuild, TextureToBufferReadFail

    with pytest.raises(AccelBuild):
        build_bvh(np.full((1, 3), np.nan, np.float32),
                  np.zeros((1, 3), np.float32),
                  np.zeros((1, 3), np.float32))
    with pytest.raises(TextureToBufferReadFail):
        driver.save_screenshot(str(tmp_path / "no_dir" / "x" / "shot.png"))


def test_screenshot_at_window_resolution(driver, tmp_path):
    """Screenshots are written at WINDOW resolution even when the internal
    render runs at 0.5x (renderer.rs:727-811 readback parity)."""
    from PIL import Image

    p = str(tmp_path / "shot.png")
    driver.save_screenshot(p)
    assert Image.open(p).size == tuple(driver.renderer.window_size)
