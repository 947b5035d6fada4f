"""CLI + GUI-analog + input-manager tests."""

import json
import os

import numpy as np
import pytest

from loupiote_tpu.app.gui import (error_window, performance_window,
                                  render_status, scene_info_window,
                                  toolbar_state)
from loupiote_tpu.app.input import Event, InputManager
from loupiote_tpu.config import RenderConfig

CORNELL = "/root/reference/assets/cornell-box.glb"


def test_cli_info(capsys):
    from loupiote_tpu.__main__ import main

    main(["info", CORNELL])
    out = json.loads(capsys.readouterr().out)
    assert out["meshes"] == 5
    assert out["triangles"] == 34


def test_cli_render(tmp_path, capsys):
    from loupiote_tpu.__main__ import main

    out = str(tmp_path / "o.png")
    main(["render", CORNELL, out, "--spp", "2", "--size", "64x64",
          "--scale", "1.0", "--mode", "pathtrace",
          "--camera", "0,0.6,12,0,0,-1"])
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (64, 64, 4)
    assert img[..., :3].mean() > 1  # not black


def test_cli_multi_scene_session(tmp_path, capsys):
    """Several positional scenes merge into one session, each optionally
    translated (default-session analog, standalone/lib.rs:109-126)."""
    from loupiote_tpu.__main__ import _setup, main

    class A:
        scene = [CORNELL, CORNELL + "@0,8,0"]
        env = None
        size = "32x32"
        scale = 1.0
        bounces = 1
        mode = "pathtrace"
        camera = "0,0.6,12,0,0,-1"
        blue_noise = False
        seed = 0
        fit_light = None

    d = _setup(A())
    from loupiote_tpu.scene import Scene, load_gltf_path

    one = Scene.default()
    load_gltf_path(CORNELL, one)
    n1 = len(one.instances)
    assert len(d.scene.instances) == 2 * n1
    # The second copy is translated +8y.
    lo = min(i.model_to_world[1, 3] for i in d.scene.instances[n1:])
    lo1 = min(i.model_to_world[1, 3] for i in d.scene.instances[:n1])
    assert lo == pytest.approx(lo1 + 8.0)


@pytest.fixture(scope="module")
def driver():
    from loupiote_tpu.app import Driver

    d = Driver(size=(32, 32), config=RenderConfig(downsample_factor=1.0,
                                                  denoise=False))
    d.load_gltf_path(CORNELL)
    d.upload_scene()
    from loupiote_tpu.config import BlitMode

    d.settings.blit_mode = BlitMode.PATHTRACE
    d.step(dt=0.016)
    return d


def test_gui_windows(driver):
    info = scene_info_window(driver)
    assert info["meshes"] == 5
    assert "adapter" in info
    perf = performance_window(driver)
    assert perf["fps"] > 0
    assert "raytrace" in perf["passes"]
    tb = toolbar_state(driver.settings)
    assert set(tb["blit_modes"]) == {
        "pathtrace", "denoised_pathtrace", "temporal", "gbuffer",
        "motion_vector"}
    assert error_window(None)["error"] is None
    assert "ValueError" in error_window(ValueError("boom"))["error"]
    status = render_status(driver)
    assert "fps" in status and "meshes" in status


def test_input_manager(driver):
    im = InputManager()
    acc0 = driver.settings.accumulate
    im.handle_key(driver, " ", True)
    assert driver.settings.accumulate != acc0
    im.handle_key(driver, " ", True)

    im.handle_key(driver, "w", True)
    from loupiote_tpu.render.camera import CameraMoveCommand

    assert driver.camera_controller.commands & CameraMoveCommand.FORWARD
    im.handle_key(driver, "w", False)
    assert not (driver.camera_controller.commands & CameraMoveCommand.FORWARD)


def test_input_events(driver, tmp_path):
    im = InputManager()
    shot = str(tmp_path / "evt.png")
    im.handle_event(driver, Event("save_screenshot", shot))
    assert os.path.exists(shot)
