"""Renderer-level multi-chip tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from loupiote_tpu.config import BlitMode, RenderConfig
from loupiote_tpu.parallel import make_mesh
from loupiote_tpu.render import Renderer

from test_render import CORNELL_CAM, cornell_with_light


pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def cornell_bufs(cornell_scene):
    from loupiote_tpu.scene import build_scene_buffers

    return build_scene_buffers(cornell_with_light(cornell_scene))


def test_multichip_renderer_matches_single(cornell_bufs):
    mesh = make_mesh(n_tiles=4, n_spp=2)
    cfg = RenderConfig(downsample_factor=1.0, denoise=False)

    rm = Renderer((32, 32), cfg, mesh=mesh)
    rm.set_resources(cornell_bufs)
    rm.accumulate = True
    r1 = Renderer((32, 32), cfg)
    r1.set_resources(cornell_bufs)
    r1.accumulate = True

    for _ in range(6):
        rm.raytrace(CORNELL_CAM)
        r1.raytrace(CORNELL_CAM)

    a = np.asarray(rm.state.accum)
    b = np.asarray(r1.state.accum)
    assert np.isfinite(a).all()
    assert int(rm.state.frame_count) == int(r1.state.frame_count) == 7
    # Different RNG streams but same integrand: means agree.
    assert abs(a.mean() - b.mean()) < 0.15 * b.mean() + 0.02
    # spp axis: multi-chip frame averages 2 samples -> lower variance is
    # plausible but not asserted (noisy at 6 frames).
    img = rm.blit()
    assert img.shape == (32, 32, 3)


def test_multichip_denoised_mode(cornell_bufs):
    mesh = make_mesh(n_tiles=8, n_spp=1)
    rm = Renderer((32, 32), RenderConfig(downsample_factor=1.0), mesh=mesh)
    rm.set_resources(cornell_bufs)
    rm.set_blit_mode(BlitMode.DENOISED_PATHTRACE)
    for _ in range(3):
        rm.raytrace(CORNELL_CAM)
    out = np.asarray(rm.state.denoised)
    assert np.isfinite(out).all()
    assert out.mean() > 0.01
    assert float(np.asarray(rm.state.asvgf_history).mean()) > 1.0


def test_multichip_height_rounding():
    # Size-logic only: rendering at a third distinct shape would compile a
    # third full sharded-frame program (~minutes on the CPU test mesh) for
    # no extra coverage — the sharded render itself is exercised above.
    mesh = make_mesh(n_tiles=8, n_spp=1)
    rm = Renderer((64, 36), RenderConfig(downsample_factor=1.0,
                                         denoise=False), mesh=mesh)
    # 36 rows don't divide by 8 tiles -> rounded down to 32.
    assert rm.get_size()[1] % 8 == 0
    assert rm.get_size() == (64, 32)
    assert rm.state.accum.shape == (32, 64, 3)
