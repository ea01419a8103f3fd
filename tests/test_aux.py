"""Auxiliary subsystem tests: profiling timers, checkpoint/resume."""

import numpy as np
import pytest

from radarays_ros_tpu.opti.checkpoint import load_checkpoint, save_checkpoint
from radarays_ros_tpu.sim.config import Materials, RadarParams
from radarays_ros_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2
    assert t.counts["b"] == 1
    assert t.total >= 0.0
    s = t.summary()
    assert "a:" in s and "b:" in s and "total" in s


def test_stage_timer_disabled_is_noop():
    t = StageTimer(enabled=False)
    with t.stage("x"):
        pass
    assert t.totals == {}


def test_checkpoint_roundtrip(tmp_path, simple_materials):
    params = RadarParams.make(simple_materials, [1, 2, 0], beam_width_deg=5.0)
    hist = [3.0, 2.0, 1.5]
    vec = np.array([1.0, 2.0])
    p = tmp_path / "ck.npz"
    save_checkpoint(p, params, vec=vec, history=hist, step=7,
                    meta={"n_reflections": 4})
    params2, extras = load_checkpoint(p)
    np.testing.assert_allclose(np.asarray(params2.materials.velocity),
                               np.asarray(params.materials.velocity))
    np.testing.assert_array_equal(np.asarray(params2.object_materials),
                                  [1, 2, 0])
    assert float(params2.beam_width) == pytest.approx(np.deg2rad(5.0))
    assert extras["step"] == 7
    np.testing.assert_allclose(extras["vec"], vec)
    np.testing.assert_allclose(extras["history"], hist)
    assert int(extras["n_reflections"]) == 4


def test_checkpoint_atomic_overwrite(tmp_path, simple_materials):
    params = RadarParams.make(simple_materials, [0], beam_width_deg=2.0)
    p = tmp_path / "ck.npz"
    save_checkpoint(p, params, step=1)
    save_checkpoint(p, params, step=2)
    _, extras = load_checkpoint(p)
    assert extras["step"] == 2
    assert list(tmp_path.glob("*.tmp")) == []


def test_radar_verbose_timing(box_scene, simple_materials, capsys):
    from radarays_ros_tpu.sim.config import RadarModelConfig
    from radarays_ros_tpu.sim.radar import Radar

    cfg = RadarModelConfig(n_angles=8, n_cells=32, n_samples=2,
                           n_reflections=1, resolution=0.5,
                           signal_denoising=0, ambient_noise=0)
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    radar = Radar(box_scene, params, cfg, verbose_timing=True)
    radar.simulate()
    out = capsys.readouterr().out
    assert "[radar]" in out and "ms" in out
    assert radar.timer.counts["frame"] == 1
