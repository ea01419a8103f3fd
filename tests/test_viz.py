"""Ray-reflection debug trace tests — the reference's visual checks
(ray_reflection_test.cpp:169-354) as assertions (SURVEY.md §4.1)."""

import numpy as np
import pytest

from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.utils.transforms import identity_pose
from radarays_ros_tpu.viz.rays import segments_to_polylines, trace_debug_rays


@pytest.fixture(scope="module")
def debug_cfg():
    return RadarModelConfig(
        n_angles=8, n_cells=64, n_samples=8, n_reflections=2,
        resolution=0.5, signal_denoising=0, ambient_noise=0)


def test_single_ray_bounces_inside_box(box_scene, simple_materials, debug_cfg):
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    res = trace_debug_rays(box_scene.device_arrays(), params, debug_cfg,
                           identity_pose(), yaw=0.0, n_bounces=3, mode="single")
    segs = res["segments"]
    assert res["n_rays"] == 1
    assert len(segs) >= 3  # primary + its children all hit the closed box
    first = segs[0]
    assert first["kind"] == "primary"
    assert first["medium"] == "air"
    # +x ray from origin hits the pillar face at x = 7 (pillar spans 7..9)
    assert first["end"][0] == pytest.approx(7.0, abs=1e-3)
    # energies never exceed the unit transmit energy
    assert all(s["energy"] <= 1.0 + 1e-6 for s in segs)
    # reflection children lose energy vs their parent
    kinds = {s["kind"] for s in segs}
    assert "reflection" in kinds


def test_refraction_enters_material(box_scene, simple_materials, debug_cfg):
    """Material 1 has velocity 0.15 > 0 -> refraction transmits into it."""
    params = RadarParams.make(simple_materials, [1, 1], beam_width_deg=2.0)
    res = trace_debug_rays(box_scene.device_arrays(), params, debug_cfg,
                           identity_pose(), yaw=0.0, n_bounces=3, mode="single")
    media = {s["medium"] for s in res["segments"]}
    assert "material" in media  # green segments exist (inside the wall)


def test_fan_mode_counts(box_scene, simple_materials, debug_cfg):
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=2.0)
    res = trace_debug_rays(box_scene.device_arrays(), params, debug_cfg,
                           identity_pose(), n_bounces=1, mode="fan", n_fan=36)
    assert res["n_rays"] == 36
    # closed box: every fan ray hits
    assert len(res["segments"]) == 36


def test_cone_mode_uses_config_samples(box_scene, simple_materials, debug_cfg):
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=8.0)
    res = trace_debug_rays(box_scene.device_arrays(), params, debug_cfg,
                           identity_pose(), n_bounces=1, mode="cone")
    assert res["n_rays"] == debug_cfg.n_samples


def test_polyline_grouping(box_scene, simple_materials, debug_cfg):
    params = RadarParams.make(simple_materials, [1, 1], beam_width_deg=2.0)
    res = trace_debug_rays(box_scene.device_arrays(), params, debug_cfg,
                           identity_pose(), yaw=0.5, n_bounces=3, mode="single")
    groups = segments_to_polylines(res)
    assert set(groups) == {"air", "material"}
    assert len(groups["air"]) + len(groups["material"]) == len(res["segments"])
