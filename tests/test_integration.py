"""End-to-end integration: the reference's own configs + full workflows.

The reference's integration story is launch files over real scenes
(launch/tests/radar_sim_test.launch: oru4 indoor free-running;
launch/mulran_sim.launch: KAIST bag sync) and the dev/opti action loop
(scripts/radaray_opti.py). These tests replay those workflows natively on
synthetic stand-in geometry.
"""

import pathlib

import numpy as np
import jax
import pytest

from radarays_ros_tpu.geom.primitives import make_box
from radarays_ros_tpu.geom.scene import Scene
from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.radar import Radar

REF = pathlib.Path("/root/reference")


@pytest.fixture(scope="module")
def indoor_scene():
    """An 18-object indoor stand-in for the oru4 lab scene (the reference
    object_materials maps exactly 18 mesh objects)."""
    rng = np.random.default_rng(9)
    parts = [make_box((0, 0, 0), (30.0, 30.0, 6.0))[:, ::-1, :]]  # hallway shell
    for _ in range(17):
        c = rng.uniform(-12, 12, 2)
        parts.append(make_box((c[0], c[1], 0), (*rng.uniform(0.5, 3.0, 2), 4.0)))
    return Scene.compose(parts, [f"obj_{i}" for i in range(18)], chunk_size=32)


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_oru4_config_full_frame(indoor_scene):
    """Load the reference's structured oru4_test.yaml and render a frame —
    the radar_sim_test.launch workflow."""
    from radarays_ros_tpu.io.config import load_scene_config

    sc = load_scene_config(REF / "config" / "oru4_test.yaml")
    assert sc.object_materials.shape[0] == 18
    params = sc.radar_params(beam_width_deg=8.0)
    cfg = RadarModelConfig(
        n_angles=32, n_cells=256, n_samples=5, n_reflections=2,
        resolution=0.25, signal_denoising=1,
        signal_denoising_triangular_width=7,
        signal_denoising_triangular_mode=0.4, ambient_noise=2,
        material_id_air=sc.material_id_air)
    radar = Radar(indoor_scene, params, cfg)
    # glass has velocity 0.03 > 0 -> refraction lives -> NOT opaque mode
    assert not radar.cfg.opaque_materials
    img = radar.simulate_image()
    assert img.shape == (256, 32)
    assert img.max() > 0  # walls visible


@pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")
def test_mulran_preset_frame(indoor_scene):
    """The tuned KAIST preset drives a frame end-to-end (scaled down)."""
    from radarays_ros_tpu.io.config import load_preset, load_scene_config

    sc = load_scene_config(REF / "config" / "mulran_kaist02.yaml")
    cfg, bw, _ = load_preset(REF / "cfg" / "mulran_kaist_dyncfg_minimal.yaml")
    cfg = cfg.replace(n_angles=32, n_cells=256, material_id_air=sc.material_id_air)
    obj_mat = np.resize(sc.object_materials, 18)
    params = RadarParams.make(sc.materials, obj_mat, beam_width_deg=bw or 8.0)
    radar = Radar(indoor_scene, params, cfg)
    # wall-stone velocity 0 -> the opaque fast path must auto-enable
    assert radar.cfg.opaque_materials
    img = radar.simulate_image()
    assert img.shape == (256, 32)
    assert img.max() > 0


def test_full_opti_workflow(indoor_scene, simple_materials):
    """The radaray_opti.py loop, natively: GetRadarParams -> param vector ->
    black-box optimize over GenRadarImage goals -> improved PSNR."""
    from radarays_ros_tpu.opti.metrics import psnr
    from radarays_ros_tpu.opti.optimize import ParamVector, optimize_black_box
    from radarays_ros_tpu.opti.workload import RadarImageServer, params_to_msg

    cfg = RadarModelConfig(
        n_angles=16, n_cells=96, n_samples=3, n_reflections=1,
        resolution=0.5, signal_denoising=0, ambient_noise=0)
    params_true = RadarParams.make(simple_materials, [1, 2] + [1] * 16,
                                   beam_width_deg=4.0)
    server = RadarImageServer(Radar(indoor_scene, params_true, cfg))
    real = server.gen_radar_image()  # "recorded" frame

    # perturb the wall material, as if starting from a wrong guess
    m = params_true.materials
    params_wrong = params_true._replace(
        materials=m._replace(ambient=m.ambient.at[1].set(0.3)))
    server.radar.update_params(params_wrong)

    pv = ParamVector(material_slots=(1,), tune_n_reflections=False,
                     tune_beam_width=False)
    start_psnr = float(psnr(real.astype(np.float32),
                            server.gen_radar_image().astype(np.float32)))

    def objective(vec):
        p, _ = pv.to_params(server.radar.params, vec)
        sim = server.gen_radar_image(
            goal_params=params_to_msg(p, cfg.n_samples, cfg.n_reflections))
        return -float(psnr(real.astype(np.float32), sim.astype(np.float32)))

    x, fx, _ = optimize_black_box(
        objective, pv.bounds(), n_seeds=6, iters=10, seed=3,
        x0=pv.to_vec(params_wrong))
    assert -fx > start_psnr  # optimization improved the match
