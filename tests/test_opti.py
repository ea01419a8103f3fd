"""Optimization-track tests: metrics, param vector parity, optimizers,
GenRadarImage workload."""

import numpy as np
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.opti.metrics import (
    mse, mutual_information, normalized_mutual_information, psnr, ssim)
from radarays_ros_tpu.opti.optimize import (
    ParamVector, optimize_black_box, optimize_gradient)
from radarays_ros_tpu.sim.config import RadarParams


# ---------------------------------------------------------------- metrics

def test_psnr_identity_is_large(rng):
    a = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    assert float(psnr(a, a)) > 100.0


def test_psnr_known_value():
    a = np.zeros((16, 16), np.float32)
    b = np.full((16, 16), 16.0, np.float32)  # mse = 256 -> psnr = 10log10(255^2/256)
    expect = 10 * np.log10(255.0**2 / 256.0)
    assert float(psnr(a, b)) == pytest.approx(expect, abs=1e-4)


def test_ssim_bounds(rng):
    a = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    assert float(ssim(a, b)) < 0.9


def test_mutual_information_orders(rng):
    a = rng.uniform(0, 255, (24, 24)).astype(np.float32)
    noise = rng.normal(0, 5, a.shape).astype(np.float32)
    b_close = np.clip(a + noise, 0, 255)
    b_far = rng.uniform(0, 255, a.shape).astype(np.float32)
    assert float(mutual_information(a, b_close)) > float(mutual_information(a, b_far))
    assert float(normalized_mutual_information(a, a)) > float(
        normalized_mutual_information(a, b_far))


# ---------------------------------------------------------------- param vec

def _params(simple_materials):
    return RadarParams.make(simple_materials, [1, 2], beam_width_deg=8.0)


def test_param_vector_roundtrip(simple_materials):
    pv = ParamVector(material_slots=(1, 2))
    params = _params(simple_materials)
    vec = pv.to_vec(params, n_reflections=3)
    assert vec.shape == (10,)  # reference 10-dim layout (radaray_opti.py:37-85)
    assert vec[0] == pytest.approx(8.0)
    assert vec[1] == 3.0
    params2, n_ref = pv.to_params(params, vec)
    assert n_ref == 3
    np.testing.assert_allclose(np.asarray(params2.materials.velocity),
                               np.asarray(params.materials.velocity), atol=1e-6)
    assert float(params2.beam_width) == pytest.approx(np.deg2rad(8.0), abs=1e-6)


def test_param_vector_bounds_match_reference(simple_materials):
    pv = ParamVector(material_slots=(1, 3))
    b = pv.bounds()
    assert b.shape == (10, 2)
    np.testing.assert_allclose(b[0], [0.01, 20.0])   # beam_width
    np.testing.assert_allclose(b[1], [0.0, 6.0])     # n_reflections
    np.testing.assert_allclose(b[2], [0.0, 0.3])     # velocity
    np.testing.assert_allclose(b[5], [0.0, 5000.0])  # specular


# ---------------------------------------------------------------- optimizers

def test_black_box_quadratic():
    target = np.array([0.3, -1.0, 2.0])
    bounds = np.array([[-2.0, 2.0], [-3.0, 3.0], [0.0, 4.0]])

    def f(x):
        return float(np.sum((x - target) ** 2))

    x, fx, hist = optimize_black_box(f, bounds, n_seeds=24, iters=80, seed=1)
    assert fx < 1e-3
    np.testing.assert_allclose(x, target, atol=0.05)


def test_gradient_opt_recovers_material(box_scene, simple_materials):
    """Perturb one material, then recover it by gradient descent on the
    frame-difference loss — the end-to-end differentiability claim."""
    import jax

    from radarays_ros_tpu.sim.config import RadarModelConfig
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    scene = box_scene.device_arrays()
    cfg = RadarModelConfig(
        n_angles=8, n_cells=64, n_samples=4, n_reflections=1,
        resolution=0.5, signal_denoising=0, ambient_noise=0)
    key = jax.random.PRNGKey(0)
    params_true = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    pose = identity_pose()

    target = simulate_frame(scene, params_true, cfg, pose, key).image_float

    pv = ParamVector(material_slots=(1,), tune_n_reflections=False,
                     tune_beam_width=False)
    # perturb ambient of material 1
    m = params_true.materials
    params_start = params_true._replace(
        materials=m._replace(ambient=m.ambient.at[1].set(0.4)))

    def loss_of_params(p):
        res = simulate_frame(scene, p, cfg, pose, key)
        return jnp.mean((res.image_float - target) ** 2)

    res = optimize_gradient(loss_of_params, params_start, pv,
                            steps=40, lr=0.1)
    start_loss = float(loss_of_params(params_start))
    assert res.value < start_loss * 0.2  # large reduction
    # ambient of slot 1 moved back toward 1.0
    assert abs(float(res.params.materials.ambient[1]) - 1.0) < \
        abs(0.4 - 1.0)


# ---------------------------------------------------------------- workload

def test_radar_image_server(box_scene, simple_materials):
    from radarays_ros_tpu.opti.workload import RadarImageServer, params_to_msg
    from radarays_ros_tpu.sim.config import RadarModelConfig
    from radarays_ros_tpu.sim.radar import Radar

    cfg = RadarModelConfig(
        n_angles=8, n_cells=64, n_samples=2, n_reflections=1,
        resolution=0.5, signal_denoising=0, ambient_noise=0)
    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    server = RadarImageServer(Radar(box_scene, params, cfg))

    msg = server.get_radar_params()
    assert msg["model"]["beam_width"] == pytest.approx(4.0, abs=1e-4)
    assert len(msg["materials"]["data"]) == 3

    img = server.gen_radar_image()
    assert img.shape == (64, 8)
    assert img.dtype == np.uint8

    # action goal with modified params
    msg["materials"]["data"][1]["ambient"] = 0.5
    img2 = server.gen_radar_image(goal_params=msg)
    assert img2.shape == (64, 8)
    assert float(server.radar.params.materials.ambient[1]) == pytest.approx(0.5)


# ---------------------------------------------------------------- evaluate

def test_evaluate_dirs(tmp_path, rng):
    from radarays_ros_tpu.io.image_io import write_png_gray
    from radarays_ros_tpu.opti.evaluate import evaluate_dirs

    real_d = tmp_path / "real"; real_d.mkdir()
    sim_d = tmp_path / "sim"; sim_d.mkdir()
    for i in range(3):
        a = rng.integers(0, 255, (32, 16), dtype=np.uint8)
        noise = rng.integers(-10, 10, (32, 16))
        b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
        write_png_gray(real_d / f"f{i}.png", a)
        write_png_gray(sim_d / f"f{i}.png", b)
    rep = evaluate_dirs(real_d, sim_d, metrics=("psnr", "ssim", "mae"))
    assert rep["n_frames"] == 3
    assert rep["summary"]["psnr"]["mean"] > 20.0
    assert 0.0 < rep["summary"]["ssim"]["mean"] <= 1.0
    assert rep["summary"]["mae"]["mean"] < 10.0


def test_cli_eval(tmp_path, rng, capsys):
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.image_io import write_png_gray

    real_d = tmp_path / "real"; real_d.mkdir()
    sim_d = tmp_path / "sim"; sim_d.mkdir()
    a = rng.integers(0, 255, (16, 8), dtype=np.uint8)
    write_png_gray(real_d / "f0.png", a)
    write_png_gray(sim_d / "f0.png", a)
    out = tmp_path / "report.json"
    rc = main(["eval", "--real", str(real_d), "--sim", str(sim_d),
               "--metrics", "psnr,mae", "--out", str(out)])
    assert rc == 0
    assert "psnr" in capsys.readouterr().out
    import json as _json
    rep = _json.loads(out.read_text())
    assert rep["summary"]["mae"]["mean"] == 0.0


def test_resume_checkpoint_feeds_jitted_gradient(tmp_path, box_scene,
                                                 simple_materials):
    """Params loaded from a checkpoint must work inside jitted/differentiated
    code (NumPy leaves used to break traced object_materials indexing)."""
    import jax

    from radarays_ros_tpu.opti.checkpoint import load_checkpoint, save_checkpoint
    from radarays_ros_tpu.sim.config import RadarModelConfig
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import identity_pose

    params = RadarParams.make(simple_materials, [1, 2], beam_width_deg=4.0)
    save_checkpoint(tmp_path / "ck.npz", params, step=3)
    resumed, extras = load_checkpoint(tmp_path / "ck.npz")
    assert extras["step"] == 3

    sa = box_scene.device_arrays()
    cfg = RadarModelConfig(n_angles=8, n_cells=32, n_samples=2,
                           n_reflections=1, resolution=0.5,
                           signal_denoising=0, ambient_noise=0)
    key = jax.random.PRNGKey(0)

    def loss(p):
        res = simulate_frame(sa, p, cfg, identity_pose(), key)
        return jnp.sum(res.image_float)

    pv = ParamVector(material_slots=(1,), tune_n_reflections=False,
                     tune_beam_width=True)
    out = optimize_gradient(loss, resumed, pv, steps=2, lr=0.01)
    assert np.isfinite(out.value)
