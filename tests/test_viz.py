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


# ---------------------------------------------------------------- panels

def test_beam_panel_distributions():
    from radarays_ros_tpu.viz.beams import beam_panel

    panel = beam_panel(width_deg=8.0, n_samples=4000, p_in_cone=0.8, seed=1)
    assert set(panel) == {"D1_uniform_radius", "D2_uniform_disk",
                          "D3_normal", "D4_sqrt_normal"}
    # D1/D2 are bounded by the cone: everything inside
    assert panel["D1_uniform_radius"]["frac_in_cone"] == pytest.approx(1.0)
    assert panel["D2_uniform_disk"]["frac_in_cone"] == pytest.approx(1.0)
    # D3 lands ~p_in_cone of samples inside (|N(0,1)| <= z with p = 0.8
    # two-sided -> the reference's contract)
    assert panel["D3_normal"]["frac_in_cone"] == pytest.approx(0.8, abs=0.03)
    # uniform-in-disk has more mass at large radii than uniform-in-radius
    h1 = np.asarray(panel["D1_uniform_radius"]["r_hist"], float)
    h2 = np.asarray(panel["D2_uniform_disk"]["r_hist"], float)
    assert h2[-8:].sum() / h2.sum() > h1[-8:].sum() / h1.sum()


def test_brdf_curve_shape():
    from radarays_ros_tpu.viz.brdf import brdf_curve

    c = brdf_curve(ambient=0.2, diffuse=0.5, specular=100.0, n_points=91)
    e = np.asarray(c["energy"])
    # at normal incidence: A + B; at grazing: ~A
    assert e[0] == pytest.approx(0.7, abs=1e-5)
    assert e[-1] == pytest.approx(0.2, abs=1e-3)
    assert np.all(np.diff(e) <= 1e-6)  # monotone decreasing


def test_fresnel_curve_physics():
    from radarays_ros_tpu.viz.brdf import fresnel_curve

    c = fresnel_curve(v1=0.3, v2=0.15)  # entering a slower medium
    R = np.asarray(c["reflectance"])
    T = np.asarray(c["transmittance"])
    np.testing.assert_allclose(R + T, 1.0, atol=1e-5)  # energy conservation
    assert R[-1] > 0.9          # grazing -> near-total reflection
    assert not any(c["total_internal_reflection"])  # slow medium: no TIR

    c2 = fresnel_curve(v1=0.15, v2=0.3)  # exiting into a faster medium
    assert any(c2["total_internal_reflection"])     # TIR beyond critical angle


def test_slab_explorer_energy_and_snell():
    """2-D multi-media explorer (scripts/reflections/snell_multi.py class):
    energy conservation at each split and Snell refraction across the slab."""
    import numpy as np

    from radarays_ros_tpu.viz.reflections import propagate_slab_rays

    out = propagate_slab_rays(
        depths=[0.0, -0.2], velocities=[0.3, 0.15, 0.3],
        origin=(0.0, 0.5), direction=(0.6, -0.8), n_bounces=3)
    segs = out["segments"]
    assert len(segs) >= 3
    # first segment: from the origin down to the first interface
    assert segs[0]["p1"][1] == pytest.approx(0.0, abs=1e-9)
    assert segs[0]["energy"] == 1.0

    # the two children of the first hit carry Reff + Teff = 1 (one-bounce
    # run so no later generation also originates at y = 0)
    out1 = propagate_slab_rays(
        depths=[0.0, -0.2], velocities=[0.3, 0.15, 0.3],
        origin=(0.0, 0.5), direction=(0.6, -0.8), n_bounces=1)
    children = [s for s in out1["segments"] + out1["leaks"]
                if abs(np.asarray(s["p0"])[1]) < 1e-5]
    assert sum(c["energy"] for c in children) == pytest.approx(1.0, rel=1e-5)

    # refraction into the slower medium bends TOWARD the normal
    inside = [s for s in segs if s["medium"] == 1]
    assert inside
    d_in = np.asarray(inside[0]["p1"]) - np.asarray(inside[0]["p0"])
    d_in /= np.linalg.norm(d_in)
    sin_in = abs(d_in[0])
    # Snell with n ~ 1/v: sin_t = sin_i * v2/v1 = 0.6 * 0.5
    assert sin_in == pytest.approx(0.3, abs=1e-4)


def test_slab_explorer_total_internal_reflection():
    """A shallow ray inside the fast-to-slow... slow-to-fast interface
    beyond the critical angle reflects totally (no refraction child)."""
    from radarays_ros_tpu.viz.reflections import propagate_slab_rays

    # start inside the slow slab, shallow ray upward: sin_i = ~0.94 > v1/v2
    out = propagate_slab_rays(
        depths=[0.0, -0.5], velocities=[0.3, 0.15, 0.3],
        origin=(0.0, -0.25), direction=(0.94, 0.34), n_bounces=1)
    kids = [s for s in out["segments"] + out["leaks"]
            if abs(s["p0"][1]) < 1e-5]
    assert len(kids) == 1            # reflection only
    assert kids[0]["energy"] == pytest.approx(1.0, rel=1e-5)
    assert kids[0]["medium"] == 1    # still inside the slab


def test_explore_panels_render(tmp_path):
    """The standalone explorer (cli explore) renders every panel: data dict
    + a savable matplotlib figure (scripts/reflections/ etc. as a tool)."""
    from radarays_ros_tpu.viz import explore

    data, fig = explore.panel_brdf(1.0, 0.2, 30.0, plot=True)
    assert len(data["energy"]) == len(data["angle_rad"])
    data, fig2 = explore.panel_fresnel(0.3, 0.15, plot=True)
    assert max(data["reflectance"]) <= 1.0 + 1e-6
    data, fig3 = explore.panel_slab([0.0, -0.2], [0.3, 0.15, 0.3], plot=True)
    assert data["segments"]
    data, fig4 = explore.panel_beams(n_samples=200, plot=True)
    assert len(data) == 4
    for i, f in enumerate([fig, fig2, fig3, fig4]):
        assert f is not None
        f.savefig(tmp_path / f"panel{i}.png")


def test_explore_cli(tmp_path):
    from radarays_ros_tpu.io.cli import main

    out = tmp_path / "fresnel.json"
    rc = main(["explore", "--panel", "fresnel", "--v1", "0.3", "--v2",
               "0.15", "--json", str(out)])
    assert rc == 0
    import json as _json

    data = _json.loads(out.read_text())
    assert "reflectance" in data and "refraction_angle_deg" in data


def test_interactive_explorers_drive_sliders():
    """The live slider explorers (cli explore --interactive) recompute
    through the SAME wave/ physics on slider moves — driven headlessly by
    programmatic set_val (Agg backend; widgets still dispatch)."""
    import matplotlib
    matplotlib.use("Agg")
    from radarays_ros_tpu.viz import explore

    fig, _upd = explore.interactive_brdf(1.0, 0.2, 30.0)
    (line,) = fig.axes[0].lines
    before = np.array(line.get_ydata(), float)
    s_amb = fig._sliders[0]
    s_amb.set_val(1.7)  # raises the constant term everywhere
    after = np.array(line.get_ydata(), float)
    assert np.all(after >= before - 1e-6) and after[0] > before[0] + 0.4

    fig2, _ = explore.interactive_fresnel(0.3, 0.15, 0.5)
    l_r = fig2.axes[0].lines[0]
    r_before = np.array(l_r.get_ydata(), float)
    fig2._sliders[1].set_val(0.0)  # v2 -> 0: everything reflects
    r_after = np.array(l_r.get_ydata(), float)
    assert not np.allclose(r_before, r_after)
    np.testing.assert_allclose(r_after, 1.0, atol=1e-3)

    fig3, _ = explore.interactive_beams(8.0, n_samples=200)
    sc = fig3.axes[0].collections[0]
    before3 = sc.get_offsets().data.copy()
    fig3._sliders[0].set_val(20.0)  # wider cone -> wider spread
    after3 = sc.get_offsets().data
    assert np.abs(after3).max() > np.abs(before3).max() * 1.5

    import matplotlib.pyplot as plt
    plt.close("all")


def test_explore_interactive_cli_rejects_slab():
    from radarays_ros_tpu.io.cli import main

    rc = main(["explore", "--panel", "slab", "--interactive"])
    assert rc == 2


def test_polar_to_cartesian_geometry():
    """A bright cell at range r, azimuth column a lands at
    (r cos th_a, r sin th_a) in the view (x up, y left; th_a = -2pi a/A),
    matching polar_to_points (io/image_io.py)."""
    from radarays_ros_tpu.viz.cartesian import polar_to_cartesian

    n_cells, A = 64, 16
    img = np.zeros((n_cells, A), np.uint8)
    img[40, 0] = 200    # straight ahead (+x = up in the view)
    img[40, 4] = 100    # a quarter turn: th = -pi/2 -> y = -40 (right)
    cart = polar_to_cartesian(img, size=129, bilinear=False)
    half = 64
    scale = half / (n_cells - 1)
    # +x is up: row = half - 40*scale
    assert cart[half - int(round(40 * scale)), half] == 200
    # th=-pi/2: y=-40 -> col = half + 40*scale
    assert cart[half, half + int(round(40 * scale))] == 100
    # outside the disc is zero
    assert cart[0, 0] == 0


def test_imaging_stats_and_compare_self_zero():
    from radarays_ros_tpu.viz.cartesian import (
        compare_imaging_stats, imaging_stats)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 20, size=(256, 64)).astype(np.uint8)
    img[10:20, 5] = 200
    st = imaging_stats(img)
    assert 0.0 < st["return_fraction"] < 0.05
    cmp_self = compare_imaging_stats(st, st)
    assert all(v == 0.0 for v in cmp_self.values())


def test_cartesian_stats_roundtrip_close():
    """Rendering a polar frame to cartesian and measuring there must land
    near the polar statistics (same distributions, resampled grid)."""
    from radarays_ros_tpu.viz.cartesian import (
        cartesian_stats, compare_imaging_stats, imaging_stats,
        polar_to_cartesian)

    rng = np.random.default_rng(1)
    img = (rng.random((128, 32)) * 24).astype(np.uint8)
    img[30:40, :] = 180                      # a bright ring
    pol = imaging_stats(img)
    cart = cartesian_stats(polar_to_cartesian(img, size=257))
    d = compare_imaging_stats(pol, cart)
    assert d["return_fraction_delta"] < 0.05
    assert d["noise_floor_tv_distance"] < 0.35


def test_render_cli(tmp_path):
    from radarays_ros_tpu.io.cli import main
    from radarays_ros_tpu.io.image_io import read_png_gray, write_png_gray

    rng = np.random.default_rng(2)
    frame = (rng.random((128, 32)) * 24).astype(np.uint8)
    frame[50:60, 10:20] = 220
    fp = tmp_path / "frame.png"
    write_png_gray(fp, frame)
    out = tmp_path / "cart.png"
    stats = tmp_path / "stats.json"
    rc = main(["render", "--frame", str(fp), "--out", str(out), "--stretch",
               "--against-polar", str(fp), "--stats-out", str(stats)])
    assert rc == 0
    img = read_png_gray(out)
    assert img.shape == (800, 800) and img.max() > 0
    import json as _json

    rep = _json.loads(stats.read_text())
    # self-comparison distances are exactly zero
    assert all(v == 0.0 for v in rep["polar_comparison"].values())
