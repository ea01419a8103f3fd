"""Regenerate the committed demo/eval artifacts (docs/).

Renders one full 400x3424 KAIST-preset frame on the canyon demo scene
(geom/primitives.py:make_canyon_scene — the KAIST02-class regime scene,
VERDICT r4 #5: dense facades + street clutter bring the polar return
fraction within ~2x of the reference's published simulated panel), then:

  * docs/demo_polar_kaist_preset.png      — the polar frame;
  * docs/cartesian_kaist_demo.png         — papercolor cartesian view;
  * docs/polar_panels_real_refsim_ours.png — real | ref-sim | ours panels;
  * prints the imaging-stats comparison JSON for docs/EVAL_VS_PUBLISHED.md.

Run on the TPU (one ~10 min first compile): python -u benchmarks/make_demo.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOCS = Path(__file__).resolve().parent.parent / "docs"
REF_FIG = Path("/root/reference/dat/kaist02_radarays_papercolor.png")

# the canyon demo scene configuration (measured round 5: return fraction
# 0.114 at 64 azimuths on CPU — within 2x of the ref sim panel's 0.154)
SCENE_KW = dict(n_blocks=12, street_w=12.0, block_len=18.0, seed=3,
                clutter=2.5)


def build_frame():
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.geom.primitives import make_canyon_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.sim.config import (Materials, RadarModelConfig,
                                             RadarParams)
    from radarays_ros_tpu.sim.pipeline import simulate_frame
    from radarays_ros_tpu.utils.transforms import make_pose

    parts, names = make_canyon_scene(**SCENE_KW)
    scene = Scene.compose(parts, names, chunk_size=256)
    sa = jax.device_put(scene.device_arrays())
    mats = Materials.from_list([
        dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
        dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0)])
    params = RadarParams.make(mats, np.ones(scene.n_objects, np.int32),
                              10.0)
    cfg = RadarModelConfig(
        n_angles=400, n_cells=3424, resolution=0.0595238,
        n_samples=50, n_reflections=4, beam_sample_dist=2,
        beam_sample_dist_normal_p_in_cone=0.8, energy_max=0.72,
        signal_max=110.0, signal_denoising=1,
        signal_denoising_triangular_width=35,
        signal_denoising_triangular_mode=0.35,
        ambient_noise=2, ambient_noise_at_signal_0=0.1,
        ambient_noise_at_signal_1=0.03, ambient_noise_energy_max=0.1,
        ambient_noise_energy_min=0.05,
        record_multi_reflection=True, record_multi_path=False,
        opaque_materials=True)
    t0 = time.perf_counter()
    r = simulate_frame(sa, params, cfg, jnp.asarray(make_pose([0., 0., 2.])),
                       jax.random.PRNGKey(0))
    img = np.asarray(r.image_u8)
    print(f"frame: {scene.n_triangles} tris, "
          f"{time.perf_counter() - t0:.1f}s (incl. compile)", flush=True)
    return img


def main():
    import pathlib

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from radarays_ros_tpu.io.image_io import (read_image_gray,
                                              write_png_gray, write_png_rgb)
    from radarays_ros_tpu.viz.cartesian import (colorize_papercolor,
                                                compare_imaging_stats,
                                                imaging_stats,
                                                polar_to_cartesian,
                                                stretch_contrast)

    img = build_frame()
    write_png_gray(DOCS / "demo_polar_kaist_preset.png", img)
    print(f"wrote {DOCS / 'demo_polar_kaist_preset.png'}", flush=True)

    cart = polar_to_cartesian(img, size=800,
                              max_cell=int(round(90.0 / 0.0595238)))
    write_png_rgb(DOCS / "cartesian_kaist_demo.png",
                  colorize_papercolor(stretch_contrast(cart)))
    print(f"wrote {DOCS / 'cartesian_kaist_demo.png'}", flush=True)

    ref = read_image_gray(str(REF_FIG))
    real = ref[0:761, 0:375]
    refsim = ref[0:761, 1515:1889]
    ours = img[:761]
    panel = np.concatenate(
        [real, np.full((761, 8), 255, real.dtype),
         refsim, np.full((761, 8), 255, real.dtype),
         ours.astype(real.dtype)], axis=1)
    write_png_gray(DOCS / "polar_panels_real_refsim_ours.png", panel)
    print(f"wrote {DOCS / 'polar_panels_real_refsim_ours.png'}", flush=True)

    s_real = imaging_stats(real)
    s_ref = imaging_stats(refsim)
    s_ours = imaging_stats(ours)
    out = {
        "scene": SCENE_KW,
        "real": {k: s_real[k] for k in
                 ("noise_floor_mean", "noise_floor_std", "return_fraction",
                  "dynamic_range_per_column_mean")},
        "refsim": {k: s_ref[k] for k in
                   ("noise_floor_mean", "noise_floor_std", "return_fraction",
                    "dynamic_range_per_column_mean")},
        "ours": {k: s_ours[k] for k in
                 ("noise_floor_mean", "noise_floor_std", "return_fraction",
                  "dynamic_range_per_column_mean")},
        "ours_vs_real": compare_imaging_stats(s_ours, s_real),
        "ours_vs_refsim": compare_imaging_stats(s_ours, s_ref),
    }
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
