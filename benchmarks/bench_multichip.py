"""Multi-chip frame benchmark — ready to run the day real chips exist.

Times the sharded pipeline over every available device, both layouts:

  * 1-D "az" mesh:  azimuth data-parallel batched frames (throughput);
  * 2-D "az,smp" mesh: azimuth x beam-sample sharding of ONE frame
    (single-frame latency; shard_map + one psum image combine).

Usage:
  python benchmarks/bench_multichip.py [--buildings 800] [--frames 10]
      [--smp 2] [--cpu-mesh N]

--cpu-mesh N forces an N-virtual-device CPU mesh (smoke mode; the same
command without it uses the real accelerator complement). Every timed
iteration fetches a checksum (relay-proof fencing, see CLAUDE.md).

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buildings", type=int, default=800)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--smp", type=int, default=2,
                    help="sample-axis size of the 2-D mesh")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force an N-virtual-device CPU mesh (smoke mode)")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.parallel.sharding import (
        make_mesh, make_mesh_2d, simulate_frame_sharded,
        simulate_frame_sharded_2d)
    from radarays_ros_tpu.sim.config import (
        Materials, RadarModelConfig, RadarParams)
    from radarays_ros_tpu.utils.transforms import identity_pose

    n_dev = len(jax.devices())
    print(json.dumps({"devices": n_dev, "kind": str(jax.devices()[0])}))

    small = args.cpu_mesh > 0
    parts, names = make_urban_scene(
        n_buildings=args.buildings if not small else 24,
        extent=300.0 if not small else 60.0, seed=7)
    scene = Scene.compose(parts, names, chunk_size=256 if not small else 16)
    sa = jax.device_put(scene.device_arrays())
    materials = Materials.from_list(
        [dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),
         dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0)])
    params = jax.device_put(RadarParams.make(
        materials, np.ones(scene.n_objects, np.int32), beam_width_deg=10.0))
    cfg = RadarModelConfig(
        n_angles=400, n_cells=3424 if not small else 256,
        resolution=0.0595238, n_samples=48, n_reflections=4,
        beam_sample_dist=2, energy_max=0.72, signal_max=110.0,
        signal_denoising=1, signal_denoising_triangular_width=35,
        signal_denoising_triangular_mode=0.35, ambient_noise=2,
        record_multi_reflection=True, opaque_materials=True)
    key = jax.random.PRNGKey(0)
    poses = np.tile(identity_pose(), (cfg.n_angles, 1))
    poses[:, 2] = 2.0

    def fenced(fn, n):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(i)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[0], float(np.median(ts))

    # --- 1-D azimuth mesh: single-frame latency over all devices
    mesh = make_mesh(n_dev)
    def run_1d(i):
        res = simulate_frame_sharded(
            sa, params, cfg, poses, jax.random.fold_in(key, i), mesh)
        return int(jnp.sum(res.image_u8.astype(jnp.int32)))

    run_1d(0)  # compile
    best, med = fenced(run_1d, args.iters)
    print(json.dumps({"bench": "frame_sharded_1d_az", "devices": n_dev,
                      "best_hz": round(1.0 / best, 2),
                      "med_hz": round(1.0 / med, 2)}))

    # --- 2-D az x smp mesh: single-frame latency
    if n_dev % args.smp == 0 and n_dev >= 2 * args.smp \
            and cfg.n_samples % args.smp == 0:
        mesh2 = make_mesh_2d(n_az=n_dev // args.smp, n_smp=args.smp)
        def run_2d(i):
            res = simulate_frame_sharded_2d(
                sa, params, cfg, poses, jax.random.fold_in(key, i), mesh2)
            return int(jnp.sum(res.image_u8.astype(jnp.int32)))

        run_2d(0)
        best, med = fenced(run_2d, args.iters)
        print(json.dumps({"bench": "frame_sharded_2d_az_smp",
                          "mesh": [n_dev // args.smp, args.smp],
                          "best_hz": round(1.0 / best, 2),
                          "med_hz": round(1.0 / med, 2)}))


if __name__ == "__main__":
    main()
