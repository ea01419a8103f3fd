"""Device-time stage profile of the flagship 20-frame batch (xplane).

Runs one fetched-forced 20-frame KAIST-preset batch at the 1M-triangle
scale under jax.profiler.trace, parses the NEWEST vm.xplane.pb (the
profile dir accumulates runs — globbing all of them shows stale data,
CLAUDE.md round-3 lesson 5) and prints the top device ops grouped by
name prefix. This is the committed form of the ad-hoc profiling workflow
rounds 2-4 used to find the gather/prep/denoise levers.

Usage: python -u benchmarks/profile_frame.py [--buildings 83000]
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_xplane(profile_dir: Path):
    """Aggregate device-op durations from the newest vm.xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(profile_dir.rglob("*.xplane.pb"),
                 key=lambda p: p.stat().st_mtime)
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {profile_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(pbs[-1].read_bytes())
    ops = collections.Counter()
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # -> ms
                ops[name] += dur
                total += dur
    return ops, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buildings", type=int, default=83000)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_benchmark, ensure_native
    from radarays_ros_tpu.sim.pipeline import simulate_frames_jit
    from radarays_ros_tpu.utils.transforms import make_pose

    ensure_native()
    scene, params, cfg, key = build_benchmark(args.buildings)
    scene = jax.device_put(scene)
    params = jax.device_put(params)
    poses = jnp.tile(jnp.asarray(make_pose([0.0, 0.0, 2.0]))[None], (20, 1))

    @jax.jit
    def run_batch(scene, params, poses, keys):
        res = simulate_frames_jit(scene, params, cfg, poses, keys)
        return jnp.sum(res.image_u8.astype(jnp.int32))

    keys = jax.random.split(key, 20)
    t0 = time.perf_counter()
    int(run_batch(scene, params, poses, keys))
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    prof_dir = Path(tempfile.mkdtemp(prefix="rr_prof_"))
    k2 = jax.random.split(jax.random.fold_in(key, 99), 20)
    with jax.profiler.trace(str(prof_dir)):
        checksum = int(run_batch(scene, params, poses, k2))
    print(f"checksum {checksum}", file=sys.stderr)

    ops, total = parse_xplane(prof_dir)
    # group fusions by leading op-name token for a readable stage view
    groups = collections.Counter()
    for name, ms in ops.items():
        groups[name.split(".")[0].split("(")[0][:60]] += ms
    out = {
        "device_total_ms": round(total, 1),
        "top_ops": [{"op": n, "ms": round(ms, 2),
                     "pct": round(100 * ms / total, 1)}
                    for n, ms in groups.most_common(args.top)],
        "profile_dir": str(prof_dir),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
