"""Validate + time the pallas3 sweep kernel on the real TPU.

Three stages, each printing one JSON line:
  1. parity: pallas3 vs culled (k_chunks=None, exact) on a ~200k-triangle
     urban scene with a coherent radar fan — the real-hardware check that
     interpret-mode tests cannot provide (Mosaic tiling/alignment rules are
     only enforced on TPU, CLAUDE.md).
  2. trace marginal: chained-marginal trace cost at the 1M-triangle
     flagship scale ((t_k - t_1)/(k-1) with data-dependent chaining inside
     ONE jit — the only relay-robust stage-timing protocol,
     docs/PERFORMANCE.md).
  3. frame: bench.py's fenced 20-frame batch at 1M triangles.

Usage: python -u benchmarks/sweep_kernel_ab.py [--skip-frame]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def radar_fan(n_rays: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    A = 400
    S = n_rays // A
    az = np.repeat(np.linspace(0, 2 * np.pi, A, endpoint=False), S)
    el = np.tile(rng.normal(0, 0.06, S), A)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1).astype(np.float32)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), d.shape)
    return o.copy(), d


def parity(n_buildings=16600, n_rays=131072):
    # the parity core lives in bench.py (it gates every bench run and its
    # verdict ships inside each BENCH_rN headline JSON); this stage is the
    # standalone wrapper for manual A/B sessions
    from bench import parity_check

    out = {"stage": "parity",
           **parity_check(n_buildings=n_buildings, n_rays=n_rays)}
    print(json.dumps(out), flush=True)
    return out


def trace_marginal(n_buildings=83000, n_rays=409600, k=5):
    import jax
    import jax.numpy as jnp

    from bench import build_benchmark
    from radarays_ros_tpu.trace.api import trace

    scene, params, cfg, key = build_benchmark(n_buildings)
    sa = jax.device_put(scene)
    o, d = radar_fan(n_rays)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    def chained(reps):
        @jax.jit
        def run(sa, o_j, d_j):
            # scene as ARGUMENT (not closure): closed-over tables are
            # inlined into the compile payload and the relay 413s
            acc = jnp.float32(0.0)
            oo = o_j
            for _ in range(reps):
                r = trace(sa, oo, d_j, engine="pallas3", ray_block=2048)
                s = jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0))
                acc = acc + s
                # data dependence defeats relay dedup without changing rays
                oo = o_j + (s * 0.0)
            return acc
        return run

    run1, runk = chained(1), chained(k)
    float(run1(sa, o_j, d_j)); float(runk(sa, o_j, d_j))  # compile+warm

    def t_of(run):
        ts = []
        for i in range(5):
            oo = o_j + np.float32(i) * 1e-6
            t0 = time.perf_counter()
            float(run(sa, oo, d_j))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tk = t_of(run1), t_of(runk)
    marg = (tk - t1) / (k - 1)
    out = {"stage": "trace_marginal", "n_triangles": int(sa.verts.shape[0]),
           "n_rays": n_rays, "t1_ms": round(t1 * 1e3, 2),
           f"t{k}_ms": round(tk * 1e3, 2),
           "marginal_trace_ms": round(marg * 1e3, 2),
           "mrays_per_sec_marginal": round(n_rays / marg / 1e6, 2)}
    print(json.dumps(out), flush=True)
    return out


def frame(n_buildings=83000):
    from bench import measure_scale

    stream, best, tmed, tris, _cfg = measure_scale(n_buildings=n_buildings)
    out = {"stage": "frame_1m", "sustained_hz": round(stream, 2),
           "best_hz": round(best, 2),
           "trimmed_median_hz": round(tmed, 2), "n_triangles": tris}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-frame", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-marginal", action="store_true")
    args = ap.parse_args()

    import pathlib

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps({"stage": "env", "device": str(jax.devices()[0])}),
          flush=True)
    if not args.skip_parity:
        parity()
    if not args.skip_marginal:
        trace_marginal()
    if not args.skip_frame:
        frame()
