"""Hardware A/B of the pallas3 argmin placement variants (VERDICT r4 #4).

The sweep kernel is ~2/3 of device time at ~55% VPU utilization; the
per-visit argmin is ~3 of its ~20 VPU ops per (Tc, RB) visit tile. Three
placements (trace/pallas_trace.py:_trace_kernel_v3 docstring):

  * visit — classic per-visit min+argmin (rounds 2-4);
  * gated — argmin + winner updates only on improving visits;
  * defer — sweep tracks (best_t, best chunk); the row argmin is
    recovered in the gated winner-fetch pass.

Per mode, three measurements on the real TPU:
  1. parity vs the exact culled oracle (200k tris, 131k rays) — the
     hardware exactness gate (bench.parity_check);
  2. chained-marginal standalone trace at the 1M-triangle flagship
     scale (the relay-robust kernel timing);
  3. the 1M-triangle frame bench (sustained + fenced), via
     bench.measure_scale(cfg_overrides=...).

Usage: python -u benchmarks/argmin_ab.py [--modes visit,gated,defer]
       [--skip-frame] [--skip-marginal]
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


def trace_marginal(mode: str, scene, n_rays=409600, k=5, **trace_kwargs):
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.trace.api import trace

    sa = scene
    o, d = radar_fan(n_rays)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)

    def chained(reps):
        @jax.jit
        def run(sa, o_j, d_j):
            acc = jnp.float32(0.0)
            oo = o_j
            for _ in range(reps):
                r = trace(sa, oo, d_j, engine="pallas3", ray_block=2048,
                          argmin_mode=mode, **trace_kwargs)
                s = jnp.sum(jnp.where(jnp.isfinite(r.t), r.t, 0.0))
                acc = acc + s
                oo = o_j + (s * 0.0)   # data dependence defeats relay dedup
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
    return {"t1_ms": round(t1 * 1e3, 2), f"t{k}_ms": round(tk * 1e3, 2),
            "marginal_trace_ms": round(marg * 1e3, 2),
            "mrays_per_sec_marginal": round(n_rays / marg / 1e6, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="visit,gated,defer")
    ap.add_argument("--term-strides", default="",
                    help="comma list (e.g. 1,2,4): additionally A/B the "
                         "early-termination check stride under the gated "
                         "argmin (trace_pallas_v3 term_stride)")
    ap.add_argument("--skip-frame", action="store_true")
    ap.add_argument("--skip-marginal", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    modes = [m for m in args.modes.split(",") if m]
    strides = [int(s) for s in args.term_strides.split(",") if s]

    import pathlib

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(json.dumps({"stage": "env", "device": str(jax.devices()[0])}),
          flush=True)

    from bench import build_benchmark, ensure_native, measure_scale, \
        parity_check

    ensure_native()

    if not args.skip_marginal and (modes or strides):
        # one shared 1M scene for all marginal runs
        scene, _params, _cfg, _key = build_benchmark(83000)
        scene = jax.device_put(scene)

    for mode in modes:
        if not args.skip_parity:
            par = parity_check(argmin_mode=mode)
            print(json.dumps({"stage": "parity", "mode": mode, **par}),
                  flush=True)
        if not args.skip_marginal:
            m = trace_marginal(mode, scene)
            print(json.dumps({"stage": "marginal", "mode": mode, **m}),
                  flush=True)
        if not args.skip_frame:
            s, b, t, tris, _ = measure_scale(
                n_buildings=83000,
                cfg_overrides={"trace_argmin_mode": mode})
            print(json.dumps({"stage": "frame_1m", "mode": mode,
                              "sustained_hz": round(s, 2),
                              "best_hz": round(b, 2),
                              "trimmed_median_hz": round(t, 2),
                              "n_triangles": tris}), flush=True)

    for stride in strides:
        if not args.skip_parity:
            par = parity_check(argmin_mode="gated", term_stride=stride)
            print(json.dumps({"stage": "parity", "term_stride": stride,
                              **par}), flush=True)
        if not args.skip_marginal:
            m = trace_marginal("gated", scene, term_stride=stride)
            print(json.dumps({"stage": "marginal", "term_stride": stride,
                              **m}), flush=True)
        if not args.skip_frame:
            s, b, t, tris, _ = measure_scale(
                n_buildings=83000,
                cfg_overrides={"trace_term_stride": stride})
            print(json.dumps({"stage": "frame_1m", "term_stride": stride,
                              "sustained_hz": round(s, 2),
                              "best_hz": round(b, 2),
                              "trimmed_median_hz": round(t, 2),
                              "n_triangles": tris}), flush=True)


if __name__ == "__main__":
    main()
