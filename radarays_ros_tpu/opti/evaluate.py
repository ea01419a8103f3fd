"""Real-vs-sim evaluation harness.

The reference evaluates simulation fidelity by replaying a bag and comparing
stamped real frames against synced simulated frames with the external
radar_tools `compare_radar_images.py` (launch/tests/eval_real_to_sim.launch,
topics /Navtech/Polar vs /radar/image -> /real_to_sim_gap), scoring PSNR in
the optimizer (scripts/radaray_opti.py:205). This module is that workflow,
file-based: pair up frames, compute the metric suite per pair, and emit a
JSON-able report.

CLI: `python -m radarays_ros_tpu.io.cli eval --real dir1 --sim dir2`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from radarays_ros_tpu.opti.metrics import (
    mutual_information, normalized_mutual_information, psnr, ssim,
    variation_of_information)


def load_frame_dir(path) -> List[np.ndarray]:
    """Load all frames in a directory (sorted by name; .png or .npy)."""
    from radarays_ros_tpu.io.image_io import read_png_gray

    frames = []
    for p in sorted(Path(path).iterdir()):
        if p.suffix == ".png":
            frames.append(read_png_gray(p))
        elif p.suffix == ".npy":
            frames.append(np.load(p))
    if not frames:
        raise ValueError(f"no frames (.png/.npy) in {path}")
    return frames


def compare_frames(real: np.ndarray, sim: np.ndarray,
                   metrics: Sequence[str] = ("psnr", "ssim")) -> Dict[str, float]:
    """Metric suite for one frame pair (shapes must match)."""
    if real.shape != sim.shape:
        raise ValueError(f"shape mismatch: real {real.shape} vs sim {sim.shape}")
    real = np.asarray(real, np.float32)
    sim = np.asarray(sim, np.float32)
    fns = {
        "psnr": lambda: float(psnr(real, sim)),
        "ssim": lambda: float(ssim(real, sim)),
        "mi": lambda: float(mutual_information(real, sim)),
        "nmi": lambda: float(normalized_mutual_information(real, sim)),
        "voi": lambda: float(variation_of_information(real, sim)),
        "mae": lambda: float(np.mean(np.abs(real - sim))),
    }
    return {m: fns[m]() for m in metrics}


def evaluate_real_vs_sim(real, scene_arrays, params, cfg, traj,
                         metrics: Sequence[str] = ("psnr", "ssim"),
                         limit: Optional[int] = None, seed: int = 0,
                         verbose: bool = True) -> Dict:
    """Stamp-synced real-vs-sim evaluation — the reference's sync workflow.

    For each stamped REAL frame (io/realdata.py:RealFrameSequence), simulate
    at the trajectory pose of that stamp and score the metric suite, logging
    the sync error between the frame stamp and the trajectory sample the
    pose came from — mirroring radar_simulator.cpp:83-96 (simulate at each
    incoming /Navtech/Polar stamp, log the sync gap) driven by
    eval_real_to_sim.launch.

    Args:
      real: RealFrameSequence.
      scene_arrays/params/cfg: the simulator inputs.
      traj: io.trajectory.Trajectory providing pose_at(stamp). Real stamps
        outside the trajectory's span are clamped to its ends (counted in
        the report as out_of_traj).
    """
    import jax

    from radarays_ros_tpu.sim.pipeline import simulate_frame_jit

    n = len(real) if limit is None else min(limit, len(real))
    key = jax.random.PRNGKey(seed)
    t_lo, t_hi = float(traj.stamps[0]), float(traj.stamps[-1])

    per_frame = []
    sync_errors = []
    out_of_traj = 0
    for i in range(n):
        stamp = float(real.stamps[i])
        clamped = min(max(stamp, t_lo), t_hi)
        sync_err = clamped - stamp
        if sync_err != 0.0:
            out_of_traj += 1
        pose = traj.pose_at(clamped)
        key, sub = jax.random.split(key)
        res = simulate_frame_jit(scene_arrays, params, cfg, pose, sub)
        sim = np.asarray(res.image_u8)
        real_img = real.frame(i)
        row = compare_frames(real_img, sim, metrics)
        row["stamp"] = stamp
        row["sync_error_s"] = sync_err
        per_frame.append(row)
        sync_errors.append(sync_err)
        if verbose:
            # per-frame sync log, as the reference prints (ms)
            print(f"frame {i:4d} stamp {stamp:.3f}  "
                  f"sync error: {sync_err * 1e3:.1f} ms  "
                  + "  ".join(f"{m} {row[m]:.3f}" for m in metrics))

    summary = {
        m: {
            "mean": float(np.mean([f[m] for f in per_frame])),
            "std": float(np.std([f[m] for f in per_frame])),
            "min": float(np.min([f[m] for f in per_frame])),
            "max": float(np.max([f[m] for f in per_frame])),
        }
        for m in metrics
    }
    return {"n_frames": n, "per_frame": per_frame, "summary": summary,
            "mode": "real_vs_sim_synced",
            "sync_error_s": {"mean": float(np.mean(np.abs(sync_errors))),
                             "max": float(np.max(np.abs(sync_errors)))},
            "out_of_traj": out_of_traj}


def evaluate_dirs(real_dir, sim_dir,
                  metrics: Sequence[str] = ("psnr", "ssim"),
                  limit: Optional[int] = None) -> Dict:
    """Pairwise evaluation of two frame directories -> summary report."""
    real = load_frame_dir(real_dir)
    sim = load_frame_dir(sim_dir)
    n = min(len(real), len(sim))
    if limit:
        n = min(n, limit)
    per_frame = [compare_frames(real[i], sim[i], metrics) for i in range(n)]
    summary = {
        m: {
            "mean": float(np.mean([f[m] for f in per_frame])),
            "std": float(np.std([f[m] for f in per_frame])),
            "min": float(np.min([f[m] for f in per_frame])),
            "max": float(np.max([f[m] for f in per_frame])),
        }
        for m in metrics
    }
    return {"n_frames": n, "per_frame": per_frame, "summary": summary,
            "real_dir": str(real_dir), "sim_dir": str(sim_dir)}
