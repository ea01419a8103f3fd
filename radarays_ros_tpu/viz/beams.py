"""Beam-distribution inspection — scripts/radaray_beams.py, data-first.

The reference visualizes the four cone sample distributions D1..D4 as
scatter panels (scripts/radaray_beams.py:63-101). Here the same inspection
produces data: per-distribution samples, radial histograms and the fraction
of samples inside the nominal cone (the p_in_cone contract of D3/D4),
suitable for plotting or asserting.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from radarays_ros_tpu.wave.cone import sample_cone_local


def beam_panel(width_deg: float = 8.0, n_samples: int = 5000,
               p_in_cone: float = 0.8, seed: int = 0,
               n_bins: int = 32) -> Dict:
    """Sample all four distributions; return offsets + radial stats.

    Returns {dist_name: {alpha, beta, r_hist, r_edges, frac_in_cone}} with
    alpha/beta the pitch/yaw offsets in radians (the rendered axes of
    radaray_beams.py).
    """
    width = float(np.deg2rad(width_deg))
    key = jax.random.PRNGKey(seed)
    out = {}
    for dist, name in enumerate(["D1_uniform_radius", "D2_uniform_disk",
                                 "D3_normal", "D4_sqrt_normal"]):
        dirs = np.asarray(sample_cone_local(
            jax.random.fold_in(key, dist), width, n_samples, dist, p_in_cone))
        # recover (alpha, beta) offsets from the rotated +x directions
        beta = np.arctan2(dirs[:, 1], dirs[:, 0])
        alpha = np.arcsin(np.clip(-dirs[:, 2], -1.0, 1.0)) * -1.0
        r = np.hypot(alpha, beta)
        hist, edges = np.histogram(r, bins=n_bins, range=(0.0, width / 2.0))
        out[name] = {
            "alpha": alpha.tolist(),
            "beta": beta.tolist(),
            "r_hist": hist.tolist(),
            "r_edges": edges.tolist(),
            "frac_in_cone": float(np.mean(r <= width / 2.0)),
        }
    return out
