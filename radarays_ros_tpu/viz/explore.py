"""Standalone 2-D physics explorer panels — scripts/reflections/ as a tool.

The reference ships interactive matplotlib prototypes for its physics
(scripts/reflections/{fresnel,snell_multi}.py, scripts/radaray_beams.py,
scripts/radarays_snell_fresnel_brdf.py). This module renders the same four
explorations as static figures from the data-first helpers (viz/brdf.py,
viz/reflections.py, viz/beams.py), which run the SAME wave/ physics the
simulator uses — so the explorer genuinely exercises production code.

Each `panel_*` function returns (data_dict, figure_or_None); figures are
only built when matplotlib is importable (it is optional — the data side
never needs it). `python -m radarays_ros_tpu.io.cli explore` is the CLI.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# validated categorical order (identity = medium/series), light surface
_SERIES = ("#2a78d6", "#eb6834", "#1baf7a", "#eda100",
           "#e87ba4", "#008300", "#4a3aa7", "#e34948")
_INK = "#333333"
_MUTED = "#8a8a8a"


def _mpl():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:  # pragma: no cover - matplotlib is baked in here
        return None


def _style_axis(ax):
    ax.grid(True, color=_MUTED, alpha=0.25, linewidth=0.6)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(_MUTED)
    ax.tick_params(colors=_INK, labelsize=8)


def panel_brdf(ambient: float, diffuse: float, specular: float,
               plot: bool = False) -> Tuple[Dict, Optional[object]]:
    """Back-reflection energy vs incidence angle (the A + B*cos^C shader)."""
    from radarays_ros_tpu.viz.brdf import brdf_curve

    data = brdf_curve(ambient, diffuse, specular)
    fig = None
    plt = _mpl() if plot else None
    if plt is not None:
        fig, ax = plt.subplots(figsize=(5.2, 3.4), dpi=120)
        ang = np.degrees(data["angle_rad"])
        ax.plot(ang, data["energy"], color=_SERIES[0], linewidth=2.0)
        ax.set_xlabel("incidence angle [deg]", color=_INK, fontsize=9)
        ax.set_ylabel("returned energy fraction", color=_INK, fontsize=9)
        ax.set_title(
            f"back-reflection shader  A={ambient:g} B={diffuse:g} "
            f"C={specular:g}", color=_INK, fontsize=10)
        _style_axis(ax)
        fig.tight_layout()
    return data, fig


def panel_fresnel(v1: float, v2: float, polarization: float = 0.5,
                  plot: bool = False) -> Tuple[Dict, Optional[object]]:
    """Reff/Teff split and refraction angle vs incidence angle.

    Two stacked panels (energy fraction and refraction angle are different
    quantities — never a dual axis).
    """
    from radarays_ros_tpu.viz.brdf import fresnel_curve

    data = fresnel_curve(v1, v2, polarization)
    fig = None
    plt = _mpl() if plot else None
    if plt is not None:
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(5.2, 5.4), dpi=120,
                                       sharex=True)
        ang = np.degrees(data["angle_rad"])
        ax1.plot(ang, data["reflectance"], color=_SERIES[0], linewidth=2.0,
                 label="Reff")
        ax1.plot(ang, data["transmittance"], color=_SERIES[1], linewidth=2.0,
                 label="Teff")
        ax1.set_ylabel("energy fraction", color=_INK, fontsize=9)
        ax1.set_title(
            f"Fresnel split  v1={v1:g} v2={v2:g} m/ns  pol={polarization:g}",
            color=_INK, fontsize=10)
        ax1.legend(frameon=False, fontsize=8, labelcolor=_INK)
        _style_axis(ax1)
        refr = np.asarray(data["refraction_angle_deg"], float)
        ax2.plot(ang, refr, color=_SERIES[2], linewidth=2.0)
        tir = np.asarray(data["total_internal_reflection"], bool)
        if tir.any():
            ax2.axvspan(float(ang[tir.argmax()]), float(ang[-1]),
                        color=_MUTED, alpha=0.15, linewidth=0)
            ax2.text(float(ang[tir.argmax()]), np.nanmax(refr) * 0.5,
                     " total internal reflection", color=_INK, fontsize=8)
        ax2.set_xlabel("incidence angle [deg]", color=_INK, fontsize=9)
        ax2.set_ylabel("refraction angle [deg]", color=_INK, fontsize=9)
        _style_axis(ax2)
        fig.tight_layout()
    return data, fig


def panel_slab(depths: Sequence[float], velocities: Sequence[float],
               origin=(0.0, 1.0), direction=(0.6, -0.8), n_bounces: int = 4,
               polarization: float = 0.5,
               plot: bool = False) -> Tuple[Dict, Optional[object]]:
    """2-D reflect/refract ray tree through a stack of media interfaces
    (scripts/reflections/snell_multi.py). Segment color = medium identity
    (fixed categorical order); opacity = carried energy."""
    from radarays_ros_tpu.viz.reflections import propagate_slab_rays

    data = propagate_slab_rays(depths, velocities, origin=origin,
                               direction=direction, n_bounces=n_bounces,
                               polarization=polarization)
    fig = None
    plt = _mpl() if plot else None
    if plt is not None:
        fig, ax = plt.subplots(figsize=(5.6, 4.2), dpi=120)
        xs = [s["p0"][0] for s in data["segments"]] + \
            [s["p1"][0] for s in data["segments"]] or [0.0, 1.0]
        x_lo, x_hi = min(xs) - 0.1, max(xs) + 0.1
        for d in depths:
            ax.hlines(d, x_lo, x_hi, color=_MUTED, alpha=0.6,
                      linewidth=1.0)
        seen = set()
        for s in data["segments"]:
            m = int(s["medium"])
            label = f"medium {m} (v={velocities[m]:g})" \
                if m not in seen else None
            seen.add(m)
            ax.plot([s["p0"][0], s["p1"][0]], [s["p0"][1], s["p1"][1]],
                    color=_SERIES[m % len(_SERIES)], linewidth=2.0,
                    alpha=float(np.clip(0.25 + 0.75 * s["energy"], 0, 1)),
                    label=label)
        for leak in data["leaks"]:
            p0 = np.asarray(leak["p0"])
            d = np.asarray(leak["dir"])
            p1 = p0 + 0.3 * d
            ax.plot([p0[0], p1[0]], [p0[1], p1[1]], linestyle=":",
                    color=_SERIES[int(leak["medium"]) % len(_SERIES)],
                    linewidth=1.4,
                    alpha=float(np.clip(0.25 + 0.75 * leak["energy"], 0, 1)))
        ax.set_xlabel("x [m]", color=_INK, fontsize=9)
        ax.set_ylabel("depth [m]", color=_INK, fontsize=9)
        ax.set_title(f"slab reflect/refract tree, {n_bounces} bounces",
                     color=_INK, fontsize=10)
        if len(seen) >= 2:
            ax.legend(frameon=False, fontsize=8, labelcolor=_INK)
        ax.set_aspect("equal", adjustable="datalim")
        _style_axis(ax)
        fig.tight_layout()
    return data, fig


def panel_beams(width_deg: float = 8.0, n_samples: int = 2000,
                p_in_cone: float = 0.8, seed: int = 0,
                plot: bool = False) -> Tuple[Dict, Optional[object]]:
    """The four cone sample distributions D1..D4 as small multiples
    (scripts/radaray_beams.py:63-101)."""
    from radarays_ros_tpu.viz.beams import beam_panel

    data = beam_panel(width_deg, n_samples, p_in_cone, seed)
    fig = None
    plt = _mpl() if plot else None
    if plt is not None:
        fig, axes = plt.subplots(2, 2, figsize=(6.4, 6.4), dpi=120,
                                 sharex=True, sharey=True)
        half = np.deg2rad(width_deg) / 2.0
        theta = np.linspace(0, 2 * np.pi, 181)
        for ax, (name, d) in zip(axes.ravel(), data.items()):
            ax.scatter(d["beta"], d["alpha"], s=2.5, color=_SERIES[0],
                       alpha=0.35, linewidths=0)
            ax.plot(half * np.cos(theta), half * np.sin(theta),
                    color=_MUTED, linewidth=1.0, alpha=0.8)
            ax.set_title(f"{name}  in-cone {d['frac_in_cone']:.2f}",
                         color=_INK, fontsize=9)
            ax.set_aspect("equal")
            _style_axis(ax)
        for ax in axes[-1]:
            ax.set_xlabel("yaw offset [rad]", color=_INK, fontsize=8)
        for ax in axes[:, 0]:
            ax.set_ylabel("pitch offset [rad]", color=_INK, fontsize=8)
        fig.suptitle(f"cone sampling, width {width_deg:g} deg, "
                     f"p_in_cone {p_in_cone:g}", color=_INK, fontsize=10)
        fig.tight_layout()
    return data, fig
