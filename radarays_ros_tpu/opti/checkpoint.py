"""Checkpoint/resume for optimization runs.

The reference has no checkpointing (SURVEY.md §5); the state worth
persisting is exactly what its workflow keeps on disk manually: tuned
parameter presets (cfg/*_dyncfg*.yaml) and the optimizer's progress. Here
both are first-class:

  * `save_checkpoint` / `load_checkpoint` — RadarParams + optimizer vector +
    loss history to one .npz (atomic rename, resumable mid-run);
  * round-trip into the reference preset formats via io/config.py
    (`save_scene_config`, `save_preset`) so a finished optimization can be
    dropped back into any consumer of the reference YAMLs.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from radarays_ros_tpu.sim.config import Materials, RadarParams


def save_checkpoint(path, params: RadarParams, *, vec=None, history=None,
                    step: int = 0, meta: Optional[dict] = None) -> None:
    """Atomically write an optimization checkpoint."""
    path = Path(path)
    payload = {
        "velocity": np.asarray(params.materials.velocity),
        "ambient": np.asarray(params.materials.ambient),
        "diffuse": np.asarray(params.materials.diffuse),
        "specular": np.asarray(params.materials.specular),
        "object_materials": np.asarray(params.object_materials),
        "beam_width": np.asarray(params.beam_width),
        "step": np.int64(step),
    }
    if vec is not None:
        payload["vec"] = np.asarray(vec)
    if history is not None:
        payload["history"] = np.asarray(history, np.float64)
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path) -> Tuple[RadarParams, dict]:
    """Load a checkpoint -> (RadarParams, extras dict with step/vec/history).

    Arrays come back as jnp (not NumPy): resumed params flow straight into
    jitted/differentiated code, where NumPy leaves break traced indexing."""
    import jax.numpy as jnp

    with np.load(path) as z:
        params = RadarParams(
            materials=Materials(
                velocity=jnp.asarray(z["velocity"]),
                ambient=jnp.asarray(z["ambient"]),
                diffuse=jnp.asarray(z["diffuse"]),
                specular=jnp.asarray(z["specular"])),
            object_materials=jnp.asarray(z["object_materials"]),
            beam_width=jnp.asarray(z["beam_width"]),
        )
        extras = {"step": int(z["step"])}
        for k in ("vec", "history"):
            if k in z:
                extras[k] = z[k]
        for k in z.files:
            if k.startswith("meta_"):
                extras[k[5:]] = z[k]
    return params, extras
