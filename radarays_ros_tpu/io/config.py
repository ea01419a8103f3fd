"""YAML configuration IO: scene/material configs + tuned parameter presets.

Preserves the reference's three on-disk formats so existing configs drop in
unchanged:

  1. Structured scene config (config/oru4_test.yaml, config/mulran_kaist02.yaml):
     a `materials:` list of {velocity, ambient, diffuse, specular} dicts, plus
     `material_id_air` and the `object_materials` object->material map.
  2. Parallel-array scene config (config/oru3.yaml, config/oru4.yaml): separate
     `velocities:` / `ambient:` / `diffuse:` / `specular:` arrays (and the
     velocity-table-only config/radar.yaml).
  3. dynamic_reconfigure preset dumps (cfg/*_dyncfg*.yaml): `rosparam dump`
     output carrying `!!python/object/new:dynamic_reconfigure.encoding.Config`
     tags with the flat parameter dict under `dictitems` (the format written
     by `dynparam dump` and loaded at launch/mulran_sim.launch:31-32).

Unknown keys are preserved in the returned raw dict; RadarModelConfig
consumes only the fields it knows (sim/config.py:from_dict).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np
import yaml

from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams


class _RosTagLoader(yaml.SafeLoader):
    """SafeLoader that flattens ROS dynamic_reconfigure python-object tags."""


def _config_tag(loader, _suffix, node):
    mapping = loader.construct_mapping(node, deep=True)
    return mapping.get("dictitems", mapping)


_RosTagLoader.add_multi_constructor(
    "tag:yaml.org,2002:python/object/new:", _config_tag)
_RosTagLoader.add_multi_constructor(
    "tag:yaml.org,2002:python/object:", _config_tag)


def load_yaml(path) -> Any:
    with open(path) as f:
        return yaml.load(f, Loader=_RosTagLoader)


class SceneConfig:
    """Parsed scene/material config (formats 1 & 2 above)."""

    def __init__(self, materials: Materials, object_materials: np.ndarray,
                 material_id_air: int, raw: dict):
        self.materials = materials
        self.object_materials = object_materials
        self.material_id_air = material_id_air
        self.raw = raw

    def radar_params(self, beam_width_deg: float = 8.0) -> RadarParams:
        return RadarParams.make(self.materials, self.object_materials,
                                beam_width_deg=beam_width_deg)


def load_scene_config(path) -> SceneConfig:
    """Load a scene/material YAML in either reference format."""
    raw = load_yaml(path)
    if not isinstance(raw, dict):
        raise ValueError(f"{path}: expected a mapping at top level")

    if "materials" in raw:
        entries = raw["materials"]
        materials = Materials.from_list(entries)
    elif "velocities" in raw:
        vel = [float(v) for v in raw["velocities"]]
        n = len(vel)

        def arr(key, default):
            vals = raw.get(key)
            if vals is None:
                return [default] * n
            return [float(v) for v in vals] + [default] * (n - len(vals))

        materials = Materials.from_list([
            dict(velocity=vel[i], ambient=arr("ambient", 0.0)[i],
                 diffuse=arr("diffuse", 0.0)[i], specular=arr("specular", 0.0)[i])
            for i in range(n)
        ])
    else:
        raise ValueError(
            f"{path}: no 'materials' or 'velocities' key (unknown scene format)")

    object_materials = np.asarray(raw.get("object_materials", [0]), np.int32)
    material_id_air = int(raw.get("material_id_air", 0))
    return SceneConfig(materials, object_materials, material_id_air, raw)


def flatten_dyncfg(raw: Any) -> dict:
    """Flatten a dynamic_reconfigure dump to its top-level parameter dict."""
    if not isinstance(raw, dict):
        raise ValueError("preset YAML did not parse to a mapping")
    flat = {k: v for k, v in raw.items()
            if k not in ("groups", "state", "id", "name", "parameters",
                         "parent", "type")
            and not isinstance(v, (dict, list))}
    return flat


def load_preset(path) -> Tuple[RadarModelConfig, Optional[float], dict]:
    """Load a tuned dyncfg preset (format 3).

    Returns (cfg, beam_width_deg_or_None, flat_param_dict). `beam_width` is
    dynamic (it lives in RadarParams, not the static config), so it is
    returned separately in degrees, as stored by the reference
    (cfg/RadarModel.cfg:14 — beam width in deg; converted at
    Radar.cpp:208-217).
    """
    flat = flatten_dyncfg(load_yaml(path))
    cfg = RadarModelConfig.from_dict(flat)
    bw = flat.get("beam_width")
    return cfg, (float(bw) if bw is not None else None), flat


def save_preset(path, cfg: RadarModelConfig, beam_width_deg: Optional[float] = None):
    """Write a flat (untagged) preset YAML; load_preset round-trips it."""
    import dataclasses

    d = dataclasses.asdict(cfg)
    if beam_width_deg is not None:
        d["beam_width"] = float(beam_width_deg)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=True)


def velocity_table(path) -> np.ndarray:
    """Load a bare velocity table (config/radar.yaml format)."""
    raw = load_yaml(path)
    return np.asarray(raw["velocities"], np.float32)


def save_scene_config(path, materials: Materials, object_materials,
                      material_id_air: int = 0):
    """Write a structured scene config (format 1)."""
    entries = [
        dict(velocity=float(materials.velocity[i]),
             ambient=float(materials.ambient[i]),
             diffuse=float(materials.diffuse[i]),
             specular=float(materials.specular[i]))
        for i in range(materials.n)
    ]
    with open(path, "w") as f:
        yaml.safe_dump(
            dict(materials=entries, material_id_air=int(material_id_air),
                 object_materials=[int(x) for x in np.asarray(object_materials)]),
            f, sort_keys=False)
