"""The GenRadarImage workload — the reference's action/service IDL, native.

The reference defines (but on main only partially serves) a ROS API used by
the optimizer:

  * `GetRadarParams.srv` — response-only RadarParams fetch
    (srv/GetRadarParams.srv:1; dead server at radar_simulator.cpp:70-81);
  * `GenRadarImage.action` — goal RadarParams -> result polar image
    (action/GenRadarImage.action:1-6; client loop radaray_opti.py:164-204).

`RadarImageServer` implements both natively: `get_radar_params()` returns
the current parameter state as the msg-shaped dict, and `gen_radar_image`
renders a frame for a requested parameter set (the action). Message dicts
use the exact field names of msg/RadarMaterial.msg, msg/RadarModel.msg and
msg/RadarParams.msg so serialized requests are drop-in.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from radarays_ros_tpu.sim.config import Materials, RadarParams
from radarays_ros_tpu.sim.radar import Radar


def params_to_msg(params: RadarParams, n_samples: int,
                  n_reflections: int) -> dict:
    """RadarParams -> msg-shaped dict (msg/RadarParams.msg layout)."""
    m = params.materials
    return {
        "materials": {
            "data": [
                {
                    "velocity": float(m.velocity[i]),
                    "ambient": float(m.ambient[i]),
                    "diffuse": float(m.diffuse[i]),
                    "specular": float(m.specular[i]),
                }
                for i in range(m.n)
            ]
        },
        "model": {
            "beam_width": float(np.rad2deg(np.asarray(params.beam_width))),
            "n_samples": int(n_samples),
            "n_reflections": int(n_reflections),
        },
    }


def msg_to_params(msg: dict, object_materials) -> tuple[RadarParams, int, int]:
    """msg-shaped dict -> (RadarParams, n_samples, n_reflections)."""
    mats = Materials.from_list(msg["materials"]["data"])
    model = msg.get("model", {})
    params = RadarParams.make(
        mats, object_materials,
        beam_width_deg=float(model.get("beam_width", 8.0)))
    return (params, int(model.get("n_samples", 200)),
            int(model.get("n_reflections", 2)))


class RadarImageServer:
    """Native GenRadarImage action server + GetRadarParams service."""

    def __init__(self, radar: Radar):
        self.radar = radar

    def get_radar_params(self) -> dict:
        """GetRadarParams.srv equivalent."""
        return params_to_msg(self.radar.params, self.radar.cfg.n_samples,
                             self.radar.cfg.n_reflections)

    def gen_radar_image(self, goal_params: Optional[dict] = None,
                        pose=None) -> np.ndarray:
        """GenRadarImage.action equivalent: apply goal params, render one
        polar frame, restore nothing (parameter changes persist, matching the
        action server semantics of re-loading params per goal)."""
        if goal_params is not None:
            params, n_samples, n_reflections = msg_to_params(
                goal_params, self.radar.params.object_materials)
            if (n_samples != self.radar.cfg.n_samples
                    or n_reflections != self.radar.cfg.n_reflections):
                self.radar.update_config(n_samples=n_samples,
                                         n_reflections=n_reflections)
            self.radar.update_params(params)
        return self.radar.simulate_image(pose)
