"""`Radar` — the stateful simulator front-end.

Counterpart of the reference's `Radar` base class + engines
(include/radarays_ros/Radar.hpp:34-107, src/radarays_ros/Radar.cpp): owns the
scene, the material/parameter state, the runtime configuration, and a pose
source; `simulate(pose)` produces one polar image. Differences by design:

  * There is no CPU/GPU engine split — one jitted XLA pipeline serves every
    scene size, with the trace engine selected in the config.
  * TF lookups become explicit pose arguments (a (7,) pose or a per-azimuth
    (n_angles, 7) pose array for include_motion); the last-pose fallback of
    Radar.cpp:102-121 becomes `simulate()` with no argument reusing the last
    pose.
  * dynamic_reconfigure becomes `update_config` / `update_params`
    (Radar.cpp:188-218): beam-shape changes re-seed the cone sampling key,
    reproducing the m_resample trigger (Radar.cpp:199-206).
  * The PRNG is an explicit jax key: `simulate(..., reseed=True)` draws new
    noise each frame like the reference's std::random_device; by default the
    noise key advances per frame deterministically.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from radarays_ros_tpu.geom.scene import Scene
from radarays_ros_tpu.sim.config import Materials, RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.pipeline import FrameResult, simulate_frame_jit
from radarays_ros_tpu.utils.transforms import identity_pose


class Radar:
    def __init__(
        self,
        scene: Scene,
        params: Optional[RadarParams] = None,
        cfg: Optional[RadarModelConfig] = None,
        seed: int = 0,
        verbose_timing: bool = False,
    ):
        from radarays_ros_tpu.utils.profiling import StageTimer

        # timing forces a host sync per frame (block_until_ready through the
        # remote relay); keep the default path async-dispatch
        self.timer = StageTimer(enabled=verbose_timing)
        self.verbose_timing = verbose_timing
        self.scene = scene
        self._scene_arrays = jax.tree_util.tree_map(
            lambda x: x, scene.device_arrays()
        )
        if params is None:
            from radarays_ros_tpu.sim.config import default_params

            params, default_cfg = default_params(scene.n_objects)
            cfg = cfg or default_cfg
        self.params = params
        self.cfg = cfg or RadarModelConfig()
        self._auto_opaque()
        self._bake_aux()
        key = jax.random.PRNGKey(seed)
        self._cone_key, self._noise_key = jax.random.split(key)
        self._last_pose = identity_pose()
        # last two (stamp, pose) pairs for the pose-extrapolation fallback
        # (Radar.cpp:102-121 caches Tsm_last + stamps; see simulate())
        self._pose_history: list[tuple[float, np.ndarray]] = []

    # ------------------------------------------------------------ config

    def update_config(self, **kwargs) -> None:
        """Runtime reconfigure (dynamic_reconfigure equivalent).

        Beam-shape parameters trigger cone resampling (Radar.cpp:199-206).
        """
        resample_keys = {"beam_sample_dist", "n_samples",
                         "beam_sample_dist_normal_p_in_cone"}
        if resample_keys & set(kwargs):
            self.resample()
        self.cfg = self.cfg.replace(**kwargs)

    def update_params(self, params: RadarParams, resample: bool = False) -> None:
        self.params = params
        if resample:
            self.resample()
        self._auto_opaque()
        self._bake_aux()

    def resample(self) -> None:
        """Draw a fresh cone-sampling key (m_resample = true)."""
        self._cone_key, _ = jax.random.split(jax.random.fold_in(self._cone_key, 1))

    def load_materials(self, entries, object_materials) -> None:
        """loadParams() equivalent (Radar.cpp:220-226)."""
        self.params = self.params._replace(
            materials=Materials.from_list(entries),
            object_materials=np.asarray(object_materials, np.int32),
        )
        self._auto_opaque()
        self._bake_aux()

    def _bake_aux(self) -> None:
        """Bake the object->material map into the scene fetch table's aux
        slot (geom/scene.py:bake_tri_aux) so the jitted frame passes
        tri_aux="baked" instead of gathering the (T,) per-triangle map per
        jit call and copying the (48, T) table in-jit (~9 ms per 20-frame
        batch at 1M triangles). The map only changes through update_params/
        load_materials, which re-run this; both rows match the pipeline's
        gather semantics exactly (clip to the material-count range)."""
        sa = self._scene_arrays
        if getattr(sa, "tri_table_t", None) is None:
            return  # hand-built SceneArrays without the fetch table
        from radarays_ros_tpu.geom.scene import bake_tri_aux

        om = np.asarray(self.params.object_materials)
        row = om.astype(np.float32)[
            np.clip(np.asarray(sa.obj_ids), 0, om.shape[0] - 1)]
        self._scene_arrays = bake_tri_aux(sa, row)
        if not self.cfg.trace_aux_baked:
            self.cfg = self.cfg.replace(trace_aux_baked=True)

    def _auto_opaque(self) -> None:
        """Enable the refraction-free fast path when it is provably exact:
        every non-air material has wave velocity 0, so Fresnel transmits
        nothing (Teff = 0) and the refraction branch is all-dead. Halves the
        wave tensor per bounce (the static-shape analog of the reference CPU
        engine's energy pruning, RadarCPU.cpp:364-370)."""
        vel = np.asarray(self.params.materials.velocity)
        mask = np.ones(vel.shape[0], bool)
        air = self.cfg.material_id_air
        if 0 <= air < vel.shape[0]:
            mask[air] = False
        opaque = bool(np.all(vel[mask] == 0.0)) if mask.any() else False
        if opaque != self.cfg.opaque_materials:
            self.cfg = self.cfg.replace(opaque_materials=opaque)

    # ------------------------------------------------------------ simulate

    def extrapolate_pose(self, stamp: Optional[float]) -> np.ndarray:
        """Pose-failure fallback (Radar.cpp:102-121, where the last cached
        Tsm is reused and its stamp advanced by the elapsed wall time).

        With the last TWO stamped poses cached, this goes one step further
        than the reference's verbatim reuse: the translation is linearly
        extrapolated and the rotation slerp-extrapolated along the geodesic
        to the requested stamp. With fewer than two stamped poses (or no
        stamp), it degrades to the reference's behavior: last pose verbatim.
        """
        if stamp is not None and len(self._pose_history) == 2:
            (s0, p0), (s1, p1) = self._pose_history
            if s1 > s0:
                from radarays_ros_tpu.io.trajectory import _slerp

                a = (float(stamp) - s0) / (s1 - s0)
                t = p0[0:3] + (p1[0:3] - p0[0:3]) * np.float32(a)
                q = _slerp(p0[3:7].astype(np.float64),
                           p1[3:7].astype(np.float64), a)
                return np.concatenate([t, q.astype(np.float32)])
        return self._last_pose

    def simulate(self, pose=None, *, stamp: Optional[float] = None,
                 reseed: bool = True) -> FrameResult:
        """Simulate one frame at the given sensor pose.

        pose: (7,) [t, q_xyzw] map<-sensor pose, or (n_angles, 7) per-azimuth
        poses, or None for the pose-failure fallback: extrapolate from the
        last two stamped poses when `stamp` is given (see
        `extrapolate_pose`), else reuse the last pose (Radar.cpp:102-121).
        stamp: frame timestamp in seconds; with a (7,) pose it is recorded
        for later extrapolation.
        """
        if pose is None:
            pose = self.extrapolate_pose(stamp)
        elif stamp is not None:
            p = np.asarray(pose, np.float32)
            if p.ndim == 1:
                self._pose_history.append((float(stamp), p.copy()))
                del self._pose_history[:-2]
        self._last_pose = np.asarray(pose, np.float32)
        if reseed:
            self._noise_key, sub = jax.random.split(self._noise_key)
        else:
            sub = self._noise_key
        import time

        import jax.numpy as jnp

        t0 = time.perf_counter()
        res = simulate_frame_jit(
            self._scene_arrays, self.params, self.cfg,
            jnp.asarray(pose, jnp.float32), (self._cone_key, sub),
        )
        if self.verbose_timing:
            # per-frame wall-time print, as the reference engines do
            # (RadarCPU.cpp:550-553). Fencing + timing only here: a
            # block_until_ready on every frame would serialize dispatch
            # through the remote relay for the interactive API.
            jax.block_until_ready(res.image_u8)
            dt = time.perf_counter() - t0
            self.timer.add("frame", dt)
            n = self.timer.counts["frame"]
            print(f"[radar] {dt * 1e3:8.2f} ms "
                  f"(avg {self.timer.totals['frame'] / n * 1e3:.2f} ms over {n} frames)")
        return res

    def simulate_image(self, pose=None, **kwargs) -> np.ndarray:
        """Convenience: uint8 (n_cells, n_angles) numpy polar image."""
        return np.asarray(self.simulate(pose, **kwargs).image_u8)
