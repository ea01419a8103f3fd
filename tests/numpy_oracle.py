"""Independent end-to-end oracle: a reference-faithful NumPy scalar engine.

This module re-implements one whole radar frame the way the reference CPU
engine computes it — per-azimuth, per-wave Python loops with DYNAMIC wave
lists, energy pruning, float64 scalars — following the order of operations
of /root/reference/src/radarays_ros/RadarCPU.cpp:220-542:

    per azimuth: transmit cone -> [nearest-hit trace -> move -> material
    flip -> Snell/Fresnel split -> path-return + multipath signals -> energy
    pruning]^n_reflections -> range binning with denoise splat or max-combine
    -> ambient noise -> per-column normalize -> uint8 column.

It deliberately shares NO implementation with radarays_ros_tpu: ray-triangle
intersection is a fresh Moller-Trumbore, Snell/Fresnel and the shader are
transcribed from the reference header (radar_algorithms.h:55-187), the
denoise splat is the reference's per-tap loop (not a convolution), and
binning/normalization are per-signal scalar updates. tests/test_oracle.py
asserts whole-frame agreement with the jitted pipeline bin-for-bin.

Scope notes (documented contract of the TPU pipeline being validated):
  * cone sampling directions and noise FIELDS are inputs — PRNG streams are
    explicitly out of bin-for-bin scope (the reference draws from a
    nondeterministic std::random_device, RadarCPU.cpp:460-463); the
    distributions are tested separately (tests/test_wave_physics.py).
  * signals whose center cell falls outside [0, n_cells) are dropped
    entirely, INCLUDING any kernel taps that would land in range — this
    matches the reference exactly: every reference draw path gates the
    whole splat on the CENTER cell (`if (cell < slice.rows)`,
    RadarCPU.cpp:414; RadarGPU.cpp:630; radar_algorithms.cu:771) before
    the per-tap clip of RadarCPU.cpp:419-432. Pinned by
    tests/test_image.py::test_splat_center_guard_matches_reference.
  * range cell 0 is never written in denoise mode (the reference's
    glob_id > 0 guard, RadarCPU.cpp:423).
"""

from __future__ import annotations

import math

import numpy as np

_EPS_ANGLE = 1e-4      # radar_algorithms.h:111 special-case window
_DET_EPS = 1e-12


# ------------------------------------------------------------------ geometry

def _quat_to_matrix(q):
    x, y, z, w = (np.asarray(q, np.float64) / np.linalg.norm(q)).tolist()
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _rotz(theta):
    c, s = math.cos(theta), math.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _nearest_hit(verts, obj_ids, o, d, t_min=0.0, t_max=1000.0):
    """Moller-Trumbore nearest hit of ONE ray against all triangles.

    Returns (hit, t, oriented_normal, obj_id)."""
    v0 = verts[:, 0]
    e1 = verts[:, 1] - v0
    e2 = verts[:, 2] - v0
    pvec = np.cross(np.broadcast_to(d, e2.shape), e2)
    det = np.einsum("ij,ij->i", e1, pvec)
    ok = np.abs(det) > _DET_EPS
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o[None, :] - v0
    u = np.einsum("ij,ij->i", tvec, pvec) * inv_det
    qvec = np.cross(tvec, e1)
    v = np.einsum("j,ij->i", d, qvec) * inv_det
    t = np.einsum("ij,ij->i", e2, qvec) * inv_det
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= t_min) & (t <= t_max)
    if not hit.any():
        return False, math.inf, np.zeros(3), -1
    t = np.where(hit, t, np.inf)
    i = int(np.argmin(t))
    n = np.cross(e1[i], e2[i])
    n = n / max(np.linalg.norm(n), 1e-30)
    if float(n @ d) > 0.0:
        n = -n
    return True, float(t[i]), n, int(obj_ids[i])


# ------------------------------------------------------------- wave physics

def _fresnel(normal, dir_in, energy, pol, v1, v2):
    """Scalar Snell/Fresnel transcription of radar_algorithms.h:55-139.

    Returns (refl_dir, refr_dir (zeros when no transmission), E_refl,
    E_refr, incidence_angle)."""
    # n ~ 1/velocity, fed swapped (radar_algorithms.h:62-63)
    n1, n2 = v2, v1
    n_dot_d = float(normal @ dir_in)
    incidence_angle = math.acos(max(-1.0, min(1.0, -n_dot_d)))

    refl_dir = dir_in - 2.0 * n_dot_d * normal

    refr_dir = np.zeros(3)
    # with a zero refraction dir, acos(0 . -n) = pi/2 — the angle the
    # reference's formula yields for no transmission (it drives Reff -> 1)
    refraction_angle = math.pi / 2.0
    if n1 > 0.0:
        n21 = n2 / n1
        angle_limit = math.asin(n21) if abs(n21) <= 1.0 else 100.0
        if incidence_angle <= angle_limit and n2 > 0.0:
            n_o = -normal if n_dot_d > 0.0 else normal
            n12 = n1 / n2
            c = math.cos(incidence_angle)
            radicand = 1.0 - n12 * n12 * (1.0 - c * c)
            root = math.sqrt(max(radicand, 0.0))
            refr_dir = dir_in * n12 + n_o * (n12 * c - root)
            refraction_angle = math.acos(
                max(-1.0, min(1.0, float(refr_dir @ (-n_o)))))

    s = incidence_angle + refraction_angle
    if s < _EPS_ANGLE:
        rs = rp = (n1 - n2) / (n1 + n2) if abs(n1 + n2) > 1e-12 else 1.0
    elif s > math.pi - _EPS_ANGLE:
        rs = rp = 1.0
    else:
        rs = -math.sin(incidence_angle - refraction_angle) / math.sin(s)
        tan_s = math.tan(s)
        rp = (math.tan(incidence_angle - refraction_angle) / tan_s
              if abs(tan_s) > 1e-12 else 1.0)
    reff = min(max(pol * rs * rs + (1.0 - pol) * rp * rp, 0.0), 1.0)
    return refl_dir, refr_dir, reff * energy, (1.0 - reff) * energy, incidence_angle


def _shade(angle, energy, ambient, diffuse, specular):
    """back_reflection_shader with the reference's call-site convention:
    material (ambient, diffuse, specular) -> (diffuse, specular_fac,
    specular_exp) (RadarCPU.cpp:310-316; radar_algorithms.h:168-187)."""
    c = max(math.cos(angle), 0.0)
    return (ambient + diffuse * (c ** specular)) * energy


# ------------------------------------------------------------------- engine

def simulate_frame_oracle(verts, obj_ids, materials, object_materials, cfg,
                          local_dirs, pose, denoise_weights=None,
                          denoise_mode=0, noise_field=None):
    """One full frame, the reference way (see module docstring).

    Args:
      verts: (T, 3, 3) float triangle soup (un-chunked, un-padded).
      obj_ids: (T,) int object id per triangle.
      materials: dict of lists {velocity, ambient, diffuse, specular}.
      object_materials: (n_objects,) object -> material id.
      cfg: the pipeline's RadarModelConfig (read-only scalars).
      local_dirs: (S, 3) transmit cone directions in the beam frame — the
        pipeline's sample_cone_local output (PRNG out of oracle scope).
      pose: (7,) [t, q_xyzw] sensor pose.
      denoise_weights/denoise_mode: the kernel cfg.denoiser() returns.
      noise_field: optional (A, n_cells) noise field p in [0, 1] (the
        pipeline's uniform/Perlin field; None = ambient noise off).

    Returns (image_u8 (n_cells, A), image_float (A, n_cells), max_val (A,)).
    """
    verts = np.asarray(verts, np.float64)
    obj_ids = np.asarray(obj_ids)
    vel = np.asarray(materials["velocity"], np.float64)
    amb = np.asarray(materials["ambient"], np.float64)
    dif = np.asarray(materials["diffuse"], np.float64)
    spe = np.asarray(materials["specular"], np.float64)
    object_materials = np.asarray(object_materials)

    A = cfg.n_angles
    n_cells = cfg.n_cells
    air = cfg.material_id_air
    thresh = cfg.wave_energy_threshold

    R_sm = _quat_to_matrix(np.asarray(pose[3:7], np.float64))
    t_sm = np.asarray(pose[:3], np.float64)
    sensor = t_sm + np.array([0.0, 0.0, cfg.z_offset])

    img = np.zeros((A, n_cells))
    max_val = np.zeros(A)

    for a in range(A):
        theta = -(2.0 * math.pi) * a / A            # Radar.cpp:27-32 spin
        R_am = R_sm @ _rotz(theta)
        # dynamic wave list (RadarCPU.cpp:220: one list per pass)
        waves = [dict(orig=sensor.copy(), dir=R_am @ np.asarray(s, np.float64),
                      energy=1.0, pol=0.5, vel=vel[air], time=0.0, mat=air)
                 for s in local_dirs]
        signals = []  # (time, strength)

        for pass_id in range(cfg.n_reflections):
            nxt = []
            for w in waves:
                hit, t, normal, obj = _nearest_hit(verts, obj_ids,
                                                   w["orig"], w["dir"])
                if not hit:
                    continue
                # move to the hit (radar_types.h:108-113)
                w_orig = w["orig"] + w["dir"] * t
                w_time = w["time"] + t / w["vel"]
                # material flip (RadarCPU.cpp:264-271)
                refr_mat = object_materials[obj] if w["mat"] == air else air
                v2 = w["vel"] if refr_mat == w["mat"] else vel[refr_mat]

                refl_dir, refr_dir, e_refl, e_refr, angle = _fresnel(
                    normal, w["dir"], w["energy"], w["pol"], w["vel"], v2)

                if e_refl > thresh:
                    in_air = w["mat"] == air
                    # path-return signal (RadarCPU.cpp:302-323)
                    if in_air and (pass_id == 0 or cfg.record_multi_reflection):
                        ret = _shade(angle, e_refl, amb[refr_mat],
                                     dif[refr_mat], spe[refr_mat])
                        signals.append((2.0 * w_time, ret))
                    # multipath air return (RadarCPU.cpp:325-360)
                    if cfg.record_multi_path and pass_id > 0 and in_air:
                        to_sensor = w_orig - sensor
                        dist = np.linalg.norm(to_sensor)
                        dir_s2h = to_sensor / max(dist, 1e-12)
                        view_scalar = float(w["dir"] @ dir_s2h)
                        if view_scalar > cfg.multipath_threshold:
                            angle_air = math.acos(max(-1.0, min(
                                1.0, float(-refl_dir @ dir_s2h))))
                            e_air = _shade(angle_air, e_refl, amb[refr_mat],
                                           dif[refr_mat], spe[refr_mat])
                            signals.append(
                                (w_time + dist / w["vel"], e_air))
                    # reflection child stays in the medium; skip_dist advance
                    child = dict(
                        orig=w_orig + refl_dir * cfg.skip_dist,
                        dir=refl_dir, energy=e_refl, pol=w["pol"],
                        vel=w["vel"],
                        time=w_time + cfg.skip_dist / w["vel"], mat=w["mat"])
                    nxt.append(child)
                if (not cfg.opaque_materials and e_refr > thresh
                        and float(refr_dir @ refr_dir) > 0.25):
                    child = dict(
                        orig=w_orig + refr_dir * cfg.skip_dist,
                        dir=refr_dir, energy=e_refr, pol=w["pol"],
                        vel=v2, time=w_time + cfg.skip_dist / v2,
                        mat=refr_mat)
                    nxt.append(child)
            waves = nxt

        # --- range binning (RadarCPU.cpp:402-450)
        col = img[a]
        if denoise_weights is not None:
            w_k = np.asarray(denoise_weights, np.float64)
            for t_sig, s_sig in signals:
                cell = int((0.3 * t_sig / 2.0) / cfg.resolution)
                if 0 <= cell < n_cells:
                    for k in range(len(w_k)):
                        g = cell + k - denoise_mode
                        if 0 <= g < n_cells:
                            col[g] += s_sig * w_k[k]
            col[0] = 0.0                        # glob_id > 0 guard
        else:
            for t_sig, s_sig in signals:
                cell = int((0.3 * t_sig / 2.0) / cfg.resolution)
                if 0 <= cell < n_cells:
                    col[cell] = max(col[cell], s_sig)
            np.maximum(col, 0.0, out=col)
        max_val[a] = col.max()

    img *= cfg.energy_max                       # RadarCPU.cpp:453

    # --- ambient noise (RadarCPU.cpp:459-528), field injected
    if noise_field is not None and cfg.ambient_noise != 0:
        p = np.asarray(noise_field, np.float64)
        x = (np.arange(n_cells) + 0.5) * cfg.resolution
        for a in range(A):
            amp = max_val[a]
            safe_amp = amp if amp > 0 else 1.0
            sf = 1.0 - img[a] / safe_amp
            s4 = sf ** 4
            noise_amp = (s4 * (amp * cfg.ambient_noise_at_signal_0)
                         + (1.0 - s4) * (amp * cfg.ambient_noise_at_signal_1))
            y = noise_amp * p[a]
            y = y + (amp * cfg.ambient_noise_energy_max
                     - amp * cfg.ambient_noise_energy_min) * np.exp(
                -cfg.ambient_noise_energy_loss * x) \
                + amp * cfg.ambient_noise_energy_min
            img[a] += np.abs(y)

    # --- per-column normalization + u8 (RadarCPU.cpp:533-542)
    out = np.zeros((n_cells, A), np.uint8)
    for a in range(A):
        scale = cfg.signal_max / max_val[a] if max_val[a] > 0 else 0.0
        colq = np.clip(np.round(img[a] * scale), 0, 255).astype(np.uint8)
        out[:, (cfg.scroll_image + a) % A] = colq
    return out, img, max_val
