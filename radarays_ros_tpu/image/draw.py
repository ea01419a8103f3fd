"""Signal drawing: (time, strength) pairs -> polar range/azimuth image.

TPU-shaped rebuild of the reference's per-signal splat loops
(RadarCPU.cpp:402-450 CPU; radar_algorithms.cu:730-849 draw_signals kernel):

  * All azimuth columns are processed at once: signals arrive as dense
    (A, N) arrays with a validity mask.
  * Range binning: cell = floor((0.3 * t / 2) / resolution)
    (RadarCPU.cpp:410-413); signals with cell >= n_cells are dropped.
  * Denoising splat: instead of scattering W kernel taps per signal, we
    point-bin each signal's strength into its cell and then run ONE 1-D
    cross-correlation with the kernel along the range axis — mathematically
    identical (the splat is linear). The reference's `glob_id > 0` guard
    (RadarCPU.cpp:423-424) — which silently never writes range cell 0 — is
    reproduced by zeroing row 0 after the convolution.
  * Point binning has three implementations (draw_method): "pallas" (one-hot
    accumulate kernel, image/pallas_draw.py — fastest on TPU), "scatter"
    (XLA scatter) and "sort" (sort+cumsum+searchsorted); parity-tested.
  * No-denoise mode max-combines signals per cell (RadarCPU.cpp:434-448).
  * Ambient noise + normalization follow RadarCPU.cpp:453-542 exactly
    (signal-adaptive amplitude, exponential range floor, per-column
    signal_max/max_val scaling), with the Perlin scales/fractions taken from
    the config (the CPU reference hardcodes 0.05/0.2/0.9 at
    RadarCPU.cpp:468-493; our defaults equal those values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from radarays_ros_tpu.image.perlin import perlin_affine_rows, perlin_noise


def bin_cells(times, resolution):
    """Range cell index for signal times: (0.3 [m/ns] * t / 2) / resolution."""
    signal_dist = 0.3 * times / 2.0
    return (signal_dist / resolution).astype(jnp.int32)


def _rowwise_bin_sum(cell, s, ok, n_cells: int):
    """Per-row histogram sum WITHOUT scatter: sort + cumsum + searchsorted.

    XLA lowers scatter-with-duplicate-indices to a serialized update loop on
    TPU — for the ~3e5 signals of a tuned frame that dominates the whole
    pipeline. Sorting each azimuth row by cell index, prefix-summing the
    strengths and differencing at bucket boundaries computes the identical
    histogram with only sorts, cumsums and gathers (all vectorized on TPU).
    """
    A, N = cell.shape
    key = jnp.where(ok, cell, n_cells)            # invalid -> overflow bucket
    order = jnp.argsort(key, axis=1)
    key_s = jnp.take_along_axis(key, order, axis=1)
    s_s = jnp.take_along_axis(jnp.where(ok, s, 0.0), order, axis=1)
    cs = jnp.concatenate(
        [jnp.zeros((A, 1), jnp.float32), jnp.cumsum(s_s, axis=1)], axis=1)
    bounds = jnp.arange(n_cells + 1, dtype=key_s.dtype)
    lo = jax.vmap(lambda k: jnp.searchsorted(k, bounds, side="left"))(key_s)
    return cs[jnp.arange(A)[:, None], lo[:, 1:]] - \
        cs[jnp.arange(A)[:, None], lo[:, :-1]]


def _rowwise_bin_max(cell, s, ok, n_cells: int):
    """Per-row histogram max without scatter: lexicographic sort puts each
    bucket's maximum last in its run; gather it at the bucket boundary."""
    A, N = cell.shape
    key = jnp.where(ok, cell, n_cells)
    s_m = jnp.where(ok, s, -jnp.inf)
    # sort by (cell, strength): stable argsort of strength, then of cell
    order_s = jnp.argsort(s_m, axis=1)
    key_1 = jnp.take_along_axis(key, order_s, axis=1)
    s_1 = jnp.take_along_axis(s_m, order_s, axis=1)
    order_k = jnp.argsort(key_1, axis=1, stable=True)
    key_s = jnp.take_along_axis(key_1, order_k, axis=1)
    s_s = jnp.take_along_axis(s_1, order_k, axis=1)
    bounds = jnp.arange(n_cells + 1, dtype=key_s.dtype)
    lo = jax.vmap(lambda k: jnp.searchsorted(k, bounds, side="left"))(key_s)
    hi = lo[:, 1:]                                 # end of each bucket's run
    has = hi > lo[:, :-1]
    rows = jnp.arange(A)[:, None]
    vals = s_s[rows, jnp.maximum(hi - 1, 0)]
    # clamp to 0 like the scatter path (jnp.maximum(img, 0.0) below) and the
    # pallas kernel, so negative strengths bin identically across methods
    return jnp.where(has, jnp.maximum(vals, 0.0), 0.0)


def draw_signals(times, strengths, valid, *, n_cells: int, resolution,
                 denoise_weights=None, denoise_mode: int = 0,
                 method: str = "auto"):
    """Draw per-azimuth signal lists into an (A, n_cells) float image.

    Args:
      times:     (A, N) signal round-trip times [ns].
      strengths: (A, N) signal strengths.
      valid:     (A, N) bool mask.
      denoise_weights: static (W,) kernel (mode tap scaled to 1.0) or None.
      denoise_mode: integer mode offset of the kernel.
      method:    "scatter" (XLA scatter binning), "sort" (sort + cumsum +
                 searchsorted) or "pallas" (one-hot accumulate kernel,
                 image/pallas_draw.py) — identical results, different TPU
                 cost profiles. "auto" = "pallas" on TPU (the measured-fast
                 path, docs/PERFORMANCE.md), "scatter" elsewhere.

    Returns (image (A, n_cells) float32, max_val (A,)) where max_val is the
    per-column maximum BEFORE any energy_max scaling, matching the running
    max of RadarCPU.cpp:404-448.
    """
    if method == "auto":
        method = "pallas" if jax.default_backend() == "tpu" else "scatter"
    A, N = times.shape
    cell = bin_cells(times, resolution)
    ok = valid & (cell >= 0) & (cell < n_cells)

    if denoise_weights is not None:
        w_host = np.asarray(denoise_weights, np.float32)
        W = w_host.shape[0]
        if method == "pallas":
            # the kernel fuses the W correlation taps while the binned
            # image is still VMEM-resident (image/pallas_draw.py) —
            # bit-identical to the bin + shift-add below
            from radarays_ros_tpu.image.pallas_draw import bin_signals_pallas

            img = bin_signals_pallas(
                jnp.where(ok, cell, n_cells), jnp.where(ok, strengths, 0.0),
                n_cells=n_cells, combine="sum",
                weights=tuple(float(x) for x in w_host),
                w_mode=denoise_mode,
                interpret=jax.default_backend() != "tpu")
        else:
            if method == "sort":
                point = _rowwise_bin_sum(cell, strengths, ok, n_cells)
            else:
                az = jnp.broadcast_to(
                    jnp.arange(A, dtype=jnp.int32)[:, None], (A, N))
                point = jnp.zeros((A, n_cells), jnp.float32).at[
                    az, jnp.where(ok, cell, 0)].add(
                        jnp.where(ok, strengths, 0.0))
            # correlate so out[cell + k - mode] += strength * w[k], as W
            # static shifted multiply-adds on the VPU. Each tap product is
            # a plain f32 elementwise multiply — exact on hardware, unlike
            # the MXU conv whose DEFAULT precision truncates inputs to bf16
            # and whose HIGHEST repair ran six accumulation passes (12.7 ms
            # per 20-frame batch; docs/PERFORMANCE.md).
            padded = jnp.pad(point, ((0, 0), (W - 1, W - 1)))
            img = jnp.zeros_like(point)
            for k in range(W):
                off = (W - 1) - (k - denoise_mode)
                img = img + float(w_host[k]) * padded[:, off:off + n_cells]
        # reference never writes range cell 0 in denoise mode (glob_id > 0)
        img = img.at[:, 0].set(0.0)
    else:
        if method == "sort":
            img = _rowwise_bin_max(cell, strengths, ok, n_cells)
        elif method == "pallas":
            from radarays_ros_tpu.image.pallas_draw import bin_signals_pallas

            img = bin_signals_pallas(
                jnp.where(ok, cell, n_cells),
                jnp.where(ok, strengths, -jnp.inf),
                n_cells=n_cells, combine="max",
                interpret=jax.default_backend() != "tpu")
        else:
            az = jnp.broadcast_to(
                jnp.arange(A, dtype=jnp.int32)[:, None], (A, N))
            img = jnp.zeros((A, n_cells), jnp.float32).at[
                az, jnp.where(ok, cell, 0)].max(
                    jnp.where(ok, strengths, -jnp.inf))
            img = jnp.maximum(img, 0.0)

    max_val = jnp.max(img, axis=-1)
    return img, max_val


def apply_ambient_noise(img, max_val, cols, key, *, mode: int, resolution,
                        at_signal_0, at_signal_1, energy_max, energy_min,
                        energy_loss, perlin_scale_low=0.05,
                        perlin_scale_high=0.2, perlin_p_low=0.9,
                        rows_slice=None):
    """Add signal-adaptive ambient noise to an (A, n_cells) image.

    `img` must already be scaled by cfg.energy_max (RadarCPU.cpp:453), while
    `max_val` is the pre-scaling per-column max — that asymmetry is the
    reference's (RadarCPU.cpp:453-533): energy_max < 1 lowers the signal
    relative to the noise floor.

    mode: 0=none, 1=uniform, 2=two-octave Perlin (cfg/RadarModel.cfg:54-60).
    cols: (A,) actual image column per azimuth (the Perlin y coordinate,
    RadarCPU.cpp:487).
    rows_slice: optional (row_offset, n_rows_total). When the image is an
    azimuth WEDGE of a larger frame (the shard_map 2-D path,
    parallel/sharding.py), the PRNG fields are drawn at the full
    (n_rows_total, n_cells) shape and sliced at row_offset, so every shard's
    noise is bit-identical to the unsharded frame's.
    """
    if mode == 0:
        return img
    A, n_cells = img.shape
    a0, a_total = rows_slice if rows_slice is not None else (0, A)
    k_begin, k_uni = jax.random.split(key)
    i = jnp.arange(n_cells, dtype=jnp.float32)[None, :]

    if mode == 1:
        p = jax.random.uniform(k_uni, (a_total, n_cells), jnp.float32)
        p = jax.lax.dynamic_slice_in_dim(p, a0, A, axis=0)
    else:
        # integer per-row offsets let the fast affine-row Perlin share its
        # lattice phase across rows (perlin.py:perlin_affine_rows) — same
        # row decorrelation as the reference's continuous random begin
        # (RadarCPU.cpp:461-463), ~20x cheaper on TPU
        random_begin = jax.lax.dynamic_slice_in_dim(
            jax.random.randint(k_begin, (a_total,), 0, 1000), a0, A)
        y = cols.astype(jnp.float32)
        p1 = perlin_affine_rows(random_begin, y * perlin_scale_low,
                                perlin_scale_low, n_cells)
        p2 = perlin_affine_rows(random_begin, y * perlin_scale_high,
                                perlin_scale_high, n_cells)
        p = perlin_p_low * p1 + (1.0 - perlin_p_low) * p2

    amp = max_val[:, None]
    safe_amp = jnp.where(amp > 0.0, amp, 1.0)
    signal_frac = 1.0 - img / safe_amp
    sf2 = signal_frac * signal_frac
    signal_4 = sf2 * sf2  # pow(x, 4.0) is a transcendental on TPU
    noise_amp = signal_4 * (amp * at_signal_0) + (1.0 - signal_4) * (amp * at_signal_1)

    x = (i + 0.5) * resolution
    noise_e_max = amp * energy_max
    noise_e_min = amp * energy_min
    y_noise = noise_amp * p
    y_noise = y_noise + (noise_e_max - noise_e_min) * jnp.exp(-energy_loss * x) + noise_e_min
    return img + jnp.abs(y_noise)


def normalize_to_u8(img, max_val, signal_max):
    """Per-column scale to signal_max/max_val and saturate-cast to uint8.

    RadarCPU.cpp:533-542 (slice *= signal_max / max_val; convertTo CV_8UC1).
    Columns with no signal (max_val == 0) come out all-zero instead of the
    reference's NaN division.
    """
    scale = jnp.where(max_val > 0.0, signal_max / jnp.where(max_val > 0.0, max_val, 1.0), 0.0)
    out = img * scale[:, None]
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
