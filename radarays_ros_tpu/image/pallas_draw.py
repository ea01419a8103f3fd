"""Pallas signal-binning kernel: one-hot accumulate instead of XLA scatter.

The per-frame signal draw scatters ~3e5 (azimuth, cell, strength) updates
into the (400, n_cells) polar image. XLA lowers duplicate-index scatter on
TPU to a serialized update loop (~47 ms measured); this kernel instead
sweeps the signal list once and accumulates a VMEM-resident image tile with
vectorized one-hot FMAs — no scatter anywhere.

Layout: azimuths ride the LANE axis (padded to a 128 multiple) and the
signal index rides the SUBLANE axis, because Mosaic only supports dynamic
indexing on the sublane dimension (`ref[pl.ds(n, 1), :]`); per signal n the
kernel broadcasts the (1, L) cell row against a (n_cells, L) iota and FMAs:

    acc += where(cell_iota == cell[n], s[n], 0)

The counterpart of the reference's draw_signals CUDA kernel
(radar_algorithms.cu:730-849), reorganized for a vector machine.

Modes: sum (denoise splat point image; the output then runs through the XLA
denoise convolution) and max (no-denoise max-combine, RadarCPU.cpp:434-448).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bin_kernel(cell_ref, s_ref, out_ref, *scratch, n_cells: int,
                n_signals: int, combine: str, weights=None, w_mode: int = 0):
    L = cell_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_cells, L), 0)

    if weights is not None:
        # Fused denoise splat (combine == "sum" only): bin into a VMEM
        # scratch, then apply the W static correlation taps while the
        # point image is still VMEM-resident — cells ride the SUBLANE
        # axis here, so each tap is a cheap static sublane shift, and the
        # point image never round-trips HBM (the standalone XLA shift-add
        # re-read the (A, n_cells) image W times from HBM: 8.3 ms per
        # 20-frame KAIST batch vs ~2 ms fused; docs/PERFORMANCE.md).
        # Tap order and f32 accumulation order match image/draw.py's XLA
        # shift-add exactly (zeros + w0*x0 + w1*x1 + ...), so all three
        # draw methods stay bit-identical.
        acc_ref = scratch[0]
        acc_ref[...] = jnp.zeros((n_cells, L), jnp.float32)

        def body(n, _):
            c = cell_ref[0, pl.ds(n, 1), :]             # (1, L)
            s = s_ref[0, pl.ds(n, 1), :]
            acc_ref[...] = acc_ref[...] + jnp.where(col == c, s, 0.0)
            return 0

        jax.lax.fori_loop(0, n_signals, body, 0)
        # Tap accumulation in static sublane tiles: a full-image value
        # accumulator would put W+2 (n_cells, L) temporaries on the VMEM
        # stack (measured 40 MB at KAIST scale — compile OOM); per 128-row
        # tile the live set is a few 128 x L registersful, each scratch
        # element is re-read from VMEM, and the output is written once.
        TS = 128
        for lo in range(0, n_cells, TS):
            hi = min(n_cells, lo + TS)
            h = hi - lo
            img_t = jnp.zeros((h, L), jnp.float32)
            for k, wk in enumerate(weights):
                d = k - w_mode               # img[c] += w[k] * point[c - d]
                a = max(lo - d, 0)
                b = min(lo - d + h, n_cells)
                if b <= a:
                    continue
                sh = jnp.pad(acc_ref[a:b, :],
                             ((a - (lo - d), (lo - d + h) - b), (0, 0)))
                img_t = img_t + wk * sh
            out_ref[0, lo:hi, :] = img_t
        return

    init = 0.0 if combine == "sum" else -jnp.inf
    out_ref[0] = jnp.full((n_cells, L), init, jnp.float32)

    def body(n, _):
        c = cell_ref[0, pl.ds(n, 1), :]                 # (1, L)
        s = s_ref[0, pl.ds(n, 1), :]
        hit = col == c
        if combine == "sum":
            out_ref[0] = out_ref[0] + jnp.where(hit, s, 0.0)
        else:
            out_ref[0] = jnp.where(hit, jnp.maximum(out_ref[0], s), out_ref[0])
        return 0

    jax.lax.fori_loop(0, n_signals, body, 0)
    if combine == "max":
        out_ref[0] = jnp.maximum(out_ref[0], 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _bin_vjp(cell, s, n_cells, combine, lanes, interpret, weights, w_mode):
    return _bin_impl(cell, s, n_cells=n_cells, combine=combine, lanes=lanes,
                     interpret=interpret, weights=weights, w_mode=w_mode)


def _bin_fwd(cell, s, n_cells, combine, lanes, interpret, weights, w_mode):
    out = _bin_impl(cell, s, n_cells=n_cells, combine=combine, lanes=lanes,
                    interpret=interpret, weights=weights, w_mode=w_mode)
    return out, (cell, s, out)


def _bin_bwd(n_cells, combine, lanes, interpret, weights, w_mode, res, g):
    """Gradient w.r.t. strengths (cells are integer indices — no gradient).

    sum: each signal receives its cell's cotangent (a gather — the adjoint
    of the one-hot accumulate). max: the subgradient routes the cotangent to
    every signal equal to its cell's maximum (matching jnp's scatter-max
    ties-take-all convention closely enough for optimization; the denoise
    path used by the optimizer is the linear sum). With fused denoise taps,
    the cotangent is first pulled back through the correlation (its adjoint
    is the opposite-shift correlation: d point[p] = sum_k w[k] g[p + k -
    mode]) and then gathered exactly like the plain sum.
    """
    cell, s, out = res
    A, N = cell.shape
    if weights is not None:
        gc = jnp.zeros_like(g)
        for k, wk in enumerate(weights):
            d = k - w_mode                  # img[c] += w[k] * point[c - d]
            if d == 0:
                sh = g
            elif d > 0:                     # d point[p] += w[k] * g[p + d]
                sh = jnp.pad(g[:, d:], ((0, 0), (0, d)))
            else:
                sh = jnp.pad(g[:, :n_cells + d], ((0, 0), (-d, 0)))
            gc = gc + wk * sh
        g = gc
    az = jnp.broadcast_to(jnp.arange(A)[:, None], (A, N))
    safe = jnp.clip(cell, 0, n_cells - 1)
    ok = (cell >= 0) & (cell < n_cells)
    g_at = g[az, safe]
    if combine == "sum":
        ds = jnp.where(ok, g_at, 0.0)
    else:
        is_max = ok & (s == out[az, safe])
        ds = jnp.where(is_max, g_at, 0.0)
    return None, ds


_bin_vjp.defvjp(_bin_fwd, _bin_bwd)


def bin_signals_pallas(cell, s, *, n_cells: int, combine: str = "sum",
                       lanes: int = 512, interpret: bool = False,
                       weights=None, w_mode: int = 0):
    """Bin (A, N) signals -> (A, n_cells); `cell` must already encode
    invalid signals as an out-of-range value (e.g. n_cells).

    weights/w_mode (static tuple of floats + mode index, combine="sum"
    only): fuse the denoise correlation taps into the kernel — the output
    is then the SPLATTED image (bit-identical to binning followed by
    image/draw.py's XLA shift-add, at ~1/4 the HBM traffic).

    Differentiable w.r.t. `s` via a custom VJP (the kernel itself has no
    autodiff rule): material optimization differentiates through the frame,
    and the production draw path must not silently require method="scatter".
    """
    if weights is not None and combine != "sum":
        raise ValueError("fused denoise taps require combine='sum'")
    return _bin_vjp(cell, s, n_cells, combine, lanes, interpret,
                    None if weights is None else tuple(map(float, weights)),
                    int(w_mode))


@functools.partial(jax.jit,
                   static_argnames=("n_cells", "combine", "lanes", "interpret",
                                    "weights", "w_mode"))
def _bin_impl(cell, s, *, n_cells: int, combine: str = "sum",
              lanes: int = 512, interpret: bool = False, weights=None,
              w_mode: int = 0):
    if weights is not None and lanes > 256:
        # the fused-tap kernel holds the raw-bin scratch AND the output
        # block in VMEM; 512 lanes at KAIST n_cells would need ~2x 6.7 MB
        # plus tap temporaries — 256 keeps it comfortably inside 16 MB
        lanes = 256
    A, N = cell.shape
    pad_n = (-N) % 8
    if pad_n:
        cell = jnp.concatenate(
            [cell, jnp.full((A, pad_n), n_cells, cell.dtype)], axis=1)
        s = jnp.concatenate([s, jnp.zeros((A, pad_n), s.dtype)], axis=1)
    pad_a = (-A) % lanes
    if pad_a:
        cell = jnp.concatenate(
            [cell, jnp.full((pad_a, cell.shape[1]), n_cells, cell.dtype)],
            axis=0)
        s = jnp.concatenate(
            [s, jnp.zeros((pad_a, s.shape[1]), s.dtype)], axis=0)
    Ap, Np = cell.shape
    G = Ap // lanes
    # (G, Np, lanes): signals on sublanes, azimuths on lanes
    cell_g = cell.reshape(G, lanes, Np).transpose(0, 2, 1)
    s_g = s.reshape(G, lanes, Np).transpose(0, 2, 1)

    kernel = functools.partial(_bin_kernel, n_cells=n_cells, n_signals=Np,
                               combine=combine, weights=weights,
                               w_mode=w_mode)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Np, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_cells, lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, n_cells, lanes), jnp.float32),
        scratch_shapes=([pltpu.VMEM((n_cells, lanes), jnp.float32)]
                        if weights is not None else []),
        interpret=interpret,
    )(cell_g, s_g)
    # (G, n_cells, lanes) -> (A, n_cells)
    return out.transpose(0, 2, 1).reshape(Ap, n_cells)[:A]
