"""Pallas signal-binning kernel: one-hot accumulate instead of XLA scatter.

The per-frame signal draw scatters ~3e5 (azimuth, cell, strength) updates
into the (400, n_cells) polar image. XLA lowers duplicate-index scatter on
TPU to a serialized update loop (~47 ms measured); this kernel instead
sweeps the signal list once per 8-azimuth row group and accumulates a
VMEM-resident (8, n_cells) tile with vectorized one-hot FMAs:

    acc += s[:, n:n+1] * (cell_iota == cell[:, n:n+1])

one VPU op sequence per signal over the whole row — no scatter anywhere.
The counterpart of the reference's draw_signals CUDA kernel
(radar_algorithms.cu:730-849), reorganized for a vector machine.

Modes: sum (denoise splat point image; the kernel's output then runs
through the XLA denoise convolution) and max (no-denoise max-combine,
RadarCPU.cpp:434-448).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bin_kernel(cell_ref, s_ref, out_ref, *, n_cells: int, n_signals: int,
                combine: str):
    rows = cell_ref.shape[1]
    init = 0.0 if combine == "sum" else -jnp.inf
    acc0 = jnp.full((rows, n_cells), init, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, n_cells), 1)

    def body(n, acc):
        c = cell_ref[0, :, n][:, None]                  # (rows, 1)
        s = s_ref[0, :, n][:, None]
        hit = col == c
        if combine == "sum":
            return acc + jnp.where(hit, s, 0.0)
        return jnp.where(hit, jnp.maximum(acc, s), acc)

    acc = jax.lax.fori_loop(0, n_signals, body, acc0)
    if combine == "max":
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("n_cells", "combine", "rows", "interpret"))
def bin_signals_pallas(cell, s, *, n_cells: int, combine: str = "sum",
                       rows: int = 8, interpret: bool = False):
    """Bin (A, N) signals -> (A, n_cells); `cell` must already encode
    invalid signals as an out-of-range value (e.g. n_cells)."""
    A, N = cell.shape
    pad = (-A) % rows
    if pad:
        cell = jnp.concatenate(
            [cell, jnp.full((pad, N), n_cells, cell.dtype)], axis=0)
        s = jnp.concatenate([s, jnp.zeros((pad, N), s.dtype)], axis=0)
    G = cell.shape[0] // rows
    cell_g = cell.reshape(G, rows, N)
    s_g = s.reshape(G, rows, N)

    kernel = functools.partial(_bin_kernel, n_cells=n_cells, n_signals=N,
                               combine=combine)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, rows, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, n_cells), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, rows, n_cells), jnp.float32),
        interpret=interpret,
    )(cell_g, s_g)
    return out.reshape(G * rows, n_cells)[:A]
