"""Scene representation: flat triangle soup + object ids + material map.

Replaces the reference's rmagine Embree/OptiX map import
(src/radar_simulator.cpp:149,164) with a backend-neutral array form: the whole
scene is a (T, 3, 3) float32 vertex tensor plus an int32 object id per
triangle, and an object->material lookup table (the `object_materials` ROS
param, Radar.cpp:220-226). Host-side state is NumPy; `device_arrays()`
produces the jnp pytree consumed by the tracers, including precomputed
plane-equation coefficients for the MXU tracer (trace/planes.py) and
median-split leaf chunks + AABBs for the culled tracers.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple, Optional, Sequence

import numpy as np


class SceneArrays(NamedTuple):
    """Device-side scene pytree (all jnp arrays once put on device)."""

    verts: np.ndarray            # (T, 3, 3) triangle vertices
    obj_ids: np.ndarray          # (T,) int32 object id per triangle
    normals: np.ndarray          # (T, 3) unit geometric normals
    planes_o: np.ndarray         # (4T, 4) plane rows for origin side: [n, offset]
    planes_d: np.ndarray         # (4T, 3) plane normals for direction side
    chunk_aabb_lo: np.ndarray    # (C, 3) chunk AABB minima
    chunk_aabb_hi: np.ndarray    # (C, 3) chunk AABB maxima
    chunk_size: int              # triangles per chunk (static)
    # Pallas-kernel DMA layout of the intersection table
    # (_sweep_table_fused), stored in BF16: every slot value is a
    # bf16-exact split part by construction (see _SPLIT_PAIRS), so bf16
    # storage is bitwise-lossless for the kernel's MXU contraction at
    # half the HBM footprint, slab DMA bytes, and host build cost of the
    # round-3 f32 storage. (SWEEP_K, C*5*chunk_size), chunk-major
    # [so | sd | e0 | e1 | e2] column groups: support-plane
    # numerator/denominator (24 live rows, zero-padded to SWEEP_K) and
    # the three edge numerators — 8 plane rows per triangle collapse to
    # these 5 matmul output rows, the sweep kernel's dominant VMEM
    # stream (see _sweep_tables for the derivation). One contiguous slab
    # per chunk -> ONE DMA per chunk visit (a two-table split measured
    # ~15% frame loss on short sweeps, round 4). Scene-constant:
    # precomputed here (None -> the tracer derives it on the fly, e.g.
    # for hand-built SceneArrays).
    sweep_table_t: Optional[np.ndarray] = None   # (SWEEP_K, 5T) bf16
    # Packed per-triangle fetch table for the pallas3 in-kernel hit fetch,
    # (48, T) bf16: 16 semantic rows (0-8 = v0,e1,e2; 9-11 = unit normal;
    # 12 = obj_id as f32, -1 for padding; 13 = aux; 14-15 zero) stored as
    # three bf16-exact part blocks (split-exact, see _tri_fetch_table).
    # The sweep kernel contracts it against a one-hot of each lane's
    # winning triangle (one MXU matmul per visited chunk), replacing XLA
    # row gathers that run at ~1.5 GB/s.
    tri_table_t: Optional[np.ndarray] = None  # (48, T) bf16

    @property
    def n_triangles(self) -> int:
        return self.verts.shape[0]

    @property
    def n_chunks(self) -> int:
        return self.chunk_aabb_lo.shape[0]


def _triangle_planes(verts: np.ndarray):
    """Plane-equation form of Moller-Trumbore for the MXU tracer.

    For each triangle (v0, v1, v2) with geometric normal n:
      * support plane:  s0(x) = n.x - n.v0         (hit when s0(o) + t n.d = 0)
      * 3 edge planes:  sk(x) = mk.x - mk.vk  with mk = n x (v_{k+1} - v_k),
        oriented so points inside the triangle have sk >= 0.

    A point p is inside iff s1(p), s2(p), s3(p) >= 0; the ray parameter is
    t = -s0(o) / (n.d). Evaluating sk(o) and n_k.d for all (ray, plane) pairs
    is two dense matmuls — that is what puts ray casting on the MXU.
    """
    v0, v1, v2 = verts[:, 0], verts[:, 1], verts[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / np.maximum(norm, 1e-30)

    edges = [(v0, v1), (v1, v2), (v2, v0)]
    plane_normals = [n_unit]
    plane_offsets = [-np.sum(n_unit * v0, axis=-1)]
    for a, b in edges:
        m = np.cross(n_unit, b - a)
        mlen = np.linalg.norm(m, axis=-1, keepdims=True)
        m = m / np.maximum(mlen, 1e-30)
        plane_normals.append(m)
        plane_offsets.append(-np.sum(m * a, axis=-1))

    # interleave per triangle: [support, edge0, edge1, edge2]
    N = np.stack(plane_normals, axis=1)          # (T, 4, 3)
    O = np.stack(plane_offsets, axis=1)          # (T, 4)
    planes_d = N.reshape(-1, 3).astype(np.float32)               # (4T, 3)
    planes_o = np.concatenate(
        [N.reshape(-1, 3), O.reshape(-1, 1)], axis=-1
    ).astype(np.float32)                                          # (4T, 4)
    return n_unit.astype(np.float32), planes_o, planes_d


# Split-exact MXU scheme (the sweep kernel's f32 exactness on real TPUs).
#
# Mosaic lowers f32 matmuls by truncating INPUTS to bf16 (8-bit mantissa) —
# measured on a v5e as ~0.4%-relative slop: 1% wrong hits vs the brute
# oracle and object ids rounded to bf16-representable values. Requesting
# Precision.HIGHEST fixes it but runs SIX accumulation passes, each
# streaming the full (5Tc, RB) output through VMEM — measured 2.7x slower.
#
# Instead, every f32 value is pre-split into THREE bf16-exact f32 parts
# (v = v0 + v1 + v2, 8 mantissa bits each), and each scalar product a*b is
# expanded into the six dominant part-products along the CONTRACTION axis:
# (i, j) in _SPLIT_PAIRS covers i+j <= 2, leaving only O(2^-24)-relative
# terms out — f32-rounding-level accuracy. The MXU truncation of the
# pre-split inputs is LOSSLESS, products of 8-bit-mantissa values are
# exact in f32 accumulation, and K grows 8 -> 40 (still one MXU pass:
# K <= 128 fits the systolic depth), so the output is written ONCE.
_SPLIT_PAIRS = ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))
SWEEP_K = 40    # slab height: edge columns use 36 slots, padded to 40
SWEEP_K_A = 24  # so columns: 18 o-part + 3 one slots, padded to 24


def _bf16_dtype(xp):
    if xp is np:
        import ml_dtypes

        return ml_dtypes.bfloat16
    return "bfloat16"


def _bf16_parts(x, xp=np):
    """Split f32 into 3 f32 parts, each exactly bf16-representable, with
    x == p0 + p1 + p2 exactly (bf16x3 operand splitting).

    The host (numpy) path rounds each part to nearest (ml_dtypes); the
    traced (jnp) path MUST NOT be written as `x - x.astype(bf16)
    .astype(f32)`: XLA under --xla_allow_excess_precision (set by the TPU
    compile service) treats the f32->bf16->f32 round-trip as
    value-preserving and cancels the subtraction to ZERO, silently
    stripping the fine parts — measured in round 4 as the pallas3 sweep
    running at plain-bf16 accuracy (~0.3% wrong hit distances, 164
    wrong winners per 131k rays) while every part-building step computed
    EAGERLY was exact. The jnp path therefore splits by integer mantissa
    masking (a truncation split, immune to floating-point rewrites):
    p0 = bits(x) & 0xffff0000 is exactly bf16-representable, x - p0 is
    exact (same exponent window), and the <= 8 trailing mantissa bits of
    the second remainder make p2 bf16-exact too. Truncation and
    round-to-nearest splits differ in the parts they produce but both
    reconstruct x exactly — table-side (host, RNE) and feature-side
    (traced, truncation) conventions need not match."""
    if xp is np:
        bf16 = _bf16_dtype(np)
        p0 = x.astype(bf16).astype(np.float32)
        r = x - p0
        p1 = r.astype(bf16).astype(np.float32)
        return p0, p1, r - p1
    import jax

    def trunc(v):
        b = jax.lax.bitcast_convert_type(v, xp.uint32)
        return jax.lax.bitcast_convert_type(
            b & xp.uint32(0xFFFF0000), xp.float32)

    p0 = trunc(x)
    r = x - p0
    p1 = trunc(r)
    return p0, p1, r - p1


def _sweep_tables(planes_o, chunk_size: int, xp=np):
    """Pallas sweep-kernel intersection tables, BF16:
      A table (SWEEP_K_A, C*2*Tc), chunk-major column groups [so | sd];
      B table (SWEEP_K,  C*3*Tc), chunk-major column groups [e0|e1|e2]
    (trace/pallas_trace.py).

    The kernel contracts each chunk slab against per-ray feature vectors
    built by trace/pallas_trace.py:_sweep_features. Logically, with a
    triangle's support plane (n, c) and unit edge planes (m_k, c_k) from
    `planes_o`, the columns encode

        so  = n.o + c          (vs features F_A = [o, 1])
        sd  = n.d              (vs features F_D = [d])
        N_k = B_k.d + A_k.(o x d)   with A_k = m_k x n, B_k = c_k n - c m_k
              (vs features F_B = [d, o x d])

    N_k is the edge evaluation e_k(t) = (m_k.o + c_k) + t (m_k.d) at
    t = -so/sd, SCALED by sd (a Pluecker-style bilinear identity), so the
    oracle's inside test e_k >= -eps becomes the division-free, sign-safe
        N_k * sd + eps * sd^2 >= 0.
    5 output rows per triangle instead of the naive 8 (so+sd for all 4
    planes) — the sweep's dominant VMEM stream. HISTORICAL NOTE: keeping
    the K=24 so/sd contraction separate from the K=40 edge contraction
    (these two tables) saves ~16% MXU FLOPs on paper, but the MXU is not
    the bottleneck — the SHIPPED path is _sweep_table_fused below (one
    K=40 slab, ONE DMA per chunk visit), which measured equal-or-better
    at frame level (round 4: K=40 vs K=24 ±0; two-DMA split ~15% worse
    on short sweeps). This two-table builder remains as the layout
    derivation and for the v4-layout tests.

    Physically, every coefficient is laid out split-exact (see
    _SPLIT_PAIRS above): coefficient slots hold bf16-exact parts paired
    against matching feature parts, so a single DEFAULT-precision MXU pass
    computes the f32-exact contraction. Because every slot is bf16-exact
    BY CONSTRUCTION, the tables are STORED in bf16 (round 4): bitwise the
    same contraction, half the HBM/DMA/host-build bytes of f32 storage.
    Slot layout (table part index i per _SPLIT_PAIRS order):

      A table, so columns (vs F_A = [o parts, 1], K = SWEEP_K_A):
        rows  0-17  n_c^i vs o_c^j     (3 comps x 6 pairs)
        rows 18-20  c^0,c^1,c^2 vs 1
        rows 21-23  zero pad (to 24)
      A table, sd columns (vs F_D = [d parts], K = SWEEP_K_A):
        rows  0-17  n_c^i vs d_c^j
        rows 18-23  zero
      B table, edge columns (vs F_B = [d parts, w parts], K = SWEEP_K):
        rows  0-17  B_k,c^i vs d_c^j
        rows 18-35  A_k,c^i vs (o x d)_c^j
        rows 36-39  zero pad

    Generic over numpy/jnp (`xp`): the host scene build and the tracer's
    fallback for hand-built SceneArrays share this one implementation.
    """
    tc = chunk_size
    T = planes_o.shape[0] // 4
    C = T // tc
    bf16 = _bf16_dtype(xp)
    po = planes_o.reshape(T, 4, 4)
    n = po[:, 0, :3]                      # support normal
    c_t = po[:, 0, 3:4]
    m = po[:, 1:4, :3]                    # (T, 3, 3) edge-plane normals
    ck = po[:, 1:4, 3]                    # (T, 3) edge-plane offsets
    A = xp.cross(m, n[:, None, :])                          # (T, 3, 3)
    B = ck[..., None] * n[:, None, :] - c_t[..., None] * m  # (T, 3, 3)

    def six(v):
        """(T, ..., 3) -> (T, ..., 3, 6): the table-side part per slot,
        already in bf16 (each part is bf16-exact — the cast is lossless)."""
        parts = [p.astype(bf16) for p in _bf16_parts(v, xp)]
        return xp.stack([parts[i] for i, _ in _SPLIT_PAIRS], axis=-1)

    n6 = six(n).reshape(T, 18)                     # n_c^i, c-major
    c3 = xp.stack([p.astype(bf16) for p in _bf16_parts(c_t[:, 0], xp)], -1)
    z = lambda *s: xp.zeros(s, bf16)
    so_col = xp.concatenate([n6, c3, z(T, 3)], axis=-1)          # (T, 24)
    sd_col = xp.concatenate([n6, z(T, 6)], axis=-1)              # (T, 24)
    a_cols = xp.stack([so_col, sd_col], axis=1)                  # (T, 2, 24)
    a_tbl = a_cols.reshape(C, tc, 2, SWEEP_K_A).transpose(
        0, 2, 1, 3).reshape(-1, SWEEP_K_A).T                 # (24, C*2*tc)
    B6 = six(B).reshape(T, 3, 18)                  # B_k,c^i
    A6 = six(A).reshape(T, 3, 18)
    e_cols = xp.concatenate([B6, A6, z(T, 3, 4)], axis=-1)       # (T, 3, 40)
    b_tbl = e_cols.reshape(C, tc, 3, SWEEP_K).transpose(
        0, 2, 1, 3).reshape(-1, SWEEP_K).T                   # (40, C*3*tc)
    if xp is np:
        return (np.ascontiguousarray(a_tbl),
                np.ascontiguousarray(b_tbl))
    return a_tbl, b_tbl


def _sweep_table_fused(planes_o, chunk_size: int, xp=np):
    """Single fused sweep table (SWEEP_K, C*5*Tc) bf16, chunk-major
    [so | sd | e0 | e1 | e2] column groups: the A-table's 24-row so/sd
    columns zero-padded to SWEEP_K rows and interleaved with the B-table
    per chunk, so ONE slab DMA per chunk visit feeds all three kernel
    contractions (measured: the round-4 two-table/two-DMA layout cost
    ~15% frame throughput on short budget-bounded sweeps; the fused
    layout restores the round-3 schedule at 40% of its table bytes).
    so/sd contract against F_A/F_D zero-padded to K=SWEEP_K — rows 24-39
    are zero on both sides, so exactness is untouched."""
    tc = chunk_size
    T = planes_o.shape[0] // 4
    C = T // tc
    a_tbl, b_tbl = _sweep_tables(planes_o, chunk_size, xp)
    bf16 = _bf16_dtype(xp)
    a = a_tbl.T.reshape(C, 2, tc, SWEEP_K_A)       # (C, so/sd, tc, 24)
    pad = xp.zeros((C, 2, tc, SWEEP_K - SWEEP_K_A), bf16)
    a = xp.concatenate([a, pad], axis=-1)          # (C, 2, tc, 40)
    b = b_tbl.T.reshape(C, 3, tc, SWEEP_K)
    tbl = xp.concatenate([a, b], axis=1).reshape(-1, SWEEP_K).T
    return np.ascontiguousarray(tbl) if xp is np else tbl


def _median_split_order(centers: np.ndarray, chunk_size: int) -> np.ndarray:
    """Top-down longest-axis median split into leaves of exactly chunk_size.

    The permutation groups triangles into spatially COMPACT runs — the BVH
    leaf build, with the split snapped to a chunk_size multiple so every
    chunk is one tight leaf. Compared to raw Morton-code runs (whose AABBs
    straddle curve jumps), leaf AABBs overlap far fewer ray frustums: on
    the 1M-triangle urban bench a representative ray block overlaps 11
    chunks within hit range instead of 110, which directly multiplies the
    culled/pallas3 sweep throughput. Requires len(centers) % chunk_size == 0
    (callers pad with far triangles first); every leaf is then exactly
    chunk_size, by induction (the split point is a chunk_size multiple).
    """
    n = centers.shape[0]
    assert n % chunk_size == 0
    out = np.empty(n, np.int64)
    pos = 0
    stack = [np.arange(n)]
    while stack:
        s = stack.pop()
        if s.shape[0] <= chunk_size:
            out[pos:pos + s.shape[0]] = s
            pos += s.shape[0]
            continue
        c = centers[s]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = ((s.shape[0] // 2) // chunk_size) * chunk_size
        part = np.argpartition(c[:, ax], half)
        stack.append(s[part[half:]])
        stack.append(s[part[:half]])
    return out


def _median_split_order_sah(centers: np.ndarray, tri_lo: np.ndarray,
                            tri_hi: np.ndarray, chunk_size: int) -> np.ndarray:
    """SAH-scored variant of _median_split_order (same leaf contract).

    At every node, instead of fixing (longest centroid axis, median), ALL
    3 axes x ALL chunk_size-multiple split positions are scored with the
    surface-area heuristic cost  SA(left)*n_left + SA(right)*n_right,
    where the child AABBs come from prefix/suffix min-max scans of the
    per-TRIANGLE AABBs (tri_lo/tri_hi, so the score reflects the real
    chunk AABBs the sweep will slab-test, not centroid extents).

    Classic presorted full-sweep build: ONE stable sort per axis at the
    root; every node then carries its triangle set sorted by all 3 axes,
    and children inherit each sorted order by a stable boolean-mask
    filter (O(m) per axis per node), so the whole build is
    O(n log n) — ~2 s host time at 1M triangles, amortized by the scene
    cache. Bit-identical to the native C++ builder
    (native/src/builder.cpp:rr_sah_split_order, pinned by
    tests/test_native.py).

    Motivation (round 5): the sweep kernel is ~72% of frame device time
    and its cost is visits x chunk_size lanes; median-split already took
    a representative block from 110 overlapped chunks to 11 (round 2),
    and tighter leaf AABBs cut the remaining visits directly. Leaves are
    exactly chunk_size by the same induction as _median_split_order.
    """
    n = centers.shape[0]
    assert n % chunk_size == 0
    out = np.empty(n, np.int64)
    pos = 0
    member = np.zeros(n, bool)               # reusable left-flag scratch
    stack = [tuple(np.argsort(centers[:, ax], kind="stable")
                   for ax in range(3))]
    while stack:
        axs = stack.pop()
        m = axs[0].shape[0]
        if m <= chunk_size:
            out[pos:pos + m] = axs[0]
            pos += m
            continue
        n_pos = m // chunk_size - 1          # candidate split positions
        hs = np.arange(1, n_pos + 1) * chunk_size
        best = None
        for ax in range(3):
            lo_o = tri_lo[axs[ax]]
            hi_o = tri_hi[axs[ax]]
            # prefix (left child) and suffix (right child) AABBs
            pl_lo = np.minimum.accumulate(lo_o, axis=0)
            pl_hi = np.maximum.accumulate(hi_o, axis=0)
            sf_lo = np.minimum.accumulate(lo_o[::-1], axis=0)[::-1]
            sf_hi = np.maximum.accumulate(hi_o[::-1], axis=0)[::-1]
            dl = pl_hi[hs - 1] - pl_lo[hs - 1]          # (P, 3)
            dr = sf_hi[hs] - sf_lo[hs]
            sa_l = dl[:, 0] * dl[:, 1] + dl[:, 1] * dl[:, 2] \
                + dl[:, 2] * dl[:, 0]
            sa_r = dr[:, 0] * dr[:, 1] + dr[:, 1] * dr[:, 2] \
                + dr[:, 2] * dr[:, 0]
            cost = sa_l * hs + sa_r * (m - hs)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (float(cost[j]), ax, int(hs[j]))
        _, bax, h = best
        left_ids = axs[bax][:h]
        member[left_ids] = True
        left = tuple(a[member[a]] for a in axs)
        right = tuple(a[~member[a]] for a in axs)
        member[left_ids] = False
        stack.append(right)
        stack.append(left)
    return out


def ordering_variant() -> str:
    """Active chunk-ordering variant: "sah" (default since round 5 —
    SAH-scored splits cut slab-kept chunks/ray ~30% and measured +9%
    frame Hz / +18% marginal Mrays/s at 1M tris, benchmarks/order_ab.py)
    or "median" (the round-2..4 longest-axis median split), selected by
    RADARAYS_ORDER_VARIANT."""
    return os.environ.get("RADARAYS_ORDER_VARIANT", "sah")


def cache_flavor(variant: Optional[str] = None) -> str:
    """Scene-cache key flavor for the active builder + ordering variant
    (shared by Scene.device_arrays and `cli prime-cache` so both always
    address the SAME cache entry)."""
    from radarays_ros_tpu.native import builder as native_builder

    if variant is None:
        variant = ordering_variant()
    flavor = "native" if native_builder.available() else "numpy"
    if variant != "median":
        flavor = f"{flavor}-{variant}"
    return flavor


def _tri_fetch_table(verts, normals, obj_ids, xp=np):
    """(48, T) BF16 packed triangle data for the in-kernel winner fetch
    (see SceneArrays.tri_table_t), SPLIT-EXACT: the 16 semantic rows
    [v0, e1, e2, normal, obj_id_f32, aux, pad, pad] are stored as three
    bf16-exact part blocks (rows 0-15 = part0, 16-31 = part1,
    32-47 = part2; the kernel one-hot-contracts all 48 rows in ONE
    default-precision MXU pass and sums the part blocks — Mosaic's bf16
    input truncation otherwise ROUNDS the fetched values: object ids came
    back off by up to 64 on hardware). Each part is bf16-exact by
    construction, so bf16 STORAGE is lossless and halves the table.
    obj ids are exact f32; INVALID/padding triangles store -1. Real obj
    ids >= 2^24 are rejected at scene build (Scene.__post_init__) rather
    than silently degraded here. Generic over numpy/jnp (`xp`)."""
    bf16 = _bf16_dtype(xp)
    v0 = verts[:, 0]
    obj = xp.where((obj_ids >= 0) & (obj_ids < 2**24), obj_ids, -1)
    rows = xp.concatenate([
        v0.T, (verts[:, 1] - v0).T, (verts[:, 2] - v0).T, normals.T,
        obj.astype(xp.float32)[None],
        xp.zeros((3, verts.shape[0]), xp.float32),
    ], axis=0)
    out = xp.concatenate([p.astype(bf16) for p in _bf16_parts(rows, xp)],
                         axis=0)
    return np.ascontiguousarray(out) if xp is np else out


def bake_tri_aux(sa: SceneArrays, tri_aux) -> SceneArrays:
    """Return `sa` with `tri_aux` baked into the fetch table's aux slot
    (semantic row 13 of tri_table_t, split-exact parts in rows 13/29/45).

    The per-triangle aux row — in the radar pipeline, the object->material
    map gathered per triangle (sim/pipeline.py:_bounce) — is material-load
    constant, but building it inside the jitted frame costs a (T,) XLA
    gather (~7 ms per 20-frame batch at 1M triangles; gathers run at
    0.6-2.5 GB/s on TPU) plus a full copy of the (48, T) table to insert
    the three part rows (~190 MB at 1M). Baking it here ON HOST at
    material-load time (sim/radar.py:_bake_aux) removes both;
    trace(tri_aux="baked") then uses the table as-is."""
    if sa.tri_table_t is None:
        raise ValueError("bake_tri_aux needs a precomputed tri_table_t")
    tbl = np.array(sa.tri_table_t, copy=True)   # bf16
    row = np.ascontiguousarray(np.asarray(tri_aux), np.float32)
    if row.shape != (tbl.shape[1],):
        raise ValueError(
            f"tri_aux must be shaped (T,) = ({tbl.shape[1]},), got {row.shape}")
    bf16 = _bf16_dtype(np)
    for r, p in zip((13, 29, 45), _bf16_parts(row, np)):
        tbl[r] = p.astype(bf16)   # parts are bf16-exact: cast is lossless
    return sa._replace(tri_table_t=tbl)


@dataclasses.dataclass
class Scene:
    """Host-side scene: triangle soup + per-triangle object ids.

    `object_materials[obj_id]` gives the material id of an object, as in the
    reference's `object_materials` param (config/mulran_kaist02.yaml,
    Radar.cpp:224).
    """

    verts: np.ndarray                 # (T, 3, 3) float32
    obj_ids: np.ndarray               # (T,) int32
    object_names: Optional[Sequence[str]] = None
    chunk_size: int = 256

    def __post_init__(self):
        self.verts = np.ascontiguousarray(self.verts, dtype=np.float32)
        self.obj_ids = np.ascontiguousarray(self.obj_ids, dtype=np.int32)
        if self.verts.ndim != 3 or self.verts.shape[1:] != (3, 3):
            raise ValueError(f"verts must be (T,3,3), got {self.verts.shape}")
        if self.obj_ids.shape != (self.verts.shape[0],):
            raise ValueError("obj_ids must be (T,)")
        # the pallas3 winner-fetch table carries obj ids as exact f32, a
        # packing artifact capped at 2^24 — fail loudly instead of letting
        # _tri_fetch_table silently map larger ids to INVALID
        if self.obj_ids.size and int(self.obj_ids.max()) >= 2**24:
            raise ValueError(
                f"object ids must be < 2**24 (got {int(self.obj_ids.max())}):"
                " the trace engines pack them as exact float32")

    @property
    def n_triangles(self) -> int:
        return self.verts.shape[0]

    @property
    def n_objects(self) -> int:
        return int(self.obj_ids.max()) + 1 if self.n_triangles else 0

    def transformed(self, R: np.ndarray, t: np.ndarray) -> "Scene":
        """Rigidly transform the scene (pre_transform of mesh_publisher.cpp)."""
        v = self.verts.reshape(-1, 3) @ np.asarray(R, np.float32).T + np.asarray(
            t, np.float32
        )
        return Scene(v.reshape(-1, 3, 3), self.obj_ids.copy(), self.object_names,
                     self.chunk_size)

    def device_arrays(self, cache: Optional[bool] = None) -> SceneArrays:
        """Build the flattened, spatially-chunked device representation.

        Triangles are padded with degenerate far-away triangles to a
        multiple of chunk_size, then reordered by a top-down median split
        of their centroids (_median_split_order) so each chunk is one tight
        BVH-style leaf — the AABB quality that makes the culled/pallas3
        chunk sweeps short. Plane/AABB precomputation uses the native C++
        builder (native/) when available, else NumPy.

        cache: persist/reuse the finished tables on disk, keyed by scene
        content (geom/cache.py) — the analog of the reference's
        seconds-fast Embree map import for warm starts. None (default) =
        on for scenes >= ~200k triangles (big enough that the build
        dominates startup), off below; True/False force it. Disable
        globally with RADARAYS_SCENE_CACHE_DISABLE=1.
        """
        import logging
        import time

        from radarays_ros_tpu.geom import cache as scache
        from radarays_ros_tpu.native import builder as native_builder

        log = logging.getLogger(__name__)
        verts, obj_ids = self.verts, self.obj_ids
        if self.n_triangles == 0:
            raise ValueError("empty scene")

        if cache is None:
            cache = self.n_triangles >= 200_000
        if os.environ.get("RADARAYS_SCENE_CACHE_DISABLE", "0") == "1":
            cache = False
        variant = ordering_variant()
        key = None
        if cache:
            flavor = cache_flavor(variant)
            key = scache.scene_cache_key(verts, obj_ids, self.chunk_size,
                                         flavor)
            hit = scache.load_scene_arrays(key)
            if hit is not None:
                log.info("scene tables: cache hit (%s, %d triangles)",
                         key[:12], hit.verts.shape[0])
                return hit
            log.info("scene tables: cache miss — building %d triangles "
                     "(%s builder; a cold 10M-tri build takes ~1.5 min "
                     "native / ~10 min NumPy)", self.n_triangles, flavor)
        t0 = time.perf_counter()

        # pad FIRST (far degenerate triangles cluster into their own
        # leaves), so the median split can keep every leaf exactly full.
        # The chunk count is rounded to a multiple of 8 so every
        # prep_group in {1,2,4,8} divides it — otherwise the tracer falls
        # off its precomputed-table fast path (at 10M triangles the
        # on-the-fly relayout materializes ~20 GB)
        T = verts.shape[0]
        C = -(-T // self.chunk_size)
        C = -(-C // 8) * 8
        pad = C * self.chunk_size - T
        if pad:
            far = np.full((pad, 3, 3), 1e8, np.float32)
            # tiny offsets keep normals finite
            far[:, 1, 0] += 1.0
            far[:, 2, 1] += 1.0
            verts = np.concatenate([verts, far], axis=0)
            obj_ids = np.concatenate(
                [obj_ids, np.full((pad,), INVALID_OBJ_ID, np.int32)]
            )

        centers = verts.mean(axis=1)
        if variant == "sah":
            # native and NumPy SAH are bit-identical (tests/test_native.py)
            # so the cache flavor need not distinguish them
            order = (native_builder.sah_split_order(
                         centers, verts.min(axis=1), verts.max(axis=1),
                         self.chunk_size)
                     if native_builder.available()
                     and native_builder.has_sah_split()
                     else _median_split_order_sah(
                         centers, verts.min(axis=1), verts.max(axis=1),
                         self.chunk_size))
        else:
            order = (native_builder.median_split_order(centers,
                                                       self.chunk_size)
                     if native_builder.available()
                     else _median_split_order(centers, self.chunk_size))
        verts = np.ascontiguousarray(verts[order])
        obj_ids = np.ascontiguousarray(obj_ids[order])
        t1 = time.perf_counter()
        log.info("scene tables: %s-split ordering %.1fs", variant, t1 - t0)

        if native_builder.available():
            normals, planes_o, planes_d = native_builder.triangle_planes(verts)
            lo, hi = native_builder.chunk_aabbs(verts, self.chunk_size)
        else:
            normals, planes_o, planes_d = _triangle_planes(verts)
            chunks = verts.reshape(C, self.chunk_size, 3, 3)
            lo = chunks.min(axis=(1, 2))
            hi = chunks.max(axis=(1, 2))
        t2 = time.perf_counter()
        log.info("scene tables: planes + chunk AABBs %.1fs", t2 - t1)

        if native_builder.available():
            sweep_t = native_builder.sweep_table_fused(
                planes_o, self.chunk_size)
            tri_t = native_builder.tri_table(verts, normals, obj_ids)
        else:
            sweep_t = _sweep_table_fused(planes_o, self.chunk_size)
            tri_t = _tri_fetch_table(verts, normals, obj_ids)
        log.info("scene tables: split-exact sweep/fetch tables %.1fs "
                 "(%.2f GB)", time.perf_counter() - t2,
                 (sweep_t.nbytes + tri_t.nbytes) / 1e9)
        sa = SceneArrays(
            verts=verts,
            obj_ids=obj_ids,
            normals=normals,
            planes_o=planes_o,
            planes_d=planes_d,
            chunk_aabb_lo=lo.astype(np.float32),
            chunk_aabb_hi=hi.astype(np.float32),
            chunk_size=self.chunk_size,
            sweep_table_t=sweep_t,
            tri_table_t=tri_t,
        )
        if key is not None:
            try:
                scache.store_scene_arrays(key, sa)
            except OSError as e:  # disk full / read-only cache dir
                import warnings

                warnings.warn(f"scene cache write failed ({e}); continuing "
                              "without cache", stacklevel=2)
        return sa

    @staticmethod
    def compose(parts: Sequence[np.ndarray], names: Optional[Sequence[str]] = None,
                chunk_size: int = 256) -> "Scene":
        """Build a scene from a list of per-object (Ti, 3, 3) vertex arrays."""
        verts = np.concatenate(parts, axis=0).astype(np.float32)
        obj_ids = np.concatenate(
            [np.full((p.shape[0],), i, np.int32) for i, p in enumerate(parts)]
        )
        return Scene(verts, obj_ids, names, chunk_size)


# Sentinel for "no hit" object ids; the reference flags invalid hits with
# obj_id > 10000 (radar_algorithms.cpp:29, RadarCPU.cpp:252).
INVALID_OBJ_ID = np.int32(2**31 - 1)


def shard_scene_arrays(sa: SceneArrays, n_shards: int) -> SceneArrays:
    """Split a SceneArrays into n chunk-contiguous shards, stacked on a new
    leading axis — the device layout for SCENE sharding over a mesh axis.

    Chunks are independent sweep units for every culled engine, so the
    scene partitions cleanly along the chunk axis: each shard carries a
    contiguous run of whole chunks (every per-triangle field is chunk-major
    after device_arrays), padded with never-hit far chunks so all shards
    hold the same chunk count (a multiple of 8, keeping each shard on the
    precomputed-table fast path for prep_group in {1,2,4,8}). Array leaves
    gain a leading (n_shards,) axis; `chunk_size` stays scalar. Feed the
    result through shard_map with PartitionSpec(axis, None, ...) per array
    leaf (parallel/sharding.py:simulate_frame_scene_sharded); each device
    then sweeps only its chunk wedge and per-ray winners are combined with
    one min-reduce collective (trace/api.py:combine_trace_shards).

    Beyond-parity capability: the reference has no distributed story at
    all (SURVEY.md §2.5); this unlocks meshes larger than one chip's HBM.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    tc = int(sa.chunk_size)
    C = sa.n_chunks
    per = -(-C // n_shards)
    per += (-per) % 8
    pad = per * n_shards - C

    f = {k: np.asarray(v) for k, v in sa._asdict().items()
         if v is not None and k != "chunk_size"}
    if pad:
        pv = np.full((pad * tc, 3, 3), 1e8, np.float32)
        pv[:, 1, 0] += 1.0   # tiny offsets keep normals finite
        pv[:, 2, 1] += 1.0
        pobj = np.full((pad * tc,), INVALID_OBJ_ID, np.int32)
        pn, ppo, ppd = _triangle_planes(pv)
        ext = dict(
            verts=pv, obj_ids=pobj, normals=pn, planes_o=ppo, planes_d=ppd,
            chunk_aabb_lo=np.full((pad, 3), 1e9, np.float32),
            chunk_aabb_hi=np.full((pad, 3), 1e9, np.float32) + 1.0,
        )
        if "sweep_table_t" in f:
            ext["sweep_table_t"] = _sweep_table_fused(ppo, tc)
        if "tri_table_t" in f:
            ext["tri_table_t"] = _tri_fetch_table(pv, pn, pobj)
        axis1 = {"sweep_table_t", "tri_table_t"}
        f = {k: np.concatenate([v, ext[k]], axis=1 if k in axis1 else 0)
             for k, v in f.items()}

    n = n_shards
    out = dict(chunk_size=tc)
    for k, v in f.items():
        if k in ("sweep_table_t", "tri_table_t"):
            # (rows, Cp*w) -> (n, rows, per*w), chunk-major columns
            rows = v.shape[0]
            out[k] = np.ascontiguousarray(
                v.reshape(rows, n, -1).transpose(1, 0, 2))
        else:
            # per-triangle / per-chunk leading axis: plain split
            out[k] = v.reshape((n, v.shape[0] // n) + v.shape[1:])
    for k in ("sweep_table_t", "tri_table_t"):
        out.setdefault(k, None)
    return SceneArrays(**out)
