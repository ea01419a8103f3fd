"""Pallas TPU tracer ("pallas3"): ordered chunk sweep with early termination.

The production implementation of rmagine's OnDn simulate contract
(Bundle<Hits, Ranges, Normals, ObjectIds>, RadarCPU.cpp:222-236), on top of
the same plane-equation intersection math as the XLA "mxu"/"culled" engines
(geom/scene.py:_triangle_planes). The kernel is the TPU-shaped analog of a
BVH traversal:

  * Rays ride the LANE axis: the kernel contracts each chunk's packed
    bf16 intersection table (geom/scene.py:_sweep_table_fused) against
    per-ray feature vectors as (K, w)^T x (K, RB) MXU matmuls — 5 output
    rows per triangle ([so; sd] for the support plane + 3 edge numerators
    in a division-free Pluecker form) instead of the naive 8 ([so; sd]
    for all 4 planes), keeping the per-visit VMEM output stream minimal.
    The contraction uses the SPLIT-EXACT layout (K=24 for so/sd, 40 for
    edges): operands pre-split into bf16-exact parts so one
    default-precision bf16 MXU pass is f32-exact (Mosaic's bf16 input
    truncation silently corrupted hit decisions and fetched object ids on
    real hardware otherwise), and bf16 STORAGE of the parts (round 4)
    halves table HBM and slab DMA losslessly. Every reduction
    (nearest-hit min/argmin) is a sublane reduction onto the (1, RB)
    accumulator — no transposes anywhere.
  * Per ray block, the median-split leaf chunks are ranked front-to-back by slab-entry
    distance (XLA prep); the in-kernel `lax.while_loop` sweep stops once no
    active lane's best hit can be beaten by any remaining chunk — the BVH
    termination criterion, applied block-wide with per-lane overlap
    exhaustion (sky rays stop vetoing termination).
  * Plane slabs stream from HBM through double-buffered `make_async_copy`
    DMA, so scene size is bounded by HBM (~multi-million triangles), not
    VMEM.

Exactness: the slab test and the termination criterion are conservative, so
the engine is EXACT — parity with the "brute" oracle is asserted in
tests/test_trace.py, including blocks mixing hitting/sky/padding rays.

On non-TPU backends the kernel runs in Pallas interpret mode (tests).

History: two earlier kernels — v1 ("pallas", grid = blocks x chunks with an
SMEM skip mask) and v2 (whole scene VMEM-resident, capped ~40k triangles) —
were retired in round 2 after pallas3 beat them at every measured scale
(docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from radarays_ros_tpu.geom.scene import (SWEEP_K, SWEEP_K_A,
                                         _SPLIT_PAIRS, _bf16_parts)
from radarays_ros_tpu.trace.planes import _DIR_EPS, _finalize_packed

_INSIDE_EPS = 1e-5  # meters (edge planes are unit-normalized); planes.py:33
_BIG_IDX = 2**30  # python literal: jnp constants would be captured by the kernel


def _sweep_features(o, d, dtype=jnp.bfloat16):
    """Per-ray feature matrices F_A and F_B — each (SWEEP_K, R) — in the
    split-exact slot layout of geom/scene.py:_sweep_table_fused (feature
    part j per slot), cast to the sweep table's dtype: every row is a
    bf16-exact split part (or 0/1), so the bf16 cast is lossless and the
    kernel's MXU contraction is f32-exact at either operand dtype.
    F_A = [o parts, 1] (21 live rows zero-padded to SWEEP_K — the so
    table columns' rows 21-39 are zero too); F_B = [d parts, (o x d)
    parts] serves BOTH the sd columns (whose rows 18-39 are zero, killing
    the w rows) and the edge columns.

    Assembly is three block ops per array — a (6, R, 3) part stack, one
    (3c, 6s, R) transpose, a short concatenate — instead of a 36-way
    single-row stack: XLA materialized the row stack as 36 separate
    (1, R) concatenations (~0.8 ms per array per bounce at 400k rays).
    Built rays-on-lanes — the kernel's BlockSpec slices ray columns, so
    no (B, RB, K) -> (B, K, RB) transpose ever materializes."""
    R = o.shape[0]
    w = jnp.cross(o, d)

    def sixrows(v):
        # (18, R): row c*6+s = part j(s) of component c (_SPLIT_PAIRS)
        p = _bf16_parts(v, jnp)
        sl = jnp.stack([p[j] for _, j in _SPLIT_PAIRS], axis=0)  # (6, R, 3)
        return sl.transpose(2, 0, 1).reshape(18, R)

    ones = jnp.ones((1, R), jnp.float32)
    zpad = lambda k: jnp.zeros((k, R), jnp.float32)
    fa = jnp.concatenate(
        [sixrows(o), jnp.broadcast_to(ones, (3, R)),
         zpad(SWEEP_K - 21)], axis=0)
    fb = jnp.concatenate([sixrows(d), sixrows(w), zpad(SWEEP_K - 36)],
                         axis=0)
    return fa.astype(dtype), fb.astype(dtype)


def _trace_kernel_v3(nvisit_ref, order_hbm, entry_hbm, fa_ref, fb_ref,
                     tlast_ref, tbl_hbm, tri_hbm, best_t_ref, tri_ref,
                     order_ref, entry_ref, idx_sem,
                     tbl_buf, tbl_sem, tri_buf, tri_sem,
                     best_idx_ref, *,
                     tc: int, group: int, t_min: float, t_max: float,
                     argmin_mode: str = "visit", term_stride: int = 1):
    """v3: ordered chunk sweep with early termination and HBM->VMEM DMA.

    Per ray block, chunks are walked front-to-back (order_ref, ranked by the
    block's slab-entry distance); the sweep stops as soon as every ray's
    best hit is closer than the nearest entry among the remaining chunks —
    the standard BVH termination criterion, applied block-wide, with
    per-lane overlap exhaustion: tlast_ref[r] is the largest entry distance
    among the chunks lane r overlaps, so a lane stops vetoing termination
    once the next ranked entry exceeds it — rays that never hit anything
    (sky rays, block padding, budget-dead rays) cannot force the block to
    sweep every chunk. Exactness: if e_next > t_last[r], lane r overlaps no
    remaining chunk (a remaining c' it overlapped would satisfy
    block_entry(c') <= t_near[r, c'] <= t_last[r] < e_next, contradicting
    the non-decreasing ranked order); if e_next > best_t[r], no remaining
    chunk can improve r. Hence the per-lane veto bound is
    min(best_t, t_last). Intersection slabs stream from HBM through
    double-buffered async copies, so scene size is bounded by HBM, not VMEM.

    Per visit, the intersection test is the 5-row edge-numerator form
    (geom/scene.py:_sweep_table): two skinny matmuls produce (2*Tc, RB)
    [so; sd] against the split-exact [o, 1, d] features and (3*Tc, RB)
    edge numerators N_k against the split-exact [d, o x d] features; the
    inside test is the division-free N_k * sd + eps * sd^2 >= 0,
    evaluated as min_k(N_k * sd) + eps * sd^2 >= 0 — ONE add + compare
    after a 2-op min chain instead of three of each (bit-identical:
    f32 multiply is weakly monotone in one operand, so
    min_k fl(N_k * sd) == fl((sd > 0 ? min_k N_k : max_k N_k) * sd) and
    the conjunction of the three >= tests equals the min test; NaN rows
    propagate through the min and fail the compare exactly as each
    individual test did). The 5-output-rows-per-triangle form (instead
    of the naive 8) keeps the per-visit VMEM output stream minimal, and
    the split-exact K=40 contraction makes ONE default-precision MXU
    pass f32-exact (see geom/scene.py:_SPLIT_PAIRS — Mosaic's bf16 input
    truncation corrupted hits and object ids on hardware before round 3).

    argmin_mode — where the winner's ROW index is computed (VERDICT r4
    #4: the per-visit argmin is ~3 of the ~20 VPU ops on every (Tc, RB)
    visit tile of the 55%-VPU-bound sweep):
      * "visit" — classic: min + argmin every visit (round 2-4 behavior).
      * "gated" — argmin + winner updates only on visits where some lane
        improves (pl.when(any(better))): front-to-back sweeps improve
        mostly in the first visits, later ones pay one scalar sync
        instead of 3 (Tc, RB) ops.
      * "defer" — the sweep tracks only (best_t, best CHUNK) per lane
        ((1, RB) updates); the winner-fetch pass re-contracts the few
        winner-holding chunks' slabs and recovers the row argmin there,
        where the any()-gate already concentrates work. Every visit
        saves the 3 argmin ops; each winner chunk pays one extra slab
        contraction + ~10 VPU ops in the fetch.
    All three are EXACT with identical tie-breaks (earliest visited
    chunk at strict improvement; lowest row within a chunk).
    """
    i = pl.program_id(0)

    best_t_ref[:] = jnp.full(best_t_ref.shape, jnp.inf, jnp.float32)
    best_idx_ref[:] = jnp.zeros(best_idx_ref.shape, jnp.int32)
    tri_ref[:] = jnp.zeros(tri_ref.shape, jnp.float32)

    n = nvisit_ref[i, 0]
    fa = fa_ref[:]        # (SWEEP_K, RB) bf16 split-exact [o parts, 1, pad]
    fb = fb_ref[:]        # (SWEEP_K, RB) bf16 split-exact [d, o x d parts]

    # the ranked chunk list and its entry distances are too large for SMEM
    # across all ray blocks at big scenes; stream this block's rows in.
    # tables are shaped (B, 8, Cp/8): HBM tiling constrains only the last
    # two dims, so the per-block copy moves whole aligned tiles
    W = order_ref.shape[1]
    cp_o = pltpu.make_async_copy(order_hbm.at[i], order_ref, idx_sem.at[0])
    cp_e = pltpu.make_async_copy(entry_hbm.at[i], entry_ref, idx_sem.at[1])
    cp_o.start()
    cp_e.start()
    cp_o.wait()
    cp_e.wait()

    def dma(k, slot):
        # the table lives transposed in HBM as (SWEEP_K, C*5*Tc) bf16
        # with chunk-major [so|sd|e0|e1|e2] column groups, so the trailing
        # dimension (the slab, a multiple of 128) satisfies lane tiling
        # and ONE DMA per visit feeds all three contractions (a
        # two-table split measured ~15% frame loss on short
        # budget-bounded sweeps, round 4). One visit covers a SUPERGROUP
        # of `group` consecutive leaf chunks (one contiguous slab):
        # culling/ranking granularity is group*tc triangles (cheap prep
        # at scale), compute granularity stays tc (the inner static loop
        # below keeps the matmul intermediates small)
        c = order_ref[k // W, k % W]
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(c * group * 5 * tc, group * 5 * tc)],
            tbl_buf.at[slot], tbl_sem.at[slot])

    @pl.when(n > 0)
    def _sweep():
        dma(0, 0).start()

        # loop-invariant: triangle row index within a chunk (argmin helper)
        rows = jax.lax.broadcasted_iota(jnp.int32, (tc, fa.shape[1]), 0)

        def cond(carry):
            k, done = carry
            return (k < n) & jnp.logical_not(done)

        def body(carry):
            k, _ = carry
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n)
            def _prefetch():
                dma(k + 1, 1 - slot).start()

            dma(k, slot).wait()

            c = order_ref[k // W, k % W]
            for g in range(group):
                # contract the feature axis (dim 0 of both operands): no
                # transpose needed for the buffer layout
                dn = (((0,), (0,)), ((), ()))
                base = g * 5 * tc
                # The bf16 x bf16 contraction at DEFAULT precision is
                # EXACT by construction: both operands are pre-split into
                # bf16-exact parts with the product expansion along the K
                # axis (geom/scene.py:_sweep_table_fused "split-exact" layout;
                # bf16 STORAGE of the parts is lossless — Mosaic's f32
                # path truncates inputs to these very bf16 values), so
                # ONE MXU pass accumulates the f32-accurate contraction —
                # Precision.HIGHEST on f32 operands computes the same
                # thing with 6 full output-streaming passes, measured
                # 2.7x slower end-to-end.
                # sd contracts against F_B directly: the sd columns' rows
                # 18-39 are zero in the table, so F_B's w-part rows die —
                # no separate [d parts] feature array is materialized
                so_s = jax.lax.dot_general(
                    tbl_buf[slot, :, base:base + tc], fa, dn,
                    preferred_element_type=jnp.float32)   # (Tc, RB)
                sd_s = jax.lax.dot_general(
                    tbl_buf[slot, :, base + tc:base + 2 * tc], fb, dn,
                    preferred_element_type=jnp.float32)   # (Tc, RB)
                s_n = jax.lax.dot_general(
                    tbl_buf[slot, :, base + 2 * tc:base + 5 * tc], fb, dn,
                    preferred_element_type=jnp.float32)   # (3Tc, RB)
                # IEEE semantics replace the denominator guard: sd == 0
                # gives t = +-inf (rejected by the range test) or NaN
                # (so == 0 too; every comparison rejects NaN)
                t = -so_s / sd_s
                # inside test in edge-numerator form: N_k * sd + eps * sd^2
                # >= 0  <=>  e_k >= -eps (see geom/scene.py:_sweep_table),
                # as ONE min-chain test (bit-identical; docstring).
                # NO per-element t <= t_max test: if the NEAREST hit is
                # beyond t_max every hit is, so masking the winner once
                # after the kernel (trace_pallas_v3) is exact — and the
                # unmasked (smaller-or-equal) best_t only tightens the
                # early-termination bound. Saves 2 VPU ops per element.
                meps = _INSIDE_EPS * (sd_s * sd_s)
                pmin = jnp.minimum(
                    jnp.minimum(s_n[0:tc] * sd_s, s_n[tc:2 * tc] * sd_s),
                    s_n[2 * tc:3 * tc] * sd_s)
                hit = (pmin + meps >= 0.0) & (t >= t_min)
                t_masked = jnp.where(hit, t, jnp.inf)             # (Tc, RB)
                # NOTE: a single packed (t-rounded, row) min-reduce was
                # measured ~1 ms/trace faster here but picks the FARTHER of
                # two sub-grid-separated surfaces (confirmed by repro) —
                # rejected: every engine must match the brute oracle
                # exactly (tests/test_trace.py).
                local_t = jnp.min(t_masked, axis=0, keepdims=True)
                better = local_t[None] < best_t_ref[:]

                if argmin_mode == "defer":
                    # winner ROW recovery moves to the gated fetch pass;
                    # track only (best_t, best fine-chunk index) per lane
                    best_t_ref[:] = jnp.where(better, local_t[None],
                                              best_t_ref[:])
                    best_idx_ref[:] = jnp.where(
                        better, jnp.int32(c * group + g), best_idx_ref[:])
                elif argmin_mode == "gated":
                    @pl.when(jnp.any(better))
                    def _update():
                        local_i = jnp.min(
                            jnp.where(t_masked == local_t, rows, _BIG_IDX),
                            axis=0, keepdims=True)
                        best_t_ref[:] = jnp.where(better, local_t[None],
                                                  best_t_ref[:])
                        best_idx_ref[:] = jnp.where(
                            better, ((c * group + g) * tc + local_i)[None],
                            best_idx_ref[:])
                else:  # "visit"
                    local_i = jnp.min(
                        jnp.where(t_masked == local_t, rows, _BIG_IDX),
                        axis=0, keepdims=True)
                    best_t_ref[:] = jnp.where(better, local_t[None],
                                              best_t_ref[:])
                    best_idx_ref[:] = jnp.where(
                        better, ((c * group + g) * tc + local_i)[None],
                        best_idx_ref[:])

            # early termination: ranked entries are non-decreasing, so the
            # next entry bounds every remaining chunk's entry; a lane vetoes
            # only while BOTH its best hit and its own last overlapped entry
            # are at or beyond it (see docstring for the exactness proof)
            if term_stride == 1:
                worst = jnp.max(jnp.minimum(best_t_ref[0, 0, :],
                                            tlast_ref[0, 0, :]))
                done = entry_ref[(k + 1) // W, (k + 1) % W] > worst
            else:
                # term_stride > 1: pay the (RB,) reduce + vector->scalar
                # sync only every term_stride-th visit. EXACT: skipping a
                # check can only terminate LATER (<= term_stride-1 extra
                # visits per block), and extra visits never change winners
                # (front-to-back updates are idempotent improvements).
                def _check():
                    worst = jnp.max(jnp.minimum(best_t_ref[0, 0, :],
                                                tlast_ref[0, 0, :]))
                    return entry_ref[(k + 1) // W, (k + 1) % W] > worst

                done = jax.lax.cond(
                    jax.lax.rem(k + 1, jnp.int32(term_stride)) == 0,
                    _check, lambda: jnp.bool_(False))
            return k + 1, done

        k_final, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), False))

        # early termination leaves the prefetched (k_final) slab's DMA in
        # flight; every started DMA must be awaited before the kernel ends
        @pl.when(k_final < n)
        def _drain():
            dma(k_final, jax.lax.rem(k_final, 2)).wait()

        # ---- winner fetch: pull each lane's winning-triangle data out of
        # the packed table with one one-hot MXU contraction per VISITED
        # chunk that actually HOLDS some lane's winner (winners can only
        # come from visited chunks, and — round 3 — concentrate in a
        # handful of them: the per-visit any() test on the (RB,) winner
        # indices is ~16 vector ops, the skipped contraction + adds are
        # ~100x that). The DMA stays unconditional and double-buffered:
        # slab traffic is negligible and gating it would serialize the
        # pipeline (measured +2 ms/trace as a blocking per-chunk copy).
        # This replaces the XLA row-gathers of verts/normals/obj ids,
        # which run at ~1.5 GB/s and dominated the post-trace cost
        # (docs/PERFORMANCE.md). Miss lanes (best_idx 0, best_t inf) are
        # masked out of the needed test (no spurious fetch of chunk 0);
        # their accumulated rows are garbage either way and _finalize
        # masks them by isfinite(best_t).
        def tri_dma(k, slot):
            c = order_ref[k // W, k % W]
            return pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(c * group * tc, group * tc)],
                tri_buf.at[slot], tri_sem.at[slot])

        @pl.when(k_final > 0)
        def _fetch():
            defer = argmin_mode == "defer"
            tri_dma(0, 0).start()
            if defer:
                # re-stream the sweep slabs too (tbl_buf/tbl_sem are free
                # once the sweep drained): the deferred row-argmin needs
                # each winner chunk's t_masked recomputed here. Slab
                # traffic is negligible; the recompute itself is gated.
                dma(0, 0).start()
            rows_f = jax.lax.broadcasted_iota(
                jnp.int32, (tc, fa.shape[1]), 0)
            bi_all = best_idx_ref[0, 0, :]
            live = best_t_ref[0, 0, :] < jnp.inf

            def fbody(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < k_final)
                def _pref():
                    tri_dma(k + 1, 1 - slot).start()
                    if defer:
                        dma(k + 1, 1 - slot).start()

                tri_dma(k, slot).wait()
                if defer:
                    dma(k, slot).wait()
                c = order_ref[k // W, k % W]
                if defer:  # bi_all holds fine-CHUNK indices
                    inrange = ((bi_all >= c * group)
                               & (bi_all < (c + 1) * group) & live)
                else:      # bi_all holds global TRIANGLE indices
                    lo_t = c * group * tc
                    inrange = ((bi_all >= lo_t)
                               & (bi_all < lo_t + group * tc) & live)

                @pl.when(jnp.any(inrange))
                def _acc():
                    dn = (((1,), (0,)), ((), ()))
                    dn0 = (((0,), (0,)), ((), ()))
                    for g in range(group):  # tile by g: onehot (Tc, RB)
                        if defer:
                            inchunk = (bi_all == c * group + g) & live
                            # recompute this chunk's t_masked with the
                            # IDENTICAL op sequence as the sweep (same
                            # inputs, deterministic -> same bits), then
                            # recover the deferred row argmin: lowest row
                            # matching the lane's final best_t
                            base = g * 5 * tc
                            so_s = jax.lax.dot_general(
                                tbl_buf[slot, :, base:base + tc], fa, dn0,
                                preferred_element_type=jnp.float32)
                            sd_s = jax.lax.dot_general(
                                tbl_buf[slot, :, base + tc:base + 2 * tc],
                                fb, dn0,
                                preferred_element_type=jnp.float32)
                            s_n = jax.lax.dot_general(
                                tbl_buf[slot, :,
                                        base + 2 * tc:base + 5 * tc],
                                fb, dn0,
                                preferred_element_type=jnp.float32)
                            t = -so_s / sd_s
                            meps = _INSIDE_EPS * (sd_s * sd_s)
                            pmin = jnp.minimum(
                                jnp.minimum(s_n[0:tc] * sd_s,
                                            s_n[tc:2 * tc] * sd_s),
                                s_n[2 * tc:3 * tc] * sd_s)
                            # mirrors the sweep's op sequence exactly
                            # (incl. NO t_max test) so t_masked matches
                            # best_t bit-for-bit
                            hit = (pmin + meps >= 0.0) & (t >= t_min)
                            t_masked = jnp.where(hit, t, jnp.inf)
                            local_i = jnp.min(
                                jnp.where(t_masked == best_t_ref[0],
                                          rows_f, _BIG_IDX),
                                axis=0, keepdims=True)
                            onehot = ((rows_f == local_i)
                                      & inchunk[None, :]).astype(
                                          tri_buf.dtype)
                            sel = inchunk
                        else:
                            gbase = (c * group + g) * tc
                            onehot = (rows_f + gbase
                                      == bi_all).astype(tri_buf.dtype)
                            # SELECT by each lane's winner-in-this-chunk,
                            # not accumulate-across-visits: same cost, and
                            # the fetch stays correct under DUPLICATE chunk
                            # visits (an accumulating fetch adds the
                            # winner's row once per visit — the round-3
                            # paired-sweep experiment hit exactly that:
                            # doubled triangle rows, ~2x refined t, hits
                            # silently lost past their budgets)
                            sel = (bi_all >= gbase) & (bi_all < gbase + tc)\
                                & live
                        # the (48, T) bf16 tri table is stored split-exact
                        # (three bf16-exact part blocks, geom/scene.py
                        # :_tri_fetch_table), so ONE default-precision
                        # bf16 pass fetches exactly; summing the part
                        # blocks reconstructs the f32 rows bit-for-bit
                        # (a plain bf16 table would ROUND fetched object
                        # ids)
                        c48 = jax.lax.dot_general(
                            tri_buf[slot, :, g * tc:(g + 1) * tc], onehot,
                            dn, preferred_element_type=jnp.float32)
                        tri_ref[0] = jnp.where(
                            sel[None, :],
                            c48[0:16] + c48[16:32] + c48[32:48],
                            tri_ref[0])
                return 0

            jax.lax.fori_loop(0, k_final, fbody, 0)



def _slab_keep(lo_rows, hi_rows, o, idv, cap, alive):
    """Shared ray-vs-AABB slab test (all culling-prep kernels).

    lo/hi_rows: (N, 3) box slabs; o/idv: (3, RBt) ray origins and inverse
    directions; cap: (1, RBt) per-lane sweep cap; alive: cap > 0.
    Returns (keep (N, RBt) — ray may enter the box within its cap,
    tn0 (N, RBt) — entry distance clamped to >= 0).
    """
    t_near = None
    t_far = None
    for k in range(3):
        t0 = (lo_rows[:, k:k + 1] - o[k:k + 1, :]) * idv[k:k + 1, :]
        t1 = (hi_rows[:, k:k + 1] - o[k:k + 1, :]) * idv[k:k + 1, :]
        tn_k = jnp.minimum(t0, t1)
        tf_k = jnp.maximum(t0, t1)
        t_near = tn_k if t_near is None else jnp.maximum(t_near, tn_k)
        t_far = tf_k if t_far is None else jnp.minimum(t_far, tf_k)
    tn0 = jnp.maximum(t_near, 0.0)
    keep = (t_far >= tn0) & (t_near <= cap) & alive
    return keep, tn0


def _prep_kernel(lo_ref, hi_ref, o_ref, idv_ref, bud_ref,
                 entry_ref, tlast_ref, *, ct: int, n_ctiles: int,
                 t_max: float):
    """Fused culling prep: slab-test one ray tile against every chunk.

    One grid cell = (ray block, ray tile): the inner static loop sweeps all
    chunk tiles with the AABB table VMEM-resident, producing this tile's
    contribution to the per-chunk block entry (min over rays) and each
    ray's exhaustion bound t_last (max over its overlapped chunks). The
    equivalent XLA prep materializes (rays x chunks) intermediates in HBM
    and dominated the 1M-triangle frame (~100 ms of a ~170 ms trace,
    docs/PERFORMANCE.md); here every tile lives in VMEM.
    """
    o = o_ref[0]          # (3, RBt)
    idv = idv_ref[0]      # (3, RBt)
    cap = jnp.minimum(jnp.float32(t_max), bud_ref[0])   # (1, RBt)
    alive = cap > 0.0

    tl = jnp.full(cap.shape, -jnp.inf, jnp.float32)
    for j in range(n_ctiles):
        sl = slice(j * ct, (j + 1) * ct)
        keep, tn0 = _slab_keep(lo_ref[sl, :], hi_ref[sl, :], o, idv, cap,
                               alive)
        tn_eff = jnp.where(keep, tn0, jnp.inf)
        entry_ref[0, sl, :] = jnp.min(tn_eff, axis=1, keepdims=True)
        tl = jnp.maximum(tl, jnp.max(jnp.where(keep, tn0, -jnp.inf),
                                     axis=0, keepdims=True))
    tlast_ref[0] = tl


_SG = 32  # chunks per culling supergroup in the hierarchical prep
# (64 measured worse: 20.6 vs 18.6 ms marginal at 1M tris — the doubled
# per-supergroup fine-test math beats the halved word-loop bit scans)


def _prep_kernel_hier(bm_ref, lo_ref, hi_ref, o_ref, idv_ref, bud_ref,
                      entry_ref, tlast_ref, *, n_words: int, t_max: float):
    """Hierarchical culling prep: fine slab tests only where the coarse
    supergroup bitmap says a ray tile can overlap.

    Grid = (ray block, ray tile). bm_ref (SMEM) holds, per grid cell,
    `n_words` 32-bit words whose bit s says "this tile overlaps supergroup
    s" (computed conservatively in XLA against supergroup AABBs — a
    (rays x n_supers) problem, ~SG times smaller than rays x chunks). Only
    overlapped supergroups get the (SG, rbt) per-chunk slab test; typical
    tiles overlap a handful of the ~128 supergroups, so prep cost drops to
    the coarse pass + a short loop. entry is min-accumulated IN PLACE
    across the ray tiles of a block (the i grid axis revisits the same
    (1, Cp, 1) block), replacing the old (G, Cp) intermediate + XLA
    reduction."""
    i = pl.program_id(1)
    o = o_ref[0]          # (3, RBt)
    idv = idv_ref[0]      # (3, RBt)
    cap = jnp.minimum(jnp.float32(t_max), bud_ref[0])   # (1, RBt)
    alive = cap > 0.0

    @pl.when(i == 0)
    def _init():
        entry_ref[0] = jnp.full(entry_ref.shape[1:], jnp.inf, jnp.float32)

    def fine(js, tl):
        sl = pl.ds(js * _SG, _SG)
        keep, tn0 = _slab_keep(lo_ref[sl, :], hi_ref[sl, :], o, idv, cap,
                               alive)
        tn_eff = jnp.where(keep, tn0, jnp.inf)
        cur = entry_ref[0, sl, :]
        entry_ref[0, sl, :] = jnp.minimum(
            cur, jnp.min(tn_eff, axis=1, keepdims=True))
        return jnp.maximum(tl, jnp.max(jnp.where(keep, tn0, -jnp.inf),
                                       axis=0, keepdims=True))

    tl0 = jnp.full(cap.shape, -jnp.inf, jnp.float32)

    def word_loop(w, tl):
        word = bm_ref[0, i, w]

        # iterate over SET bits only (lowest-set-bit + clear), not all 32
        # positions: per-bit lax.cond overhead dominated the kernel
        def cond(carry):
            wrd, _ = carry
            return wrd != 0

        def body(carry):
            wrd, tl = carry
            low = wrd & -wrd                       # lowest set bit
            jj = 31 - jax.lax.clz(low)             # its index
            tl = fine(w * 32 + jj, tl)
            return wrd & (wrd - 1), tl

        _, tl = jax.lax.while_loop(cond, body, (word, tl))
        return tl

    tl = jax.lax.fori_loop(0, n_words, word_loop, tl0)
    tlast_ref[0] = tl


def _coarse_kernel(slo_ref, shi_ref, o_ref, idv_ref, bud_ref, ov_ref, *,
                   t_max: float):
    """Coarse pass of the hierarchical prep: per (ray tile, supergroup)
    overlap flags, all tiles VMEM-resident (the pure-XLA formulation
    materialized (tiles x supers x rays) temporaries in HBM and cost more
    than the fine pass it was gating)."""
    o = o_ref[0]          # (3, RBt)
    idv = idv_ref[0]
    cap = jnp.minimum(jnp.float32(t_max), bud_ref[0])   # (1, RBt)
    alive = cap > 0.0
    keep, _ = _slab_keep(slo_ref[:, :], shi_ref[:, :], o, idv, cap, alive)
    ov_ref[0] = jnp.any(keep, axis=1, keepdims=True).astype(jnp.int32)


def _coarse_bitmap(lo, hi, o_t, idv_t, bud_t, *, Cp: int, t_max: float,
                   interpret: bool):
    """Packed per-(ray tile, supergroup) overlap bits via _coarse_kernel.

    o_t/idv_t: (G, 3, RBt); bud_t: (G, 1, RBt). Conservative: a chunk kept
    by any lane implies its supergroup (whose AABB contains the chunk's)
    is kept by that lane here. Returns (G, n_words) int32."""
    S = Cp // _SG
    slo = lo.reshape(S, _SG, 3).min(axis=1)             # (S, 3)
    shi = hi.reshape(S, _SG, 3).max(axis=1)
    Sp = -(-S // 32) * 32
    if Sp > S:
        far = jnp.full((Sp - S, 3), 1e9, jnp.float32)
        slo = jnp.concatenate([slo, far], axis=0)
        shi = jnp.concatenate([shi, far + 1.0], axis=0)
    G, _, rbt = o_t.shape

    overlap = pl.pallas_call(
        functools.partial(_coarse_kernel, t_max=float(t_max)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # super lo (Sp, 3)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # super hi
            pl.BlockSpec((1, 3, rbt), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, rbt), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rbt), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Sp, 1), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Sp, 1), jnp.int32),
        interpret=interpret,
    )(slo, shi, o_t, idv_t, bud_t)

    bits = overlap[:, :, 0].reshape(G, Sp // 32, 32)
    # distinct powers of two: the sum IS the bitwise OR (1<<31 wraps to the
    # int32 sign bit; the kernel's lowest-set-bit scan handles it)
    weights = jnp.left_shift(jnp.int32(1), jnp.arange(32, dtype=jnp.int32))
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.int32)


def _run_prep_kernel(lo, hi, o_aug, inv_d_t, bud_b, *, Cp: int, RB: int,
                     n_blocks: int, t_max: float, interpret: bool):
    """entry (B, Cp) + t_last (B, RB) via the fused prep kernel(s)."""
    hier = Cp % _SG == 0 and Cp // _SG >= 8
    # wide ray tiles in the hierarchical path: per-grid-cell overhead
    # (entry-block revisit, word loop, vector<->scalar syncs) amortizes
    # over more lanes. Measured at 1M tris / 409.6k-ray marginal: 512 ->
    # 21.2 ms trace, 1024 -> 18.6, 2048 -> 19.8 (the whole-block tile's
    # coarser bitmap wins back the overhead it saves) — 1024 is the
    # optimum. Exactness-neutral at any width: the block entry is the
    # min over its tiles' entries and tlast is per lane either way. The
    # tile must DIVIDE the ray block (ray_block is any multiple of 128,
    # e.g. 768), so fall back through 512/256 to 128
    want = 1024 if hier else 256
    rbt = next(r for r in (want, 512, 256, 128) if RB % r == 0)
    I = RB // rbt
    G = n_blocks * I

    if hier:
        # hierarchical path: coarse supergroup bitmap (XLA) gates the fine
        # per-chunk tests (Pallas)
        o_t = o_aug.reshape(n_blocks, 3, I, rbt).transpose(
            0, 2, 1, 3).reshape(G, 3, rbt)
        idv_t = inv_d_t.reshape(n_blocks, 3, I, rbt).transpose(
            0, 2, 1, 3).reshape(G, 3, rbt)
        bud_t = bud_b.reshape(n_blocks, 1, I, rbt).transpose(
            0, 2, 1, 3).reshape(G, 1, rbt)
        words = _coarse_bitmap(lo, hi, o_t, idv_t, bud_t, Cp=Cp,
                               t_max=float(t_max), interpret=interpret)
        n_words = words.shape[1]
        words = words.reshape(n_blocks, I, n_words)

        entry, t_last = pl.pallas_call(
            functools.partial(_prep_kernel_hier, n_words=n_words,
                              t_max=float(t_max)),
            grid=(n_blocks, I),
            in_specs=[
                # per-block SMEM window: a whole-array bitmap exceeds the
                # 1 MB SMEM at ~0.5M+ rays (512+ blocks)
                pl.BlockSpec((1, I, n_words), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),   # lo (Cp, 3)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # hi (Cp, 3)
                pl.BlockSpec((1, 3, rbt), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),   # ray origins
                pl.BlockSpec((1, 3, rbt), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),   # 1/dir
                pl.BlockSpec((1, 1, rbt), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),   # budget
            ],
            out_specs=[
                # revisited across the i axis: min-accumulated in place
                pl.BlockSpec((1, Cp, 1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, rbt), lambda b, i: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, Cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, 1, RB), jnp.float32),
            ],
            # the (1, Cp, 1) entry block pads each row to a full 128-lane
            # tile; beyond ~4k chunks that exceeds Mosaic's default 16 MB
            # scoped-vmem budget (v5e VMEM is 128 MB)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(words, lo, hi, o_aug, inv_d_t, bud_b)
        return entry[:, :, 0], t_last

    ct = min(512, Cp)
    n_ctiles = Cp // ct

    entry_part, t_last = pl.pallas_call(
        functools.partial(_prep_kernel, ct=ct, n_ctiles=n_ctiles,
                          t_max=float(t_max)),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lo (Cp, 3), resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hi (Cp, 3)
            pl.BlockSpec((1, 3, rbt), lambda g: (g // I, 0, g % I),
                         memory_space=pltpu.VMEM),   # ray origins
            pl.BlockSpec((1, 3, rbt), lambda g: (g // I, 0, g % I),
                         memory_space=pltpu.VMEM),   # 1/dir
            pl.BlockSpec((1, 1, rbt), lambda g: (g // I, 0, g % I),
                         memory_space=pltpu.VMEM),   # budget
        ],
        out_specs=[
            pl.BlockSpec((1, Cp, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rbt), lambda g: (g // I, 0, g % I),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 1, RB), jnp.float32),
        ],
        interpret=interpret,
    )(lo, hi, o_aug, inv_d_t, bud_b)

    entry = jnp.min(entry_part.reshape(n_blocks, I, Cp), axis=1)
    return entry, t_last.reshape(n_blocks, 1, RB)


def _v3_callable(chunk_size: int, ray_block: int, group: int, t_min: float,
                 t_max: float, interpret: bool, argmin_mode: str = "visit",
                 term_stride: int = 1):
    """Build the v3 impl with a custom vmap rule: batched rays flatten into
    the ray axis (rays are independent), because Pallas ANY-space operands
    (the HBM-resident plane/order tables) cannot be batched by vmap."""

    @jax.custom_batching.custom_vmap
    def impl(tbl_t, tri_t, chunk_lo, chunk_hi, origs, dirs, budget):
        return _trace_pallas_v3_impl(
            tbl_t, tri_t, chunk_lo, chunk_hi, origs, dirs, budget,
            chunk_size=chunk_size, ray_block=ray_block, group=group,
            t_min=t_min, t_max=t_max, interpret=interpret,
            argmin_mode=argmin_mode, term_stride=term_stride)

    @impl.def_vmap
    def _vmap_rule(axis_size, in_batched, tbl_t, tri_t, chunk_lo,
                   chunk_hi, origs, dirs, budget):
        tb_b, tri_b, lo_b, hi_b, o_b, d_b, b_b = in_batched
        if tb_b or tri_b or lo_b or hi_b:
            raise NotImplementedError(
                "pallas3 cannot batch over scenes; batch rays/poses only")
        o = origs if o_b else jnp.broadcast_to(
            origs[None], (axis_size,) + origs.shape)
        d = dirs if d_b else jnp.broadcast_to(
            dirs[None], (axis_size,) + dirs.shape)
        b = budget if b_b else jnp.broadcast_to(
            budget[None], (axis_size,) + budget.shape)
        R = o.shape[1]
        # Interleave the batch axis INSIDE the ray axis (ray-major order):
        # batched frames share nearly identical ray geometry (same azimuth
        # layout, nearby poses), so grouping the same within-frame ray index
        # across frames makes each kernel ray block span ~batch-times fewer
        # azimuths. The narrower block frustum overlaps fewer chunks, and
        # the front-to-back rank order serves every lane at once, so the
        # sweep terminates earlier. Exact: lanes are independent; this is a
        # permutation, inverted on the outputs.
        t, tri = impl(tbl_t, tri_t, chunk_lo, chunk_hi,
                      o.transpose(1, 0, 2).reshape(-1, 3),
                      d.transpose(1, 0, 2).reshape(-1, 3),
                      b.transpose(1, 0).reshape(-1))
        return (t.reshape(R, axis_size).T,
                tri.reshape(R, axis_size, 16).transpose(1, 0, 2)), \
            (True, True)

    return impl


@functools.partial(
    jax.jit,
    static_argnames=("chunk_size", "ray_block", "group", "t_min", "t_max",
                     "interpret", "argmin_mode", "term_stride"),
)
def _trace_pallas_v3_impl(tbl_t, tri_t, chunk_lo, chunk_hi, origs,
                          dirs, budget, *, chunk_size: int, ray_block: int,
                          group: int, t_min: float, t_max: float,
                          interpret: bool, argmin_mode: str = "visit",
                          term_stride: int = 1):
    """tbl_t: bf16 fused intersection table in the kernel DMA layout
    (SWEEP_K, C*5*Tc) (geom/scene.py:_sweep_table_fused); tri_t: the
    (48, C*Tc) bf16 packed winner-fetch table — all scene-constant,
    precomputed by Scene.device_arrays (geom/scene.py) or derived once in
    trace_pallas_v3. chunk_lo/hi are already padded to a multiple of
    `group` there."""
    tc = chunk_size
    C = tbl_t.shape[1] // (5 * tc)
    R = origs.shape[0]
    RB = ray_block
    pad = (-R) % RB
    o = jnp.concatenate([origs, jnp.zeros((pad, 3), jnp.float32)], axis=0)
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), jnp.float32)], axis=0)
    bud = jnp.concatenate([budget, jnp.zeros((pad,), jnp.float32)], axis=0)
    n_blocks = o.shape[0] // RB

    # supergroup AABBs: culling granularity = group consecutive leaf
    # chunks (their triangles are one contiguous plane slab in HBM)
    C2 = C // group
    sg_lo = chunk_lo.reshape(C2, group, 3).min(axis=1)
    sg_hi = chunk_hi.reshape(C2, group, 3).max(axis=1)

    # per-ray feature matrices for the kernel's skinny matmuls, in the
    # split-exact slot layout matching geom/scene.py:_sweep_table_fused:
    # F_A = [o parts, 1], F_D = [d parts], F_B = [d parts, (o x d) parts]
    # (o x d are the ray line's Pluecker moment coords), all bf16.
    # Shaped (K, R'): the BlockSpec slices ray columns per block.
    fa, fb = _sweep_features(o, d, dtype=tbl_t.dtype)

    # per-block front-to-back SUPERGROUP ranking + entries, via the fused
    # Pallas prep kernel (_prep_kernel): the pure-XLA formulation of this
    # step materialized (rays x chunks) intermediates in HBM and dominated
    # the 1M-triangle trace (~100 of ~170 ms). Padding lanes [R:] and
    # budget-dead rays get budget 0 (cap > 0 fails): they contribute no
    # entries and carry t_last = -inf (never veto termination). The per-ray
    # budget prunes the same way: a chunk a ray only enters beyond its
    # budget cannot hold a within-budget hit for it (the uniform miss-mask
    # for beyond-budget hits lives in trace/api.py).
    inv_d = 1.0 / jnp.where(jnp.abs(d) > _DIR_EPS, d,
                            jnp.where(d >= 0, _DIR_EPS, -_DIR_EPS))
    inv_d_t = inv_d.reshape(n_blocks, RB, 3).transpose(0, 2, 1)  # (B, 3, RB)
    bud_live = jnp.where(jnp.arange(o.shape[0]) < R, bud, 0.0)
    bud_b = bud_live.reshape(n_blocks, 1, RB)
    # pad the chunk table so the hierarchical prep's supergroups tile it
    # exactly (512 is a multiple of _SG=32); tiny scenes keep a snug pad
    ct = 512 if C2 >= 8 * _SG else min(512, max(8, C2))
    Cp2 = -(-C2 // ct) * ct
    far = jnp.full((Cp2 - C2, 3), 1e9, jnp.float32)
    entry, t_last = _run_prep_kernel(
        jnp.concatenate([sg_lo, far], axis=0),
        jnp.concatenate([sg_hi, far + 1.0], axis=0),
        o.reshape(n_blocks, RB, 3).transpose(0, 2, 1), inv_d_t, bud_b,
        Cp=Cp2, RB=RB, n_blocks=n_blocks, t_max=t_max, interpret=interpret)
    entry = entry[:, :C2]                                      # (B, C2)
    # one fused key-value sort; argsort + take_along_axis costs ~8 ms more
    # per trace at this size (the gather dominates)
    entry_ranked, order = jax.lax.sort_key_val(
        entry, jnp.broadcast_to(
            jnp.arange(C2, dtype=jnp.int32)[None], entry.shape), dimension=1)
    nvisit = jnp.sum(jnp.isfinite(entry_ranked), axis=1,
                     keepdims=True).astype(jnp.int32)        # (B, 1)
    # pad the ranked tables so their (8, Cp/8) tile shape is aligned; the
    # entry padding is +inf so the termination test holds at k+1 == n == C2
    Cp = ((C2 + 1 + 1023) // 1024) * 1024
    order = jnp.concatenate(
        [order, jnp.zeros((n_blocks, Cp - C2), jnp.int32)],
        axis=1).reshape(n_blocks, 8, Cp // 8)
    entry_pad = jnp.concatenate(
        [entry_ranked, jnp.full((n_blocks, Cp - C2), jnp.inf)],
        axis=1).reshape(n_blocks, 8, Cp // 8)

    kernel = functools.partial(
        _trace_kernel_v3, tc=tc, group=group,
        t_min=float(t_min), t_max=float(t_max), argmin_mode=argmin_mode,
        term_stride=term_stride)

    best_t, tri_rows = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # nvisit (B, 1)
            pl.BlockSpec(memory_space=pltpu.HBM),    # order (B, Cp)
            pl.BlockSpec(memory_space=pltpu.HBM),    # ranked entries (B, Cp)
            pl.BlockSpec((SWEEP_K, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # F_A (split-exact)
            pl.BlockSpec((SWEEP_K, RB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),   # F_B (split-exact)
            pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # t_last
            pl.BlockSpec(memory_space=pltpu.HBM),    # fused table (bf16)
            pl.BlockSpec(memory_space=pltpu.HBM),    # tri fetch table (bf16)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, RB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),   # winner rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, 1, RB), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, 16, RB), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((8, Cp // 8), jnp.int32),       # this block's order
            pltpu.SMEM((8, Cp // 8), jnp.float32),     # this block's entries
            pltpu.SemaphoreType.DMA((2,)),             # order/entry DMA
            pltpu.VMEM((2, SWEEP_K, group * 5 * tc), tbl_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 48, group * tc), tri_t.dtype),     # tri dbl buf
            pltpu.SemaphoreType.DMA((2,)),
            # the winning GLOBAL triangle index is only needed inside the
            # kernel (it drives the winner-fetch one-hot); scratch, not out
            pltpu.VMEM((1, 1, RB), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(nvisit, order, entry_pad, fa, fb, t_last, tbl_t, tri_t)

    tri = tri_rows.transpose(0, 2, 1).reshape(-1, 16)[:R]
    # the kernel sweeps UNmasked by t_max (per-element range test dropped
    # — exact, see the kernel's inside-test comment); the winner is range-
    # masked once here, (R,) ops instead of (Tc, RB) per visit
    bt = best_t.reshape(-1)[:R]
    return jnp.where(bt <= t_max, bt, jnp.inf), tri


def _auto_prep_group(n_chunks: int) -> int:
    """Smallest supergroup size whose culling tables fit the prep kernel's
    VMEM scope (VERDICT r3 #4: a 10M-triangle scene with the default
    group=1 blew Mosaic's VMEM budget instead of rendering).

    The prep kernel keeps three per-(super)chunk VMEM blocks resident —
    the entry accumulator (1, Cp, 1) and the lo/hi AABB tables (Cp, 3) —
    each padded to 128 lanes, so VMEM cost ~ 3 * Cp * 512 B. Keeping
    Cp <= 12288 (~18 MB, comfortably inside the 96 MB limit alongside the
    bitmap/ray tiles and double-buffering) reproduces the measured-good
    operating points: 1M triangles (4k chunks) -> 1, 10M (40k chunks) ->
    4. Powers of two only, capped at 8: Scene.device_arrays pads the
    chunk count to a multiple of 8, so any g <= 8 divides it and stays on
    the precomputed-table fast path. Denser scenes than ~25M triangles
    should raise chunk_size instead.
    """
    g = 1
    while g < 8 and -(-n_chunks // g) > 12288:
        g *= 2
    return g


def _ray_sort_key(origs, dirs):
    """Spatial sort key for incoherent rays: direction octant (3 bits) over
    a 6-bit-per-axis Morton code of the origin. Grouping rays that start
    near each other and point the same way restores the block coherence
    the sweep's culling lives on."""
    lo = jnp.min(origs, axis=0)
    ext = jnp.maximum(jnp.max(origs, axis=0) - lo, 1e-6)
    q = jnp.clip((origs - lo) / ext * 63.0, 0.0, 63.0).astype(jnp.int32)
    code = jnp.zeros(origs.shape[0], jnp.int32)
    for b in range(6):
        for ax in range(3):
            code = code | (((q[:, ax] >> b) & 1) << (3 * b + ax))
    octant = ((dirs[:, 0] > 0).astype(jnp.int32) * 4
              + (dirs[:, 1] > 0).astype(jnp.int32) * 2
              + (dirs[:, 2] > 0).astype(jnp.int32))
    # origin-major, octant as tie-break: in dense scenes rays resolve within
    # a few chunk lengths, so a block of same-cell rays (any direction)
    # overlaps one neighborhood ball — far tighter than octant-major
    # blocks, whose frustum is a 90-degree cone across many cells
    return (code << 3) | octant


def trace_pallas_v3(scene, origs, dirs, t_min: float = 0.0,
                    t_max: float = 1000.0, ray_block: int = 2048,
                    t_budget=None, prep_group: int | None = None,
                    tri_aux=None, sort_rays: bool = False,
                    two_phase_cap: float | None = None,
                    argmin_mode: str = "gated",
                    term_stride: int = 1,
                    interpret: bool | None = None, **_ignored):
    """v3 Pallas trace: front-to-back sweep + early termination + HBM DMA.

    The BVH-style engine for large scenes: chunk visits stop at the block's
    nearest hits instead of scanning every overlapped chunk. Exact (the
    termination criterion is conservative); parity-tested against brute.
    t_budget: optional (R,) per-ray sweep cap (see trace/api.py).
    prep_group: chunks per culling supergroup (coarser ranking, one DMA +
    inner loop per visit). Measured worse than 1 on dense 1M-triangle
    scenes (coarser culling multiplies kernel work faster than it cuts
    prep), but REQUIRED >1 at ~10M triangles so the prep kernel's
    per-chunk tables fit VMEM. Default (None/0): derived from the chunk
    count by _auto_prep_group — 1 up to ~3M triangles, then 2/4/8.
    sort_rays: spatially sort rays (origin Morton code + direction octant)
    before blocking and restore order after — the engine's culling relies
    on intra-block coherence, so fully INCOHERENT ray sets (random
    origins/directions) run ~50x faster with it (benchmarks/engines.py
    --saturated). Radar fans are already coherent: leave it off there
    (the two multi-operand sorts cost more than they save). Caveat: the
    sort changes each block's chunk visit order, so while hit distances
    stay exact, the reported obj_id on EXACT-distance ties (coplanar
    overlapping surfaces) is visit-order dependent and may differ from the
    unsorted trace (tests tolerate tie-only divergence).
    two_phase_cap: two-phase requeue for mixed hit/miss ray sets. Phase 1
    sweeps with budgets capped at this distance [m]; lanes NOT resolved
    within the cap (the rare deep/miss rays, whose huge sweep range would
    otherwise stall every block containing one) are compacted to the
    front by a stable flag-sort and re-traced with their full budget —
    fully-dead re-trace blocks skip at the nvisit==0 guard, so phase 2
    costs only ~ceil(unresolved/ray_block) real block sweeps. EXACT: a
    capped-budget winner within the cap is the global winner (any nearer
    triangle would lie in a chunk entered within the cap), and phase 2 is
    a plain full-budget trace for the rest. Off by default (two sweeps of
    bookkeeping); big win on incoherent/miss-heavy sets, neutral-to-
    harmful on coherent radar fans whose image-range budgets already
    bound the sweep.
    argmin_mode: where the winner's row argmin is computed — "visit"
    (every sweep visit, classic), "gated" (only on visits that improve
    some lane — the default) or "defer" (recovered inside the gated
    winner-fetch pass). All exact with identical tie-breaks
    (_trace_kernel_v3 docstring). Measured round 5 on the 1M-triangle
    flagship (marginal trace / frame sustained): visit 18.36 ms / 114.0
    Hz, gated 17.70 ms / 119.5 Hz, defer 19.37 ms (dead-end: the fetch
    recompute costs more than the sweep saves) — "gated" wins on both.
    term_stride: evaluate the block-wide early-termination test only every
    Nth chunk visit (1 = every visit, the default). Skipping a check
    only ever terminates LATER (<= N-1 extra idempotent visits), so any
    stride is exact with bit-identical outputs. MEASURED DEAD-END on
    radar fans (docs/PERFORMANCE.md round 5): 11.75 -> 12.02 -> 13.07 ms
    marginal at stride 1/2/4 (frame-level a wash) — the per-visit sync
    overlaps the next visit's DMA, so stride only buys extra visits'
    slab work. Kept for sparse-scene workloads with long sweeps.
    """
    if argmin_mode not in ("visit", "gated", "defer"):
        raise ValueError(f"unknown argmin_mode {argmin_mode!r}")
    if term_stride < 1:
        raise ValueError(f"term_stride must be >= 1, got {term_stride}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    chunk_size = scene.verts.shape[0] // scene.chunk_aabb_lo.shape[0]
    if chunk_size % 8 != 0:
        raise ValueError(
            f"pallas trace needs chunk_size % 8 == 0, got {chunk_size}")
    if not interpret and (5 * chunk_size) % 128 != 0:
        # the compiled kernel's HBM slab DMA (width 5*Tc per chunk) must be
        # 128-lane aligned; Mosaic rejects it otherwise. Interpret mode
        # (tests) does not enforce this.
        raise ValueError(
            "pallas trace on TPU needs chunk_size to be a multiple of 128 "
            f"(slab width 5*Tc must align to 128 lanes), got {chunk_size}")
    if ray_block % 128 != 0:
        raise ValueError(f"ray_block must be a multiple of 128, got {ray_block}")
    group = prep_group or _auto_prep_group(scene.chunk_aabb_lo.shape[0])
    impl = _v3_callable(chunk_size, ray_block, group, float(t_min),
                        float(t_max), interpret, argmin_mode,
                        int(term_stride))
    origs = jnp.asarray(origs)
    dirs = jnp.asarray(dirs)
    budget = (jnp.full(origs.shape[:-1], t_max, jnp.float32)
              if t_budget is None else jnp.asarray(t_budget, jnp.float32))

    chunk_lo = jnp.asarray(scene.chunk_aabb_lo)
    chunk_hi = jnp.asarray(scene.chunk_aabb_hi)
    C = chunk_lo.shape[0]
    pad_c = (-C) % group
    tbl_t = getattr(scene, "sweep_table_t", None)
    if tbl_t is not None and pad_c == 0:
        # scene-constant kernel layout, precomputed on host (the on-the-fly
        # relayout of the ~160 MB table dominated large-scene trace time)
        tbl_t = jnp.asarray(tbl_t)
    else:
        # fallback for hand-built SceneArrays or non-dividing prep_group:
        # the SAME builder the host precompute uses (geom/scene.py), run in
        # jnp (parity covered by
        # tests/test_trace.py::test_pallas_v3_nondividing_group_...)
        from radarays_ros_tpu.geom.scene import _sweep_table_fused

        planes_o = jnp.asarray(scene.planes_o)
        if pad_c:
            # pad the chunk axis to a multiple of the supergroup size with
            # never-hit chunks (zero planes -> |denominator| = 0)
            planes_o = jnp.concatenate(
                [planes_o, jnp.zeros((pad_c * 4 * chunk_size, 4),
                                     jnp.float32)], axis=0)
        tbl_t = _sweep_table_fused(planes_o, chunk_size, xp=jnp)
    aux_baked = isinstance(tri_aux, str)
    if aux_baked and tri_aux != "baked":
        raise ValueError(f"tri_aux must be an array or 'baked', got {tri_aux!r}")
    tri_t = getattr(scene, "tri_table_t", None)
    if tri_t is not None:
        tri_t = jnp.asarray(tri_t)
        if pad_c:
            # pad the triangle axis with never-fetched zeros (the matching
            # pad chunks have zero planes and are never entered)
            tri_t = jnp.concatenate(
                [tri_t, jnp.zeros((48, pad_c * chunk_size), tri_t.dtype)],
                axis=1)
    else:
        if aux_baked:
            raise ValueError(
                "tri_aux='baked' needs a precomputed tri_table_t "
                "(geom/scene.py:bake_tri_aux)")
        from radarays_ros_tpu.geom.scene import _tri_fetch_table

        xp = np if isinstance(scene.verts, np.ndarray) else jnp
        tri_t = jnp.asarray(_tri_fetch_table(
            scene.verts, scene.normals, scene.obj_ids, xp=xp))
        if pad_c:
            tri_t = jnp.concatenate(
                [tri_t, jnp.zeros((48, pad_c * chunk_size), tri_t.dtype)],
                axis=1)
    if tri_aux is not None and not aux_baked:
        # caller-provided per-triangle values ride the kernel's winner-fetch
        # pass as semantic row 13 of the split table (zeros otherwise) —
        # one bf16-exact part per part block (lossless bf16 casts). When
        # the aux row is material-load constant, bake it into the table
        # instead (geom/scene.py:bake_tri_aux + tri_aux="baked"): this
        # in-jit path costs a (T,) gather upstream plus a full-table copy
        # here.
        aux_row = jnp.asarray(tri_aux, jnp.float32)
        if pad_c:
            aux_row = jnp.concatenate(
                [aux_row, jnp.zeros((pad_c * chunk_size,), jnp.float32)])
        a0, a1, a2 = (p.astype(tri_t.dtype)
                      for p in _bf16_parts(aux_row, jnp))
        tri_t = tri_t.at[13, :].set(a0).at[29, :].set(a1).at[45, :].set(a2)
    if pad_c:
        far = jnp.full((pad_c, 3), 1e9, jnp.float32)
        chunk_lo = jnp.concatenate([chunk_lo, far], axis=0)
        chunk_hi = jnp.concatenate([chunk_hi, far + 1.0], axis=0)
    # Differentiation contract: the kernel picks WHICH triangle wins
    # (discrete — no useful derivative, and pallas_call has no AD rule);
    # the hit DISTANCE is then recomputed differentiably against that
    # triangle by _finalize_packed's Moller-Trumbore refinement. Stopping
    # tangents into the kernel makes d(t)/d(origs, dirs) flow through the
    # refinement — the exact gradient conditional on the discrete hit —
    # so beam-width/pose optimization works on the production engine.
    sg = jax.lax.stop_gradient

    def run(o_r, d_r, b_r):
        return impl(sg(tbl_t), sg(tri_t), sg(chunk_lo), sg(chunk_hi),
                    o_r, d_r, b_r)

    def permute(key, o_r, d_r, b_r):
        """Stable multi-operand sort of the ray set by `key` (a permutation
        gather/scatter of this size would itself run at XLA's ~1 GB/s
        gather speed). Returns the sorted rays + the inverse index."""
        iota = jnp.arange(o_r.shape[0], dtype=jnp.int32)
        (_, ox, oy, oz, dx, dy, dz, b_s, inv) = jax.lax.sort(
            (key, o_r[:, 0], o_r[:, 1], o_r[:, 2],
             d_r[:, 0], d_r[:, 1], d_r[:, 2], b_r, iota), num_keys=1)
        return (jnp.stack([ox, oy, oz], axis=-1),
                jnp.stack([dx, dy, dz], axis=-1), b_s, inv)

    def unpermute(inv, t_s, tri_s):
        uns = jax.lax.sort(
            (inv, t_s) + tuple(tri_s[:, j] for j in range(16)), num_keys=1)
        return uns[1], jnp.stack(uns[2:], axis=-1)

    def run_phased(o_r, d_r, b_r):
        if two_phase_cap is None:
            return run(o_r, d_r, b_r)
        cap = jnp.float32(two_phase_cap)
        b1 = jnp.minimum(b_r, cap)
        t1, tri1 = run(o_r, d_r, b1)
        # trustworthy iff the phase-1 winner lies within the capped
        # budget (the kernel's budget prunes CHUNKS, so a returned t may
        # exceed b1 — a nearer triangle could hide in a pruned chunk)
        resolved = jnp.isfinite(t1) & (t1 <= b1)
        live = jnp.logical_not(resolved) & (b_r > cap)
        b2 = jnp.where(live, b_r, 0.0)
        # compact the unresolved lanes to the front (stable: preserves
        # any spatial order within each class), full-budget re-trace —
        # all-dead blocks skip at the kernel's nvisit==0 guard
        o2, d2, b2s, inv2 = permute(
            resolved.astype(jnp.int32), o_r, d_r, b2)
        t2, tri2 = unpermute(inv2, *run(o2, d2, b2s))
        return (jnp.where(resolved, t1, t2),
                jnp.where(resolved[:, None], tri1, tri2))

    if sort_rays:
        o_s, d_s, bud_s, inv = permute(
            _ray_sort_key(sg(origs), sg(dirs)),
            sg(origs), sg(dirs), sg(budget))
        best_t, tri = unpermute(inv, *run_phased(o_s, d_s, bud_s))
    else:
        best_t, tri = run_phased(sg(origs), sg(dirs), sg(budget))
    return _finalize_packed(origs, dirs, sg(best_t), sg(tri),
                            with_aux=tri_aux is not None)
