"""Vectorized classic Perlin noise (Ken Perlin's improved noise, 2002).

Counterpart of include/radarays_ros/image_algorithms.h:14-128 and the CUDA
twin image_algorithms.cu. Uses the canonical 256-entry permutation of
Perlin's reference implementation (the same table hardcoded at
image_algorithms.h:14-50), doubled for overflow-free indexing, so noise
values agree with the reference bit-for-bit in float64 and to float32
rounding otherwise.

The jnp implementation is fully vectorized: integer-hash table gathers over
arbitrary coordinate arrays, no loops. Used for the ambient-noise stage
(image/draw.py) where x varies over range cells and y over azimuth columns.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Canonical permutation from Ken Perlin's improved-noise reference
# implementation (public domain); identical to PERLIN_PERMUTATIONS
# (image_algorithms.h:14-50).
_PERM256 = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225,
    140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148,
    247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32,
    57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171, 168, 68, 175,
    74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158, 231, 83, 111, 229, 122,
    60, 211, 133, 230, 220, 105, 92, 41, 55, 46, 245, 40, 244, 102, 143, 54,
    65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132, 187, 208, 89, 18, 169,
    200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109, 198, 173, 186, 3, 64,
    52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212,
    207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213,
    119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241,
    81, 51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157,
    184, 84, 204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93,
    222, 114, 67, 29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180,
], np.int32)
PERM = np.concatenate([_PERM256, _PERM256])


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(h, x, y, z):
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def perlin_noise(src_x, src_y, src_z=0.0):
    """Classic 3-D Perlin noise in [-1, 1], vectorized over array inputs.

    Semantics of perlin_noise (image_algorithms.h:69-106).
    """
    src_x = jnp.asarray(src_x, jnp.float32)
    src_y = jnp.asarray(src_y, jnp.float32)
    src_z = jnp.broadcast_to(jnp.asarray(src_z, jnp.float32), src_x.shape)
    perm = jnp.asarray(PERM)

    fx, fy, fz = jnp.floor(src_x), jnp.floor(src_y), jnp.floor(src_z)
    X = fx.astype(jnp.int32) & 255
    Y = fy.astype(jnp.int32) & 255
    Z = fz.astype(jnp.int32) & 255
    x, y, z = src_x - fx, src_y - fy, src_z - fz
    u, v, w = _fade(x), _fade(y), _fade(z)

    A = perm[X] + Y
    AA = perm[A] + Z
    AB = perm[A + 1] + Z
    B = perm[X + 1] + Y
    BA = perm[B] + Z
    BB = perm[B + 1] + Z

    def lerp(t, a, b):
        return a + t * (b - a)

    res = lerp(
        w,
        lerp(v,
             lerp(u, _grad(perm[AA], x, y, z), _grad(perm[BA], x - 1.0, y, z)),
             lerp(u, _grad(perm[AB], x, y - 1.0, z),
                  _grad(perm[BB], x - 1.0, y - 1.0, z))),
        lerp(v,
             lerp(u, _grad(perm[AA + 1], x, y, z - 1.0),
                  _grad(perm[BA + 1], x - 1.0, y, z - 1.0)),
             lerp(u, _grad(perm[AB + 1], x, y - 1.0, z - 1.0),
                  _grad(perm[BB + 1], x - 1.0, y - 1.0, z - 1.0))),
    )
    return res


def perlin_noise_hilo(off_x, off_y, x, y, scale_low, scale_high, p_low):
    """Two-octave blend p_low*low + (1-p_low)*high (image_algorithms.h:108-128)."""
    low = perlin_noise(off_x + x * scale_low, off_y + y * scale_low)
    high = perlin_noise(off_x + x * scale_high, off_y + y * scale_high)
    return p_low * low + (1.0 - p_low) * high


def perlin_noise_reference(src_x, src_y, src_z=0.0):
    """Pure-NumPy float64 scalar reference (oracle for tests)."""
    p = PERM

    def fade(t):
        return t * t * t * (t * (t * 6 - 15) + 10)

    def lerp(t, a, b):
        return a + t * (b - a)

    def grad(h, x, y, z):
        h = h & 15
        u = x if h < 8 else y
        v = y if h < 4 else (x if h in (12, 14) else z)
        return (u if (h & 1) == 0 else -u) + (v if (h & 2) == 0 else -v)

    X = int(np.floor(src_x)) & 255
    Y = int(np.floor(src_y)) & 255
    Z = int(np.floor(src_z)) & 255
    x = src_x - np.floor(src_x)
    y = src_y - np.floor(src_y)
    z = src_z - np.floor(src_z)
    u, v, w = fade(x), fade(y), fade(z)
    A = p[X] + Y
    AA = p[A] + Z
    AB = p[A + 1] + Z
    B = p[X + 1] + Y
    BA = p[B] + Z
    BB = p[B + 1] + Z
    return lerp(w,
                lerp(v,
                     lerp(u, grad(p[AA], x, y, z), grad(p[BA], x - 1, y, z)),
                     lerp(u, grad(p[AB], x, y - 1, z), grad(p[BB], x - 1, y - 1, z))),
                lerp(v,
                     lerp(u, grad(p[AA + 1], x, y, z - 1), grad(p[BA + 1], x - 1, y, z - 1)),
                     lerp(u, grad(p[AB + 1], x, y - 1, z - 1),
                          grad(p[BB + 1], x - 1, y - 1, z - 1))))


# ---------------------------------------------------------------- fast path

def _grad_coef_tables():
    """grad(h, x, y, 0) is affine in (x, y): grad = alpha(h)*x + beta(h)*y.

    Derived from _grad: u = x if h<8 else y (sign from h&1); v = y if h<4,
    x if h in {12, 14}, else z=0 (sign from h&2)."""
    alpha = np.zeros(16, np.float32)
    beta = np.zeros(16, np.float32)
    for h in range(16):
        su = 1.0 if (h & 1) == 0 else -1.0
        sv = 1.0 if (h & 2) == 0 else -1.0
        if h < 8:
            alpha[h] += su
        else:
            beta[h] += su
        if h < 4:
            beta[h] += sv
        elif h in (12, 14):
            alpha[h] += sv
    return alpha, beta


_GRAD_ALPHA, _GRAD_BETA = _grad_coef_tables()


def _fused_hash_tables():
    """G[x, y]  = perm[perm[perm[x] + y]] & 15   (the A-corner hash)
       G2[x, y] = perm[perm[perm[x] + y + 1]] & 15 (the AB/BB corner hash)

    Fusing the reference's three-level permutation chain into two (256, 256)
    lookup tables turns 10 chained table gathers per octave into 4."""
    x = np.arange(256)
    y = np.arange(256)
    a = PERM[x][:, None] + y[None, :]          # (256, 256) in [0, 510]
    g = PERM[PERM[a]] & 15
    g2 = PERM[PERM[a + 1]] & 15
    return g.astype(np.int32), g2.astype(np.int32)


_HASH_G, _HASH_G2 = _fused_hash_tables()

# (256_y, 256_x, 4) channel-stacked hash tables [G, G2, G(x+1), G2(x+1)],
# y-major so the per-row selection Gsel = GG[Y] is a contiguous row gather
_HASH_STACK = np.stack([
    _HASH_G, _HASH_G2,
    np.roll(_HASH_G, -1, axis=0), np.roll(_HASH_G2, -1, axis=0),
], axis=-1).transpose(1, 0, 2).astype(np.float32)  # -> (y, x, 4)


def _alpha_beta(h):
    """Arithmetic gradient coefficients (no 16-entry table gather):
    grad(h, x, y, 0) = alpha*x + beta*y with h already masked to 4 bits."""
    su = jnp.where(h & 1 == 0, 1.0, -1.0)
    sv = jnp.where(h & 2 == 0, 1.0, -1.0)
    lo8 = h < 8
    alpha = jnp.where(lo8, su, 0.0) + jnp.where((h == 12) | (h == 14), sv, 0.0)
    beta = jnp.where(lo8, 0.0, su) + jnp.where(h < 4, sv, 0.0)
    return alpha, beta


def perlin_affine_rows(x0_int, y, scale: float, n_cells: int):
    """Rowwise 2-D Perlin for x = x0_int[a] + i*scale, i = 0..n_cells-1.

    EXACTLY equals perlin_noise(x0_int[:, None] + i*scale, y[:, None]) when
    x0_int is integer-valued — but runs ~20x faster on TPU: because the x
    lattice phase is shared across rows (integer offsets), the per-cell
    corner-constant expansion is ONE static 0/1 selection matmul instead of
    1.4M-element table gathers. Corner hashing touches only (A, K) lattice
    points (K = number of lattice intervals spanned by the row).

    Used by the ambient-noise stage (image/draw.py) with integer random row
    offsets — the reference's continuous random_begin (RadarCPU.cpp:461-463)
    decorrelates rows, which integer offsets do equally well; parity tests
    compare distributions, not samples (SURVEY.md §7).
    """
    x0_int = jnp.asarray(x0_int, jnp.int32)            # (A,)
    y = jnp.asarray(y, jnp.float32)                    # (A,)

    # shared per-cell lattice data — computed on device (embedding the
    # (K, n_cells) selection as a literal would bloat the HLO by megabytes
    # and slow remote compilation)
    i = jnp.arange(n_cells, dtype=jnp.float32) * jnp.float32(scale)
    fi = jnp.floor(i)
    k_cell = fi.astype(jnp.int32)                      # (n_cells,) interval id
    t = i - fi                                         # frac, shared
    u = _fade(t)
    K = int(np.floor((n_cells - 1) * float(scale))) + 1    # lattice intervals
    sel = (k_cell[None, :] ==
           jnp.arange(K, dtype=jnp.int32)[:, None]).astype(jnp.float32)

    # per-row y lattice data
    fy = jnp.floor(y)
    Y = fy.astype(jnp.int32) & 255
    yf = y - fy
    v = _fade(yf)

    # corner hashes on the (A, K+1) lattice WITHOUT per-element gathers:
    # TPU arbitrary gathers are slow, so (1) select each row's y-slice of the
    # channel-stacked hash tables with a contiguous row gather, then
    # (2) resolve the x lookups as a one-hot contraction (exact: all values
    # are small integers). One einsum yields all four corner hashes.
    Xk = (x0_int[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]) & 255
    # bf16 operands are exact here (one-hot 0/1 and table values <= 15) and
    # halve the HBM traffic of the materialized one-hot
    gsel = jnp.asarray(_HASH_STACK).astype(jnp.bfloat16)[Y]    # (A, 256, 4)
    onehot = (Xk[:, :, None]
              == jnp.arange(256, dtype=jnp.int32)[None, None, :]
              ).astype(jnp.bfloat16)                   # (A, K+1, 256)
    hashes = jnp.einsum("akx,axc->akc", onehot, gsel,
                        preferred_element_type=jnp.float32).astype(jnp.int32)
    hAA, hAB, hBA, hBB = (hashes[..., 0], hashes[..., 1],
                          hashes[..., 2], hashes[..., 3])

    aAA, bAA = _alpha_beta(hAA)
    aAB, bAB = _alpha_beta(hAB)
    aBA, bBA = _alpha_beta(hBA)
    aBB, bBB = _alpha_beta(hBB)
    v_ = v[:, None]
    yf_ = yf[:, None]
    # interval k's A corner hashes sit at lattice index k; its B corner is
    # the "+1" lattice point
    a0 = ((1 - v_) * aAA + v_ * aAB)[:, :K]
    c0 = ((1 - v_) * bAA * yf_ + v_ * bAB * (yf_ - 1.0))[:, :K]
    a1 = ((1 - v_) * aBA + v_ * aBB)[:, :K]
    c1 = ((1 - v_) * bBA * yf_ + v_ * bBB * (yf_ - 1.0))[:, :K]

    # expand per-interval constants to per-cell via the shared selection
    A0 = jnp.dot(a0, sel, preferred_element_type=jnp.float32)
    C0 = jnp.dot(c0, sel, preferred_element_type=jnp.float32)
    A1 = jnp.dot(a1, sel, preferred_element_type=jnp.float32)
    C1 = jnp.dot(c1, sel, preferred_element_type=jnp.float32)

    t_ = t[None, :]
    u_ = u[None, :]
    return (1.0 - u_) * (t_ * A0 + C0) + u_ * ((t_ - 1.0) * A1 + C1)
