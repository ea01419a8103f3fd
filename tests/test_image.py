"""Image layer tests: Perlin parity, denoise kernels, signal drawing, noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.image.denoise import (
    build_denoiser,
    make_denoiser_gaussian,
    make_denoiser_maxwell_boltzmann,
    make_denoiser_triangular,
    maxwell_boltzmann_pdf,
)
from radarays_ros_tpu.image.draw import (
    apply_ambient_noise,
    bin_cells,
    draw_signals,
    normalize_to_u8,
)
from radarays_ros_tpu.image.perlin import (
    perlin_noise,
    perlin_noise_hilo,
    perlin_noise_reference,
)


# ------------------------------------------------------------------ perlin

def test_perlin_matches_scalar_reference():
    rng = np.random.default_rng(0)
    xs = rng.uniform(-50, 50, 64)
    ys = rng.uniform(-50, 50, 64)
    ours = np.asarray(perlin_noise(jnp.asarray(xs, jnp.float32),
                                   jnp.asarray(ys, jnp.float32)))
    ref = np.array([perlin_noise_reference(float(np.float32(x)), float(np.float32(y)))
                    for x, y in zip(xs, ys)])
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_perlin_range_and_smoothness():
    x = jnp.linspace(0.0, 20.0, 2048)
    v = np.asarray(perlin_noise(x, jnp.zeros_like(x)))
    assert np.all(np.abs(v) <= 1.0 + 1e-5)
    # continuous: neighboring samples close
    assert np.max(np.abs(np.diff(v))) < 0.05


def test_perlin_integer_lattice_zero():
    # classic Perlin is 0 at integer lattice points
    v = np.asarray(perlin_noise(jnp.array([0.0, 1.0, 5.0]), jnp.array([0.0, 2.0, 7.0])))
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_perlin_hilo_blend():
    v = perlin_noise_hilo(0.3, 0.7, jnp.float32(3.3), jnp.float32(4.4), 0.05, 0.2, 0.9)
    lo = perlin_noise(0.3 + 3.3 * 0.05, 0.7 + 4.4 * 0.05)
    hi = perlin_noise(0.3 + 3.3 * 0.2, 0.7 + 4.4 * 0.2)
    assert float(v) == pytest.approx(float(0.9 * lo + 0.1 * hi), abs=1e-6)


# ------------------------------------------------------------------ denoise

def test_triangular_kernel_shape():
    k = make_denoiser_triangular(35, 12)
    assert k.shape == (35,)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)
    assert np.argmax(k) == 12
    # piecewise-linear ramps
    assert k[0] == 0.0
    assert np.all(np.diff(k[:13]) > 0)
    assert np.all(np.diff(k[12:]) < 0)


def test_gaussian_is_triangular_quirk():
    # reference quirk: 'gaussian' builder == triangular (radar_algorithms.h:310)
    np.testing.assert_array_equal(make_denoiser_gaussian(50, 17),
                                  make_denoiser_triangular(50, 17))


def test_mb_kernel_matches_pdf():
    k = make_denoiser_maxwell_boltzmann(50, 20)
    pdf = maxwell_boltzmann_pdf(20.0, np.arange(50, dtype=np.float32))
    np.testing.assert_allclose(k, pdf / pdf.sum(), rtol=1e-5)
    # mode of MB pdf is at x = mode parameter
    assert abs(np.argmax(k) - 20) <= 1


def test_build_denoiser_mode_weight_one():
    for enum in (1, 2, 3):
        k, mode = build_denoiser(enum, 35, 0.35)
        assert mode == 12
        assert k[mode] == pytest.approx(1.0, abs=1e-6)
    k, mode = build_denoiser(0, 35, 0.35)
    assert k is None


# ------------------------------------------------------------------ drawing

def test_bin_cells():
    # cell = (0.3 * t / 2) / resolution (RadarCPU.cpp:410-413)
    cells = bin_cells(jnp.array([0.0, 2.0, 100.0]), 0.05)
    np.testing.assert_array_equal(np.asarray(cells), [0, 6, 300])


def test_draw_signals_no_denoise_max_combine():
    times = jnp.array([[2.0, 2.0, 4.0, 1000.0]])
    strengths = jnp.array([[0.5, 0.8, 0.3, 9.9]])
    valid = jnp.array([[True, True, True, True]])
    img, max_val = draw_signals(times, strengths, valid, n_cells=16,
                                resolution=0.05, denoise_weights=None)
    # cells: 6, 6, 12; cell 3000 dropped (>= n_cells)
    assert float(img[0, 6]) == pytest.approx(0.8)  # max-combine
    assert float(img[0, 12]) == pytest.approx(0.3)
    assert float(max_val[0]) == pytest.approx(0.8)
    assert float(img.sum()) == pytest.approx(1.1)


def test_draw_signals_denoise_splat_matches_manual():
    w = np.array([0.25, 1.0, 0.5], np.float32)  # mode 1
    times = jnp.array([[2.0]])       # cell 6
    strengths = jnp.array([[2.0]])
    valid = jnp.array([[True]])
    img, max_val = draw_signals(times, strengths, valid, n_cells=16,
                                resolution=0.05, denoise_weights=w,
                                denoise_mode=1)
    want = np.zeros(16, np.float32)
    want[5:8] = 2.0 * w
    np.testing.assert_allclose(np.asarray(img[0]), want, atol=1e-6)
    assert float(max_val[0]) == pytest.approx(2.0)


def test_draw_signals_denoise_never_writes_cell0():
    # reference quirk: glob_id > 0 (RadarCPU.cpp:423-424)
    w = np.array([0.5, 1.0, 0.5], np.float32)
    times = jnp.array([[0.0]])  # cell 0: taps would be -1, 0, 1
    strengths = jnp.array([[1.0]])
    img, _ = draw_signals(times, strengths, jnp.array([[True]]), n_cells=8,
                          resolution=0.05, denoise_weights=w, denoise_mode=1)
    assert float(img[0, 0]) == 0.0
    assert float(img[0, 1]) == pytest.approx(0.5)


def test_splat_center_guard_matches_reference():
    """Out-of-range CENTER cells contribute nothing — not even kernel taps
    that would land in range. Every reference draw path gates the whole
    splat on the center cell (`if (cell < slice.rows)`, RadarCPU.cpp:414;
    RadarGPU.cpp:630; radar_algorithms.cu:771) before the per-tap clip;
    a signal at the last in-range cell splats only its in-range taps."""
    w = np.array([0.25, 1.0, 0.5], np.float32)  # width 3, mode 1
    res = 0.05
    t_of_cell = lambda c: (c + 0.5) * res * 2.0 / 0.3
    # center at n_cells (out): its mode-1 tap would land at n_cells-1
    times = jnp.array([[t_of_cell(8), t_of_cell(7)]])
    strengths = jnp.array([[3.0, 2.0]])
    valid = jnp.array([[True, True]])
    img, max_val = draw_signals(times, strengths, valid, n_cells=8,
                                resolution=res, denoise_weights=w,
                                denoise_mode=1)
    want = np.zeros(8, np.float32)
    want[6:8] = 2.0 * w[0:2]   # cell-7 signal: taps 6, 7 (tap 8 clipped)
    np.testing.assert_allclose(np.asarray(img[0]), want, atol=1e-6)
    assert float(max_val[0]) == pytest.approx(2.0)


def test_draw_signals_additive_superposition():
    w = np.array([1.0], np.float32)
    times = jnp.array([[2.0, 2.0, 2.0]])
    strengths = jnp.array([[0.5, 0.25, 0.25]])
    img, max_val = draw_signals(times, strengths, jnp.ones((1, 3), bool),
                                n_cells=16, resolution=0.05,
                                denoise_weights=w, denoise_mode=0)
    assert float(img[0, 6]) == pytest.approx(1.0)


def test_draw_invalid_signals_ignored():
    w = np.array([1.0], np.float32)
    img, max_val = draw_signals(
        jnp.array([[2.0]]), jnp.array([[5.0]]), jnp.array([[False]]),
        n_cells=16, resolution=0.05, denoise_weights=w, denoise_mode=0)
    assert float(img.sum()) == 0.0
    assert float(max_val[0]) == 0.0


# ------------------------------------------------------------------ noise

def test_ambient_noise_uniform_added_everywhere():
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((4, 256))
    img = img.at[:, 100].set(0.72)
    out = np.asarray(apply_ambient_noise(
        img, jnp.ones(4), jnp.arange(4), key, mode=1, resolution=0.06,
        at_signal_0=0.3, at_signal_1=0.03, energy_max=0.1, energy_min=0.05,
        energy_loss=0.05))
    # noise strictly added, everywhere
    assert np.all(out >= np.asarray(img))
    assert np.all(out[:, :100] > 0.0)


def test_ambient_noise_exponential_floor():
    """With the random amplitude off, only the range-dependent floor
    (max-min)*exp(-loss*x)+min remains (RadarCPU.cpp:515-523)."""
    img = jnp.zeros((1, 256))
    out = np.asarray(apply_ambient_noise(
        img, jnp.ones(1), jnp.arange(1), jax.random.PRNGKey(0), mode=1,
        resolution=0.06, at_signal_0=0.0, at_signal_1=0.0,
        energy_max=0.1, energy_min=0.05, energy_loss=0.05))[0]
    x = (np.arange(256) + 0.5) * 0.06
    want = (0.1 - 0.05) * np.exp(-0.05 * x) + 0.05
    np.testing.assert_allclose(out, want, rtol=1e-5)
    assert np.all(np.diff(out) < 0)  # strictly decreasing


def test_ambient_noise_signal_adaptive_amplitude():
    """noise_amp interpolates signal^4 between at_signal_0 and at_signal_1
    (RadarCPU.cpp:504-511); strong-signal cells get the smaller amplitude."""
    img = jnp.zeros((1, 8)).at[0, 3].set(1.0)
    # uniform p in [0,1); with energy floor off, added noise = noise_amp * p
    outs = []
    for seed in range(20):
        out = np.asarray(apply_ambient_noise(
            img, jnp.ones(1), jnp.arange(1), jax.random.PRNGKey(seed), mode=1,
            resolution=0.06, at_signal_0=0.4, at_signal_1=0.01,
            energy_max=0.0, energy_min=0.0, energy_loss=0.0))[0]
        outs.append(out - np.asarray(img)[0])
    added = np.stack(outs).mean(axis=0)
    assert added[3] < added[0] / 4.0


def test_ambient_noise_perlin_deterministic_per_key():
    key = jax.random.PRNGKey(7)
    img = jnp.zeros((2, 64))
    out1 = apply_ambient_noise(img, jnp.ones(2), jnp.arange(2), key, mode=2,
                               resolution=0.06, at_signal_0=0.3,
                               at_signal_1=0.03, energy_max=0.1,
                               energy_min=0.05, energy_loss=0.05)
    out2 = apply_ambient_noise(img, jnp.ones(2), jnp.arange(2), key, mode=2,
                               resolution=0.06, at_signal_0=0.3,
                               at_signal_1=0.03, energy_max=0.1,
                               energy_min=0.05, energy_loss=0.05)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_ambient_noise_off_identity():
    img = jnp.ones((2, 8))
    out = apply_ambient_noise(img, jnp.ones(2), jnp.arange(2),
                              jax.random.PRNGKey(0), mode=0, resolution=0.06,
                              at_signal_0=0.3, at_signal_1=0.03,
                              energy_max=0.1, energy_min=0.05,
                              energy_loss=0.05)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_normalize_to_u8():
    img = jnp.array([[0.0, 0.5, 1.0], [0.0, 0.0, 0.0]])
    max_val = jnp.array([1.0, 0.0])
    out = np.asarray(normalize_to_u8(img, max_val, 120.0))
    np.testing.assert_array_equal(out[0], [0, 60, 120])
    np.testing.assert_array_equal(out[1], [0, 0, 0])  # no-signal guard
    # saturation
    out = np.asarray(normalize_to_u8(jnp.array([[4.0]]), jnp.array([1.0]), 120.0))
    assert out[0, 0] == 255


def test_draw_methods_parity(rng):
    """scatter / sort / pallas binning must agree in both combine modes."""
    import jax.numpy as jnp

    from radarays_ros_tpu.image.draw import draw_signals

    A, N, C = 16, 40, 96
    times = jnp.asarray(rng.uniform(0, C * 0.5 / 0.3 * 2 * 1.2, (A, N)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0, 1, (A, N)).astype(np.float32))
    ok = jnp.asarray(rng.uniform(size=(A, N)) < 0.7)
    w = np.array([0.2, 0.6, 1.0, 0.5], np.float32)
    for dn in (w, None):
        ref = draw_signals(times, s, ok, n_cells=C, resolution=0.5,
                           denoise_weights=dn, denoise_mode=2,
                           method="scatter")
        for m in ("sort", "pallas"):
            got = draw_signals(times, s, ok, n_cells=C, resolution=0.5,
                               denoise_weights=dn, denoise_mode=2, method=m)
            np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                       rtol=1e-5, atol=1e-5)


def test_perlin_affine_rows_matches_general():
    """Fast affine-row Perlin == general path for integer row offsets."""
    import numpy as np

    from radarays_ros_tpu.image.perlin import perlin_affine_rows, perlin_noise

    r = np.random.default_rng(5)
    A, C = 9, 160
    for scale in (0.25, 0.05, 0.2):
        x0 = r.integers(0, 1000, A)
        y = r.uniform(0, 80, A).astype(np.float32)
        ref = np.asarray(perlin_noise(
            x0[:, None] + np.arange(C)[None, :] * scale,
            np.broadcast_to(y[:, None], (A, C))))
        fast = np.asarray(perlin_affine_rows(x0, y, scale, C))
        np.testing.assert_allclose(ref, fast, atol=1e-4)


def test_pallas_fused_denoise_vjp_matches_autodiff(rng):
    """The fused-tap kernel's custom VJP (correlation adjoint + one-hot
    gather) equals jax autodiff of the unfused composition (bin, then the
    XLA shift-add) — material optimization differentiates through the
    production draw path."""
    import jax
    import jax.numpy as jnp

    from radarays_ros_tpu.image.denoise import build_denoiser
    from radarays_ros_tpu.image.pallas_draw import bin_signals_pallas

    w, mode = build_denoiser(1, 7, 0.4)
    wt = tuple(float(x) for x in w)
    A, N, C = 12, 16, 40
    W = len(w)
    cell = jnp.asarray(rng.integers(0, C + 1, (A, N)).astype(np.int32))
    s = jnp.asarray(rng.uniform(0.1, 1, (A, N)).astype(np.float32))
    cot = jnp.asarray(rng.uniform(-1, 1, (A, C)).astype(np.float32))

    def fused(ss):
        img = bin_signals_pallas(cell, ss, n_cells=C, combine="sum",
                                 weights=wt, w_mode=mode, interpret=True)
        return jnp.sum(img * cot)

    def unfused(ss):
        point = bin_signals_pallas(cell, ss, n_cells=C, combine="sum",
                                   interpret=True)
        padded = jnp.pad(point, ((0, 0), (W - 1, W - 1)))
        img = jnp.zeros_like(point)
        for k in range(W):
            off = (W - 1) - (k - mode)
            img = img + float(w[k]) * padded[:, off:off + C]
        return jnp.sum(img * cot)

    np.testing.assert_allclose(float(fused(s)), float(unfused(s)), rtol=1e-6)
    gf = np.asarray(jax.grad(fused)(s))
    gu = np.asarray(jax.grad(unfused)(s))
    np.testing.assert_allclose(gf, gu, rtol=1e-5, atol=1e-6)


def test_pallas_draw_multiple_lane_groups(rng):
    """Azimuth counts above the lane width exercise the multi-step grid."""
    import jax.numpy as jnp

    from radarays_ros_tpu.image.pallas_draw import bin_signals_pallas

    A, N, C = 70, 24, 48
    cell = jnp.asarray(rng.integers(0, C + 1, (A, N)).astype(np.int32))
    s = jnp.asarray(rng.uniform(0, 1, (A, N)).astype(np.float32))
    got = bin_signals_pallas(cell, s, n_cells=C, combine="sum", lanes=32,
                             interpret=True)
    ref = np.zeros((A, C), np.float32)
    c_np, s_np = np.asarray(cell), np.asarray(s)
    for a in range(A):
        for n in range(N):
            if c_np[a, n] < C:
                ref[a, c_np[a, n]] += s_np[a, n]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
