"""Material-property optimization — the reference's `dev/opti` track, native.

The reference optimizes a 10-dim parameter vector [beam_width, n_reflections,
(velocity, ambient, diffuse, specular) x {wall, glass}] by black-box
scipy.optimize.shgo over a ROS action round-trip, scoring -PSNR between a
simulated and a stored real frame (scripts/radaray_opti.py:37-113,164-229).

Here the simulator is a differentiable jitted function, so the same problem
is solved two ways:

  * `optimize_gradient` — optax Adam on a sigmoid-reparameterized vector
    (bounds become unconstrained logits), gradients flowing through the full
    frame: cone sampling -> trace -> fresnel -> shading -> binning -> noise.
    n_reflections is a static compile parameter; it is held fixed per run
    (sweep it outside, `sweep_n_reflections`).
  * `optimize_black_box` — a derivative-free simplicial-homology-flavored
    fallback (sobol-ish seeding + Nelder-Mead polish, no scipy dependency)
    with the same objective and bounds, for parameters gradients can't reach
    (e.g. integer n_reflections) and for parity with the reference workflow.

`ParamVector` mirrors the reference's to_param_vec/vec_to_params mapping and
bounds (radaray_opti.py:37-113) with configurable material slots.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radarays_ros_tpu.opti.metrics import psnr
from radarays_ros_tpu.sim.config import RadarModelConfig, RadarParams
from radarays_ros_tpu.sim.pipeline import simulate_frame


@dataclasses.dataclass(frozen=True)
class ParamVector:
    """Pack/unpack RadarParams <-> bounded flat vector.

    Default layout and bounds follow radaray_opti.py:37-85: beam_width
    (0.01..20 deg), n_reflections (0..6), then 4 material scalars per tuned
    slot; tuned slots default to (1, 3) = wall, glass.
    """

    material_slots: Tuple[int, ...] = (1, 3)
    tune_n_reflections: bool = True
    tune_beam_width: bool = True
    beam_width_bounds: Tuple[float, float] = (0.01, 20.0)
    velocity_bounds: Tuple[float, float] = (0.0, 0.3)
    ambient_bounds: Tuple[float, float] = (0.0, 1.0)
    diffuse_bounds: Tuple[float, float] = (0.0, 1.0)
    specular_bounds: Tuple[float, float] = (0.0, 5000.0)

    @property
    def n(self) -> int:
        return (int(self.tune_beam_width) + int(self.tune_n_reflections)
                + 4 * len(self.material_slots))

    def bounds(self) -> np.ndarray:
        b = []
        if self.tune_beam_width:
            b.append(self.beam_width_bounds)
        if self.tune_n_reflections:
            b.append((0.0, 6.0))
        for _ in self.material_slots:
            b += [self.velocity_bounds, self.ambient_bounds,
                  self.diffuse_bounds, self.specular_bounds]
        return np.asarray(b, np.float64)

    def to_vec(self, params: RadarParams, n_reflections: int = 2) -> np.ndarray:
        v = []
        if self.tune_beam_width:
            v.append(float(np.rad2deg(np.asarray(params.beam_width))))
        if self.tune_n_reflections:
            v.append(float(n_reflections))
        m = params.materials
        for s in self.material_slots:
            v += [float(m.velocity[s]), float(m.ambient[s]),
                  float(m.diffuse[s]), float(m.specular[s])]
        return np.asarray(v, np.float64)

    def to_params(self, params_init: RadarParams, vec) -> Tuple[RadarParams, int]:
        """Differentiable when `vec` is a jnp array (pure scatter updates)."""
        vec = jnp.asarray(vec, jnp.float32)
        off = int(self.tune_beam_width)
        n_reflections = 2
        if self.tune_n_reflections:
            n_reflections = int(round(float(jax.lax.stop_gradient(vec[off]))))
            off += 1
        m = params_init.materials
        # params_init may hold NumPy arrays (e.g. a loaded checkpoint,
        # opti/checkpoint.py) — the .at updates below need jnp
        vel, amb, dif, spe = (jnp.asarray(m.velocity), jnp.asarray(m.ambient),
                              jnp.asarray(m.diffuse), jnp.asarray(m.specular))
        for i, s in enumerate(self.material_slots):
            vel = vel.at[s].set(vec[off + 4 * i + 0])
            amb = amb.at[s].set(vec[off + 4 * i + 1])
            dif = dif.at[s].set(vec[off + 4 * i + 2])
            spe = spe.at[s].set(vec[off + 4 * i + 3])
        params = params_init._replace(
            materials=m._replace(velocity=vel, ambient=amb, diffuse=dif,
                                 specular=spe),
            beam_width=(jnp.deg2rad(vec[0]) if self.tune_beam_width
                        else params_init.beam_width),
        )
        return params, n_reflections


def default_objective(scene, cfg: RadarModelConfig, poses, key, target_u8):
    """-PSNR(sim, real) over uint8-scale images — the reference's objective
    (radaray_opti.py:205). Computed on `float_u8_image` (the per-column
    normalized float frame on the 0..255 scale, sim/pipeline.py), NOT on
    image_u8: gradients through jnp.round and the uint8 cast are identically
    zero, which would silently freeze every gradient-based optimizer."""
    from radarays_ros_tpu.sim.pipeline import float_u8_image

    target = jnp.asarray(target_u8, jnp.float32)

    def objective(params: RadarParams):
        res = simulate_frame(scene, params, cfg, poses, key)
        return -psnr(float_u8_image(res, cfg).T, target.T)

    return objective


@dataclasses.dataclass
class OptResult:
    vec: np.ndarray
    value: float
    history: list
    params: RadarParams
    n_reflections: int


def _sigmoid_reparam(bounds: np.ndarray):
    lo = jnp.asarray(bounds[:, 0], jnp.float32)
    hi = jnp.asarray(bounds[:, 1], jnp.float32)

    def to_vec(z):
        return lo + (hi - lo) * jax.nn.sigmoid(z)

    def to_z(v):
        p = np.clip((np.asarray(v) - bounds[:, 0])
                    / (bounds[:, 1] - bounds[:, 0]), 1e-4, 1 - 1e-4)
        return jnp.asarray(np.log(p / (1 - p)), jnp.float32)

    return to_vec, to_z


def optimize_gradient(loss_of_params: Callable[[RadarParams], jnp.ndarray],
                      params_init: RadarParams,
                      pv: Optional[ParamVector] = None,
                      steps: int = 100, lr: float = 5e-2,
                      verbose: bool = False) -> OptResult:
    """Adam on the sigmoid-reparameterized param vector.

    loss_of_params: differentiable scalar loss of RadarParams (e.g. from
    default_objective with cfg/n_reflections baked in).
    """
    import optax

    pv = pv or ParamVector(tune_n_reflections=False)
    bounds = pv.bounds()
    to_vec, to_z = _sigmoid_reparam(bounds)
    z = to_z(pv.to_vec(params_init))

    @jax.jit
    def step_loss(z):
        params, _ = pv.to_params(params_init, to_vec(z))
        return loss_of_params(params)

    opt = optax.adam(lr)
    state = opt.init(z)
    grad_fn = jax.jit(jax.value_and_grad(step_loss))
    history = []
    best = (np.inf, z)
    for i in range(steps):
        val, g = grad_fn(z)
        val = float(val)
        history.append(val)
        if val < best[0]:
            best = (val, z)
        updates, state = opt.update(g, state)
        z = optax.apply_updates(z, updates)
        if verbose and i % 10 == 0:
            print(f"step {i:4d}  loss {val:.4f}")
    vec = np.asarray(to_vec(best[1]))
    params, n_ref = pv.to_params(params_init, vec)
    return OptResult(vec=vec, value=best[0], history=history,
                     params=params, n_reflections=n_ref)


def optimize_black_box(f: Callable[[np.ndarray], float],
                       bounds: np.ndarray, *, n_seeds: int = 32,
                       iters: int = 60, seed: int = 0,
                       x0: Optional[np.ndarray] = None) -> Tuple[np.ndarray, float, list]:
    """Derivative-free global-ish minimize over a box (shgo stand-in).

    Phase 1: scrambled low-discrepancy seeding (+ optional x0); phase 2:
    Nelder-Mead polish from the best seed. Returns (x_best, f_best, history).
    """
    rng = np.random.default_rng(seed)
    lo, hi = bounds[:, 0], bounds[:, 1]
    dim = bounds.shape[0]

    # Halton-like seeding
    def halton(i, base):
        f, r = 1.0, 0.0
        while i > 0:
            f /= base
            r += f * (i % base)
            i //= base
        return r

    primes = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37][:dim]
    shift = rng.uniform(size=dim)
    seeds = [lo + (hi - lo) * np.array(
        [(halton(i + 1, p) + s) % 1.0 for p, s in zip(primes, shift)])
        for i in range(n_seeds)]
    if x0 is not None:
        seeds.insert(0, np.clip(np.asarray(x0, np.float64), lo, hi))

    history = []
    evals = [(float(f(x)), x) for x in seeds]
    history += [v for v, _ in evals]
    evals.sort(key=lambda t: t[0])
    f_best, x_best = evals[0]

    # Nelder-Mead polish (standard coefficients, box-clipped)
    scale = (hi - lo) * 0.05
    simplex = [x_best] + [np.clip(x_best + scale * (np.arange(dim) == k), lo, hi)
                          for k in range(dim)]
    fvals = [float(f(x)) for x in simplex]
    history += fvals
    for _ in range(iters):
        order = np.argsort(fvals)
        simplex = [simplex[i] for i in order]
        fvals = [fvals[i] for i in order]
        centroid = np.mean(simplex[:-1], axis=0)
        xr = np.clip(centroid + (centroid - simplex[-1]), lo, hi)
        fr = float(f(xr))
        history.append(fr)
        if fr < fvals[0]:
            xe = np.clip(centroid + 2 * (centroid - simplex[-1]), lo, hi)
            fe = float(f(xe))
            history.append(fe)
            simplex[-1], fvals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        else:
            xc = np.clip(centroid + 0.5 * (simplex[-1] - centroid), lo, hi)
            fc = float(f(xc))
            history.append(fc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:  # shrink
                for k in range(1, dim + 1):
                    simplex[k] = simplex[0] + 0.5 * (simplex[k] - simplex[0])
                    fvals[k] = float(f(simplex[k]))
                history += fvals[1:]
    order = np.argsort(fvals)
    if fvals[order[0]] < f_best:
        f_best, x_best = fvals[order[0]], simplex[order[0]]
    return np.asarray(x_best), float(f_best), history


def sweep_n_reflections(make_loss: Callable[[int], Callable[[RadarParams], jnp.ndarray]],
                        params_init: RadarParams,
                        pv: Optional[ParamVector] = None,
                        n_reflections_range: Sequence[int] = (1, 2, 3, 4),
                        **kw) -> OptResult:
    """Outer sweep over the static bounce count; inner gradient opt."""
    pv = pv or ParamVector(tune_n_reflections=False)
    best = None
    for n_ref in n_reflections_range:
        res = optimize_gradient(make_loss(n_ref), params_init, pv, **kw)
        res.n_reflections = n_ref
        if best is None or res.value < best.value:
            best = res
    return best
