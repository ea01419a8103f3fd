"""Tracer tests: geometric golden values + engine parity (brute is oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radarays_ros_tpu.geom.primitives import make_box, make_plane, make_icosphere
from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID, Scene
from radarays_ros_tpu.trace.api import trace


def _rays_from_origin(n, rng, orig=(0.0, 0.0, 0.0)):
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray(orig, np.float32), (n, 3))
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def wall_scene():
    # wall at x = 5, facing -x (toward origin)
    wall = make_plane((5.0, 0, 0), (10.0, 10.0), normal_axis=0)
    return Scene.compose([wall], ["wall"], chunk_size=4)


@pytest.mark.parametrize("engine", ["brute", "mxu", "culled"])
def test_axis_hit_distance(wall_scene, engine):
    sa = wall_scene.device_arrays()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    res = trace(sa, o, d, engine=engine)
    assert bool(res.hit[0])
    assert float(res.t[0]) == pytest.approx(5.0, abs=1e-4)
    # normal oriented against the ray
    np.testing.assert_allclose(np.asarray(res.normal[0]), [-1, 0, 0], atol=1e-5)
    assert int(res.obj_id[0]) == 0


@pytest.mark.parametrize("engine", ["brute", "mxu", "culled"])
def test_miss(wall_scene, engine):
    sa = wall_scene.device_arrays()
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    res = trace(sa, o, d, engine=engine)
    assert not bool(res.hit[0])
    assert not np.isfinite(float(res.t[0]))
    assert int(res.obj_id[0]) == INVALID_OBJ_ID


def test_nearest_of_stacked_walls():
    near = make_plane((3.0, 0, 0), (10.0, 10.0), normal_axis=0)
    far = make_plane((7.0, 0, 0), (10.0, 10.0), normal_axis=0)
    scene = Scene.compose([far, near], ["far", "near"], chunk_size=4)
    sa = scene.device_arrays()
    res = trace(sa, jnp.zeros((1, 3)), jnp.array([[1.0, 0, 0]]), engine="brute")
    assert float(res.t[0]) == pytest.approx(3.0, abs=1e-4)
    assert int(res.obj_id[0]) == 1


def test_sphere_hit_distance_analytic(rng):
    sphere = make_icosphere((10.0, 0, 0), radius=2.0, subdivisions=4)
    scene = Scene.compose([sphere], ["sphere"], chunk_size=64)
    sa = scene.device_arrays()
    res = trace(sa, jnp.zeros((1, 3)), jnp.array([[1.0, 0, 0]]), engine="mxu")
    # faceted sphere: generous tolerance
    assert float(res.t[0]) == pytest.approx(8.0, abs=0.05)


@pytest.mark.parametrize("engine", ["mxu", "culled"])
def test_engine_parity_random_rays(box_scene, engine, rng):
    sa = box_scene.device_arrays()
    o, d = _rays_from_origin(256, rng)
    ref = trace(sa, o, d, engine="brute")
    got = trace(sa, o, d, engine=engine, **(
        {"k_chunks": sa.n_chunks} if engine == "culled" else {}
    ))
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_allclose(
        np.asarray(ref.t)[np.asarray(ref.hit)],
        np.asarray(got.t)[np.asarray(ref.hit)], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id), np.asarray(got.obj_id))
    np.testing.assert_allclose(np.asarray(ref.normal), np.asarray(got.normal),
                               atol=1e-4)


def test_culled_sweep_exact_on_urban_fan(rng):
    """The ordered chunk sweep terminates early but must stay EXACT when the
    sweep cap is not artificially lowered (k_chunks=None)."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene

    parts, names = make_urban_scene(n_buildings=24, extent=60.0, seed=3)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()
    assert sa.n_chunks >= 12
    # incoherent 360-degree fan from the sensor clearing — worst case for
    # block-level culling
    az = rng.uniform(0, 2 * np.pi, 256)
    el = rng.uniform(-0.05, 0.05, 256)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (256, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    ref = trace(sa, o, d, engine="brute")
    got = trace(sa, o, d, engine="culled", k_chunks=None)
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(hit, np.asarray(got.hit))
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(got.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id), np.asarray(got.obj_id))


def test_auto_engine_resolves_per_backend(box_scene):
    """"auto" must resolve to the fast engine for the backend (culled on the
    CPU test mesh) and trace like any explicit engine."""
    from radarays_ros_tpu.trace.api import resolve_engine

    assert resolve_engine("auto") in ("pallas3", "culled")
    assert resolve_engine("mxu") == "mxu"
    sa = box_scene.device_arrays()
    res = trace(sa, jnp.zeros((4, 3)),
                jnp.broadcast_to(jnp.array([1.0, 0, 0]), (4, 3)))
    assert bool(res.hit[0])


def test_rays_inside_closed_box_always_hit(box_scene, rng):
    sa = box_scene.device_arrays()
    o, d = _rays_from_origin(512, rng)
    res = trace(sa, o, d, engine="mxu")
    assert np.all(np.asarray(res.hit))


def test_batched_shape_passthrough(box_scene):
    sa = box_scene.device_arrays()
    o = jnp.zeros((4, 8, 3))
    d = jnp.broadcast_to(jnp.array([1.0, 0, 0]), (4, 8, 3))
    res = trace(sa, o, d, engine="mxu")
    assert res.hit.shape == (4, 8)
    assert res.normal.shape == (4, 8, 3)


def test_pallas_v3_engine_parity(box_scene, rng):
    """v3 (ordered sweep + early termination + HBM DMA) matches brute,
    including under vmap (the frame-batch path uses a custom_vmap rule)."""
    import jax

    sa = box_scene.device_arrays()
    o, d = _rays_from_origin(300, rng)
    ref = trace(sa, o, d, engine="brute")
    got = trace(sa, o, d, engine="pallas3", ray_block=128)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(got.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id), np.asarray(got.obj_id))

    ov = jnp.stack([o, o + 0.01])
    dv = jnp.stack([d, d])
    tv = jax.vmap(lambda oo, dd: trace(sa, oo, dd, engine="pallas3",
                                       ray_block=128).t)(ov, dv)
    np.testing.assert_allclose(np.asarray(tv[0])[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("engine", ["brute", "mxu", "culled", "pallas3"])
def test_per_ray_budget_contract(engine, rng):
    """trace(t_budget=b) must equal the unbudgeted trace post-masked to
    misses where t > b, for EVERY engine — including culled/pallas3 whose
    sweeps are additionally pruned by the budget."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID

    parts, names = make_urban_scene(n_buildings=24, extent=60.0, seed=3)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()

    n = 257
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.1, 0.4, n)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (n, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    # budgets straddling typical hit distances (a margin away from any hit
    # keeps the plane-t vs refined-t boundary jitter out of the comparison)
    bud = jnp.asarray(rng.choice([5.0, 20.0, 75.0, 1000.0], n), jnp.float32)

    kw = {"ray_block": 128} if engine != "brute" else {}
    full = trace(sa, o, d, engine=engine, **kw)
    got = trace(sa, o, d, engine=engine, t_budget=bud, **kw)

    exp_hit = np.asarray(full.hit) & (np.asarray(full.t) <= np.asarray(bud))
    np.testing.assert_array_equal(np.asarray(got.hit), exp_hit)
    np.testing.assert_allclose(np.asarray(got.t)[exp_hit],
                               np.asarray(full.t)[exp_hit], rtol=1e-6)
    assert np.all(np.isinf(np.asarray(got.t)[~exp_hit]))
    np.testing.assert_array_equal(
        np.asarray(got.obj_id)[~exp_hit],
        np.full((~exp_hit).sum(), INVALID_OBJ_ID))


@pytest.mark.parametrize("prep_group", [2, 4, 8])
def test_pallas_v3_supergroup_parity(prep_group, rng):
    """Supergrouped culling (prep_group chunks per ranked supergroup) must
    stay exact, with per-ray budgets. Scene.device_arrays pads chunk
    counts to a multiple of 8, so every group here divides it and the
    precomputed-table fast path is exercised."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene

    parts, names = make_urban_scene(n_buildings=24, extent=60.0, seed=3)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()
    assert sa.chunk_aabb_lo.shape[0] % 8 == 0

    n = 300
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.05, 0.3, n)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (n, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    bud = jnp.asarray(rng.choice([15.0, 60.0, 1000.0], n), jnp.float32)

    ref = trace(sa, o, d, engine="brute", t_budget=bud)
    got = trace(sa, o, d, engine="pallas3", ray_block=128, t_budget=bud,
                prep_group=prep_group)
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(hit, np.asarray(got.hit))
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(got.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id),
                                  np.asarray(got.obj_id))


def test_pallas_v3_exact_with_escaping_rays(rng):
    """Early termination with per-lane overlap exhaustion: blocks mixing
    hitting rays, sky rays (never hit anything) and block padding (301 rays,
    ray_block 128) must still be bit-exact against brute on an OPEN scene.
    Sky lanes keep best_t = inf forever; the termination max must exclude
    them once their own overlapped chunks are exhausted, not sweep forever
    nor stop too early."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene

    parts, names = make_urban_scene(n_buildings=24, extent=60.0, seed=3)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()

    n = 301  # deliberately not a multiple of the ray block
    az = rng.uniform(0, 2 * np.pi, n)
    el = np.where(rng.uniform(size=n) < 0.4,
                  rng.uniform(0.3, 1.4, n),       # steep sky rays
                  rng.uniform(-0.05, 0.05, n))    # near-horizontal rays
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (n, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)

    ref = trace(sa, o, d, engine="brute")
    got = trace(sa, o, d, engine="pallas3", ray_block=128)
    hit = np.asarray(ref.hit)
    assert hit.any() and not hit.all()  # both populations present
    np.testing.assert_array_equal(hit, np.asarray(got.hit))
    np.testing.assert_allclose(np.asarray(ref.t)[hit], np.asarray(got.t)[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id), np.asarray(got.obj_id))


@pytest.mark.parametrize("engine", ["brute", "mxu", "culled", "pallas3"])
def test_trace_distance_gradients(engine):
    """d(t)/d(origin) must flow through every engine (via the differentiable
    Moller-Trumbore refinement for the sweep engines — the kernels
    themselves have no AD rules and stop tangents at their boundary).
    Wall at x = 5: t = 5 - ox, so d(sum t)/d(ox) = -1 per hitting ray.
    Budgets must not break differentiation (they feed the prep kernel)."""
    import jax

    wall = make_plane((5.0, 0, 0), (10.0, 10.0), normal_axis=0)
    sa = Scene.compose([wall], ["wall"], chunk_size=8).device_arrays()
    d = jnp.broadcast_to(jnp.array([1.0, 0, 0]), (4, 3))
    bud = jnp.full((4,), 100.0)

    def loss(ox):
        o = jnp.stack([jnp.full((4,), ox), jnp.zeros(4), jnp.zeros(4)], -1)
        res = trace(sa, o, d, engine=engine, t_budget=bud * (ox + 1.0),
                    **({"ray_block": 128} if engine != "brute" else {}))
        return jnp.sum(jnp.where(res.hit, res.t, 0.0))

    g = jax.grad(loss)(0.5)
    assert np.isfinite(float(g))
    assert float(g) == pytest.approx(-4.0, rel=1e-4)


def test_pallas_v3_hierarchical_prep_parity(rng):
    """Scenes with >= 256 chunks take the hierarchical culling-prep path
    (coarse supergroup bitmap + gated fine slab tests); it must stay exact
    vs brute, including with budgets and mixed hit/sky rays."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.trace import pallas_trace as P

    parts, names = make_urban_scene(n_buildings=220, extent=120.0, seed=9)
    scene = Scene.compose(parts, names, chunk_size=8)
    sa = scene.device_arrays()
    assert sa.chunk_aabb_lo.shape[0] >= 8 * P._SG  # hierarchical path

    n = 300
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.2, 0.5, n)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (n, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    bud = jnp.asarray(rng.choice([10.0, 50.0, 1000.0], n), jnp.float32)

    ref = trace(sa, o, d, engine="brute", t_budget=bud)
    got = trace(sa, o, d, engine="pallas3", t_budget=bud, ray_block=128)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id),
                                  np.asarray(got.obj_id))


def test_pallas_v3_sort_rays_parity(rng):
    """sort_rays (spatial re-blocking for incoherent ray sets) is a
    permutation: results must be identical to the unsorted trace."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=60, extent=80.0, seed=4)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()

    n = 500
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    bud = jnp.asarray(rng.choice([15.0, 1000.0], n), jnp.float32)

    ref = trace(sa, o, d, engine="pallas3", t_budget=bud, ray_block=128)
    got = trace(sa, o, d, engine="pallas3", t_budget=bud, ray_block=128,
                sort_rays=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-5)
    # obj ids may differ ONLY on exact geometric ties (building bases are
    # coplanar with the ground plane; re-blocking changes the chunk visit
    # order, which is the tie-break) — require any differing lane to be a
    # same-distance tie, and ties to be rare
    diff = np.asarray(ref.obj_id) != np.asarray(got.obj_id)
    assert diff.mean() < 0.02
    np.testing.assert_allclose(np.asarray(got.t)[diff],
                               np.asarray(ref.t)[diff], rtol=1e-4)


def test_pallas_v3_nondividing_group_and_odd_ray_block(rng):
    """Regression cover for two fallback paths: a prep_group that does NOT
    divide the chunk count (pad_c path: on-the-fly table relayout +
    tri_aux padding), and a ray_block that is a multiple of 256 but not
    512 (the hierarchical prep must pick a dividing ray tile)."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene
    from radarays_ros_tpu.trace import pallas_trace as P

    parts, names = make_urban_scene(n_buildings=220, extent=120.0, seed=9)
    scene = Scene.compose(parts, names, chunk_size=8)
    sa = scene.device_arrays()
    C = sa.chunk_aabb_lo.shape[0]
    assert C % 5 != 0 and C >= 8 * P._SG

    n = 256
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.2, 0.4, n)
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                  np.sin(el)], -1)
    o = np.broadcast_to(np.array([0, 0, 2.0], np.float32), (n, 3))
    o, d = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    aux = jnp.arange(sa.verts.shape[0], dtype=jnp.float32) % 97.0

    ref = trace(sa, o, d, engine="brute")
    got = trace(sa, o, d, engine="pallas3", ray_block=128, prep_group=5,
                tri_aux=aux)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ref.obj_id),
                                  np.asarray(got.obj_id))

    # odd-but-legal ray block: 768 = 3*256 (hier ray tile falls back to 256)
    got2 = trace(sa, o, d, engine="pallas3", ray_block=768)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got2.hit))
    np.testing.assert_allclose(np.asarray(got2.t)[hit],
                               np.asarray(ref.t)[hit], rtol=1e-4, atol=1e-4)


def test_pallas_v3_baked_aux_matches_array_aux(rng):
    """tri_aux='baked' (the aux row pre-baked into tri_table_t at
    material-load time, geom/scene.py:bake_tri_aux) is bit-identical to
    passing the (T,) array per call — including on the pad_c path
    (non-dividing prep_group), where the baked table is zero-padded."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene, bake_tri_aux

    parts, names = make_urban_scene(n_buildings=220, extent=120.0, seed=9)
    scene = Scene.compose(parts, names, chunk_size=8)
    sa = scene.device_arrays()
    aux = np.arange(sa.verts.shape[0], dtype=np.float32) % 97.0
    sab = bake_tri_aux(sa, aux)

    n = 256
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.2, 0.4, n)
    d = jnp.asarray(np.stack([np.cos(el) * np.cos(az),
                              np.cos(el) * np.sin(az), np.sin(el)], -1),
                    jnp.float32)
    o = jnp.broadcast_to(jnp.asarray([0, 0, 2.0], jnp.float32), (n, 3))

    for kw in (dict(), dict(prep_group=5)):
        ref = trace(sa, o, d, engine="pallas3", ray_block=128,
                    tri_aux=jnp.asarray(aux), **kw)
        got = trace(sab, o, d, engine="pallas3", ray_block=128,
                    tri_aux="baked", **kw)
        assert bool(np.asarray(ref.hit).any())
        for field in ("hit", "t", "obj_id", "aux"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, field)),
                np.asarray(getattr(got, field)), err_msg=field)

    with pytest.raises(ValueError, match="precomputed tri_table_t"):
        trace(sa._replace(tri_table_t=None), o, d, engine="pallas3",
              ray_block=128, tri_aux="baked")


@pytest.mark.parametrize("argmin_mode", ["gated", "defer"])
@pytest.mark.parametrize("prep_group", [1, 4])
def test_pallas_v3_argmin_mode_bit_parity(argmin_mode, prep_group, rng):
    """argmin_mode variants (VERDICT r4 #4 VPU levers) are BIT-identical
    to the classic per-visit argmin on every output — including the
    in-kernel aux fetch, which the "defer" mode reimplements (the row
    argmin is recovered inside the fetch pass) — with mixed budgets and
    escaping rays exercising early termination."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=120, extent=90.0, seed=21)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()

    n = 384
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.1, 0.6, n)  # some escape upward
    d = jnp.asarray(np.stack([np.cos(el) * np.cos(az),
                              np.cos(el) * np.sin(az), np.sin(el)], -1),
                    jnp.float32)
    o = jnp.broadcast_to(jnp.asarray([0, 0, 2.0], jnp.float32), (n, 3))
    bud = jnp.asarray(rng.choice([10.0, 50.0, 1000.0], n), jnp.float32)
    aux = jnp.asarray(np.arange(sa.verts.shape[0], dtype=np.float32) % 53.0)

    kw = dict(engine="pallas3", ray_block=128, t_budget=bud, tri_aux=aux,
              prep_group=prep_group)
    ref = trace(sa, o, d, argmin_mode="visit", **kw)
    got = trace(sa, o, d, argmin_mode=argmin_mode, **kw)
    assert bool(np.asarray(ref.hit).any())
    for field in ("hit", "t", "obj_id", "normal", "aux"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, field)),
                                      np.asarray(getattr(got, field)),
                                      err_msg=field)

    # and against the oracle (hits must be right, not merely consistent)
    br = trace(sa, o, d, engine="brute", t_budget=bud)
    np.testing.assert_array_equal(np.asarray(br.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(br.obj_id),
                                  np.asarray(got.obj_id))

    with pytest.raises(ValueError, match="argmin_mode"):
        trace(sa, o, d, engine="pallas3", argmin_mode="bogus")


@pytest.mark.parametrize("term_stride", [2, 4])
def test_pallas_v3_term_stride_bit_parity(term_stride, rng):
    """term_stride > 1 (early-termination check every Nth visit) is
    BIT-identical to the per-visit check: skipping a check only terminates
    LATER, and extra front-to-back visits are idempotent improvements —
    mixed budgets and escaping rays exercise the termination path."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=120, extent=90.0, seed=21)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa = scene.device_arrays()

    n = 384
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.1, 0.6, n)  # some escape upward
    d = jnp.asarray(np.stack([np.cos(el) * np.cos(az),
                              np.cos(el) * np.sin(az), np.sin(el)], -1),
                    jnp.float32)
    o = jnp.broadcast_to(jnp.asarray([0, 0, 2.0], jnp.float32), (n, 3))
    bud = jnp.asarray(rng.choice([10.0, 50.0, 1000.0], n), jnp.float32)
    aux = jnp.asarray(np.arange(sa.verts.shape[0], dtype=np.float32) % 53.0)

    kw = dict(engine="pallas3", ray_block=128, t_budget=bud, tri_aux=aux)
    ref = trace(sa, o, d, **kw)                        # term_stride = 1
    got = trace(sa, o, d, term_stride=term_stride, **kw)
    assert bool(np.asarray(ref.hit).any())
    for field in ("hit", "t", "obj_id", "normal", "aux"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, field)),
                                      np.asarray(getattr(got, field)),
                                      err_msg=field)

    with pytest.raises(ValueError, match="term_stride"):
        trace(sa, o, d, engine="pallas3", term_stride=0)


def test_culled_k_chunks_cap_warns(box_scene, rng):
    """Capping the culled sweep below n_chunks opts out of exactness and
    must say so loudly (the engines-match-brute contract holds uncapped)."""
    import warnings

    sa = box_scene.device_arrays()
    o, d = _rays_from_origin(64, rng)
    with pytest.warns(UserWarning, match="NO LONGER GUARANTEED EXACT"):
        trace(sa, o, d, engine="culled", k_chunks=max(1, sa.n_chunks - 1))
    # uncapped: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        trace(sa, o, d, engine="culled", k_chunks=None)


def test_pallas_v3_two_phase_requeue_parity(rng):
    """Two-phase requeue (phase 1 capped budgets, unresolved lanes
    compacted + re-traced full-budget) is EXACT: parity vs the brute
    oracle and the single-phase trace on a mixed hit/miss incoherent set."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=60, extent=80.0, seed=4)
    sa = Scene.compose(parts, names, chunk_size=16).device_arrays()

    n = 512
    o = jnp.asarray(rng.uniform(-60, 60, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    # mix in upward sky rays (guaranteed deep misses) with building hits
    d[::5, 2] = np.abs(d[::5, 2]) + 2.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)
    bud = jnp.asarray(rng.choice([8.0, 1000.0], n), jnp.float32)

    ref = trace(sa, o, d, engine="brute", t_max=1000.0)
    # budget-mask the oracle the way trace/api.py does
    ref_hit = np.asarray(ref.hit) & (np.asarray(ref.t) <= np.asarray(bud))

    for kw in (dict(two_phase_cap=20.0),
               dict(two_phase_cap=20.0, sort_rays=True)):
        got = trace(sa, o, d, engine="pallas3", t_budget=bud,
                    ray_block=128, **kw)
        np.testing.assert_array_equal(ref_hit, np.asarray(got.hit))
        np.testing.assert_allclose(np.asarray(got.t)[ref_hit],
                                   np.asarray(ref.t)[ref_hit],
                                   rtol=1e-4, atol=1e-4)
        diff = (np.asarray(ref.obj_id) != np.asarray(got.obj_id)) & ref_hit
        assert diff.mean() < 0.02   # exact-distance ties only


def test_auto_prep_group_derivation():
    """prep_group auto-derivation (VERDICT r3 #4): defaults reproduce the
    measured-good operating points and cap at the divisibility guarantee."""
    from radarays_ros_tpu.trace.pallas_trace import _auto_prep_group

    assert _auto_prep_group(4096) == 1       # 1M tris @ tc=256
    assert _auto_prep_group(12288) == 1      # boundary stays 1
    assert _auto_prep_group(16384) == 2
    assert _auto_prep_group(40960) == 4      # 10M tris @ tc=256
    assert _auto_prep_group(200000) == 8     # capped: pad contract is %8
