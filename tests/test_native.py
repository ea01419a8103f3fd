"""Native C++ builder parity vs the NumPy reference implementations.

The host-side scene build (median-split order, chunk AABBs, plane precompute) has
two implementations: C++ (native/src/builder.cpp, the counterpart of the
reference's native rmagine map build) and NumPy (geom/scene.py). They must
agree bit-for-bit on ordering and to float tolerance on geometry.
"""

import numpy as np
import pytest

from radarays_ros_tpu.native import builder as nb


pytestmark = pytest.mark.skipif(
    not nb.available(),
    reason="libradarays_native.so not built (make -C radarays_ros_tpu/native)")


@pytest.fixture(scope="module")
def tris(rng=None):
    return np.random.default_rng(11).normal(size=(2048, 3, 3)).astype(np.float32)


def test_triangle_planes_parity(tris):
    from radarays_ros_tpu.geom.scene import _triangle_planes

    n1, po1, pd1 = nb.triangle_planes(tris)
    n2, po2, pd2 = _triangle_planes(tris)
    np.testing.assert_allclose(n1, n2, atol=1e-5)
    np.testing.assert_allclose(po1, po2, atol=1e-5)
    np.testing.assert_allclose(pd1, pd2, atol=1e-5)


def test_chunk_aabbs_parity(tris):
    lo, hi = nb.chunk_aabbs(tris, 64)
    ch = tris.reshape(-1, 64, 3, 3)
    np.testing.assert_allclose(lo, ch.min(axis=(1, 2)))
    np.testing.assert_allclose(hi, ch.max(axis=(1, 2)))


def test_device_arrays_same_with_and_without_native(monkeypatch):
    """Scene.device_arrays must produce identical scenes either way."""
    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=10, extent=40.0, seed=2)
    scene = Scene.compose(parts, names, chunk_size=16)
    sa_native = scene.device_arrays()
    monkeypatch.setattr(nb, "available", lambda: False)
    sa_numpy = scene.device_arrays()
    # C++ nth_element and NumPy argpartition may place centroid TIES at a
    # split boundary differently, so chunk membership is not bit-identical;
    # the contract is: same triangle multiset overall, and chunks of the
    # same spatial quality (the property the tracers depend on)
    def sorted_rows(v):
        r = np.asarray(v).reshape(-1, 9)
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_array_equal(sorted_rows(sa_native.verts),
                                  sorted_rows(sa_numpy.verts))
    tc = scene.chunk_size

    def mean_chunk_volume(sa):
        ext = np.asarray(sa.chunk_aabb_hi) - np.asarray(sa.chunk_aabb_lo)
        real = np.asarray(sa.chunk_aabb_lo)[:, 0] < 1e7
        return float(np.prod(ext[real], axis=1).mean())

    assert mean_chunk_volume(sa_native) <= mean_chunk_volume(sa_numpy) * 1.25
    assert mean_chunk_volume(sa_numpy) <= mean_chunk_volume(sa_native) * 1.25


def test_obj_parse_parity(tmp_path):
    """Native OBJ parser == Python parser on groups, polygons, negatives."""
    obj = tmp_path / "t.obj"
    obj.write_text(
        "o first\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"           # quad -> 2 triangles
        "g second\n"
        "v 0 0 1\nv 1 0 1\nv 0 1 1\n"
        "f 5/1/1 6/2/2 7/3/3\n"  # v/vt/vn face
        "f -3 -2 -1\n"           # negative indices
    )
    from radarays_ros_tpu.geom import mesh as M

    verts, obj_ids, names = nb.parse_obj(obj)
    ref = M._load_obj(obj, 8)
    np.testing.assert_allclose(verts, ref.verts, atol=1e-6)
    np.testing.assert_array_equal(obj_ids, ref.obj_ids)
    assert names == list(ref.object_names)
    assert verts.shape == (4, 3, 3)
    assert names == ["first", "second"]


def test_median_split_order_quality(tris):
    """C++ median split: valid permutation, full leaves, leaf AABB quality
    matching the NumPy reference split."""
    import numpy as np

    from radarays_ros_tpu.geom.scene import _median_split_order
    from radarays_ros_tpu.native import builder as nb

    if not nb.available():
        import pytest

        pytest.skip("native builder not built")
    rng = np.random.default_rng(3)
    tc = 64
    c = rng.uniform(-50, 50, (4096, 3)).astype(np.float32)
    o_c = nb.median_split_order(c, tc)
    o_np = _median_split_order(c, tc)
    assert sorted(o_c.tolist()) == list(range(4096))

    def mean_leaf_volume(order):
        v = c[order].reshape(-1, tc, 3)
        ext = v.max(axis=1) - v.min(axis=1)
        return float(np.prod(ext, axis=1).mean())

    assert mean_leaf_volume(o_c) <= mean_leaf_volume(o_np) * 1.10


def test_sweep_table_parity(tris):
    from radarays_ros_tpu.geom.scene import (_sweep_table_fused,
                                             _triangle_planes)
    from radarays_ros_tpu.native import builder

    _, po, _ = _triangle_planes(tris)
    t1 = builder.sweep_table_fused(po, 8)
    t2 = _sweep_table_fused(po, 8)
    assert t1.shape == t2.shape and t1.dtype == t2.dtype
    # bit-exact: the split-exact bf16 parts must agree between the C++ and
    # NumPy builders (the Makefile pins -ffp-contract=off for this)
    np.testing.assert_array_equal(t1.view(np.uint16), t2.view(np.uint16))


def test_tri_table_parity(tris):
    from radarays_ros_tpu.geom.scene import (_tri_fetch_table,
                                             _triangle_planes)
    from radarays_ros_tpu.native import builder

    normals, _, _ = _triangle_planes(tris)
    obj_ids = (np.arange(tris.shape[0]) % 7).astype(np.int32)
    obj_ids[::5] = -1   # padding ids map to -1 in the table
    t1 = builder.tri_table(tris, normals, obj_ids)
    t2 = _tri_fetch_table(tris, normals, obj_ids)
    assert t1.shape == t2.shape and t1.dtype == t2.dtype
    np.testing.assert_array_equal(t1.view(np.uint16), t2.view(np.uint16))


def test_sah_split_order_bit_parity(tris):
    """C++ SAH split (rr_sah_split_order) must be BIT-IDENTICAL to the
    NumPy reference (_median_split_order_sah): stable sorts + IEEE f32
    scans + f64 cost with first-minimum tie-breaks on both sides (the
    scene cache relies on this — the ordering variant shares one cache
    flavor across builders)."""
    from radarays_ros_tpu.geom.scene import _median_split_order_sah

    if not nb.has_sah_split():
        pytest.skip("libradarays_native.so predates rr_sah_split_order")
    rng = np.random.default_rng(17)
    # clustered scene with duplicate centroids to exercise tie-breaking
    k = 12
    cc = rng.uniform(-80, 80, (k, 3))
    ci = rng.integers(0, k, 2048)
    v0 = cc[ci] + rng.normal(0, 3, (2048, 3))
    v0[::9] = v0[3::9][: v0[::9].shape[0]]  # force exact duplicates
    verts = (v0[:, None, :] + rng.normal(0, 0.5, (2048, 3, 3))).astype(
        np.float32)
    centers = verts.mean(axis=1)
    lo, hi = verts.min(axis=1), verts.max(axis=1)
    for tc in (64, 256):
        o_py = _median_split_order_sah(centers, lo, hi, tc)
        o_cc = nb.sah_split_order(centers, lo, hi, tc)
        assert sorted(o_cc.tolist()) == list(range(2048))
        np.testing.assert_array_equal(o_py, o_cc)


def test_sah_order_variant_leaf_contract():
    """RADARAYS_ORDER_VARIANT=sah produces the same triangle multiset and
    exactly-full leaves; its chunk AABBs must not be worse than median
    split (the property the sweep kernel's cost rides on)."""
    import os

    from radarays_ros_tpu.geom.primitives import make_urban_scene
    from radarays_ros_tpu.geom.scene import Scene

    parts, names = make_urban_scene(n_buildings=12, extent=50.0, seed=4)

    def build(variant):
        scene = Scene.compose(parts, names, chunk_size=16)
        os.environ["RADARAYS_ORDER_VARIANT"] = variant
        try:
            return scene.device_arrays()
        finally:
            os.environ.pop("RADARAYS_ORDER_VARIANT", None)

    sa_m = build("median")
    sa_s = build("sah")

    def sorted_rows(v):
        r = np.asarray(v).reshape(-1, 9)
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_array_equal(sorted_rows(sa_m.verts),
                                  sorted_rows(sa_s.verts))

    def sa_sum(sa):
        lo = np.asarray(sa.chunk_aabb_lo)
        hi = np.asarray(sa.chunk_aabb_hi)
        real = lo[:, 0] < 1e7
        d = (hi - lo)[real]
        return float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                      + d[:, 2] * d[:, 0]).sum())

    assert sa_sum(sa_s) <= sa_sum(sa_m) * 1.05
