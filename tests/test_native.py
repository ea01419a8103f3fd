"""Native C++ builder parity vs the NumPy reference implementations.

The host-side scene build (Morton order, chunk AABBs, plane precompute) has
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


def test_morton_order_parity(tris):
    from radarays_ros_tpu.geom.scene import _morton_order

    centers = tris.mean(axis=1)
    np.testing.assert_array_equal(nb.morton_order(centers),
                                  _morton_order(centers))


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
    np.testing.assert_array_equal(sa_native.verts, sa_numpy.verts)
    np.testing.assert_array_equal(sa_native.obj_ids, sa_numpy.obj_ids)
    np.testing.assert_allclose(sa_native.planes_o, sa_numpy.planes_o, atol=1e-5)
    np.testing.assert_allclose(sa_native.chunk_aabb_lo, sa_numpy.chunk_aabb_lo)


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
