"""Geometry layer tests: primitives, scene build, mesh IO round-trips."""

import numpy as np
import pytest

from radarays_ros_tpu.geom.mesh import load_mesh, save_ply
from radarays_ros_tpu.geom.primitives import (
    make_box,
    make_cylinder,
    make_icosphere,
    make_plane,
    make_urban_scene,
)
from radarays_ros_tpu.geom.scene import INVALID_OBJ_ID, Scene


def test_box_winding_outward():
    box = make_box((0, 0, 0), (2, 2, 2))
    assert box.shape == (12, 3, 3)
    n = np.cross(box[:, 1] - box[:, 0], box[:, 2] - box[:, 0])
    centers = box.mean(axis=1)
    # outward: normal . center > 0 for a box centered at origin
    assert np.all(np.sum(n * centers, axis=-1) > 0)


def test_icosphere_radius():
    s = make_icosphere((1, 2, 3), radius=2.5, subdivisions=2)
    r = np.linalg.norm(s.reshape(-1, 3) - np.array([1, 2, 3]), axis=-1)
    np.testing.assert_allclose(r, 2.5, atol=1e-6)


def test_cylinder_shape():
    c = make_cylinder(segments=16)
    assert c.shape[0] == 16 * 2 + 16 * 2  # sides + caps


def test_scene_compose_and_device_arrays():
    parts = [make_plane(), make_box()]
    scene = Scene.compose(parts, ["p", "b"], chunk_size=4)
    assert scene.n_triangles == 14
    assert scene.n_objects == 2
    sa = scene.device_arrays()
    # padded to multiple of chunk_size
    assert sa.verts.shape[0] % 4 == 0
    assert sa.planes_o.shape == (4 * sa.verts.shape[0], 4)
    # padding triangles marked invalid
    assert np.sum(sa.obj_ids == INVALID_OBJ_ID) == sa.verts.shape[0] - 14
    # chunk AABBs contain their triangles
    C = sa.n_chunks
    chunks = sa.verts.reshape(C, 4, 3, 3)
    assert np.all(chunks.min(axis=(1, 2)) >= sa.chunk_aabb_lo - 1e-5)
    assert np.all(chunks.max(axis=(1, 2)) <= sa.chunk_aabb_hi + 1e-5)


def test_scene_transformed():
    scene = Scene.compose([make_box()], ["b"])
    th = np.pi / 2
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    moved = scene.transformed(R, [10.0, 0, 0])
    c = moved.verts.reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(c, [10, 0, 0], atol=1e-5)


def test_urban_scene_clearing():
    parts, names = make_urban_scene(n_buildings=10, seed=1)
    scene = Scene.compose(parts, names)
    assert scene.n_objects == 11
    centers = scene.verts.mean(axis=1)
    building_centers = centers[scene.obj_ids > 0]
    assert np.all(np.linalg.norm(building_centers[:, :2], axis=-1) > 5.0)


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    scene = Scene.compose([make_box(), make_plane((5, 0, 0))], ["b", "p"])
    path = tmp_path / "scene.ply"
    save_ply(path, scene, binary=binary)
    loaded = load_mesh(path)
    assert loaded.n_triangles == scene.n_triangles
    np.testing.assert_allclose(loaded.verts, scene.verts, atol=1e-6)
    np.testing.assert_array_equal(loaded.obj_ids, scene.obj_ids)


def test_obj_loader(tmp_path):
    p = tmp_path / "two.obj"
    p.write_text(
        "o first\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 2 4 3\n"
        "o second\n"
        "v 0 0 1\nv 1 0 1\nv 0 1 1\n"
        "f 5 6 7\n"
    )
    scene = load_mesh(p)
    assert scene.n_triangles == 3
    np.testing.assert_array_equal(scene.obj_ids, [0, 0, 1])
    assert scene.object_names == ["first", "second"]


def test_stl_binary_loader(tmp_path):
    import struct

    tris = make_plane()
    path = tmp_path / "m.stl"
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            f.write(np.zeros(3, "<f4").tobytes())
            f.write(t.astype("<f4").tobytes())
            f.write(struct.pack("<H", 0))
    scene = load_mesh(path)
    np.testing.assert_allclose(scene.verts, tris, atol=1e-6)
