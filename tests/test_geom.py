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


_DAE_FIXTURE = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="centimeter" meter="0.01"/><up_axis>Y_UP</up_axis></asset>
  <library_geometries>
    <geometry id="quad" name="QuadMesh">
      <mesh>
        <source id="quad-pos">
          <float_array id="quad-pos-array" count="12">
            0 0 0  100 0 0  100 100 0  0 100 0</float_array>
          <technique_common>
            <accessor source="#quad-pos-array" count="4" stride="3">
              <param name="X" type="float"/><param name="Y" type="float"/>
              <param name="Z" type="float"/>
            </accessor>
          </technique_common>
        </source>
        <source id="quad-nrm">
          <float_array id="quad-nrm-array" count="3">0 0 1</float_array>
          <technique_common>
            <accessor source="#quad-nrm-array" count="1" stride="3"/>
          </technique_common>
        </source>
        <vertices id="quad-verts">
          <input semantic="POSITION" source="#quad-pos"/>
        </vertices>
        <polylist count="1" material="m0">
          <input semantic="VERTEX" source="#quad-verts" offset="0"/>
          <input semantic="NORMAL" source="#quad-nrm" offset="1"/>
          <vcount>4</vcount>
          <p>0 0 1 0 2 0 3 0</p>
        </polylist>
      </mesh>
    </geometry>
    <geometry id="tri" name="TriMesh">
      <mesh>
        <source id="tri-pos">
          <float_array id="tri-pos-array" count="9">
            0 0 0  100 0 0  0 0 100</float_array>
          <technique_common>
            <accessor source="#tri-pos-array" count="3" stride="3"/>
          </technique_common>
        </source>
        <vertices id="tri-verts">
          <input semantic="POSITION" source="#tri-pos"/>
        </vertices>
        <triangles count="1">
          <input semantic="VERTEX" source="#tri-verts" offset="0"/>
          <p>0 1 2</p>
        </triangles>
      </mesh>
    </geometry>
  </library_geometries>
  <library_visual_scenes>
    <visual_scene id="scene0">
      <node id="n1" name="floor">
        <matrix>1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1</matrix>
        <instance_geometry url="#quad"/>
      </node>
      <node id="n2" name="wedge_parent">
        <translate>100 0 0</translate>
        <node id="n3" name="wedge">
          <instance_geometry url="#tri"/>
        </node>
      </node>
    </visual_scene>
  </library_visual_scenes>
  <scene><instance_visual_scene url="#scene0"/></scene>
</COLLADA>
"""


def test_dae_loader(tmp_path):
    """Minimal Collada import: polylist fan-triangulation, triangles,
    nested node transforms, centimeter units, Y_UP -> Z_UP conversion,
    one object per instancing node (radar_sim_test.launch:6 scene class)."""
    p = tmp_path / "scene.dae"
    p.write_text(_DAE_FIXTURE)
    scene = load_mesh(p, chunk_size=8)

    assert scene.n_triangles == 3           # quad (2 tris) + wedge (1)
    assert scene.object_names == ["floor", "wedge"]
    np.testing.assert_array_equal(scene.obj_ids, [0, 0, 1])

    floor = scene.verts[scene.obj_ids == 0].reshape(-1, 3)
    wedge = scene.verts[scene.obj_ids == 1].reshape(-1, 3)
    # centimeter scale: 100 units -> 1.0 m; Y_UP: the quad's +Y extent
    # becomes -Z ((x, y, z) -> (x, -z, y))
    np.testing.assert_allclose(floor[:, 0].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(floor[:, 2].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(floor[:, 1], 0.0, atol=1e-6)
    # wedge: node translate (100, 0, 0) then unit scale -> x in [1, 2];
    # its document +Z (up to 100) becomes world -Y, document y (0) -> z
    np.testing.assert_allclose(wedge[:, 0].min(), 1.0, atol=1e-6)
    np.testing.assert_allclose(wedge[:, 0].max(), 2.0, atol=1e-6)
    np.testing.assert_allclose(wedge[:, 1].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(wedge[:, 2], 0.0, atol=1e-6)


def test_dae_rotate_scale_and_no_scene(tmp_path):
    """rotate/scale node transforms; a document without a visual scene
    falls back to loading every geometry at identity."""
    doc = _DAE_FIXTURE.replace(
        "<matrix>1 0 0 0  0 1 0 0  0 0 1 0  0 0 0 1</matrix>",
        "<rotate>0 0 1 90</rotate><scale>2 1 1</scale>")
    p = tmp_path / "rot.dae"
    p.write_text(doc)
    scene = load_mesh(p, chunk_size=8)
    floor = scene.verts[scene.obj_ids == 0].reshape(-1, 3)
    # local x in [0,2] after scale, then Rz(90): x' = -y, y' = x; Y_UP swap
    # maps document (x, y, z) -> (x, -z, y): document y in [0, 2] -> world
    # z in [0, 2]; document x in [-1, 0] stays x
    np.testing.assert_allclose(floor[:, 0].min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(floor[:, 2].max(), 2.0, atol=1e-6)

    # strip the visual scene: both geometries load at identity
    import re as _re

    doc2 = _re.sub(r"<library_visual_scenes>.*</library_visual_scenes>", "",
                   _DAE_FIXTURE, flags=_re.S)
    p2 = tmp_path / "noscene.dae"
    p2.write_text(doc2)
    scene2 = load_mesh(p2, chunk_size=8)
    assert scene2.n_triangles == 3
    assert scene2.object_names == ["QuadMesh", "TriMesh"]


def test_scene_cache_roundtrip(tmp_path, monkeypatch):
    """Cache hit returns a bitwise-identical SceneArrays (VERDICT r3 #2):
    the on-disk tables must be indistinguishable from a fresh build."""
    monkeypatch.setenv("RADARAYS_SCENE_CACHE", str(tmp_path / "scenes"))
    monkeypatch.delenv("RADARAYS_SCENE_CACHE_DISABLE", raising=False)
    rng = np.random.default_rng(11)
    v0 = rng.uniform(-20, 20, (600, 3)).astype(np.float32)
    tris = (v0[:, None, :] + rng.uniform(-1, 1, (600, 3, 3))).astype(
        np.float32)
    scene = Scene(tris, (np.arange(600) % 5).astype(np.int32), chunk_size=16)

    fresh = scene.device_arrays(cache=True)    # miss -> build + store
    cached = scene.device_arrays(cache=True)   # hit -> load
    files = list((tmp_path / "scenes").glob("*.npz"))
    assert len(files) == 1
    for name, a, b in zip(fresh._fields, fresh, cached):
        if name == "chunk_size":
            assert int(a) == int(b)
            continue
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype, name
        av = a.view(np.uint16) if str(a.dtype) == "bfloat16" else a
        bv = b.view(np.uint16) if str(b.dtype) == "bfloat16" else b
        np.testing.assert_array_equal(av, bv, err_msg=name)

    # different chunk_size -> different key, no false hit
    scene2 = Scene(tris, (np.arange(600) % 5).astype(np.int32), chunk_size=8)
    other = scene2.device_arrays(cache=True)
    assert other.chunk_aabb_lo.shape[0] != fresh.chunk_aabb_lo.shape[0]
    assert len(list((tmp_path / "scenes").glob("*.npz"))) == 2

    # corrupt entry falls back to a fresh build (and repairs the file)
    files[0].write_bytes(b"garbage")
    repaired = scene.device_arrays(cache=True)
    np.testing.assert_array_equal(repaired.verts, fresh.verts)


def test_scene_cache_missing_required_field_is_miss(tmp_path, monkeypatch):
    """An entry missing a REQUIRED SceneArrays field (older field set under
    an unbumped layout version) must be a cache miss, never a
    half-populated hit (ADVICE r4)."""
    from radarays_ros_tpu.geom import cache

    monkeypatch.setenv("RADARAYS_SCENE_CACHE", str(tmp_path / "scenes"))
    rng = np.random.default_rng(3)
    tris = rng.uniform(-5, 5, (64, 3, 3)).astype(np.float32)
    scene = Scene(tris, np.zeros(64, np.int32), chunk_size=16)
    fresh = scene.device_arrays(cache=True)

    (path,) = (tmp_path / "scenes").glob("*.npz")
    with np.load(path) as z:
        stripped = {k: z[k] for k in z.files if k != "normals"}
    np.savez(path, **stripped)
    key = path.stem
    assert cache.load_scene_arrays(key) is None  # required field gone

    # a missing OPTIONAL field is still a valid (degraded) hit
    full = {n: (np.asarray(v).view(np.uint16)
                if n in cache._BF16_FIELDS else np.asarray(v))
            for n, v in zip(fresh._fields, fresh)
            if v is not None and n != "sweep_table_t"}
    np.savez(path, **full)
    hit = cache.load_scene_arrays(key)
    assert hit is not None and hit.sweep_table_t is None
    np.testing.assert_array_equal(hit.normals, fresh.normals)


def test_scene_cache_lru_eviction(tmp_path, monkeypatch):
    """Over-cap caches evict least-recently-used entries after a store,
    never the entry just written (ADVICE r4)."""
    from radarays_ros_tpu.geom import cache

    d = tmp_path / "scenes"
    monkeypatch.setenv("RADARAYS_SCENE_CACHE", str(d))
    rng = np.random.default_rng(5)

    def build(seed):
        tris = rng.uniform(-5, 5, (128, 3, 3)).astype(np.float32)
        scene = Scene(tris, np.zeros(128, np.int32), chunk_size=16)
        return scene.device_arrays(cache=True)

    build(0)
    first = {p.name for p in d.glob("*.npz")}
    # cap below one entry's size: each store evicts every OTHER entry
    monkeypatch.setenv("RADARAYS_SCENE_CACHE_MAX_GB", "1e-9")
    build(1)
    names = {p.name for p in d.glob("*.npz")}
    assert len(names) == 1 and not (names & first)  # old evicted, new kept

    # cap <= 0 disables eviction entirely
    monkeypatch.setenv("RADARAYS_SCENE_CACHE_MAX_GB", "0")
    build(2)
    assert len(list(d.glob("*.npz"))) == 2
