"""On-disk cache of precomputed SceneArrays tables.

The reference's rmagine/Embree map import builds its BVH in seconds
(src/radar_simulator.cpp:149); our split-exact kernel tables are heavier to
precompute (seconds native, ~minutes NumPy at 10M triangles), so
Scene.device_arrays() persists the finished SceneArrays keyed by a content
hash of (vertices, object ids, chunk_size, layout version, builder flavor).
A warm start then costs one np.load — the reference's order of magnitude.

Storage: one .npz per scene under RADARAYS_SCENE_CACHE (default
~/.cache/radarays_tpu/scenes), written atomically (tmp + rename) so
concurrent builders race benignly. bf16 tables are stored as uint16 bit
patterns (the npz format cannot represent ml_dtypes dtypes portably).
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_log = logging.getLogger(__name__)

# bump when the SceneArrays field set / table layouts change — round 4
# introduced the bf16 fused sweep-table layout (v5: single fused table
# after the two-table v4 measured a frame-rate loss)
LAYOUT_VERSION = 5

# bf16 leaves stored as uint16 bit patterns
_BF16_FIELDS = ("sweep_table_t", "tri_table_t")

# SceneArrays fields that may legitimately be absent (the tracer derives
# them on the fly); a MISSING required field means the entry was written
# by an older layout under an unbumped version — treat as a cache miss,
# never serve a half-populated SceneArrays
_OPTIONAL_FIELDS = ("sweep_table_t", "tri_table_t")

# Total cache size cap. One 1M-triangle entry is ~0.6 GB and one
# 10M-triangle entry ~5-6 GB (the fused (40, 5T) bf16 sweep table alone
# is ~4 GB), so a handful of procedural benchmark scenes can fill a home
# directory. After every store, least-recently-USED entries (atime when
# available, mtime otherwise; load_scene_arrays touches entries on hit)
# are evicted until the directory fits. Override with
# RADARAYS_SCENE_CACHE_MAX_GB (float, 0 disables eviction).
DEFAULT_MAX_GB = 24.0


def default_cache_dir() -> Path:
    env = os.environ.get("RADARAYS_SCENE_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "radarays_tpu" / "scenes"


def scene_cache_key(verts: np.ndarray, obj_ids: np.ndarray,
                    chunk_size: int, builder_flavor: str) -> str:
    """Content hash of everything device_arrays derives its output from.

    The builder flavor (native/numpy) is part of the key: both produce
    EXACT tables, but their median-split orderings differ at partition
    ties, so entries are not interchangeable bit-for-bit. For the native
    flavor the .so's own table version (native.builder.builder_version())
    is folded in too, so a builder.cpp change that alters table contents
    (e.g. median-split tie-breaking) invalidates entries even without a
    LAYOUT_VERSION bump.
    """
    if builder_flavor == "native":
        from radarays_ros_tpu.native import builder as native_builder

        builder_flavor = f"native-b{native_builder.builder_version()}"
    h = hashlib.sha256()
    h.update(f"v{LAYOUT_VERSION}|{chunk_size}|{builder_flavor}|"
             f"{verts.shape}|{obj_ids.shape}|".encode())
    h.update(np.ascontiguousarray(verts, np.float32).tobytes())
    h.update(np.ascontiguousarray(obj_ids, np.int32).tobytes())
    return h.hexdigest()[:32]


def load_scene_arrays(key: str, cache_dir: Optional[Path] = None):
    """Return the cached SceneArrays for `key`, or None."""
    from radarays_ros_tpu.geom.scene import SceneArrays

    import ml_dtypes

    path = (cache_dir or default_cache_dir()) / f"{key}.npz"
    if not path.exists():
        return None
    try:
        with np.load(path) as z:
            fields = {}
            for name in SceneArrays._fields:
                if name == "chunk_size":
                    fields[name] = int(z["chunk_size"])
                elif name in z.files:
                    arr = z[name]
                    if name in _BF16_FIELDS:
                        arr = arr.view(ml_dtypes.bfloat16)
                    fields[name] = arr
                elif name in _OPTIONAL_FIELDS:
                    fields[name] = None
                else:
                    # required field absent: written by an older field set
                    # under an unbumped LAYOUT_VERSION — a cache MISS, not
                    # a half-populated hit
                    return None
            sa = SceneArrays(**fields)
    except Exception:
        # corrupt/stale entry (e.g. truncated write on an old crash):
        # fall back to a fresh build; the store() below overwrites it
        return None
    try:  # refresh mtime: LRU eviction treats this entry as just-used
        os.utime(path)
    except OSError:
        pass
    return sa


def store_scene_arrays(key: str, sa, cache_dir: Optional[Path] = None) -> Path:
    """Persist a SceneArrays under `key` (atomic rename)."""
    d = cache_dir or default_cache_dir()
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{key}.npz"
    out = {}
    for name, val in zip(sa._fields, sa):
        if val is None:
            continue
        if name == "chunk_size":
            out[name] = np.int64(val)
        elif name in _BF16_FIELDS:
            out[name] = np.asarray(val).view(np.uint16)
        else:
            out[name] = np.asarray(val)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **out)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    _log.info("scene cache: wrote %s (%.2f GB)", path.name,
              path.stat().st_size / 1e9)
    _evict_to_cap(d, keep=path)
    return path


def _evict_to_cap(d: Path, keep: Optional[Path] = None) -> None:
    """Evict least-recently-used entries until the cache fits its cap.

    Cap: RADARAYS_SCENE_CACHE_MAX_GB (default DEFAULT_MAX_GB; 0 or a
    negative value disables eviction). The just-written entry (`keep`) is
    never evicted, so one over-cap scene still caches.
    """
    try:
        cap_gb = float(os.environ.get("RADARAYS_SCENE_CACHE_MAX_GB",
                                      str(DEFAULT_MAX_GB)))
    except ValueError:
        cap_gb = DEFAULT_MAX_GB
    if cap_gb <= 0:
        return
    cap = int(cap_gb * 1e9)
    try:
        entries = [(p.stat().st_mtime, p.stat().st_size, p)
                   for p in d.glob("*.npz")]
    except OSError:
        return
    total = sum(sz for _, sz, _ in entries)
    if total <= cap:
        return
    for _, sz, p in sorted(entries):  # oldest mtime first
        if total <= cap:
            break
        if keep is not None and p == keep:
            continue
        try:
            p.unlink()
            total -= sz
            _log.info("scene cache: evicted %s (%.2f GB) to fit the "
                      "%.1f GB cap", p.name, sz / 1e9, cap_gb)
        except OSError:
            pass
