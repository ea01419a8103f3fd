"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first jax import so sharding tests see 8
devices; real-TPU benchmarking happens outside pytest (bench.py).
"""

import os

# Force CPU: the session environment points JAX at the axon TPU tunnel
# (JAX_PLATFORMS=axon), which is reserved for bench.py. The axon
# sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, which overrides the env var — so we must override the
# CONFIG, not just the env, before any backend is initialized (otherwise
# every test jit round-trips through the remote TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def box_scene():
    """A 20 m hollow box around the origin: 2 objects (walls, pillar)."""
    from radarays_ros_tpu.geom.primitives import make_box
    from radarays_ros_tpu.geom.scene import Scene

    walls = make_box((0, 0, 0), (40.0, 40.0, 8.0))
    # flip wall normals inward so the sensor inside sees front faces
    walls = walls[:, ::-1, :]
    pillar = make_box((8.0, 0, 0), (2.0, 2.0, 8.0))
    return Scene.compose([walls, pillar], ["walls", "pillar"], chunk_size=8)


@pytest.fixture(scope="session")
def simple_materials():
    from radarays_ros_tpu.sim.config import Materials

    return Materials.from_list([
        dict(velocity=0.3, ambient=1.0, diffuse=0.0, specular=1.0),   # air
        dict(velocity=0.15, ambient=1.0, diffuse=0.2, specular=300.0),  # wall
        dict(velocity=0.0, ambient=1.0, diffuse=0.0, specular=3000.0),  # stone
    ])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
