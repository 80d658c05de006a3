"""Domain-decomposed Euler vs single-device stencil backend."""

import jax
import numpy as np
import pytest

from conservation_fem_tpu.models import euler
from conservation_fem_tpu.parallel.euler_sharded import shard_euler


@pytest.fixture(scope="module")
def device_mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return jax.sharding.Mesh(np.array(devs[:8]), ("i",))


def test_sharded_sod_matches_single(device_mesh):
    p = euler.build(problem="sod", nx=24, T=0.05)
    res_single = euler.solve(p)
    U_sh = shard_euler(euler.build(problem="sod", nx=24, T=0.05), device_mesh).solve()
    np.testing.assert_allclose(
        np.asarray(U_sh), np.asarray(res_single.U), atol=1e-11
    )


def test_sharded_riemann2d_matches_single(device_mesh):
    p = euler.build(problem="riemann2d", nx=13, T=0.05)  # uneven rows
    res_single = euler.solve(p)
    U_sh = shard_euler(
        euler.build(problem="riemann2d", nx=13, T=0.05), device_mesh
    ).solve()
    np.testing.assert_allclose(
        np.asarray(U_sh), np.asarray(res_single.U), atol=1e-11
    )
