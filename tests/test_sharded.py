"""Multi-chip correctness: the sharded step must match single-device results
to f64 roundoff (the reference has no distributed tests — SURVEY.md section
4.7 — this is the upgrade)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.parallel.sharded import shard_problem


@pytest.fixture(scope="module")
def device_mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual CPU devices"
    return jax.sharding.Mesh(np.array(devs[:8]), ("fem",))


def test_sharded_kernels_match_single(device_mesh):
    p_ref = kpp.build(mesh_size=4, T=0.05)
    p_sh = shard_problem(kpp.build(mesh_size=4, T=0.05), device_mesh)
    u = p_ref.u0 + 0.01 * jnp.sin(p_ref.mesh.points[:, 0])
    r_ref = p_ref._nonlinear_rhs(u)
    r_sh = p_sh._nonlinear_rhs(u)
    np.testing.assert_allclose(np.asarray(r_sh), np.asarray(r_ref), atol=1e-13)
    eps = jnp.abs(jnp.cos(u))
    k_ref = p_ref._assemble_keps(eps)
    k_sh = p_sh._assemble_keps(eps)
    np.testing.assert_allclose(np.asarray(k_sh), np.asarray(k_ref), atol=1e-13)


def test_sharded_full_solve_matches_single(device_mesh):
    p_ref = kpp.build(mesh_size=4, T=0.05)
    res_ref = p_ref.solve()
    p_sh = shard_problem(kpp.build(mesh_size=4, T=0.05), device_mesh)
    res_sh = p_sh.solve()
    np.testing.assert_allclose(
        np.asarray(res_sh.u), np.asarray(res_ref.u), atol=1e-10
    )
