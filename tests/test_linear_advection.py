"""End-to-end linear advection tests: solid rotation returns to the IC
(ref Code/Linear_advection/*_convergence.py, 4-point refinement, order ~2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import linear_advection as la
from conservation_fem_tpu.utils.convergence import run_convergence


def _err(n, stab):
    return float(la.run(mesh_size=n, stabilization=stab).error_l2)


@pytest.mark.parametrize(
    "stab,err32,last_rate",
    [
        ("gfem", 5e-3, 1.8),      # ref linear_advection_convergence.py
        ("rv_node", 5.5e-3, 2.0),  # ref RV_node_convergence.py
        ("rv_cell", 5e-3, 1.8),    # ref RV_cell_convergence.py
        ("si", 2e-2, 2.0),         # ref smoothness_convergence.py
    ],
)
def test_convergence(stab, err32, last_rate):
    res = run_convergence(lambda n: _err(n, stab), (8, 16, 32))
    assert res.errors[-1] < err32, res.errors
    assert res.rates()[-1] > last_rate, res.rates()
    # errors strictly decreasing under refinement
    assert (np.diff(res.errors) < 0).all()


def test_rk4_matches_cn_accuracy():
    """Explicit RK4 (ref GFEM_RK4.py) should land within ~10% of CN GFEM."""
    e_rk4 = _err(16, "rk4")
    e_cn = _err(16, "gfem")
    assert abs(e_rk4 - e_cn) / e_cn < 0.1, (e_rk4, e_cn)


def test_dt_matches_reference_formula():
    """dt = CFL*hmax/max_i(|wx_i|+|wy_i|) (ref linear_advection.py:74-84,
    including the matrix-inf-norm quirk)."""
    p = la.build(la.AdvectionConfig(mesh_size=8))
    w = np.asarray(p.w)
    w_inf = np.abs(w).sum(axis=1).max()
    assert np.isclose(p.dt, 0.5 * (1 / 8) / w_inf)
    assert p.num_steps == int(np.ceil(1.0 / p.dt))


def test_boundary_stays_zero():
    r = la.run(mesh_size=8, stabilization="rv_node")
    p = la.build(la.AdvectionConfig(mesh_size=8))
    bnd = np.asarray(p.mesh.boundary_mask)
    np.testing.assert_allclose(np.asarray(r.u)[bnd], 0.0, atol=1e-12)


def test_square_domain_runs():
    r = la.run(mesh_size=8, domain="square", T=0.1)
    assert np.isfinite(float(r.error_l2))


def test_banded_backend_matches_gather():
    """RCM-banded operators == gather ELL on the disk advection."""
    from conservation_fem_tpu.ops.mesh import (
        disk_mesh,
        rcm_permutation,
        reorder_mesh,
    )

    base = disk_mesh(1 / 8)
    mesh = reorder_mesh(base, rcm_permutation(base))
    cfg1 = la.AdvectionConfig(mesh_size=8, stabilization="rv_node", T=0.1)
    cfg2 = la.AdvectionConfig(mesh_size=8, stabilization="rv_node", T=0.1,
                              ell_matvec_backend="banded")
    u1 = la.solve(la.build(cfg1, host_mesh=mesh)).u
    u2 = la.solve(la.build(cfg2, host_mesh=mesh)).u
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-12)
