"""Golden-data parity against the reference's stored FEniCSx fields
(Code/Linear_advection/Data/*/*.h5 — gmsh disk mesh, 1011 nodes, plus
per-step solution series at hmax=1/16).

Provenance notes (verified by inspection in round 1):
  * All three stored series (RV_cell, RV_node, SI) share an identical first
    entry — a GFEM Crank-Nicolson bootstrap step. Our CN step reproduces it
    to 2.5e-15 on the reference's own mesh — exact parity of assembly +
    solve against PETSc LU.
  * RV_cell.h5 tracks our rv_cell trajectory: first stabilized step matches
    to 2.4e-11; later steps drift to ~3e-3 Linf because the reference's
    nodal epsilon is last-cell-wins in DOLFINx's *internal* (reordered)
    cell numbering, which the stored file does not preserve (ref
    RV_cell.py:193-195). The artifact is order-dependent by construction.
  * RV_node.h5 provenance (established in round 2): the stored series is a
    P1 run with the DISCONTINUOUS indicator IC (not the smooth tanh of the
    current degree-2 RV_node.py source), globally-normalized simple RV
    (rv_epsilon_linear_simple, Cvel=0.25, CRV=1.0), and — decisively — the
    BDF1 residual projection solved WITHOUT boundary conditions (the
    current source applies bcs, ref RV_node.py:215, and mismatches the
    stored data at 5e-4/step teacher-forced; without bcs every stored step
    reproduces to 2e-14). Free-running full-trajectory parity: 8e-13 Linf
    over all 285 steps — the strongest accuracy gate in the suite.
  * GFEM/solution.h5 is from an abandoned run — the stored field never
    evolves (identical to the IC at every timestep), so it is unusable as
    an oracle.
  * SI/smoothness.h5 was produced by an older SI variant (first stabilized
    step differs structurally from the current Code/Utils/SI.py kernel).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import linear_advection as la
from conservation_fem_tpu.utils.io import read_h5_mesh, read_h5_series

RV_CELL_H5 = "/root/reference/Code/Linear_advection/Data/RV/RV_cell.h5"


@pytest.fixture(scope="module")
def golden():
    mesh = read_h5_mesh(RV_CELL_H5)
    times, vals = read_h5_series(RV_CELL_H5, "uh")
    return mesh, times, vals


def test_reference_mesh_geometry(golden):
    mesh, times, vals = golden
    assert mesh.n_nodes == 1011 and mesh.n_cells == 1919
    assert len(times) == 285
    # dt grid matches the reference formula on this mesh
    p = la.build(la.AdvectionConfig(mesh_size=16), host_mesh=mesh)
    np.testing.assert_allclose(p.dt, times[0], rtol=0, atol=0)


def test_gfem_step_matches_petsc_lu_exactly(golden):
    """Our CN + BiCGStab reproduces the stored PETSc-LU bootstrap step on
    the reference gmsh mesh to 1e-11 Linf (the 1e-8 accuracy gate)."""
    mesh, times, vals = golden
    p = la.build(
        la.AdvectionConfig(mesh_size=16, stabilization="rv_cell",
                           discontinuous_ic=True, krylov_rtol=1e-14),
        host_mesh=mesh,
    )
    (u1, _), _ = la._step_gfem(p, (p.u0, p.u0), None)
    assert float(jnp.abs(u1 - vals[0]).max()) < 1e-11


def test_rv_cell_first_step_parity(golden):
    """First stabilized RV-cell step matches the stored field to 1e-9."""
    mesh, times, vals = golden
    p = la.build(
        la.AdvectionConfig(mesh_size=16, stabilization="rv_cell",
                           discontinuous_ic=True, krylov_rtol=1e-14),
        host_mesh=mesh,
    )
    (u1, _), _ = la._step_gfem(p, (p.u0, p.u0), None)
    (u2, _), _ = la._step_rv_cell(p, (u1, p.u0), None)
    assert float(jnp.abs(u2 - vals[1]).max()) < 1e-9


def test_rv_cell_full_trajectory_tracks(golden):
    """Full 285-step trajectory stays within the cell-ordering-artifact
    envelope (~3e-3 Linf, ~1e-3 L2) of the stored reference run."""
    import jax

    mesh, times, vals = golden
    p = la.build(
        la.AdvectionConfig(mesh_size=16, stabilization="rv_cell",
                           discontinuous_ic=True),
        host_mesh=mesh,
    )

    @jax.jit
    def traj(u0):
        (u1, _), _ = la._step_gfem(p, (u0, u0), None)
        def stepfn(c, _):
            c2, _ = la._step_rv_cell(p, c, None)
            return c2, c2[0]
        _, us = jax.lax.scan(stepfn, (u1, u0), None, length=284)
        return us

    us = np.asarray(traj(p.u0))
    final = us[-1]
    ref = vals[-1]
    assert np.abs(final - ref).max() < 5e-3
    d = jnp.asarray(final - ref)
    l2 = float(jnp.sqrt(d @ (p.M * d[p.mesh.patch_cols]).sum(1)))
    assert l2 < 2e-3, l2


RV_NODE_H5 = "/root/reference/Code/Linear_advection/Data/RV/RV_node.h5"


def test_rv_node_full_trajectory_parity():
    """FULL 285-step stabilized trajectory against the reference's stored
    RV_node.h5 series at 1e-10 Linf on EVERY step (measured: 8e-13).

    This is the full-trajectory <=1e-8 accuracy gate (BASELINE.md):
    node-based epsilon has no cell-ordering artifact, and with the
    producing variant identified (rv_node_simple + unconstrained residual
    projection, see module docstring) parity is at solver tolerance."""
    import jax

    mesh = read_h5_mesh(RV_NODE_H5)
    times, vals = read_h5_series(RV_NODE_H5, "uh")
    assert len(times) == 285
    p = la.build(
        la.AdvectionConfig(mesh_size=16, stabilization="rv_node_simple",
                           discontinuous_ic=True, krylov_rtol=1e-14),
        host_mesh=mesh,
    )

    @jax.jit
    def traj(u0):
        (u1, _), _ = la._step_gfem(p, (u0, u0), None)

        def stepfn(c, _):
            c2, _ = la._step_rv_node_simple(p, c, None)
            return c2, c2[0]

        _, us = jax.lax.scan(stepfn, (u1, u0), None, length=284)
        return u1, us

    u1, us = traj(p.u0)
    assert float(jnp.abs(u1 - vals[0]).max()) < 1e-10
    err = np.abs(np.asarray(us) - np.asarray(vals[1:])).max()
    assert err < 1e-10, err


def test_own_golden_regression():
    """Regression gate against this framework's own stored golden field
    (golden/kpp_rv8.h5, f64 mesh-8 KPP RV at T=1): future refactors must
    reproduce it to solver tolerance. A finer mesh-64 field
    (golden/kpp_rv64.h5) is stored for convergence studies."""
    from conservation_fem_tpu.models import kpp

    res = kpp.run(kpp.KPPConfig(mesh_size=8))
    err = kpp.compare_to_reference(
        "golden/kpp_rv8.xdmf", res.u,
        kpp.build(kpp.KPPConfig(mesh_size=8)).host_mesh,
    )
    assert err < 1e-8, err


def test_coarse_converges_to_fine_golden():
    """Cross-mesh: coarse runs approach the stored mesh-64 field."""
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.utils.interpolate import cross_mesh_l2
    from conservation_fem_tpu.utils.io import read_h5_mesh, read_h5_series

    fine_mesh = read_h5_mesh("golden/kpp_rv64.h5")
    _, vals = read_h5_series("golden/kpp_rv64.h5", "uh")
    u_fine = vals[-1]
    errs = []
    for ms in (8, 16):
        p = kpp.build(kpp.KPPConfig(mesh_size=ms))
        u = np.asarray(p.solve().u)
        errs.append(cross_mesh_l2(fine_mesh, u_fine, p.host_mesh, u))
    assert errs[1] < errs[0], errs


def test_burgers_golden_regression():
    from conservation_fem_tpu.models import burgers
    from conservation_fem_tpu.utils.io import read_h5_series

    p = burgers.build(burgers.BurgersConfig(mesh_size=50))
    res = p.solve()
    _, vals = read_h5_series("golden/burgers_rv50.h5", "uh")
    assert np.abs(np.asarray(res.u) - vals[-1]).max() < 1e-9


def test_euler_golden_regression():
    from conservation_fem_tpu.models import euler
    from conservation_fem_tpu.utils.io import read_h5_series

    p = euler.build(problem="sod", nx=100)
    res = euler.solve(p)
    for k in range(4):
        _, vals = read_h5_series("golden/euler_sod100.h5", f"U{k}")
        assert np.abs(np.asarray(res.U[:, k]) - vals[-1]).max() < 1e-10, k
