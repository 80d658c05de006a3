"""Unstructured node-partition + halo-exchange path: exact agreement with
single-device ELL results on disk and reference gmsh meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.ops import assembly
from conservation_fem_tpu.ops.mesh import disk_mesh, load_h5_mesh
from conservation_fem_tpu.ops.spmv import ell_matvec
from conservation_fem_tpu.parallel.partition import build_partition
from conservation_fem_tpu.parallel.unstructured_sharded import (
    DistributedELL,
    distributed_poisson_demo,
)


@pytest.fixture(scope="module")
def device_mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return jax.sharding.Mesh(np.array(devs[:8]), ("i",))


def test_partition_structure():
    mesh = disk_mesh(1 / 8)
    part = build_partition(mesh, 8)
    # every halo slot resolves to a published shared slot of another device
    assert part.halo_src.max() < 8 * part.shared_size
    # owned blocks tile all nodes
    rows = part.global_rows[part.global_rows >= 0]
    assert sorted(rows.tolist()) == list(range(part.mesh.n_nodes))


def test_distributed_spmv_matches(device_mesh):
    mesh = disk_mesh(1 / 8)
    part = build_partition(mesh, 8)
    m = part.mesh.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    dist = DistributedELL(part, device_mesh)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=part.mesh.n_nodes))
    y_ref = ell_matvec(m, K, x)
    pad = part.n_total - part.mesh.n_nodes
    A_rows = jax.device_put(
        jnp.concatenate([K, jnp.zeros((pad, part.mesh.max_patch), K.dtype)]),
        dist.shard,
    )
    y = dist.sharded_spmv(A_rows, dist.pad_rows(x))
    np.testing.assert_allclose(dist.unpad_rows(y), np.asarray(y_ref), atol=1e-13)


def _single_device_solution(rmesh):
    from conservation_fem_tpu.ops.bc import constrained_operator, lift_rhs
    from conservation_fem_tpu.ops.krylov import cg

    m = rmesh.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    g = m.points[:, 0] ** 2 - m.points[:, 1] ** 2
    b = lift_rhs(m, K, jnp.zeros(rmesh.n_nodes), g, m.boundary_mask)
    return np.asarray(
        cg(constrained_operator(m, K, m.boundary_mask), b, rtol=1e-12).x
    )


def test_distributed_poisson_disk(device_mesh):
    """Distributed solve == single-device solve (x^2-y^2 data is not in the
    P1 space, so compare solver-to-solver, not to the boundary function)."""
    mesh = disk_mesh(1 / 8)
    rmesh, x, g = distributed_poisson_demo(mesh, device_mesh)
    np.testing.assert_allclose(x, _single_device_solution(rmesh), atol=1e-10)


def test_distributed_poisson_reference_gmsh_mesh(device_mesh):
    """Halo path on the reference's real unstructured gmsh mesh."""
    mesh = load_h5_mesh("/root/reference/Data/KPP_RV.h5")
    rmesh, x, g = distributed_poisson_demo(mesh, device_mesh)
    np.testing.assert_allclose(x, _single_device_solution(rmesh), atol=1e-9)


def test_distributed_full_kpp_step_matches_single(device_mesh):
    """The complete unstructured KPP RV step SPMD (cell-partitioned
    assembly + reverse halo accumulation + psum Krylov) == single device.

    Note: the mesh must be a [-2,2]-type domain where the KPP IC is
    non-constant — on the unit disk the IC circle covers the whole domain,
    making the RV normalization n_i identically zero and eps a pure
    roundoff hair-trigger (any two correct executions then legitimately
    differ at the first-order-viscosity scale)."""
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops.mesh import rectangle_mesh
    from conservation_fem_tpu.parallel.unstructured_sharded import DistributedKPP

    mesh = rectangle_mesh((-2, -2), (2, 2), nx=11)   # unstructured-path mesh
    cfg = kpp.KPPConfig(mesh_size=11, T=0.03)
    p_single = kpp.build(cfg, host_mesh=mesh)
    res_single = p_single.solve()

    dist = DistributedKPP(kpp.build(cfg, host_mesh=mesh), device_mesh)
    u_dist = dist.solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-10)


def test_distributed_full_kpp_on_reference_gmsh_mesh(device_mesh):
    """Same, on the reference's real gmsh mesh (4886 nodes)."""
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.parallel.unstructured_sharded import DistributedKPP

    mesh = load_h5_mesh("/root/reference/Data/KPP_RV.h5")
    cfg = kpp.KPPConfig(mesh_size=32, T=0.02)
    res_single = kpp.build(cfg, host_mesh=mesh).solve()
    dist = DistributedKPP(kpp.build(cfg, host_mesh=mesh), device_mesh)
    u_dist = dist.solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-9)


def _dist_vs_single(build_problem, device_mesh, atol):
    from conservation_fem_tpu.parallel.unstructured_sharded import (
        DistributedHyperbolic,
    )

    res_single = build_problem().solve()
    u_dist = DistributedHyperbolic(build_problem(), device_mesh).solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=atol)


def test_distributed_burgers_rv_timedep_bc(device_mesh):
    """Distributed Burgers RV (BDF2 residual, time-dependent exact-solution
    Dirichlet data) == single device (ref Exact_Burger_RV.py)."""
    from conservation_fem_tpu.models import burgers
    from conservation_fem_tpu.ops.mesh import rectangle_mesh

    mesh = rectangle_mesh((0, 0), (1, 1), nx=12)
    cfg = burgers.BurgersConfig(mesh_size=12, T=0.03, backend="ell")
    _dist_vs_single(
        lambda: burgers.build(cfg, host_mesh=mesh), device_mesh, 1e-9)


def test_distributed_burgers_si_smoothing(device_mesh):
    """Distributed Burgers SI incl. halo'd stiffness rows + post-solve
    patch smoothing == single device (ref Exact_Burger_SI.py:169-193)."""
    from conservation_fem_tpu.models import burgers
    from conservation_fem_tpu.ops.mesh import rectangle_mesh

    mesh = rectangle_mesh((0, 0), (1, 1), nx=12)
    cfg = burgers.BurgersConfig(mesh_size=12, T=0.03, backend="ell",
                                stabilization="si", smooth_l=4.0)
    _dist_vs_single(
        lambda: burgers.build(cfg, host_mesh=mesh), device_mesh, 1e-9)


def test_distributed_burgers_bump_bdf1(device_mesh):
    """Distributed bump-IC Burgers with the BDF1 residual scheme ==
    single device (ref Burger_RV.py:144)."""
    from conservation_fem_tpu.models import burgers
    from conservation_fem_tpu.ops.mesh import rectangle_mesh

    mesh = rectangle_mesh((0, 0), (1, 1), nx=12)
    cfg = burgers.BurgersConfig(mesh_size=12, T=0.03, backend="ell",
                                ic="bump", residual_scheme="bdf1")
    _dist_vs_single(
        lambda: burgers.build(cfg, host_mesh=mesh), device_mesh, 1e-9)


def test_distributed_kpp_si(device_mesh):
    """Distributed KPP SI == single device (ref KPP_SI.py)."""
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.ops.mesh import rectangle_mesh

    mesh = rectangle_mesh((-2, -2), (2, 2), nx=11)
    cfg = kpp.KPPConfig(mesh_size=11, T=0.03, stabilization="si",
                        backend="ell")
    _dist_vs_single(
        lambda: kpp.build(cfg, host_mesh=mesh), device_mesh, 1e-9)


def test_distributed_advection_rv_node(device_mesh):
    """Distributed linear advection with node RV == single device on the
    unstructured disk mesh (ref RV_node.py)."""
    from conservation_fem_tpu.models import linear_advection as adv
    from conservation_fem_tpu.parallel.unstructured_sharded import (
        DistributedAdvection,
    )

    cfg = adv.AdvectionConfig(mesh_size=8, stabilization="rv_node", T=0.02)
    p = adv.build(cfg)
    res_single = adv.solve(p)
    u_dist = DistributedAdvection(adv.build(cfg, host_mesh=p.host_mesh),
                                  device_mesh).solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-9)


def test_distributed_advection_rv_cell(device_mesh):
    """Distributed cell RV == single device with the order-independent
    scatter='max' variant (the reference's last-cell-wins loop order is
    single-device-only by construction; deviation documented in
    models/linear_advection._step_rv_cell)."""
    from conservation_fem_tpu.models import linear_advection as adv
    from conservation_fem_tpu.parallel.unstructured_sharded import (
        DistributedAdvection,
    )

    cfg = adv.AdvectionConfig(mesh_size=8, stabilization="rv_cell", T=0.02,
                              rv_cell_scatter="max")
    p = adv.build(cfg)
    res_single = adv.solve(p)
    u_dist = DistributedAdvection(adv.build(cfg, host_mesh=p.host_mesh),
                                  device_mesh).solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-9)


def test_distributed_advection_rk4(device_mesh):
    """Distributed explicit RK4 == single device (ref GFEM_RK4.py)."""
    from conservation_fem_tpu.models import linear_advection as adv
    from conservation_fem_tpu.parallel.unstructured_sharded import (
        DistributedAdvection,
    )

    cfg = adv.AdvectionConfig(mesh_size=8, stabilization="rk4", T=0.02)
    p = adv.build(cfg)
    res_single = adv.solve(p)
    u_dist = DistributedAdvection(adv.build(cfg, host_mesh=p.host_mesh),
                                  device_mesh).solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-9)


def test_distributed_advection_si(device_mesh):
    """Distributed linear advection with SI == single device
    (ref smoothness.py)."""
    from conservation_fem_tpu.models import linear_advection as adv
    from conservation_fem_tpu.parallel.unstructured_sharded import (
        DistributedAdvection,
    )

    cfg = adv.AdvectionConfig(mesh_size=8, stabilization="si", T=0.02)
    p = adv.build(cfg)
    res_single = adv.solve(p)
    u_dist = DistributedAdvection(adv.build(cfg, host_mesh=p.host_mesh),
                                  device_mesh).solve()
    np.testing.assert_allclose(u_dist, np.asarray(res_single.u), atol=1e-9)
