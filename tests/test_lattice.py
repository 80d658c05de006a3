"""Lattice-stencil converter == ELL SpMV, to f64 roundoff, on every
space it claims to cover (P1 mesh, P2/P3 spaces on structured rectangle
meshes — the Taylor-Hood building blocks)."""

import jax.numpy as jnp
import numpy as np

from conservation_fem_tpu.ops import assembly, assembly_pk as apk, lattice
from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.ops.spaces import build_space
from conservation_fem_tpu.ops.spmv import ell_matvec


def _check(space_like, coords, A, seed=0, atol=1e-12):
    plan = lattice.build_plan(coords)
    op = lattice.lattice_op(plan, space_like, A)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal(coords.shape[0]))
    want = np.asarray(ell_matvec(space_like, A, x))
    got = np.asarray(lattice.from_grid(plan, op(lattice.to_grid(plan, x))))
    np.testing.assert_allclose(got, want, atol=atol)
    return plan, op


def test_p1_stiffness_matches_ell():
    m = rectangle_mesh(nx=7, ny=5).device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    plan, op = _check(m, np.asarray(m.points), K)
    assert plan.full and (plan.nI, plan.nJ) == (8, 6)
    # the P1 Laplacian on a right-diagonal mesh is the 5-point stencil:
    # the (1,1)/(-1,-1) couplings cancel exactly and the converter drops
    # them (the hand-built 7-plane stencil keeps the zero planes)
    assert len(op.offsets) == 5
    M = assembly.assemble_mass(m)
    _, op_m = _check(m, np.asarray(m.points), M, seed=1)
    assert len(op_m.offsets) == 7


def test_p2_mass_and_stiffness_match_ell():
    sp = build_space(rectangle_mesh(nx=6, ny=4), 2).device_arrays(jnp.float64)
    for A in (apk.assemble_mass(sp), apk.assemble_stiffness(sp)):
        plan, op = _check(sp, np.asarray(sp.dof_coords), A)
        # P2 dofs fill the refined lattice
        assert plan.full and (plan.nI, plan.nJ) == (13, 9)


def test_p3_stiffness_matches_ell():
    sp = build_space(rectangle_mesh(nx=4, ny=4), 3).device_arrays(jnp.float64)
    A = apk.assemble_stiffness(sp)
    plan, op = _check(sp, np.asarray(sp.dof_coords), A)
    assert plan.full     # P3 dofs fill the 3x-refined lattice


def test_traced_ell_to_planes_matches_host():
    """Device-side value relayout (fixed pattern, traced values) equals
    the host converter — the path for per-step rebuilt operators."""
    import jax

    sp = build_space(rectangle_mesh(nx=5, ny=4), 2).device_arrays(jnp.float64)
    A = apk.assemble_stiffness(sp)
    plan = lattice.build_plan(np.asarray(sp.dof_coords))
    conv = lattice.ell_to_planes_fn(plan, sp)
    op_dev = jax.jit(lambda a: conv(a).planes)(A)
    op_dev = lattice.LatticeOp(offsets=conv.offsets, planes=op_dev)
    op_host = lattice.lattice_op(plan, sp, A)
    rng = np.random.default_rng(7)
    x2 = lattice.to_grid(plan, jnp.asarray(
        rng.standard_normal(sp.dof_coords.shape[0])))
    np.testing.assert_allclose(np.asarray(op_dev(x2)),
                               np.asarray(op_host(x2)), atol=1e-12)


def test_lattice_backend_full_burgers_solves():
    """ell_matvec_backend='lattice' through complete solves: P2 SI (the
    higher_order_SI.py workload — 'SI on Pk spaces' fast path) and P1 RV,
    both vs the gather backend."""
    from conservation_fem_tpu.models import burgers

    c = dict(mesh_size=15, degree=2, stabilization="si", T=0.1)
    u1 = np.asarray(burgers.build(burgers.BurgersConfig(**c)).solve().u)
    u2 = np.asarray(burgers.build(burgers.BurgersConfig(
        **c, ell_matvec_backend="lattice")).solve().u)
    np.testing.assert_allclose(u2, u1, atol=1e-11)

    c = dict(mesh_size=12, T=0.1, backend="ell")
    u3 = np.asarray(burgers.build(burgers.BurgersConfig(**c)).solve().u)
    u4 = np.asarray(burgers.build(burgers.BurgersConfig(
        **c, ell_matvec_backend="lattice")).solve().u)
    np.testing.assert_allclose(u4, u3, atol=1e-12)


def test_nonfull_lattice_p1_on_p2_grid():
    """P1 pressure dofs seen on the P2 (fine) lattice: holes are handled
    (coefficients vanish wherever the target is a hole)."""
    mesh = rectangle_mesh(nx=5, ny=3)
    m = mesh.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    # embed vertex coords on the half-step lattice by scaling: the plan
    # only sees coordinates, so the inferred spacing is the vertex one —
    # force the fine lattice by appending a fake offset point is overkill;
    # instead check a plan with holes directly via a masked submesh.
    pts = np.asarray(m.points)
    plan = lattice.build_plan(pts)
    assert plan.full     # plain P1 vertex lattice is full
    # synthesize a holed plan: shift indices onto a 2x grid
    idx2 = (pts[:, 0] * 10).round().astype(np.int64) * 2 * (
        2 * plan.nJ) + (pts[:, 1] * 6).round().astype(np.int64) * 2
    holed = lattice.LatticePlan(
        nI=2 * plan.nI, nJ=2 * plan.nJ,
        idx=(plan.idx // plan.nJ) * 2 * (2 * plan.nJ)
            + (plan.idx % plan.nJ) * 2,
        dof_at=np.full(4 * plan.nI * plan.nJ, -1, np.int64), full=False)
    op = lattice.lattice_op(holed, m, K)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(pts.shape[0]))
    want = np.asarray(ell_matvec(m, K, x))
    got = np.asarray(lattice.from_grid(
        holed, op(lattice.to_grid(holed, x))))
    np.testing.assert_allclose(got, want, atol=1e-12)
