"""Geometric multigrid (ops/multigrid.py): convergence + Stokes wiring.

The V-cycle's claim is resolution-INDEPENDENT Krylov counts (vs the
1/h^2-conditioned Jacobi-CG that forces auto_kip = 3*nx in
models/stokes.py); these tests pin the count, the preconditioner's
symmetry (CG validity), and full-step agreement with the adaptive
lattice path at f64.
"""

import numpy as np
import jax.numpy as jnp

from conservation_fem_tpu.models import stokes
from conservation_fem_tpu.ops import assembly, lattice as lat
from conservation_fem_tpu.ops import multigrid as mg
from conservation_fem_tpu.ops.krylov import cg
from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.ops.spmv import ell_diag


def _pinned_poisson(nx):
    host = rectangle_mesh((0, 0), (1, 1), nx=nx)
    mp = host.device_arrays(jnp.float64)
    K1 = assembly.assemble_stiffness(mp)
    bc = np.asarray(host.boundary_mask)
    plan = lat.build_plan(np.asarray(host.points))
    lK1 = lat.lattice_op(plan, host, np.asarray(K1))
    pbg = lat.to_grid(plan, jnp.asarray(bc))

    def A(xf):
        x = xf.reshape(plan.nI, plan.nJ)
        x_in = jnp.where(pbg, 0.0, x)
        return jnp.where(pbg, x, lK1(x_in)).reshape(-1)

    static, arrs = mg.build_mg(plan, host.patch_cols, host.patch_mask,
                               [[np.asarray(K1)]], bc, dtype=jnp.float64)
    return plan, A, static, arrs


def test_mg_poisson_count_and_symmetry():
    """MG-CG solves the pinned P1 Poisson in <= 9 iterations at nx=32
    (plain Jacobi-CG needs ~110 and doubles per refinement), and the
    V(2,2) cycle is a symmetric operator (valid CG preconditioner)."""
    plan, A, static, arrs = _pinned_poisson(64)
    assert len(static.shapes) >= 2            # a real hierarchy
    pre = mg.preconditioner(static, arrs)
    rng = np.random.default_rng(0)
    b1 = jnp.asarray(rng.standard_normal(plan.nI * plan.nJ))
    b2 = jnp.asarray(rng.standard_normal(plan.nI * plan.nJ))
    s1 = float(jnp.vdot(pre(b1), b2))
    s2 = float(jnp.vdot(b1, pre(b2)))
    assert abs(s1 - s2) <= 1e-12 * abs(s1)

    sol = cg(A, b1, precond=pre, rtol=1e-10)
    assert int(sol.iters) <= 9, int(sol.iters)
    rel = float(jnp.linalg.norm(b1 - A(sol.x)) / jnp.linalg.norm(b1))
    assert rel < 1e-9, rel


def test_mg_stokes_matches_adaptive():
    """multigrid=True only changes the preconditioner — the adaptive
    lattice solution is reproduced to solver tolerance."""
    base = dict(nx=16, num_steps=20, T=0.4, backend="lattice")
    r_a = stokes.solve(stokes.build(**base))
    r_m = stokes.solve(stokes.build(**base, multigrid=True))
    du = np.abs(np.asarray(r_m.u) - np.asarray(r_a.u)).max()
    assert du < 1e-9, du


def test_mg_stokes_fixed_small_count():
    """With the V-cycle, krylov_iters=5 (and auto kip=6 — NOT 3*nx)
    already reproduces the adaptive run; without MG the same counts
    under-converge by orders of magnitude (auto_kip docstring)."""
    base = dict(nx=16, num_steps=20, T=0.4, backend="lattice")
    r_a = stokes.solve(stokes.build(**base))
    assert stokes.auto_kip(stokes.StokesConfig(
        nx=16, multigrid=True, krylov_iters=5)) == 6
    r_f = stokes.solve(stokes.build(**base, multigrid=True,
                                    krylov_iters=5))
    du = np.abs(np.asarray(r_f.u) - np.asarray(r_a.u)).max()
    assert du < 1e-4, du


def test_mg_needs_lattice_backend():
    import pytest

    p, fd = stokes.build(nx=8, num_steps=4, multigrid=True)
    with pytest.raises(NotImplementedError):
        stokes.step_buffers(p, fd)
