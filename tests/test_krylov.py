"""Krylov layer tests vs dense solves (SURVEY.md section 7 stage 3)."""

import jax.numpy as jnp
import numpy as np

from conservation_fem_tpu.ops import assembly
from conservation_fem_tpu.ops.bc import constrained_operator, lift_rhs
from conservation_fem_tpu.ops.krylov import bicgstab, cg, jacobi_preconditioner
from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec


def test_cg_spd_random():
    rng = np.random.default_rng(1)
    n = 60
    Q = rng.normal(size=(n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.normal(size=n)
    res = cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), rtol=1e-13)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-9)


def test_cg_mass_matrix_with_jacobi():
    host = rectangle_mesh((0, 0), (1, 1), nx=10, ny=10)
    m = host.device_arrays(jnp.float64)
    M = assembly.assemble_mass(m)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=host.n_nodes))
    pre = jacobi_preconditioner(ell_diag(m, M))
    res = cg(lambda x: ell_matvec(m, M, x), b, precond=pre, rtol=1e-14)
    assert bool(res.converged)
    # verify residual directly
    r = b - ell_matvec(m, M, res.x)
    assert float(jnp.linalg.norm(r)) < 1e-12 * float(jnp.linalg.norm(b))


def test_bicgstab_nonsymmetric():
    rng = np.random.default_rng(3)
    n = 80
    A = np.eye(n) * 4 + 0.5 * rng.normal(size=(n, n)) / np.sqrt(n)
    b = rng.normal(size=n)
    res = bicgstab(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), rtol=1e-13)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-8)


def test_constrained_poisson_dirichlet():
    """Solve -lap u = 0 with u = x on the boundary; exact solution u = x.
    Exercises the full apply_lifting + set_bc + constrained matvec path
    (ref Code/Linear_advection/linear_advection.py:122-169)."""
    host = rectangle_mesh((0, 0), (1, 1), nx=8, ny=8)
    m = host.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    bc_mask = m.boundary_mask
    g = m.points[:, 0]  # boundary data (full vector, used on bc nodes)
    b = jnp.zeros(host.n_nodes)
    b = lift_rhs(m, K, b, g, bc_mask)
    op = constrained_operator(m, K, bc_mask)
    res = cg(op, b, rtol=1e-14)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g), atol=1e-10)
