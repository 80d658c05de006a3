"""Assembly oracle tests, mirroring the reference's verification fixtures
(ref tests/verification/stiffness.py — stiffness row on a crossed unit
square) plus brute-force quadrature cross-checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.ops import assembly, helpers
from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec


def dense_from_ell(m, A):
    out = np.zeros((m.patch_cols.shape[0], m.patch_cols.shape[0]))
    cols = np.asarray(m.patch_cols)
    mask = np.asarray(m.patch_mask)
    A = np.asarray(A)
    for i in range(out.shape[0]):
        out[i, cols[i][mask[i]]] = A[i][mask[i]]
    return out


@pytest.fixture(scope="module")
def unit_square():
    mesh = rectangle_mesh((0, 0), (1, 1), nx=1, ny=1, diagonal="crossed")
    return mesh, mesh.device_arrays(jnp.float64)


def test_mass_matrix_total(unit_square):
    host, m = unit_square
    M = assembly.assemble_mass(m)
    dense = dense_from_ell(host, M)
    # sum of all entries = area of the domain
    np.testing.assert_allclose(dense.sum(), 1.0, rtol=1e-14)
    # symmetric
    np.testing.assert_allclose(dense, dense.T, rtol=1e-14)
    # row sum = int phi_a
    np.testing.assert_allclose(dense.sum(1).sum(), 1.0, rtol=1e-14)


def test_stiffness_crossed_unit_square(unit_square):
    """Analytic stiffness of the 1x1 crossed mesh (4 triangles, center node 4).

    For the center node of a crossed unit square the P1 Laplacian row is
    [-1, -1, -1, -1, 4] (standard result; the reference prints this row from
    PETSc for eyeball verification, ref tests/verification/stiffness.py:80-85).
    """
    host, m = unit_square
    K = assembly.assemble_stiffness(m)
    dense = dense_from_ell(host, K)
    np.testing.assert_allclose(dense.sum(1), 0.0, atol=1e-14)  # null const
    np.testing.assert_allclose(dense, dense.T, rtol=1e-14)
    center = 4  # crossed mesh appends the center node last
    row = dense[center]
    np.testing.assert_allclose(row[center], 4.0, rtol=1e-14)
    np.testing.assert_allclose(row[:4], -1.0, rtol=1e-14)


def brute_force_matrices(host):
    """Dense mass/stiffness via 7-point quadrature in NumPy (independent
    implementation for cross-checking)."""
    # degree-5 rule
    w = np.array([0.225] + [0.132394152788506] * 3 + [0.125939180544827] * 3)
    a, b = 0.470142064105115, 0.101286507323456
    pts = np.array(
        [[1 / 3, 1 / 3], [a, a], [1 - 2 * a, a], [a, 1 - 2 * a],
         [b, b], [1 - 2 * b, b], [b, 1 - 2 * b]]
    )
    n = host.points.shape[0]
    M = np.zeros((n, n))
    K = np.zeros((n, n))
    for c in range(host.n_cells):
        vids = host.cells[c]
        p = host.points[vids]
        A2 = 2 * host.area[c]
        g = host.grads[c]
        phi = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
        for q in range(len(w)):
            wq = w[q] * 0.5 * A2
            M[np.ix_(vids, vids)] += wq * np.outer(phi[q], phi[q])
        K[np.ix_(vids, vids)] += host.area[c] * (g @ g.T)
    return M, K


def test_against_brute_force():
    host = rectangle_mesh((0, 0), (2, 1), nx=3, ny=2)
    m = host.device_arrays(jnp.float64)
    Mref, Kref = brute_force_matrices(host)
    np.testing.assert_allclose(dense_from_ell(host, assembly.assemble_mass(m)), Mref, atol=1e-13)
    np.testing.assert_allclose(
        dense_from_ell(host, assembly.assemble_stiffness(m)), Kref, atol=1e-13
    )


def test_convection_constant_field():
    """C(w) @ const = 0 and C matches the exact integral for linear u."""
    host = rectangle_mesh((0, 0), (1, 1), nx=4, ny=4)
    m = host.device_arrays(jnp.float64)
    w = jnp.stack([jnp.ones(host.n_nodes), 2 * jnp.ones(host.n_nodes)], axis=1)
    C = assembly.assemble_convection(m, w)
    ones = jnp.ones(host.n_nodes)
    np.testing.assert_allclose(ell_matvec(m, C, ones), 0.0, atol=1e-14)
    # u = x  =>  w . grad u = 1; C @ u should equal the mass row sums
    u = m.points[:, 0]
    Cu = ell_matvec(m, C, u)
    M = assembly.assemble_mass(m)
    row_sums = ell_matvec(m, M, ones)
    np.testing.assert_allclose(Cu, row_sums, atol=1e-13)


def test_eps_stiffness_constant_eps():
    host = rectangle_mesh((0, 0), (1, 1), nx=3, ny=3)
    m = host.device_arrays(jnp.float64)
    eps = 2.5 * jnp.ones(host.n_nodes)
    Ke = assembly.assemble_eps_stiffness(m, eps)
    K = assembly.assemble_stiffness(m)
    np.testing.assert_allclose(np.asarray(Ke), 2.5 * np.asarray(K), rtol=1e-13)


def test_lumped_mass_row_sums():
    host = rectangle_mesh((0, 0), (1, 1), nx=5, ny=5)
    m = host.device_arrays(jnp.float64)
    ml = assembly.lumped_mass(m)
    M = assembly.assemble_mass(m)
    rs = ell_matvec(m, M, jnp.ones(host.n_nodes))
    np.testing.assert_allclose(np.asarray(ml), np.asarray(rs), rtol=1e-13)
    np.testing.assert_allclose(float(ml.sum()), 1.0, rtol=1e-13)


def test_nonlinear_convection_burgers_quadratic_exact():
    """Burgers f'(u)=(u,u): the integrand is quadratic, so the degree-4
    rule must match the closed-form C(w)|_{w=(u,u)} acting on u."""
    host = rectangle_mesh((0, 0), (1, 1), nx=4, ny=4)
    m = host.device_arrays(jnp.float64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=host.n_nodes))
    fprime = lambda uq: jnp.stack([uq, uq], axis=-1)
    r = assembly.convection_rhs_flux(m, u, fprime)
    # brute force: per cell integral of (u,u).grad(u) phi_a, u P1
    host_r = np.zeros(host.n_nodes)
    w = np.array([0.225] + [0.132394152788506] * 3 + [0.125939180544827] * 3)
    a_, b_ = 0.470142064105115, 0.101286507323456
    pts = np.array(
        [[1 / 3, 1 / 3], [a_, a_], [1 - 2 * a_, a_], [a_, 1 - 2 * a_],
         [b_, b_], [1 - 2 * b_, b_], [b_, 1 - 2 * b_]]
    )
    phi = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)
    u_np = np.asarray(u)
    for c in range(host.n_cells):
        vids = host.cells[c]
        uc = u_np[vids]
        g = host.grads[c]
        gradu = uc @ g
        for q in range(len(w)):
            uq = phi[q] @ uc
            conv = uq * (gradu[0] + gradu[1])
            host_r[vids] += w[q] * host.area[c] * conv * phi[q]
    np.testing.assert_allclose(np.asarray(r), host_r, atol=1e-13)


def test_nodal_h_constant_on_uniform_mesh():
    """On a uniform mesh the DG0->CG projection of a constant is exact
    (ref Code/Utils/helpers.py:29-36)."""
    host = rectangle_mesh((0, 0), (1, 1), nx=6, ny=6)
    m = host.device_arrays(jnp.float64)
    h = helpers.get_nodal_h(m)
    np.testing.assert_allclose(np.asarray(h), host.h_cell[0], rtol=1e-10)


def test_l2_error_quadrature():
    host = rectangle_mesh((0, 0), (1, 1), nx=8, ny=8)
    m = host.device_arrays(jnp.float64)
    # u_h = interpolant of x+y, compare against exact x+y: error only from
    # interpolation = 0 for a linear function
    u = m.points[:, 0] + m.points[:, 1]
    err = assembly.l2_error_vs_function(m, u, lambda x, y: x + y)
    assert float(err) < 1e-14
    # constant-vs-zero: ||1||_L2 over unit square = 1
    err = assembly.l2_error_vs_function(m, jnp.ones(host.n_nodes), lambda x, y: 0.0 * x)
    np.testing.assert_allclose(float(err), 1.0, rtol=1e-13)


def test_rv_epsilon_1storder():
    """First-order viscosity eps_i = 0.5 h_i |f'(u_i)| (ref RV.py:42-54:
    per-node 0.5*hi*norm(f'(u_i)), no patch reduction)."""
    import jax.numpy as jnp

    from conservation_fem_tpu.ops import stabilization as stab

    h = jnp.asarray([0.1, 0.2, 0.4])
    u = jnp.asarray([0.0, 1.0, -2.0])
    beta = jnp.sqrt(2.0) * jnp.abs(u)       # Burgers |f'(u)|
    eps = stab.rv_epsilon_1storder(h, beta)
    np.testing.assert_allclose(
        np.asarray(eps), 0.5 * np.asarray(h) * np.asarray(beta), rtol=1e-15)
    # first-order viscosity upper-bounds the plain RV epsilon when Cvel=0.5
    r = jnp.asarray([3.0, -1.0, 0.5])
    eps_rv = stab.rv_epsilon(0.5, 1.0, h, r, beta)
    assert bool((eps_rv <= eps + 1e-15).all())
