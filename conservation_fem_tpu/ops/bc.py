"""Dirichlet boundary conditions in matrix-free form.

Reproduces DOLFINx semantics (ref Code/Linear_advection/linear_advection.py:
122 ``assemble_matrix(a, bcs)`` zeroes bc rows/cols with unit diagonal;
:164-166 ``apply_lifting`` subtracts A[:,bc] g from the rhs and ``set_bc``
pins b[bc] = g) without ever materializing a modified matrix: the
constrained operator is a wrapper around the unconstrained SpMV.

For a symmetric A the constrained operator stays symmetric positive
definite, so CG remains applicable.
"""

from __future__ import annotations

import jax.numpy as jnp

from conservation_fem_tpu.ops.mesh import MeshArrays
from conservation_fem_tpu.ops.spmv import ell_matvec


def constrained_matvec(mesh: MeshArrays, A, x, bc_mask):
    """y = A_bc @ x where A_bc has bc rows/cols zeroed and 1 on the diag."""
    x_in = jnp.where(bc_mask, 0.0, x)
    y = ell_matvec(mesh, A, x_in)
    return jnp.where(bc_mask, x, y)


def constrained_operator(mesh: MeshArrays, A, bc_mask):
    return lambda x: constrained_matvec(mesh, A, x, bc_mask)


def lift_rhs(mesh: MeshArrays, A, b, g, bc_mask):
    """apply_lifting + set_bc: b' = b - A @ (g on bc) on interior rows,
    b'[bc] = g[bc]. ``g`` is a full-length vector of boundary values."""
    g_ext = jnp.where(bc_mask, g, 0.0)
    lifted = b - ell_matvec(mesh, A, g_ext)
    return jnp.where(bc_mask, g, lifted)


def ell_with_bc(mesh: MeshArrays, A, bc_mask):
    """Materialize DOLFINx ``assemble_matrix(a, bcs)`` semantics on an ELL
    matrix: zero bc rows AND bc columns, unit diagonal on bc rows
    (ref linear_advection.py:122). Needed where the reference feeds the
    bc-applied matrix to downstream kernels — e.g. the SI stiffness
    (ref Code/Linear_advection/smoothness.py:147-149)."""
    n, K = A.shape
    bc_row = bc_mask[:, None]
    bc_col = bc_mask[mesh.patch_cols]
    out = jnp.where(bc_row | bc_col, 0.0, A)
    rows = jnp.arange(n)
    diag_one = out[rows, mesh.diag_slot]
    out = out.at[rows, mesh.diag_slot].set(jnp.where(bc_mask, 1.0, diag_one))
    return out


def constrain_residual(F, u, g, bc_mask):
    """Newton residual with Dirichlet rows replaced by (u - g).

    Mirrors dolfinx NonlinearProblem bc handling (ref
    Code/KPP/KPP_NodeRV.py:136,155): the converged solution satisfies
    u[bc] = g and interior residual F = 0.
    """
    return jnp.where(bc_mask, u - g, F)
