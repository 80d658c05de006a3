"""Nodal mesh-size field and misc small kernels.

Replaces Code/Utils/helpers.py: per-cell h_k = min edge length stored in DG0,
then L2-projected onto CG P1 by solving (h_CG, v) = (h_DG, v)
(ref helpers.py:29-36, solved there with LU). Here the projection mass solve
uses CG to 1e-14 relative — numerically equivalent far below the 1e-8 gate.
"""

from __future__ import annotations

import jax.numpy as jnp

from conservation_fem_tpu.ops import assembly
from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner
from conservation_fem_tpu.ops.mesh import MeshArrays
from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec


def get_nodal_h(mesh: MeshArrays, mass_ell=None, rtol=1e-14):
    """L2-project the DG0 cell-size field onto P1 (ref helpers.py:7-38).

    rhs b_a = sum_cells h_k * int_cell phi_a = sum_cells h_k * area/3.
    """
    rhs_cell = ((mesh.h_cell * mesh.area / 3.0)[:, None]
                * jnp.ones(3, mesh.h_cell.dtype))
    b = assembly.scatter_vector(mesh, rhs_cell)
    if mass_ell is None:
        mass_ell = assembly.assemble_mass(mesh)
    precond = jacobi_preconditioner(ell_diag(mesh, mass_ell))
    res = cg(lambda x: ell_matvec(mesh, mass_ell, x), b, precond=precond, rtol=rtol)
    return res.x
