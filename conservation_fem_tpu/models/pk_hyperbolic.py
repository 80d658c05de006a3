"""Pk (degree 2-3) nonlinear scalar conservation-law solver.

Extends the generic HyperbolicProblem pipeline to higher-degree Lagrange
spaces via the quadrature assembly layer (ops/assembly_pk.py) — parity with
the reference's higher-order nonlinear runs
(ref Code/Burgers_equation/higher_order_SI.py: P2 SI Burgers with
dt scaled by 1/degree^2, :21,104). All ELL machinery (SpMV, constrained
matvecs, RV/SI patch kernels) is duck-typed over the space's dof adjacency,
so only the assembly calls change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conservation_fem_tpu.models.scalar_hyperbolic import (
    HyperbolicConfig,
    HyperbolicProblem,
)
from conservation_fem_tpu.models.advection_ho import _ell_with_bc, get_nodal_h_pk
from conservation_fem_tpu.ops import assembly_pk as apk
from conservation_fem_tpu.ops.mesh import Mesh
from conservation_fem_tpu.ops.spaces import build_space


class PkHyperbolicProblem(HyperbolicProblem):
    """HyperbolicProblem on a Pk Lagrange space (k = 2, 3)."""

    def __init__(self, cfg: HyperbolicConfig, host_mesh: Mesh, degree: int,
                 flux_prime, flux_prime_norm, bc_value, u0_fn, dt, num_steps):
        self.cfg = cfg
        self.host_mesh = host_mesh
        self.degree = degree
        self.space = self._make_space(host_mesh, degree)
        dtype = jnp.dtype(cfg.dtype)
        sp = self.space.device_arrays(dtype)
        self.mesh = sp            # duck-typed: patch/boundary/diag fields
        self.flux_prime = flux_prime
        self.flux_prime_norm = flux_prime_norm
        self.bc_value = bc_value
        self.dt = float(dt)
        self.num_steps = int(num_steps)
        self.M = apk.assemble_mass(sp)
        self._bc_points = sp.dof_coords
        self.u0 = u0_fn(sp.dof_coords[:, 0], sp.dof_coords[:, 1]).astype(dtype)
        self._h_cg = None
        self._K_bc = None
        self._bplan = None        # banded backend is P1-only for now
        self._latplan = None      # lattice backend: Pk dofs on the
        if cfg.ell_matvec_backend == "lattice":   # k-times-refined lattice
            import numpy as _np

            self._init_lattice(_np.asarray(self.space.dof_coords), sp)
        self._solve_jit = None

    def _make_space(self, host_mesh, degree):
        """Space construction hook (the blocked subclass RCM-permutes)."""
        return build_space(host_mesh, degree)

    @property
    def h_cg(self):
        if self._h_cg is None:
            val = get_nodal_h_pk(self.mesh, self.M)
            if isinstance(val, jax.core.Tracer):
                return val      # mid-trace: never cache (tracer leak)
            self._h_cg = val
        return self._h_cg

    @property
    def K_bc(self):
        if self._K_bc is None and self.cfg.stabilization == "si":
            val = _ell_with_bc(
                self.mesh, apk.assemble_stiffness(self.mesh),
                self.mesh.boundary_mask,
            )
            if isinstance(val, jax.core.Tracer):
                return val      # mid-trace: never cache (tracer leak)
            self._K_bc = val
        return self._K_bc

    def _nonlinear_rhs(self, u):
        return apk.convection_rhs_flux(self.mesh, u, self.flux_prime)

    def _assemble_keps(self, eps):
        return apk.assemble_eps_stiffness(self.mesh, eps)

    def _assemble_flux_jacobian(self, u):
        return apk.assemble_flux_jacobian(self.mesh, u, self.flux_prime)
