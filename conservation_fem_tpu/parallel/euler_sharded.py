"""Domain-decomposed Euler solver: row-sharded grids + halo exchange.

Extends the structured-row decomposition (parallel/structured_sharded.py)
to the 4-component Euler system — every cell kernel, stencil matvec and
patch reduction reuses the halo primitives of ShardedStructuredKPP; the
per-step work is the explicit SSP-RK2 update of models/euler.py run SPMD.
Global reductions (RV normalization) use psum/pmax.

Correctness: matches the single-device stencil Euler to f64 roundoff on a
virtual 8-device mesh (tests/test_euler_sharded.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from conservation_fem_tpu.parallel.structured_sharded import ShardedStructuredKPP


class ShardedStructuredEuler(ShardedStructuredKPP):
    """Construct from a built EulerProblem (stencil backend)."""

    def __init__(self, problem, device_mesh: DeviceMesh, axis: str = "i"):
        # geometry bookkeeping (duplicated from the base to avoid assuming a
        # HyperbolicProblem interface)
        self.p = problem
        self.dmesh = device_mesh
        self.axis = axis
        sd = problem.sd
        assert sd is not None, "build the Euler problem with backend='auto'"
        self.nx, self.ny = sd.nx, sd.ny
        n1x, n1y = self.nx + 1, self.ny + 1
        n_dev = device_mesh.shape[axis]
        self.n_dev = n_dev
        L = -(-n1x // n_dev)
        self.L = L
        self.pad_rows = L * n_dev - n1x
        self.n1y = n1y
        dtype = problem.U0.dtype
        self.dtype = dtype

        def pad_global(x2, fill=0.0):
            return jnp.pad(x2, ((0, self.pad_rows), (0, 0)),
                           constant_values=fill)

        self._pad_global = pad_global
        shard = NamedSharding(device_mesh, P(axis, None))
        self.shard = shard

        def coef_shard(coef):   # (7, n1x, n1y) -> (rows, 7, n1y) sharded
            return jax.device_put(
                jnp.moveaxis(jnp.stack([pad_global(coef[k])
                                        for k in range(coef.shape[0])]), 0, 1),
                shard,
            )

        self.Mc_s = coef_shard(sd.M_coef)
        self.Cx_s = coef_shard(problem.Cx_c)
        self.Cy_s = coef_shard(problem.Cy_c)
        self.ml_s = jax.device_put(pad_global(problem.ml2, 1.0), shard)
        self.bc_s = jax.device_put(pad_global(problem.bc2, True), shard)
        self.slip_s = jax.device_put(pad_global(problem.slip2, False), shard)
        self.h_s = jax.device_put(pad_global(sd.h_cg2), shard)
        valid = pad_global(jnp.ones((n1x, n1y), dtype), 0.0)
        self.valid_s = jax.device_put(valid, shard)

    # -- step -----------------------------------------------------------------

    def make_step(self):
        p = self.p
        cfg = p.cfg
        sd = p.sd
        dt = p.dt
        grads, area = sd.grads, sd.area
        axis = self.axis
        gamma, floor = cfg.gamma, cfg.rho_floor

        def primitives(U):
            rho = jnp.maximum(U[0], floor)
            u1, u2 = U[1] / rho, U[2] / rho
            pr = (gamma - 1.0) * (U[3] - 0.5 * rho * (u1**2 + u2**2))
            return rho, u1, u2, jnp.maximum(pr, floor)

        def fluxes(U):
            rho, u1, u2, pr = primitives(U)
            E = U[3]
            Fx = jnp.stack([rho * u1, rho * u1**2 + pr, rho * u1 * u2,
                            (E + pr) * u1])
            Fy = jnp.stack([rho * u2, rho * u1 * u2, rho * u2**2 + pr,
                            (E + pr) * u2])
            return Fx, Fy

        def step_local(Mc, Cx, Cy, ml, bc, slip, h2, valid, U, U_old):
            def div_flux(Ug):
                Fx, Fy = fluxes(Ug)
                return jnp.stack([
                    self._matvec(Cx, Fx[k]) + self._matvec(Cy, Fy[k])
                    for k in range(4)
                ])

            def rhs(Ug, Kc):
                visc = jnp.stack([self._matvec(Kc, Ug[k]) for k in range(4)])
                dU = -(div_flux(Ug) + visc) / ml[None]
                return jnp.where(bc[None], 0.0, dU)

            # RV from the density residual
            rho_dot = (U[0] - U_old[0]) / dt
            div_m = (self._matvec(Cx, U[1]) + self._matvec(Cy, U[2])) / ml
            R = rho_dot + div_m
            rho, u1, u2, pr = primitives(U)
            beta = jnp.sqrt(u1**2 + u2**2) + jnp.sqrt(gamma * pr / rho)
            nvalid = jax.lax.psum(valid.sum(), axis)
            mean_r = jax.lax.psum((U[0] * valid).sum(), axis) / nvalid
            abs_term = jax.lax.pmax(
                jnp.abs(jnp.where(valid > 0, U[0] - mean_r, 0.0)).max(), axis
            )
            r_max = self._patch_reduce(U[0], jnp.maximum, -jnp.inf, valid)
            r_min = self._patch_reduce(U[0], jnp.minimum, jnp.inf, valid)
            n_i = jnp.abs((r_max - r_min) - abs_term)
            Rh_i = self._patch_reduce(jnp.abs(R), jnp.maximum, -jnp.inf, valid)
            beta_i = self._patch_reduce(beta, jnp.maximum, -jnp.inf, valid)
            tiny = jnp.asarray(
                1e-300 if U.dtype == jnp.float64 else 1e-30, U.dtype
            )
            eps = jnp.minimum(
                cfg.Cvel * h2 * beta_i,
                cfg.CRV * h2**2 * jnp.abs(Rh_i / jnp.maximum(n_i, tiny)),
            )
            eps = jnp.where(valid > 0, eps, 0.0)
            Kc = self._keps(eps, grads, area)

            def slip_proj(Ug):
                return Ug.at[2].set(jnp.where(slip, 0.0, Ug[2]))

            U1 = slip_proj(U + dt * rhs(U, Kc))
            if cfg.rk_order == 3:
                U2 = slip_proj(0.75 * U + 0.25 * (U1 + dt * rhs(U1, Kc)))
                Un = slip_proj(U / 3.0 + 2.0 / 3.0 * (U2 + dt * rhs(U2, Kc)))
            else:
                Un = slip_proj(0.5 * U + 0.5 * (U1 + dt * rhs(U1, Kc)))
            return Un, U

        smapped = shard_map(
            step_local,
            mesh=self.dmesh,
            in_specs=(P(self.axis, None, None),) * 3          # Mc, Cx, Cy
            + (P(self.axis, None),) * 5                        # ml bc slip h valid
            + (P(None, self.axis, None),) * 2,                 # U, U_old
            out_specs=(P(None, self.axis, None),) * 2,
        )
        return smapped

    def solve(self):
        p = self.p
        step = self.make_step()
        n1x, n1y = self.nx + 1, self.n1y
        U0g = jnp.moveaxis(p.U0.reshape(n1x, n1y, 4), -1, 0)
        U0g = jnp.pad(U0g, ((0, 0), (0, self.pad_rows), (0, 0)))
        U0g = jax.device_put(U0g, NamedSharding(self.dmesh, P(None, self.axis, None)))

        @jax.jit
        def _run(U0):
            def body(carry, _):
                U, Uo = carry
                return step(self.Mc_s, self.Cx_s, self.Cy_s, self.ml_s,
                            self.bc_s, self.slip_s, self.h_s, self.valid_s,
                            U, Uo), None

            (U, _), _ = jax.lax.scan(body, (U0, U0), None, length=p.num_steps)
            return U

        U = _run(U0g)
        return jnp.moveaxis(U[:, :n1x], 0, -1).reshape(-1, 4)


def shard_euler(problem, device_mesh: DeviceMesh, axis="i"):
    return ShardedStructuredEuler(problem, device_mesh, axis)
