"""Distributed blocked-window linear advection: the fast unstructured
path for the reference's primary workload family
(Code/Linear_advection on gmsh disk meshes), sharded.

Same SPMD scheme as parallel/blocked_sharded.DistributedBlocked
(subclassed for the band-halo window machinery and block-range layout):
contiguous block ranges per device, one B-row ppermute halo per side,
psum dots in the Krylov solves and psum/pmax in the RV normalizations.
Window operators M/C/K_bc are built once by the single-device problem
(models/linear_advection build with ell_matvec_backend="blocked") and
block-sharded here; the per-step eps-stiffness assembles from
componentwise locals on a per-device local plan view.

Covers gfem | rv_node | rv_node_simple | si with adaptive or
fixed-iteration (incl. dot-free cheby) solvers; rv_cell and rk4 stay on
DistributedAdvection (gather path — rv_cell's scatter order, and rk4 is
covered there already). Agreement with the single-device blocked run:
1e-9 f64 over full runs (tests/test_blocked_advection.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P

from conservation_fem_tpu.ops import blocked as blocked_ops
from conservation_fem_tpu.ops import stabilization as stab
from conservation_fem_tpu.ops.krylov import (bicgstab, bicgstab_fixed, cg,
                                             cg_fixed, chebyshev_fixed,
                                             jacobi_preconditioner)
from conservation_fem_tpu.parallel.blocked_sharded import DistributedBlocked

_SUPPORTED = ("gfem", "rv_node", "rv_node_simple", "si")


class DistributedBlockedAdvection(DistributedBlocked):
    """Wrap a blocked-backend AdvectionProblem; solve() returns u at T."""

    def __init__(self, problem, device_mesh: DeviceMesh, axis: str = "i"):
        if problem.blkplan is None:
            raise ValueError("build the problem with "
                             "ell_matvec_backend='blocked'")
        if problem.cfg.stabilization not in _SUPPORTED:
            raise NotImplementedError(
                f"distributed blocked advection: "
                f"{problem.cfg.stabilization!r} (rv_cell/rk4 live on "
                "DistributedAdvection)")
        # adapt: _setup_layout reads problem.plan / problem.u0
        problem = dataclasses.replace(problem)
        object.__setattr__(problem, "plan", problem.blkplan)
        padb, pad_rows = self._setup_layout(problem, device_mesh, axis)
        plan = self.plan

        self.Gcell_s = padb(plan.Gcell)
        self.Sv_s = padb(plan.Sv)
        self.Abool_s = padb(plan.A_bool, False)
        self.area_s = padb(plan.area_b)
        self.grads_s = padb(plan.grads_b)
        self.M_s = padb(problem.M_w)
        self.C_s = padb(problem.C_w)
        self.Kbc_s = padb(problem.Kbc_w if problem.cfg.stabilization == "si"
                          else problem.M_w)
        needs_h = problem.cfg.stabilization != "gfem"
        self.h_s = pad_rows(problem.h_cg if needs_h else problem.u0 * 0)
        self.wn_s = pad_rows(jnp.linalg.norm(problem.w, axis=1))

    def make_step(self):
        p = self.p
        cfg = p.cfg
        plan = self.plan
        dt = p.dt
        nb, B = plan.nb, plan.B
        Lb = self.Lb
        axis = self.axis

        prec = blocked_ops.plan_precision(plan)

        def step_local(Mb, Cb, Kbc, Gcell, Sv, Abool, area_b, grads_b,
                       bc_row, h2, wn2, valid2, u2, uo2):
            lplan = dataclasses.replace(
                plan, blocks=Lb, Gcell=Gcell, Sv=Sv, area_b=area_b,
                grads_b=grads_b,
                gx3=grads_b[:, :, :, 0].transpose(0, 2, 1),
                gy3=grads_b[:, :, :, 1].transpose(0, 2, 1),
                Rrow=None, Ccol=None, A_bool=None, A_float=None,
                bc_row=None, bc_win=None, diag_eye=None, patch_deg=None)
            pin2 = bc_row | ~valid2
            pin = pin2.reshape(-1)
            validf = valid2.reshape(-1)
            h = h2.reshape(-1)
            wn = wn2.reshape(-1)
            pdot = lambda a, b: jax.lax.psum(jnp.vdot(a, b), axis)

            def gather3(x):
                w = self._windows(x)
                uc = blocked_ops._oh_apply(Gcell, w, 2, self.dtype,
                                           precision=prec)
                return uc.reshape(Lb, 3, plan.C)

            def spmv(D, x):
                return blocked_ops.spmv_windows(
                    D, self._windows(x), precision=prec).reshape(-1)

            def pinned(D):
                def mv(x):
                    x_in = jnp.where(pin, 0.0, x)
                    return jnp.where(pin, x, spmv(D, x_in))
                return mv

            # bf16 sweep copies, cast ONCE outside the solver loops — the
            # exact single-device scheme (one shared definition of the
            # bf16 stream semantics), so f32 sharded-vs-single
            # trajectories stay in lockstep
            sweep = lambda D: blocked_ops.sweep_form_arrays(Gcell.dtype, D)

            Mbs, Cbs = sweep(Mb), sweep(Cb)

            def diag_of(D):
                d = jnp.diagonal(D, offset=B, axis1=1, axis2=2)
                return d[:, :nb].reshape(-1)

            def patch_reduce(x, reducer, pad_val):
                w = self._windows(jnp.where(validf, x, pad_val))
                v = jnp.where(Abool, w[:, None, :], pad_val)
                return reducer(v, axis=2).reshape(-1)

            def mass_solve(op, rhs, pre):
                if cfg.cg_iters is not None and cfg.inner_solver == "cheby":
                    return chebyshev_fixed(
                        op, rhs, precond=pre, iters=cfg.cg_iters,
                        lmin=cfg.cheby_mass_bounds[0],
                        lmax=cfg.cheby_mass_bounds[1]).x
                if cfg.cg_iters is not None:
                    return cg_fixed(op, rhs, precond=pre,
                                    iters=cfg.cg_iters, dot=pdot).x
                return cg(op, rhs, precond=pre, rtol=cfg.krylov_rtol,
                          dot=pdot).x

            u = u2.reshape(-1)
            uo = uo2.reshape(-1)

            # 1. epsilon
            if cfg.stabilization == "gfem":
                Keps = None
            else:
                diagM = jnp.where(pin, 1.0, diag_of(Mb))
                rhs = spmv(Mbs, (u - uo) / dt) + spmv(Cbs, u)
                if cfg.stabilization == "rv_node_simple":
                    # UNconstrained projection (stored-series provenance)
                    Rh = mass_solve(lambda x: spmv(Mbs, x), rhs,
                                    jacobi_preconditioner(
                                        jnp.where(validf, diag_of(Mb),
                                                  1.0)))
                else:
                    rhs = jnp.where(pin, 0.0, rhs)
                    Rh = mass_solve(pinned(Mbs), rhs,
                                    jacobi_preconditioner(diagM))
                tiny = jnp.asarray(
                    1e-300 if u.dtype == jnp.float64 else 1e-30, u.dtype)
                nvalid = jax.lax.psum(validf.sum(), axis)
                mean_u = jax.lax.psum(
                    jnp.where(validf, u, 0.0).sum(), axis) / nvalid
                abs_term = jax.lax.pmax(
                    jnp.abs(jnp.where(validf, u - mean_u, 0.0)).max(),
                    axis)
                if cfg.stabilization == "rv_node":
                    u_max = patch_reduce(u, jnp.max, -jnp.inf)
                    u_min = patch_reduce(u, jnp.min, jnp.inf)
                    n_i = jnp.abs((u_max - u_min) - abs_term)
                    Rh_i = patch_reduce(jnp.abs(Rh), jnp.max, 0.0)
                    R_i = Rh_i / jnp.maximum(n_i, tiny)
                    eps = jnp.minimum(cfg.Cvel * h * wn,
                                      cfg.CRV * h**2 * jnp.abs(R_i))
                elif cfg.stabilization == "rv_node_simple":
                    r = Rh / abs_term
                    eps = jnp.minimum(cfg.Cvel * h * wn,
                                      cfg.CRV * h**2 * jnp.abs(r))
                else:   # si
                    w = self._windows(u)
                    u_r = w[:, B:B + nb]
                    duw = w[:, None, :] - u_r[:, :, None]
                    num = jnp.abs(jnp.einsum("brw,brw->br", Kbc, duw,
                                             precision=prec))
                    den = jnp.einsum("brw,brw->br", jnp.abs(Kbc),
                                     jnp.abs(duw), precision=prec)
                    alpha = (num / jnp.maximum(den,
                                               cfg.si_eps)).reshape(-1)
                    psi = stab.sigmoid_activation(alpha)
                    eps = psi * cfg.Cm * h * wn
                eps = jnp.where(validf, eps, 0.0)
                Keps = blocked_ops.assemble_matrix_components(
                    lplan, blocked_ops.eps_locals_components(
                        lplan, eps, gather=gather3))

            # 2. CN solve
            if Keps is None:
                A = Mb + 0.5 * dt * Cb
                Bm = Mb - 0.5 * dt * Cb
            else:
                A = Mb + 0.5 * dt * Cb + 0.5 * dt * Keps
                Bm = Mb - 0.5 * dt * Cb - 0.5 * dt * Keps
            b = jnp.where(pin, 0.0, spmv(sweep(Bm), u))
            pre = jacobi_preconditioner(jnp.where(pin, 1.0, diag_of(A)))
            op = pinned(sweep(A))
            if cfg.krylov_iters is not None and cfg.inner_solver == "cheby":
                uh = chebyshev_fixed(op, b, x0=u, precond=pre,
                                     iters=cfg.krylov_iters,
                                     lmin=cfg.cheby_cn_bounds[0],
                                     lmax=cfg.cheby_cn_bounds[1]).x
            elif cfg.krylov_iters is not None:
                uh = bicgstab_fixed(op, b, x0=u, precond=pre,
                                    iters=cfg.krylov_iters, dot=pdot).x
            else:
                uh = bicgstab(op, b, x0=u, precond=pre,
                              rtol=cfg.krylov_rtol, dot=pdot).x
            return (uh.reshape(Lb, nb), u2)

        ax = self.axis
        return shard_map(
            step_local,
            mesh=self.dmesh,
            in_specs=(
                P(ax, None, None), P(ax, None, None),       # Mb, Cb
                P(ax, None, None),                           # Kbc
                P(ax, None, None), P(ax, None, None),       # Gcell, Sv
                P(ax, None, None),                           # Abool
                P(ax, None), P(ax, None, None, None),        # area, grads
                P(ax, None),                                 # bc_row
                P(ax, None), P(ax, None),                    # h2, wn2
                P(ax, None),                                 # valid
                P(ax, None), P(ax, None),                    # u, uo
            ),
            out_specs=(P(ax, None),) * 2,
        )

    def solve(self):
        p = self.p
        cfg = p.cfg
        step = self.make_step()
        bootstrap = cfg.stabilization in ("rv_node", "rv_node_simple")
        gfem_step = None
        if bootstrap:
            gcfg = dataclasses.replace(cfg, stabilization="gfem")
            gp = dataclasses.replace(p, cfg=gcfg)
            gself = object.__new__(DistributedBlockedAdvection)
            gself.__dict__.update(self.__dict__)
            gself.p = gp
            gfem_step = gself.make_step()

        @jax.jit
        def _run(u0):
            def body(carry, _):
                u, uo = carry
                return step(self.M_s, self.C_s, self.Kbc_s, self.Gcell_s,
                            self.Sv_s, self.Abool_s, self.area_s,
                            self.grads_s, self.bcrow_s, self.h_s,
                            self.wn_s, self.valid_s, u, uo), None

            if bootstrap:
                u1, _ = gfem_step(
                    self.M_s, self.C_s, self.Kbc_s, self.Gcell_s,
                    self.Sv_s, self.Abool_s, self.area_s, self.grads_s,
                    self.bcrow_s, self.h_s, self.wn_s, self.valid_s,
                    u0, u0)
                carry, n = (u1, u0), p.num_steps - 1
            else:
                carry, n = (u0, u0), p.num_steps
            (u, _), _ = jax.lax.scan(body, carry, None, length=n)
            return u

        u = _run(self.u0_s)
        return np.asarray(u).reshape(-1)[: self.plan.n]
