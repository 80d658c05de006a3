"""Distributed ELL operators over a node partition with sparse halo
exchange — the unstructured-mesh scaling path (disk / imported gmsh
meshes), complementing the structured-row decomposition in
parallel/structured_sharded.py.

All functions run inside shard_map over a 1D device axis. The two ghost
primitives (cf. DOLFINx, ref linear_advection.py:165,170):

  * halo_gather  == scatter_forward: each device publishes its compact
    shared-node block, one all_gather moves every block to every device,
    and a precomputed flat index picks out this device's halo values.
  * (reverse accumulation is not needed for SpMV with row ownership: each
    device computes exactly its own rows.)

Distributed CG solves use psum dot products.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from conservation_fem_tpu.parallel.partition import Partition, build_partition
from conservation_fem_tpu.ops import stabilization as stab
from conservation_fem_tpu.ops.krylov import bicgstab, cg, jacobi_preconditioner
from conservation_fem_tpu.ops.newton import newton_solve
from conservation_fem_tpu.ops.precision import einsum_exact as _einsum


class DistributedELL:
    """Row-partitioned ELL operator with halo exchange.

    Usage: build once from a Partition; `spmv(A_rows, x_rows)` and
    `solve_cg(...)` run under shard_map with x sharded by rows.
    """

    def __init__(self, part: Partition, device_mesh: DeviceMesh, axis="i",
                 dtype=jnp.float64):
        self.part = part
        self.dmesh = device_mesh
        self.axis = axis
        self.dtype = dtype
        shard = NamedSharding(device_mesh, P(axis, None))
        sh3 = NamedSharding(device_mesh, P(axis, None, None))
        self.local_cols = jax.device_put(
            jnp.asarray(part.local_cols, jnp.int32), sh3)
        self.local_mask = jax.device_put(jnp.asarray(part.local_mask), sh3)
        self.shared_idx = jax.device_put(
            jnp.asarray(part.shared_idx, jnp.int32), shard)
        self.halo_src = jax.device_put(
            jnp.asarray(part.halo_src, jnp.int32), shard)
        self.row_valid = jax.device_put(
            jnp.asarray(part.global_rows >= 0), shard)
        self.shard = shard

    # ---- device-local pieces (call inside shard_map; leading axis 1) -------

    def _halo_gather(self, x_own, shared_idx, halo_src):
        """x_own (n_own,), publish shared block, all_gather, pick halo."""
        published = x_own[shared_idx]                    # (S,)
        table = jax.lax.all_gather(published, self.axis).reshape(-1)
        return table[halo_src]                           # (H,)

    def _spmv_local(self, A, cols, mask, x_own, shared_idx, halo_src):
        halo = self._halo_gather(x_own, shared_idx, halo_src)
        x_ext = jnp.concatenate([x_own, halo])
        g = x_ext[cols]                                  # (n_own, K)
        return jnp.where(mask, A * g, 0.0).sum(axis=1)

    # ---- public: sharded SpMV and CG ---------------------------------------

    def sharded_spmv(self, A_rows, x_rows):
        """A_rows (n_dev*n_own, K) row-sharded ELL values; x row-sharded."""

        @partial(
            shard_map, mesh=self.dmesh,
            in_specs=(P(self.axis, None), P(self.axis, None, None),
                      P(self.axis, None, None), P(self.axis),
                      P(self.axis, None), P(self.axis, None)),
            out_specs=P(self.axis),
        )
        def run(A, cols, mask, x, sidx, hsrc):
            return self._spmv_local(A, cols[0], mask[0], x, sidx[0], hsrc[0])

        return run(A_rows, self.local_cols, self.local_mask, x_rows,
                   self.shared_idx, self.halo_src)

    def solve_cg(self, A_rows, b_rows, bc_rows, diag_rows, rtol=1e-12,
                 maxiter=1000):
        """Distributed constrained CG: rows/cols pinned at bc, psum dots."""

        @partial(
            shard_map, mesh=self.dmesh,
            in_specs=(P(self.axis, None), P(self.axis), P(self.axis),
                      P(self.axis), P(self.axis, None, None),
                      P(self.axis, None, None),
                      P(self.axis, None), P(self.axis, None),
                      P(self.axis, None)),
            out_specs=P(self.axis),
        )
        def run(A, b, bc, dg, cols, mask, sidx, hsrc, valid):
            cols_, mask_ = cols[0], mask[0]
            sidx_, hsrc_ = sidx[0], hsrc[0]
            pin = bc | ~valid[0]

            def op(x):
                x_in = jnp.where(pin, 0.0, x)
                y = self._spmv_local(A, cols_, mask_, x_in, sidx_, hsrc_)
                return jnp.where(pin, x, y)

            pdot = lambda u, v: jax.lax.psum(jnp.vdot(u, v), self.axis)
            pre = jacobi_preconditioner(jnp.where(pin, 1.0, dg))
            return cg(op, jnp.where(pin & ~bc, 0.0, b), precond=pre,
                      rtol=rtol, maxiter=maxiter, dot=pdot).x

        return run(A_rows, b_rows, bc_rows, diag_rows, self.local_cols,
                   self.local_mask, self.shared_idx, self.halo_src,
                   self.row_valid)

    # ---- host helpers --------------------------------------------------------

    def pad_rows(self, x_global):
        """(n,) global vector -> (n_total,) row-sharded device array."""
        n = self.part.mesh.n_nodes
        x = jnp.concatenate([
            jnp.asarray(x_global, self.dtype),
            jnp.zeros(self.part.n_total - n, self.dtype),
        ])
        return jax.device_put(x, NamedSharding(self.dmesh, P(self.axis)))

    def unpad_rows(self, x_rows):
        return np.asarray(x_rows)[: self.part.mesh.n_nodes]


def distributed_poisson_demo(mesh, device_mesh, axis="i", rtol=1e-12):
    """End-to-end check: solve the constrained Poisson problem from the
    single-device test suite on a node partition (used by tests)."""
    from conservation_fem_tpu.ops import assembly

    part = build_partition(mesh, device_mesh.shape[axis])
    m = part.mesh.device_arrays(jnp.float64)
    K = assembly.assemble_stiffness(m)
    dist = DistributedELL(part, device_mesh, axis)
    # pad row-wise arrays
    n, Kw = part.mesh.n_nodes, part.mesh.max_patch
    pad = part.n_total - n
    A_rows = jnp.concatenate([K, jnp.zeros((pad, Kw), K.dtype)])
    A_rows = jax.device_put(A_rows, dist.shard)
    from conservation_fem_tpu.ops.spmv import ell_diag, ell_matvec

    bc = m.boundary_mask
    g = m.points[:, 0] ** 2 - m.points[:, 1] ** 2
    b = -ell_matvec(m, K, jnp.where(bc, g, 0.0))
    b = jnp.where(bc, g, b)
    diag = ell_diag(m, K)
    x = dist.solve_cg(
        A_rows, dist.pad_rows(b),
        jax.device_put(jnp.concatenate([bc, jnp.zeros(pad, bool)]),
                       NamedSharding(device_mesh, P(axis))),
        dist.pad_rows(diag), rtol=rtol,
    )
    return part.mesh, dist.unpad_rows(x), np.asarray(g)


class DistributedUnstructured:
    """Shared SPMD infrastructure for fully distributed unstructured
    solvers: node-partitioned rows, cell-partitioned assembly structures,
    halo exchange tables, and the row-sharded static FEM fields (mass rows,
    nodal h, boundary mask, points) — everything the per-model step kernels
    build on. Subclasses add model-specific static operators and the step.
    """

    def __init__(self, host_mesh, device_mesh: DeviceMesh, axis="i",
                 dtype=jnp.float64):
        from conservation_fem_tpu.parallel.partition import (
            build_cell_partition,
            build_partition,
        )

        self.dmesh = device_mesh
        self.axis = axis
        n_dev = device_mesh.shape[axis]
        self.n_dev = n_dev
        # partition WITHOUT reordering: the problem was built on this mesh
        self.part = build_partition(host_mesh, n_dev, reorder=False)
        self.cpart = build_cell_partition(self.part)
        part, cpart = self.part, self.cpart
        self.dtype = dtype
        self.n_own = part.n_own
        self.H = part.halo_size
        self.S = part.shared_size
        self.K = part.mesh.max_patch

        sh1 = NamedSharding(device_mesh, P(axis))
        sh2 = NamedSharding(device_mesh, P(axis, None))
        sh3 = NamedSharding(device_mesh, P(axis, None, None))
        sh4 = NamedSharding(device_mesh, P(axis, None, None, None))
        self._sh1, self._sh2 = sh1, sh2
        i32 = lambda x, s: jax.device_put(jnp.asarray(x, jnp.int32), s)
        f = lambda x, s: jax.device_put(jnp.asarray(x, dtype), s)
        self.local_cols = i32(part.local_cols, sh3)
        self.local_mask = jax.device_put(jnp.asarray(part.local_mask), sh3)
        self.shared_idx = i32(part.shared_idx, sh2)
        self.halo_src = i32(part.halo_src, sh2)
        self.row_valid = jax.device_put(jnp.asarray(part.global_rows >= 0), sh2)
        self.cells_ext = i32(cpart.cells_ext, sh3)
        self.cell_valid = jax.device_put(jnp.asarray(cpart.cell_valid), sh2)
        self.careas = f(cpart.area, sh2)
        self.cgrads = f(cpart.grads, sh4)
        self.ch = f(cpart.h, sh2)
        self.cslots = i32(cpart.cell_slots, sh4)
        self.rev_src = i32(cpart.rev_src, sh3)
        self.rev_mask = jax.device_put(jnp.asarray(cpart.rev_mask), sh3)
        # row-sharded static fields
        n = part.mesh.n_nodes
        self._pad = pad = part.n_total - n
        self._padv = padv = lambda v, fill: jnp.concatenate(
            [jnp.asarray(v), jnp.full(pad, fill, jnp.asarray(v).dtype)]
        )
        self.bc_rows = jax.device_put(
            padv(part.mesh.boundary_mask, True), sh1)
        m = part.mesh.device_arrays(dtype)
        self.m = m
        from conservation_fem_tpu.ops import assembly as _asm
        from conservation_fem_tpu.ops.helpers import get_nodal_h

        M_ell = _asm.assemble_mass(m)
        self.M_rows = self.pad_ell(M_ell)
        h = get_nodal_h(m, mass_ell=M_ell)
        self.h_rows = jax.device_put(padv(h, 0.0), sh1)
        # per-device point rows for time-dependent Dirichlet data; pad rows
        # repeat node 0 (they are pinned and never referenced)
        pts = np.asarray(part.mesh.points)
        pts_pad = np.concatenate([pts, np.repeat(pts[:1], pad, axis=0)])
        self.pts_rows = jax.device_put(jnp.asarray(pts_pad, dtype), sh2)

    def pad_ell(self, A_ell):
        """(n, K) ELL values -> (n_total, K) row-sharded device array."""
        return jax.device_put(
            jnp.concatenate(
                [A_ell, jnp.zeros((self._pad, self.K), self.dtype)]
            ),
            self._sh2,
        )

    def pad_vec(self, v, fill=0.0):
        return jax.device_put(self._padv(v, fill), self._sh1)

    # -- local primitives (inside shard_map; all args device-local) ----------

    def _halo(self, x_own, sidx, hsrc):
        published = x_own[sidx]
        table = jax.lax.all_gather(published, self.axis).reshape(-1)
        return jnp.concatenate([x_own, table[hsrc]])

    def _reverse_add_vec(self, ext, sidx, rev_src, rev_mask):
        """(n_own+H,) extended accumulation -> (n_own,) with foreign-row
        contributions shipped back to owners (ghostUpdate ADD/REVERSE)."""
        halo_part = ext[self.n_own:]
        table = jax.lax.all_gather(halo_part, self.axis).reshape(-1)
        picked = jnp.where(rev_mask, table[rev_src], 0.0)
        incoming = picked.sum(axis=-1)                       # (S,)
        return ext[: self.n_own].at[sidx].add(incoming)

    def _reverse_max_vec(self, ext, sidx, rev_src, rev_mask):
        """MAX-reduction twin of _reverse_add_vec (distributed rv_cell's
        order-independent scatter='max'): owners take the max of their own
        accumulation and every foreign cell's shipped contribution."""
        halo_part = ext[self.n_own:]
        table = jax.lax.all_gather(halo_part, self.axis).reshape(-1)
        picked = jnp.where(rev_mask, table[rev_src], -jnp.inf)
        incoming = picked.max(axis=-1)                       # (S,)
        return ext[: self.n_own].at[sidx].max(incoming)

    def _reverse_add_mat(self, ext, sidx, rev_src, rev_mask):
        halo_part = ext[self.n_own:]                        # (H, K)
        table = jax.lax.all_gather(halo_part, self.axis).reshape(-1, self.K)
        picked = jnp.where(rev_mask[..., None], table[rev_src], 0.0)
        incoming = picked.sum(axis=-2)                       # (S, K)
        return ext[: self.n_own].at[sidx].add(incoming)

    def _assemble_vec(self, cell_vals, cells_l, valid_l, sidx, rev_src,
                      rev_mask):
        vals = jnp.where(valid_l[:, None], cell_vals, 0.0)
        ext = jnp.zeros(self.n_own + self.H, self.dtype).at[
            cells_l.reshape(-1)
        ].add(vals.reshape(-1))
        return self._reverse_add_vec(ext, sidx, rev_src, rev_mask)

    def _assemble_mat(self, cell_vals, cells_l, slots_l, valid_l, sidx,
                      rev_src, rev_mask):
        vals = jnp.where(valid_l[:, None, None], cell_vals, 0.0)
        rows = jnp.repeat(cells_l, 3, axis=1).reshape(-1, 3, 3)
        tgt = (rows * self.K + slots_l).reshape(-1)
        flat = jnp.zeros((self.n_own + self.H) * self.K, self.dtype).at[
            tgt
        ].add(vals.reshape(-1))
        return self._reverse_add_mat(flat.reshape(-1, self.K), sidx,
                                     rev_src, rev_mask)


class DistributedHyperbolic(DistributedUnstructured):
    """Fully distributed unstructured scalar-conservation-law solver:
    node-partitioned rows, cell-partitioned assembly with reverse halo
    accumulation (ghostUpdate ADD/REVERSE), psum Krylov dots — the complete
    SPMD step on an arbitrary triangle mesh for ANY HyperbolicProblem
    (KPP, Burgers, ...), mirroring the reference where every script is
    MPI-distributable for free (ref linear_advection.py:40-42,165,170;
    SI.py:155,163).

    Covers the full single-device feature set of
    models/scalar_hyperbolic.HyperbolicProblem:
      * stabilization rv | si | gfem (SI reads halo'd bc-applied stiffness
        rows, ref SI.py:50-61)
      * residual scheme bdf2 | bdf1
      * time-dependent Dirichlet data g(x, t) evaluated on each device's
        own point rows (Burgers exact-solution bc, ref Exact_Burger_RV.py)
      * post-solve patch smoothing (ref Exact_Burger_SI.py:193)
    """

    def __init__(self, problem, device_mesh: DeviceMesh, axis="i"):
        super().__init__(problem.host_mesh, device_mesh, axis,
                         dtype=problem.u0.dtype)
        self.p = problem
        self.u0_rows = self.pad_vec(problem.u0)
        # SI stabilization reads the bc-applied stiffness rows
        # (ref SI.py:50-61; smoothness.py:147-149)
        self.Kbc_rows = None
        if problem.cfg.stabilization == "si":
            from conservation_fem_tpu.ops import assembly as _asm
            from conservation_fem_tpu.ops.bc import ell_with_bc

            K = _asm.assemble_stiffness(self.m)
            self.Kbc_rows = self.pad_ell(
                ell_with_bc(self.m, K, self.m.boundary_mask))
        # quadrature tables
        from conservation_fem_tpu.ops.assembly import _DUN4_W, _quad_basis

        dtype = self.dtype
        self.phi = _quad_basis().astype(dtype)
        self.qw = (_DUN4_W * 0.5).astype(dtype)

    # -- step -----------------------------------------------------------------

    def make_step(self):
        p = self.p
        cfg = p.cfg
        dt = p.dt
        phi, qw = self.phi, self.qw
        axis = self.axis
        fprime = p.flux_prime
        fprime_norm = p.flux_prime_norm
        bc_value = p.bc_value

        def step_local(M, Kbc, cols, maskc, sidx, hsrc, valid, bc, h, pts,
                       cells_l, cvalid, careas, cgrads, cslots,
                       rev_src, rev_mask, u, uo, uoo, t):
            rev_src_l, rev_mask_l = rev_src[0], rev_mask[0]
            cols_, maskc_ = cols[0], maskc[0]
            sidx_, hsrc_ = sidx[0], hsrc[0]
            cellsl, cvalidl = cells_l[0], cvalid[0]
            careasl, cgradsl = careas[0], cgrads[0]
            cslotsl = cslots[0]
            validl = valid[0]
            pin = bc | ~validl
            pdot = lambda a, b: jax.lax.psum(jnp.vdot(a, b), axis)

            def spmv(A, x):
                x_ext = self._halo(x, sidx_, hsrc_)
                g = x_ext[cols_]
                return jnp.where(maskc_, A * g, 0.0).sum(axis=1)

            def c_mv(A):
                def mv(x):
                    x_in = jnp.where(pin, 0.0, x)
                    return jnp.where(pin, x, spmv(A, x_in))
                return mv

            def diag_of(A):
                # diagonal: col == own row index
                own_idx = jnp.arange(self.n_own)
                hit = (cols_ == own_idx[:, None]) & maskc_
                return jnp.where(hit, A, 0.0).sum(axis=1)

            def nl_rhs(x):
                x_ext = self._halo(x, sidx_, hsrc_)
                u_cell = x_ext[cellsl]                        # (C,3)
                u_q = _einsum("ca,qa->cq", u_cell, phi)
                fp = fprime(u_q)
                gu = _einsum("ca,cad->cd", u_cell, cgradsl)
                conv = _einsum("cqd,cd->cq", fp, gu)
                r = 2.0 * careasl[:, None] * _einsum(
                    "q,cq,qa->ca", qw, conv, phi)
                return self._assemble_vec(r, cellsl, cvalidl, sidx_,
                                           rev_src_l, rev_mask_l)

            def keps_mat(eps):
                e_ext = self._halo(eps, sidx_, hsrc_)
                e_cell = e_ext[cellsl].mean(axis=1)
                gg = _einsum("cad,cbd->cab", cgradsl, cgradsl)
                vals = (careasl * e_cell)[:, None, None] * gg
                return self._assemble_mat(vals, cellsl, cslotsl, cvalidl,
                                           sidx_, rev_src_l, rev_mask_l)

            def jac_mat(x):
                x_ext = self._halo(x, sidx_, hsrc_)
                u_cell = x_ext[cellsl]
                u_q = _einsum("ca,qa->cq", u_cell, phi)
                fp, fpp = jax.jvp(fprime, (u_q,), (jnp.ones_like(u_q),))
                gu = _einsum("ca,cad->cd", u_cell, cgradsl)
                t1 = _einsum("cqd,cd->cq", fpp, gu)
                term1 = _einsum("q,cq,qa,qb->cab", qw, t1, phi, phi)
                t2 = _einsum("cqd,cbd->cqb", fp, cgradsl)
                term2 = _einsum("q,qa,cqb->cab", qw, phi, t2)
                vals = 2.0 * careasl[:, None, None] * (term1 + term2)
                return self._assemble_mat(vals, cellsl, cslotsl, cvalidl,
                                           sidx_, rev_src_l, rev_mask_l)

            def patch_reduce(x, reducer, pad_val):
                x_ext = self._halo(jnp.where(validl, x, pad_val), sidx_, hsrc_)
                g = x_ext[cols_]
                return reducer(
                    jnp.where(maskc_, g, pad_val), axis=1
                )

            Mb = M  # (n_own, K) row block
            # 1. residual projection (bdf2: ref KPP_NodeRV.py:131-145;
            #    bdf1: ref Burger_RV.py:144)
            if cfg.residual_scheme == "bdf1":
                du = (u - uo) / dt
            else:
                du = (3.0 * u - 4.0 * uo + uoo) / (2.0 * dt)
            rhs = spmv(Mb, du) + nl_rhs(u)
            rhs = jnp.where(pin, 0.0, rhs)
            diagM = jnp.where(pin, 1.0, diag_of(Mb))
            RH = cg(c_mv(Mb), rhs, precond=jacobi_preconditioner(diagM),
                    rtol=cfg.krylov_rtol, dot=pdot).x
            # 2. epsilon
            tiny = jnp.asarray(
                1e-300 if u.dtype == jnp.float64 else 1e-30, u.dtype)
            if cfg.stabilization == "rv":
                nvalid = jax.lax.psum(validl.sum(), axis)
                mean_u = jax.lax.psum(
                    jnp.where(validl, u, 0.0).sum(), axis) / nvalid
                abs_term = jax.lax.pmax(
                    jnp.abs(jnp.where(validl, u - mean_u, 0.0)).max(), axis)
                u_max = patch_reduce(u, jnp.max, -jnp.inf)
                u_min = patch_reduce(u, jnp.min, jnp.inf)
                n_i = jnp.abs((u_max - u_min) - abs_term)
                Rh_i = patch_reduce(jnp.abs(RH), jnp.max, -jnp.inf)
                beta = patch_reduce(fprime_norm(u), jnp.max, -jnp.inf)
                eps = jnp.minimum(
                    cfg.Cvel * h * beta,
                    cfg.CRV * h**2 * jnp.abs(Rh_i / jnp.maximum(n_i, tiny)))
            elif cfg.stabilization == "si":
                # alpha_i = |sum_j b_ij du_ij| / max(sum_j |b_ij du_ij|, eps)
                # over the halo'd patch (ref SI.py:50-61,170-187)
                u_ext = self._halo(u, sidx_, hsrc_)
                dup = u_ext[cols_] - u[:, None]
                num = jnp.abs(jnp.where(maskc_, Kbc * dup, 0.0).sum(axis=1))
                den = jnp.where(maskc_, jnp.abs(Kbc) * jnp.abs(dup),
                                0.0).sum(axis=1)
                alpha = num / jnp.maximum(den, cfg.si_eps)
                psi = stab.sigmoid_activation(alpha)
                eps = psi * cfg.Cm * h * fprime_norm(u)
            else:  # gfem
                eps = jnp.zeros_like(u)
            eps = jnp.where(validl, eps, 0.0)
            # 3. Newton CN with u|bc = g(x, t)
            Kc = keps_mat(eps)
            N_un = nl_rhs(u)
            Kc_un = spmv(Kc, u)
            base = Mb + 0.5 * dt * Kc
            g2 = bc_value(pts, t)

            def residual(v):
                F = (spmv(Mb, v - u)
                     + 0.5 * dt * (nl_rhs(v) + N_un)
                     + 0.5 * dt * (spmv(Kc, v) + Kc_un))
                return jnp.where(pin, v - jnp.where(bc, g2, 0.0), F)

            def jacobian(v):
                J = base + 0.5 * dt * jac_mat(v)
                pre = jacobi_preconditioner(jnp.where(pin, 1.0, diag_of(J)))
                return c_mv(J), pre

            u_init = jnp.where(pin, jnp.where(bc, g2, 0.0), u)
            res = newton_solve(
                residual, u_init,
                rtol=cfg.newton_rtol, atol=cfg.newton_atol,
                max_it=cfg.newton_max_it, criterion="residual",
                linear_rtol=cfg.newton_linear_rtol or cfg.krylov_rtol,
                jacobian_fn=jacobian, freeze_jacobian=cfg.modified_newton,
                dot=pdot)
            uh = res.u
            if cfg.smooth_l > 0:
                # Jacobi patch smoothing over the halo'd patch
                # (ref Exact_Burger_SI.py:193, helpers.py:40-50)
                u_ext = self._halo(uh, sidx_, hsrc_)
                total = jnp.where(maskc_, u_ext[cols_], 0.0).sum(axis=1)
                dsz = jnp.maximum(
                    maskc_.sum(axis=1).astype(uh.dtype) - 1.0, 1.0)
                l = cfg.smooth_l
                uh = (total - uh + (l - 1.0) * dsz * uh) / (l * dsz)
                uh = jnp.where(validl, uh, 0.0)
            return uh, u, uo

        ax = self.axis
        smapped = shard_map(
            step_local,
            mesh=self.dmesh,
            in_specs=(
                P(ax, None), P(ax, None),    # M rows, Kbc rows
                P(ax, None, None), P(ax, None, None),   # cols, mask
                P(ax, None), P(ax, None), P(ax, None),  # sidx, hsrc, valid(2d)
                P(ax), P(ax), P(ax, None),   # bc, h, pts
                P(ax, None, None), P(ax, None),          # cells, cvalid
                P(ax, None), P(ax, None, None, None),    # careas, cgrads
                P(ax, None, None, None),                 # cslots
                P(ax, None, None), P(ax, None, None),    # rev_src, rev_mask
                P(ax), P(ax), P(ax),         # u, uo, uoo
                P(),                         # t (replicated scalar)
            ),
            out_specs=(P(ax),) * 3,
        )
        return smapped

    def solve(self):
        p = self.p
        step = self.make_step()
        valid2 = jax.device_put(
            jnp.asarray(self.part.global_rows >= 0),
            NamedSharding(self.dmesh, P(self.axis, None)),
        )
        Kbc = self.Kbc_rows if self.Kbc_rows is not None else self.M_rows

        @jax.jit
        def _run(u0):
            def body(carry, t):
                u, uo, uoo = carry
                return step(self.M_rows, Kbc, self.local_cols,
                            self.local_mask,
                            self.shared_idx, self.halo_src, valid2,
                            self.bc_rows, self.h_rows, self.pts_rows,
                            self.cells_ext, self.cell_valid, self.careas,
                            self.cgrads, self.cslots, self.rev_src,
                            self.rev_mask, u, uo, uoo, t), None

            ts = (jnp.arange(p.num_steps, dtype=u0.dtype) + 1.0) * p.dt
            (u, _, _), _ = jax.lax.scan(body, (u0, u0, u0), ts)
            return u

        u = _run(self.u0_rows)
        return np.asarray(u)[: self.part.mesh.n_nodes]


# backward-compatible name (round 1 exposed the KPP-specialized class)
DistributedKPP = DistributedHyperbolic


class DistributedAdvection(DistributedUnstructured):
    """Fully distributed linear advection on an unstructured mesh:
    Crank-Nicolson with gfem | rv_node | si stabilization, homogeneous
    Dirichlet bc, SPMD over a node partition with halo exchange — the
    distributed form of models/linear_advection.py (every reference
    advection script is MPI-rank-safe, ref linear_advection.py:40-42,165).

    rv_node bootstraps with one plain GFEM step exactly like the
    single-device driver (ref RV_cell.py:142-160).
    """

    def __init__(self, problem, device_mesh: DeviceMesh, axis="i"):
        cfg = problem.cfg
        if cfg.stabilization not in ("gfem", "rv_node", "si", "rv_cell",
                                     "rk4"):
            raise NotImplementedError(
                f"distributed advection: {cfg.stabilization!r}")
        super().__init__(problem.host_mesh, device_mesh, axis,
                         dtype=problem.u0.dtype)
        self.p = problem
        self.u0_rows = self.pad_vec(problem.u0)
        self.C_rows = self.pad_ell(problem.C)
        self.beta_rows = self.pad_vec(jnp.linalg.norm(problem.w, axis=1))
        self.Kbc_rows = (self.pad_ell(problem.K_bc)
                         if cfg.stabilization == "si" else self.M_rows)

    def make_step(self, stabilization: str):
        p = self.p
        cfg = p.cfg
        dt = p.dt
        axis = self.axis

        def step_local(M, C, Kbc, cols, maskc, sidx, hsrc, valid, bc, h,
                       beta, u, uo):
            cols_, maskc_ = cols[0], maskc[0]
            sidx_, hsrc_ = sidx[0], hsrc[0]
            cellsl, cvalidl = self._cells_l, self._cvalid_l
            validl = valid[0]
            pin = bc | ~validl
            pdot = lambda a, b: jax.lax.psum(jnp.vdot(a, b), axis)

            def spmv(A, x):
                x_ext = self._halo(x, sidx_, hsrc_)
                g = x_ext[cols_]
                return jnp.where(maskc_, A * g, 0.0).sum(axis=1)

            def c_mv(A):
                def mv(x):
                    x_in = jnp.where(pin, 0.0, x)
                    return jnp.where(pin, x, spmv(A, x_in))
                return mv

            def diag_of(A):
                own_idx = jnp.arange(self.n_own)
                hit = (cols_ == own_idx[:, None]) & maskc_
                return jnp.where(hit, A, 0.0).sum(axis=1)

            def patch_reduce(x, reducer, pad_val):
                x_ext = self._halo(jnp.where(validl, x, pad_val), sidx_,
                                   hsrc_)
                g = x_ext[cols_]
                return reducer(jnp.where(maskc_, g, pad_val), axis=1)

            if stabilization == "rk4":
                # explicit RK4: M k = -C u_stage with k|bc = 0 per stage
                # (ref GFEM_RK4.py:134-218; single-device _step_rk4)
                preM = jacobi_preconditioner(
                    jnp.where(pin, 1.0, diag_of(M)))

                def stage(v):
                    r = jnp.where(pin, 0.0, -spmv(C, v))
                    return cg(c_mv(M), r, precond=preM,
                              rtol=cfg.krylov_rtol, dot=pdot).x

                k1 = stage(u)
                k2 = stage(u + 0.5 * dt * k1)
                k3 = stage(u + 0.5 * dt * k2)
                k4 = stage(u + dt * k3)
                uh = u + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
                return jnp.where(bc, 0.0, uh), u

            # epsilon
            if stabilization == "rv_node":
                # BDF1 residual projection M Rh = M (u-uo)/dt + C u, Rh|bc=0
                # (ref RV_cell.py:169-174)
                rhs = spmv(M, (u - uo) / dt) + spmv(C, u)
                rhs = jnp.where(pin, 0.0, rhs)
                diagM = jnp.where(pin, 1.0, diag_of(M))
                Rh = cg(c_mv(M), rhs,
                        precond=jacobi_preconditioner(diagM),
                        rtol=cfg.krylov_rtol, dot=pdot).x
                # rv_epsilon_linear (ref RV.py:92-127): beta at patch owner
                nvalid = jax.lax.psum(validl.sum(), axis)
                mean_u = jax.lax.psum(
                    jnp.where(validl, u, 0.0).sum(), axis) / nvalid
                abs_term = jax.lax.pmax(
                    jnp.abs(jnp.where(validl, u - mean_u, 0.0)).max(), axis)
                u_max = patch_reduce(u, jnp.max, -jnp.inf)
                u_min = patch_reduce(u, jnp.min, jnp.inf)
                n_i = jnp.abs((u_max - u_min) - abs_term)
                Rh_i = patch_reduce(jnp.abs(Rh), jnp.max, -jnp.inf)
                tiny = jnp.asarray(
                    1e-300 if u.dtype == jnp.float64 else 1e-30, u.dtype)
                eps = jnp.minimum(
                    cfg.Cvel * h * beta,
                    cfg.CRV * h**2 * jnp.abs(Rh_i / jnp.maximum(n_i, tiny)))
            elif stabilization == "si":
                u_ext = self._halo(u, sidx_, hsrc_)
                dup = u_ext[cols_] - u[:, None]
                num = jnp.abs(jnp.where(maskc_, Kbc * dup, 0.0).sum(axis=1))
                den = jnp.where(maskc_, jnp.abs(Kbc) * jnp.abs(dup),
                                0.0).sum(axis=1)
                alpha = num / jnp.maximum(den, cfg.si_eps)
                psi = stab.sigmoid_activation(alpha)
                eps = psi * cfg.Cm * h * beta
            elif stabilization == "rv_cell":
                # cell RV (ref RV_cell.py:169-195): bc-constrained BDF1
                # residual, plain-max global normalization, per-cell
                # eps_k scattered to nodes. Scatter is the order-
                # independent 'max' variant (the reference's Python loop
                # is last-cell-wins; single-device matches it via
                # cfg.rv_cell_scatter='last' — max is the deterministic
                # distributed choice, deviation documented there).
                rhs = spmv(M, (u - uo) / dt) + spmv(C, u)
                rhs = jnp.where(pin, 0.0, rhs)
                diagM = jnp.where(pin, 1.0, diag_of(M))
                Rh = cg(c_mv(M), rhs,
                        precond=jacobi_preconditioner(diagM),
                        rtol=cfg.krylov_rtol, dot=pdot).x
                nvalid = jax.lax.psum(validl.sum(), axis)
                mean_u = jax.lax.psum(
                    jnp.where(validl, u, 0.0).sum(), axis) / nvalid
                norm = jax.lax.pmax(
                    jnp.where(validl, u - mean_u, -jnp.inf).max(), axis)
                Rext = self._halo(jnp.where(validl, jnp.abs(Rh / norm),
                                            0.0), sidx_, hsrc_)
                R_cell = Rext[cellsl].max(axis=1)
                bext = self._halo(jnp.where(validl, beta, 0.0), sidx_,
                                  hsrc_)
                beta_cell = bext[cellsl].max(axis=1)
                hc = self._ch_l
                eps_k = jnp.minimum(cfg.Cvel * hc * beta_cell,
                                    cfg.CRV * hc**2 * R_cell)
                eps_k = jnp.where(cvalidl, eps_k, -jnp.inf)
                ext = jnp.full(self.n_own + self.H, -jnp.inf,
                               u.dtype).at[cellsl.reshape(-1)].max(
                    jnp.repeat(eps_k, 3))
                eps = self._reverse_max_vec(ext, sidx_, self._rev_src_l,
                                            self._rev_mask_l)
                eps = jnp.where(jnp.isfinite(eps), eps, 0.0)
            else:
                eps = None

            # CN operators A = M + dt/2 (C + Keps), B = M - dt/2 (C + Keps)
            if eps is None:
                CK = C
            else:
                eps = jnp.where(validl, eps, 0.0)
                e_ext = self._halo(eps, sidx_, hsrc_)
                e_cell = e_ext[cellsl].mean(axis=1)
                gg = _einsum("cad,cbd->cab", self._cgrads_l,
                                self._cgrads_l)
                vals = (self._careas_l * e_cell)[:, None, None] * gg
                Keps = self._assemble_mat(vals, cellsl, self._cslots_l,
                                          cvalidl, sidx_,
                                          self._rev_src_l, self._rev_mask_l)
                CK = C + Keps
            A = M + 0.5 * dt * CK
            B = M - 0.5 * dt * CK
            b = jnp.where(pin, 0.0, spmv(B, u))
            pre = jacobi_preconditioner(jnp.where(pin, 1.0, diag_of(A)))
            # x0 = u matches the single-device _cn_solve exactly (bc rows of
            # x0 carry u's values; the identity rows converge them to 0)
            uh = bicgstab(c_mv(A), b, x0=u,
                          precond=pre, rtol=cfg.krylov_rtol, dot=pdot).x
            return uh, u

        ax = self.axis

        def step_wrapped(M, C, Kbc, cols, maskc, sidx, hsrc, valid, bc, h,
                         beta, cells_l, cvalid, careas, cgrads, ch_l,
                         cslots, rev_src, rev_mask, u, uo):
            # stash device-local cell structures for the step body
            self._cells_l, self._cvalid_l = cells_l[0], cvalid[0]
            self._careas_l, self._cgrads_l = careas[0], cgrads[0]
            self._ch_l = ch_l[0]
            self._cslots_l = cslots[0]
            self._rev_src_l, self._rev_mask_l = rev_src[0], rev_mask[0]
            return step_local(M, C, Kbc, cols, maskc, sidx, hsrc, valid,
                              bc, h, beta, u, uo)

        return shard_map(
            step_wrapped,
            mesh=self.dmesh,
            in_specs=(
                P(ax, None), P(ax, None), P(ax, None),  # M, C, Kbc rows
                P(ax, None, None), P(ax, None, None),   # cols, mask
                P(ax, None), P(ax, None), P(ax, None),  # sidx, hsrc, valid
                P(ax), P(ax), P(ax),                    # bc, h, beta
                P(ax, None, None), P(ax, None),         # cells, cvalid
                P(ax, None), P(ax, None, None, None),   # careas, cgrads
                P(ax, None),                            # ch
                P(ax, None, None, None),                # cslots
                P(ax, None, None), P(ax, None, None),   # rev_src, rev_mask
                P(ax), P(ax),                           # u, uo
            ),
            out_specs=(P(ax),) * 2,
        )

    def solve(self):
        p = self.p
        cfg = p.cfg
        step = self.make_step(cfg.stabilization)
        gfem_step = (self.make_step("gfem")
                     if cfg.stabilization in ("rv_node", "rv_cell")
                     else None)
        statics = (self.M_rows, self.C_rows, self.Kbc_rows,
                   self.local_cols, self.local_mask,
                   self.shared_idx, self.halo_src, self.row_valid,
                   self.bc_rows, self.h_rows, self.beta_rows,
                   self.cells_ext, self.cell_valid, self.careas,
                   self.cgrads, self.ch, self.cslots, self.rev_src,
                   self.rev_mask)

        @jax.jit
        def _run(u0):
            carry = (u0, u0)
            n = p.num_steps
            if gfem_step is not None:
                carry = gfem_step(*statics, *carry)
                n -= 1

            def body(c, _):
                return step(*statics, *c), None

            (u, _), _ = jax.lax.scan(body, carry, None, length=n)
            return u

        u = _run(self.u0_rows)
        return np.asarray(u)[: self.part.mesh.n_nodes]
