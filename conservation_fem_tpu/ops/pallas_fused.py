"""Fused whole-step Pallas kernel for the structured RV pipeline.

ONE kernel per time step: BDF2 residual projection (fixed-iteration CG),
RV epsilon (patch reductions), and the stabilized CN Newton solve
(fixed-iteration BiCGStab inner solves) all execute inside a single
Mosaic kernel with every field resident in VMEM. The eps-stiffness and
Newton-Jacobian stencil planes are built once per step / linearization
in-kernel, so every Krylov matvec is 7 shifted MACs; the default 16 MB
scoped-VMEM stack is raised via CompilerParams(vmem_limit_bytes) (the
intermediates measured 44 MB for the quadrature section alone on the
default limit, and the allocator THRASHING near the limit — not program
size — is what made earlier forms take >30 min in the remote compiler).

Semantics mirror ops/krylov.cg_fixed / bicgstab_fixed and
ops/newton.newton_fixed exactly (same breakdown guards), so the kernel is
a drop-in for the fixed-iteration stencil step
(models/structured_hyperbolic.py with cg_iters/newton_iters set).
Numerical identity with the XLA path is tested in interpret mode
(tests/test_pallas_fused.py).

Mosaic notes (this toolchain): static slices of traced values lower, but
`jnp.pad` (a tpu.concatenate of a lane-offset slice with zero planes)
fails with "result/input offset mismatch on non-concat dimension" — so
all neighbor access is ROLL + IOTA-MASK on full node-shaped arrays:
cell fields live at node shape (n1x, n1y) with the last row/col zeroed,
corner reads are rolls toward the origin, scatters are rolls away from
it (wrapped lanes carry the zeroed pad row/col, so no scatter mask is
needed). Gathers and lax.dynamic_slice do not lower either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conservation_fem_tpu.ops.structured import CORNERS, OFFSETS, _PLANE


def _interpret_default():
    return jax.default_backend() == "cpu"


def _make_shifts(n1x, n1y):
    """Roll+mask neighbor access on (n1x, n1y) node-shaped arrays.

    Returns (shift, shift_fill, cellmask):
      shift(x, di, dj)[i, j] = x[i+di, j+dj], 0 out of bounds
      shift_fill(x, di, dj, fill) — same with ``fill`` out of bounds
      cellmask — 1.0 where (i, j) indexes a cell of the (nx, ny) cell
      grid, 0.0 on the padding row/col (i = nx or j = ny)
    All pure rolls + iota compares — no pad/concat, Mosaic-lowerable.
    """
    ii = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 1)

    def _roll(x, di, dj):
        if di:
            x = pltpu.roll(x, -di % n1x, 0)
        if dj:
            x = pltpu.roll(x, -dj % n1y, 1)
        return x

    def _inb(di, dj):
        m = jnp.full((n1x, n1y), True)
        if di:
            m &= (ii + di >= 0) & (ii + di < n1x)
        if dj:
            m &= (jj + dj >= 0) & (jj + dj < n1y)
        return m

    def shift(x, di, dj):
        return jnp.where(_inb(di, dj), _roll(x, di, dj), 0.0)

    def shift_fill(x, di, dj, fill):
        return jnp.where(_inb(di, dj), _roll(x, di, dj), fill)

    cellmask = (ii < n1x - 1) & (jj < n1y - 1)
    return shift, shift_fill, cellmask


def fused_rv_step(u2, uo2, uoo2, g2, Mc2, *, nx, ny, dt, area, h, grads,
                  phi, qw, Cvel, CRV, fprime, fprime_norm, cg_iters,
                  newton_iters, lin_iters, freeze_jacobian,
                  residual_scheme="bdf2", stabilization="rv",
                  fprime_xy=None, interpret=None):
    """One full stabilized time step as a single Pallas kernel.

    u2/uo2/uoo2: (n1x, n1y) solution history; g2: Dirichlet data field;
    Mc2: (7, n1x, n1y) mass stencil planes (sd.M_coef).
    grads (2,3,2), phi (Q,3), qw (Q,): static numpy tables (closed over).

    Operator strategy: the eps-stiffness and Newton-Jacobian STENCIL
    PLANES are built once per step / per linearization inside the kernel
    (local 3x3 blocks -> 7 planes, the in-kernel analog of
    structured.local_to_stencil), so every Krylov matvec is 7 shifted
    MACs instead of a full re-quadrature — this cuts both runtime work
    and Mosaic program size ~10x vs the matrix-free-per-application
    form (which took >15 min in the remote compiler).
    """
    n1x, n1y = nx + 1, ny + 1
    if interpret is None:
        interpret = _interpret_default()
    dtype = u2.dtype
    f = lambda c: jnp.asarray(c, dtype)
    dt_, area_, h_ = float(dt), float(area), float(h)
    grads_c = np.asarray(grads, np.float64)
    phi_c = np.asarray(phi, np.float64)
    qw_c = np.asarray(qw, np.float64)
    gg_c = np.einsum("tad,tbd->tab", grads_c, grads_c)
    Q = phi_c.shape[0]
    tiny = 1e-300 if dtype == jnp.float64 else 1e-30
    # componentwise flux derivative: stacked (..., 2) outputs make Mosaic
    # compile ~100x slower (measured 4.4 s for ~10 rank-3 ops vs 0.5 s for
    # an entire fori_loop solver) — models pass fprime_xy=(fx, fy) so the
    # kernel never materializes a trailing-dim-2 array
    if fprime_xy is not None:
        fpx, fpy = fprime_xy
    else:
        fpx = lambda v: fprime(v)[..., 0]
        fpy = lambda v: fprime(v)[..., 1]

    def kernel(u_ref, uo_ref, uoo_ref, g_ref, Mc_ref, out_ref):
        u = u_ref[:]
        uo = uo_ref[:]
        uoo = uoo_ref[:]
        g = g_ref[:]
        Mc = tuple(Mc_ref[k] for k in range(len(OFFSETS)))
        ii = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 1)
        bc = (ii == 0) | (ii == n1x - 1) | (jj == 0) | (jj == n1y - 1)

        dot = lambda a, b: jnp.sum(a * b)

        shift, shift_fill, cellmask = _make_shifts(n1x, n1y)
        cmf = jnp.where(cellmask, f(1.0), f(0.0))

        def _cells(v):
            """Field at triangle corners, node-shaped with the pad
            row/col zeroed (cell (i,j) value at index [i,j])."""
            return [tuple(shift(v, di, dj) * cmf for (di, dj) in CORNERS[t])
                    for t in range(2)]

        def _scatter(vals):
            out = None
            for t in range(2):
                for a, (di, dj) in enumerate(CORNERS[t]):
                    c = shift(vals[t][a] * cmf, -di, -dj)
                    out = c if out is None else out + c
            return out

        def _patch_reduce(x, reducer, pad_val):
            acc = x
            for (di, dj) in OFFSETS[1:]:
                acc = reducer(acc, shift_fill(x, di, dj, f(pad_val)))
            return acc

        # -- stencil-plane machinery -----------------------------------------

        def plane_mv(coef, v):
            out = coef[0] * v
            for k, (di, dj) in enumerate(OFFSETS[1:], start=1):
                out = out + coef[k] * shift(v, di, dj)
            return out

        def to_planes(loc):
            """loc[t][a][b] node-shaped cell blocks -> 7 planes (the
            in-kernel local_to_stencil)."""
            coef = [jnp.zeros((n1x, n1y), dtype) for _ in OFFSETS]
            for t in range(2):
                cs = CORNERS[t]
                for a in range(3):
                    dai, daj = cs[a]
                    for b in range(3):
                        off = (cs[b][0] - dai, cs[b][1] - daj)
                        p = _PLANE[off]
                        coef[p] = coef[p] + shift(loc[t][a][b] * cmf,
                                                  -dai, -daj)
            return tuple(coef)

        def pinned(op):
            def mv(x):
                x0 = jnp.where(bc, 0.0, x)
                return jnp.where(bc, x, op(x0))
            return mv

        # -- quadrature pieces (per evaluation, not per matvec) --------------

        def quad_vals(vc_t):
            return tuple(
                sum(f(phi_c[q, a]) * vc_t[a] for a in range(3))
                for q in range(Q))

        def cell_grad(vc_t, t):
            return tuple(
                sum(f(grads_c[t, a, d]) * vc_t[a] for a in range(3))
                for d in range(2))

        def nl_rhs(v):
            vc = _cells(v)
            vals = []
            for t in range(2):
                u_q = quad_vals(vc[t])
                gu = cell_grad(vc[t], t)
                conv = tuple(
                    fpx(u_q[q]) * gu[0] + fpy(u_q[q]) * gu[1]
                    for q in range(Q))
                vals.append(tuple(
                    f(2.0 * area_) * sum(f(qw_c[q] * phi_c[q, a]) * conv[q]
                                         for q in range(Q))
                    for a in range(3)))
            return _scatter(vals)

        def keps_planes(e_cell):
            loc = [[[f(area_ * gg_c[t, a, b]) * e_cell[t]
                     for b in range(3)] for a in range(3)] for t in range(2)]
            return to_planes(loc)

        def conv_planes(w):
            """Stencil of d/du N(u) at w (cf. structured.flux_jacobian_coef)."""
            wc = _cells(w)
            loc = []
            for t in range(2):
                u_q = quad_vals(wc[t])
                gu = cell_grad(wc[t], t)
                fxs, fys, fgs = [], [], []
                for q in range(Q):
                    one = jnp.ones_like(u_q[q])
                    fx_v, fx_d = jax.jvp(fpx, (u_q[q],), (one,))
                    fy_v, fy_d = jax.jvp(fpy, (u_q[q],), (one,))
                    fxs.append(fx_v)
                    fys.append(fy_v)
                    fgs.append(fx_d * gu[0] + fy_d * gu[1])
                loc_t = []
                for a in range(3):
                    row = []
                    for b in range(3):
                        term = sum(
                            f(qw_c[q] * phi_c[q, a])
                            * (fgs[q] * f(phi_c[q, b])
                               + fxs[q] * f(grads_c[t, b, 0])
                               + fys[q] * f(grads_c[t, b, 1]))
                            for q in range(Q))
                        row.append(f(2.0 * area_) * term)
                    loc_t.append(row)
                loc.append(loc_t)
            return to_planes(loc)

        # -- 1. residual projection (cg_fixed semantics) ---------------------
        if residual_scheme == "bdf1":
            du = (u - uo) / f(dt_)
        else:
            du = (3.0 * u - 4.0 * uo + uoo) / f(2.0 * dt_)
        rhs = jnp.where(bc, 0.0, plane_mv(Mc, du) + nl_rhs(u))
        dMinv = 1.0 / jnp.where(bc, 1.0, Mc[0])
        op = pinned(lambda v: plane_mv(Mc, v))

        def cg_body(_, c):
            x, r, p, rz = c
            Ap = op(p)
            pAp = dot(p, Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 0, pAp, f(tiny))
            alpha = jnp.where(rz > 0, alpha, 0.0)
            x = x + alpha * p
            r = r - alpha * Ap
            z = dMinv * r
            rz_new = dot(r, z)
            beta = rz_new / jnp.where(rz > 0, rz, f(tiny))
            return (x, r, z + beta * p, rz_new)

        z0 = dMinv * rhs
        RH = jax.lax.fori_loop(
            0, cg_iters, cg_body,
            (jnp.zeros_like(rhs), rhs, z0, dot(rhs, z0)))[0]

        # -- 2. RV epsilon (cf. structured.rv_epsilon) -----------------------
        if stabilization == "rv":
            abs_term = jnp.abs(u - jnp.mean(u)).max()
            u_max = _patch_reduce(u, jnp.maximum, -np.inf)
            u_min = _patch_reduce(u, jnp.minimum, np.inf)
            n_i = jnp.abs((u_max - u_min) - abs_term)
            Rh_i = _patch_reduce(jnp.abs(RH), jnp.maximum, -np.inf)
            beta = _patch_reduce(fprime_norm(u), jnp.maximum, -np.inf)
            eps = jnp.minimum(
                f(Cvel * h_) * beta,
                f(CRV * h_ * h_) * jnp.abs(Rh_i / jnp.maximum(n_i, f(tiny))),
            )
        else:  # gfem
            eps = jnp.zeros_like(u)
        ec = _cells(eps)
        e_cell = [(ec[t][0] + ec[t][1] + ec[t][2]) / 3.0 for t in range(2)]

        # -- 3. Newton CN (newton_fixed + bicgstab_fixed semantics) ----------
        Kc = keps_planes(e_cell)
        N_un = nl_rhs(u)
        K_un = plane_mv(Kc, u)

        def residual(v):
            F = (plane_mv(Mc, v - u)
                 + f(0.5 * dt_) * (nl_rhs(v) + N_un)
                 + f(0.5 * dt_) * (plane_mv(Kc, v) + K_un))
            return jnp.where(bc, v - g, F)

        def linearize(w):
            Cc = conv_planes(w)
            Jc = tuple(Mc[k] + f(0.5 * dt_) * (Kc[k] + Cc[k])
                       for k in range(len(OFFSETS)))
            dJinv = 1.0 / jnp.where(bc, 1.0, Jc[0])
            return pinned(lambda v: plane_mv(Jc, v)), dJinv

        def safe_div(num, den):
            ok = jnp.abs(den) > f(tiny)
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

        uk0 = jnp.where(bc, g, u)
        if freeze_jacobian:
            jmv_f, dJinv_f = linearize(uk0)

        def newton_body(_, nc):
            uk, F = nc
            if freeze_jacobian:
                jmv, dJinv = jmv_f, dJinv_f
            else:
                jmv, dJinv = linearize(uk)
            rhat = -F

            def bicg_body(_, c):
                bx, br, bp, rho = c
                phat = dJinv * bp
                v = jmv(phat)
                alpha = safe_div(rho, dot(rhat, v))
                s = br - alpha * v
                shat = dJinv * s
                t = jmv(shat)
                omega = safe_div(dot(t, s), dot(t, t))
                bx = bx + alpha * phat + omega * shat
                br = s - omega * t
                rho_new = dot(rhat, br)
                beta = safe_div(rho_new, rho) * safe_div(alpha, omega)
                bp = br + beta * (bp - omega * v)
                return (bx, br, bp, rho_new)

            bx = jax.lax.fori_loop(
                0, lin_iters, bicg_body,
                (jnp.zeros_like(F), -F, -F, dot(rhat, -F)))[0]
            uk = uk + bx
            return (uk, residual(uk))

        # outer Newton loop unrolled in Python (2-3 iterations): a
        # fori_loop HERE would nest around the BiCGStab fori_loop, and
        # nested loops are the documented compile-time pathology of the
        # remote Mosaic service (minutes -> tens of minutes)
        nc = (uk0, residual(uk0))
        for _ in range(newton_iters):
            nc = newton_body(0, nc)
        out_ref[:] = nc[0]

    kwargs = {}
    if not interpret:
        # the default 16 MB scoped-VMEM stack OOMs on this kernel's
        # intermediates (measured 44 MB for the quadrature section alone);
        # v5e has 128 MiB physical VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n1x, n1y), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=bool(interpret),
        **kwargs,
    )(u2, uo2, uoo2, g2, Mc2)
