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


def _make_shifts(n1x, n1y, row0=0, n_rows=None, n_cols=None):
    """Roll+mask neighbor access on (n1x, n1y) node-shaped arrays.

    Returns (shift, shift_fill, cellmask):
      shift(x, di, dj)[i, j] = x[i+di, j+dj], 0 out of bounds
      shift_fill(x, di, dj, fill) — same with ``fill`` out of bounds
      cellmask — 1.0 where (i, j) indexes a cell of the (nx, ny) cell
      grid, 0.0 on the padding row/col (i = nx or j = ny)
    All pure rolls + iota compares — no pad/concat, Mosaic-lowerable.

    Tiled view (ops/pallas_tiled.py): when the (n1x, n1y) buffer is a
    row-tile of a larger (n_rows, n1y) grid starting at global row
    ``row0`` (may be traced), out-of-bounds tests use GLOBAL row indices
    row0 + i against n_rows, so rolls that wrap within the tile are
    masked exactly where the GLOBAL neighbour does not exist. Wrapped
    in-tile garbage is confined to the outermost rows; callers size the
    tile halo >= the sweep's shift-chain depth so interior rows never
    consume it.
    """
    if n_rows is None:
        n_rows = n1x
    if n_cols is None:
        n_cols = n1y
    ii = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 0) + row0
    jj = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 1)

    def _roll(x, di, dj):
        if di:
            x = pltpu.roll(x, -di % n1x, 0)
        if dj:
            x = pltpu.roll(x, -dj % n1y, 1)
        return x

    def _inb(di, dj):
        m = (ii >= 0) & (ii < n_rows) & (jj < n_cols)
        if di:
            m &= (ii + di >= 0) & (ii + di < n_rows)
        if dj:
            m &= (jj + dj >= 0) & (jj + dj < n_cols)
        return m

    def shift(x, di, dj):
        return jnp.where(_inb(di, dj), _roll(x, di, dj), 0.0)

    def shift_fill(x, di, dj, fill):
        return jnp.where(_inb(di, dj), _roll(x, di, dj), fill)

    cellmask = (ii >= 0) & (ii < n_rows - 1) & (jj < n_cols - 1)
    return shift, shift_fill, cellmask


def _make_lib(n1x, n1y, dtype, *, dt, area, grads_c, phi_c, qw_c, gg_c, Q,
              tiny, fpx, fpy, row0=0, n_rows=None, n_cols=None):
    """Kernel-internal helper namespace shared by the single-kernel,
    split-kernel, and row-tiled variants (everything operates on traced
    node-shaped arrays; no refs). row0/n_rows: see _make_shifts — the
    buffer is a row-tile of an (n_rows, n_cols) grid starting at global
    row row0; bc/cell masks then use global row indices. n_cols < n1y
    marks the lane-padding columns (HBM slices need 128-multiple widths)
    invalid."""
    import types

    if n_rows is None:
        n_rows = n1x
    if n_cols is None:
        n_cols = n1y
    f = lambda c: jnp.asarray(c, dtype)
    ii = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 0) + row0
    jj = jax.lax.broadcasted_iota(jnp.int32, (n1x, n1y), 1)
    bc = (ii == 0) | (ii == n_rows - 1) | (jj == 0) | (jj == n_cols - 1)
    valid = (ii >= 0) & (ii < n_rows) & (jj < n_cols)
    shift, shift_fill, cellmask = _make_shifts(n1x, n1y, row0, n_rows,
                                               n_cols)
    cmf = jnp.where(cellmask, f(1.0), f(0.0))
    dot = lambda a, b: jnp.sum(a * b)

    def cells(v):
        return [tuple(shift(v, di, dj) * cmf for (di, dj) in CORNERS[t])
                for t in range(2)]

    def scatter(vals):
        out = None
        for t in range(2):
            for a, (di, dj) in enumerate(CORNERS[t]):
                c = shift(vals[t][a] * cmf, -di, -dj)
                out = c if out is None else out + c
        return out

    def patch_reduce(x, reducer, pad_val):
        acc = x
        for (di, dj) in OFFSETS[1:]:
            acc = reducer(acc, shift_fill(x, di, dj, f(pad_val)))
        return acc

    def plane_mv(coef, v):
        out = coef[0] * v
        for k, (di, dj) in enumerate(OFFSETS[1:], start=1):
            out = out + coef[k] * shift(v, di, dj)
        return out

    def to_planes(loc):
        coef = [jnp.zeros((n1x, n1y), dtype) for _ in OFFSETS]
        for t in range(2):
            cs = CORNERS[t]
            for a in range(3):
                dai, daj = cs[a]
                for b in range(3):
                    off = (cs[b][0] - dai, cs[b][1] - daj)
                    coef[_PLANE[off]] = coef[_PLANE[off]] + shift(
                        loc[t][a][b] * cmf, -dai, -daj)
        return tuple(coef)

    def pinned(op):
        def mv(x):
            x0 = jnp.where(bc, 0.0, x)
            return jnp.where(bc, x, op(x0))
        return mv

    def quad_vals(vc_t):
        return tuple(
            sum(f(phi_c[q, a]) * vc_t[a] for a in range(3))
            for q in range(Q))

    def cell_grad(vc_t, t):
        return tuple(
            sum(f(grads_c[t, a, d]) * vc_t[a] for a in range(3))
            for d in range(2))

    def nl_rhs(v):
        vc = cells(v)
        vals = []
        for t in range(2):
            u_q = quad_vals(vc[t])
            gu = cell_grad(vc[t], t)
            conv = tuple(
                fpx(u_q[q]) * gu[0] + fpy(u_q[q]) * gu[1]
                for q in range(Q))
            vals.append(tuple(
                f(2.0 * area) * sum(f(qw_c[q] * phi_c[q, a]) * conv[q]
                                    for q in range(Q))
                for a in range(3)))
        return scatter(vals)

    def keps_planes(e_cell):
        loc = [[[f(area * gg_c[t, a, b]) * e_cell[t]
                 for b in range(3)] for a in range(3)] for t in range(2)]
        return to_planes(loc)

    def conv_planes(w):
        wc = cells(w)
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
                    row.append(f(2.0 * area) * term)
                loc_t.append(row)
            loc.append(loc_t)
        return to_planes(loc)

    def safe_div(num, den):
        ok = jnp.abs(den) > f(tiny)
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    def cg_fixed(op, rhs, dMinv, iters):
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
        return jax.lax.fori_loop(
            0, iters, cg_body,
            (jnp.zeros_like(rhs), rhs, z0, dot(rhs, z0)))[0]

    def cheby_fixed(op, rhs, dMinv, iters, lmin, lmax):
        """Preconditioned Chebyshev semi-iteration: ZERO dot products —
        the fused step's ~50 sequential Krylov dot-reduction latencies
        were its measured binding resource (RESULTS.md); the three-term
        recurrence replaces every data-dependent step size with constants
        from eigenvalue bounds of the preconditioned operator (Wathen
        [1/2, 2] for Jacobi-preconditioned P1 mass; measured [0.52, 1.96]
        with |im| <= 0.1 for the CN Newton Jacobian)."""
        theta = 0.5 * (lmax + lmin)
        delta = 0.5 * (lmax - lmin)
        sigma1 = theta / delta

        def ch_body(_, c):
            x, r, d, rho = c
            x = x + d
            r = r - op(d)
            z = dMinv * r
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = f(rho_new) * rho * d + f(2.0 * rho_new / delta) * z
            return (x, r, d, rho_new)

        d0 = dMinv * rhs / f(theta)
        return jax.lax.fori_loop(
            0, iters, ch_body,
            (jnp.zeros_like(rhs), rhs, d0, jnp.full((), 1.0 / sigma1,
                                                    dtype)))[0]

    def bicgstab_fixed(jmv, dJinv, F, iters):
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

        return jax.lax.fori_loop(
            0, iters, bicg_body,
            (jnp.zeros_like(F), -F, -F, dot(rhat, -F)))[0]

    return types.SimpleNamespace(
        f=f, bc=bc, valid=valid, cmf=cmf, dot=dot, shift=shift,
        shift_fill=shift_fill,
        cells=cells, scatter=scatter, patch_reduce=patch_reduce,
        plane_mv=plane_mv, to_planes=to_planes, pinned=pinned,
        quad_vals=quad_vals, cell_grad=cell_grad, nl_rhs=nl_rhs,
        keps_planes=keps_planes, conv_planes=conv_planes,
        safe_div=safe_div, cg_fixed=cg_fixed, cheby_fixed=cheby_fixed,
        bicgstab_fixed=bicgstab_fixed)


def _statics(dtype, dt, area, h, grads, phi, qw):
    grads_c = np.asarray(grads, np.float64)
    phi_c = np.asarray(phi, np.float64)
    qw_c = np.asarray(qw, np.float64)
    gg_c = np.einsum("tad,tbd->tab", grads_c, grads_c)
    tiny = 1e-300 if dtype == jnp.float64 else 1e-30
    return dict(dt=float(dt), area=float(area), grads_c=grads_c,
                phi_c=phi_c, qw_c=qw_c, gg_c=gg_c, Q=phi_c.shape[0],
                tiny=tiny), float(h)


def _fp_components(fprime, fprime_xy):
    if fprime_xy is not None:
        return fprime_xy
    return (lambda v: fprime(v)[..., 0]), (lambda v: fprime(v)[..., 1])


def _compiler_params(interpret):
    if interpret:
        return {}
    # the default 16 MB scoped-VMEM stack OOMs on these kernels'
    # intermediates; v5e has 128 MiB physical VMEM
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2**20)}


def _step_body(L, u, uo, uoo, g, Mc, *, dt, h, Cvel, CRV, tiny,
               fprime_norm, cg_iters, newton_iters, lin_iters,
               freeze_jacobian, residual_scheme, stabilization,
               inner_solver="bicgstab", mass_bounds=(0.5, 2.0),
               lin_bounds=(0.4, 2.2), abs_term=None):
    """One stabilized time step on traced node-shaped arrays (shared by
    the single-, split-, and multi-step kernels).

    inner_solver="cheby" runs BOTH inner solves (residual-projection mass
    solve + Newton linear solves) as dot-free Chebyshev semi-iterations
    over mass_bounds / lin_bounds — no global reductions left in the
    solver chain (only the RV normalization's mean/max remain)."""
    f, bc = L.f, L.bc
    cheby = inner_solver == "cheby"

    # 1. residual projection
    if residual_scheme == "bdf1":
        du = (u - uo) / f(dt)
    else:
        du = (3.0 * u - 4.0 * uo + uoo) / f(2.0 * dt)
    rhs = jnp.where(bc, 0.0, L.plane_mv(Mc, du) + L.nl_rhs(u))
    dMinv = 1.0 / jnp.where(bc, 1.0, Mc[0])
    mass_op = L.pinned(lambda v: L.plane_mv(Mc, v))
    if cheby:
        RH = L.cheby_fixed(mass_op, rhs, dMinv, cg_iters, *mass_bounds)
    else:
        RH = L.cg_fixed(mass_op, rhs, dMinv, cg_iters)

    # 2. RV epsilon (cf. structured.rv_epsilon). abs_term is the one
    # GLOBAL reduction of the step; when the buffer is a deep-halo block
    # of a sharded grid (parallel/structured_fused_sharded.py) the caller
    # psums it outside and passes it in — everything else below is local.
    if stabilization == "rv":
        if abs_term is None:
            abs_term = jnp.abs(u - jnp.mean(u)).max()
        u_max = L.patch_reduce(u, jnp.maximum, -np.inf)
        u_min = L.patch_reduce(u, jnp.minimum, np.inf)
        n_i = jnp.abs((u_max - u_min) - abs_term)
        Rh_i = L.patch_reduce(jnp.abs(RH), jnp.maximum, -np.inf)
        beta = L.patch_reduce(fprime_norm(u), jnp.maximum, -np.inf)
        eps = jnp.minimum(
            f(Cvel * h) * beta,
            f(CRV * h * h) * jnp.abs(Rh_i / jnp.maximum(n_i, f(tiny))))
    else:  # gfem
        eps = jnp.zeros_like(u)
    ec = L.cells(eps)
    e_cell = [(ec[t][0] + ec[t][1] + ec[t][2]) / 3.0 for t in range(2)]

    # 3. Newton CN
    Kc = L.keps_planes(e_cell)
    N_un = L.nl_rhs(u)
    K_un = L.plane_mv(Kc, u)

    def residual(v):
        F = (L.plane_mv(Mc, v - u)
             + f(0.5 * dt) * (L.nl_rhs(v) + N_un)
             + f(0.5 * dt) * (L.plane_mv(Kc, v) + K_un))
        return jnp.where(bc, v - g, F)

    def linearize(w):
        Cc = L.conv_planes(w)
        Jc = tuple(Mc[k] + f(0.5 * dt) * (Kc[k] + Cc[k])
                   for k in range(len(OFFSETS)))
        dJinv = 1.0 / jnp.where(bc, 1.0, Jc[0])
        return L.pinned(lambda v: L.plane_mv(Jc, v)), dJinv

    uk = jnp.where(bc, g, u)
    F = residual(uk)
    if freeze_jacobian:
        jmv_f, dJinv_f = linearize(uk)
    # outer Newton loop unrolled in Python: a fori_loop here would nest
    # around the BiCGStab fori_loop — nested loops are the documented
    # compile-time pathology of the remote Mosaic service
    for _ in range(newton_iters):
        jmv, dJinv = (jmv_f, dJinv_f) if freeze_jacobian else linearize(uk)
        if cheby:
            uk = uk + L.cheby_fixed(jmv, -F, dJinv, lin_iters, *lin_bounds)
        else:
            uk = uk + L.bicgstab_fixed(jmv, dJinv, F, lin_iters)
        F = residual(uk)
    return uk


def fused_rv_step(u2, uo2, uoo2, g2, Mc2, *, nx, ny, dt, area, h, grads,
                  phi, qw, Cvel, CRV, fprime, fprime_norm, cg_iters,
                  newton_iters, lin_iters, freeze_jacobian,
                  residual_scheme="bdf2", stabilization="rv",
                  fprime_xy=None, interpret=None, n_substeps=1,
                  inner_solver="bicgstab", mass_bounds=(0.5, 2.0),
                  lin_bounds=(0.4, 2.2)):
    """``n_substeps`` full stabilized time steps in a SINGLE Pallas kernel.

    u2/uo2/uoo2: (n1x, n1y) solution history; g2: Dirichlet data field
    (must be time-independent when n_substeps > 1); Mc2: (7, n1x, n1y)
    mass stencil planes (sd.M_coef). The eps-stiffness and Newton-Jacobian
    stencil planes are built in-kernel once per step / linearization
    (in-kernel local_to_stencil), so every Krylov matvec is 7 shifted
    MACs. Semantics == ops/krylov.cg_fixed / bicgstab_fixed /
    ops/newton.newton_fixed (identity tests in tests/test_pallas_fused.py).

    Why multi-step: per-launch overhead on this runtime is ~0.3 ms while
    the in-kernel compute is tens of us at small meshes; unrolling K
    steps into one launch amortizes it. Returns the last three states
    (uh_K, uh_{K-1}, uh_{K-2}) so the caller can continue the history.
    VMEM ceiling ~270 KB per field (mesh <= 64 f32) — the live set does
    not grow with n_substeps; beyond the ceiling use fused_rv_step_split.
    """
    n1x, n1y = nx + 1, ny + 1
    if interpret is None:
        interpret = _interpret_default()
    dtype = u2.dtype
    st, h_ = _statics(dtype, dt, area, h, grads, phi, qw)
    fpx, fpy = _fp_components(fprime, fprime_xy)
    body_kw = dict(dt=st["dt"], h=h_, Cvel=Cvel, CRV=CRV, tiny=st["tiny"],
                   fprime_norm=fprime_norm, cg_iters=cg_iters,
                   newton_iters=newton_iters, lin_iters=lin_iters,
                   freeze_jacobian=freeze_jacobian,
                   residual_scheme=residual_scheme,
                   stabilization=stabilization,
                   inner_solver=inner_solver, mass_bounds=mass_bounds,
                   lin_bounds=lin_bounds)

    def kernel(u_ref, uo_ref, uoo_ref, g_ref, Mc_ref, o1, o2, o3):
        u, uo, uoo, g = u_ref[:], uo_ref[:], uoo_ref[:], g_ref[:]
        Mc = tuple(Mc_ref[k] for k in range(len(OFFSETS)))
        L = _make_lib(n1x, n1y, dtype, fpx=fpx, fpy=fpy, **st)
        for _ in range(n_substeps):
            uh = _step_body(L, u, uo, uoo, g, Mc, **body_kw)
            u, uo, uoo = uh, u, uo
        o1[:] = u
        o2[:] = uo
        o3[:] = uoo

    sds = jax.ShapeDtypeStruct((n1x, n1y), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=[sds, sds, sds],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        interpret=bool(interpret),
        **_compiler_params(interpret),
    )(u2, uo2, uoo2, g2, Mc2)


def required_halo(cg_iters, newton_iters, lin_iters):
    """Shift-chain depth of one _step_body step, in rows.

    Every stencil op (plane_mv, cells/scatter, patch_reduce, to_planes)
    moves information one row; a deep-halo block whose halo width covers
    the WHOLE step's chain can run the step locally with a single
    neighbour exchange per step (communication-avoiding — possible only
    because the Chebyshev inner solver is dot-free). Counted: rhs 2 +
    mass-cheby cg_iters + eps/Kc chain 4 + per-Newton (lin_iters cheby +
    conv_planes/residual 4) + slack 6 (audited against _step_body;
    the sharded identity tests fail loudly if ever undercounted)."""
    return cg_iters + newton_iters * (lin_iters + 4) + 12


def fused_rv_block_step(u2, uo2, uoo2, g2, Mc2, row0, abs_term, *,
                        n_rows, n_cols, dt, area, h, grads, phi, qw,
                        Cvel, CRV, fprime, fprime_norm, cg_iters,
                        newton_iters, lin_iters, freeze_jacobian,
                        residual_scheme="bdf2", stabilization="rv",
                        fprime_xy=None, interpret=None,
                        inner_solver="cheby", mass_bounds=(0.5, 2.0),
                        lin_bounds=(0.4, 2.2)):
    """``fused_rv_step`` on a deep-halo row BLOCK of a global
    (n_rows, n_cols) grid — the per-device kernel of the sharded fused
    path (parallel/structured_fused_sharded.py).

    u2/uo2/uoo2/g2: (B, n1y) block = owned rows plus >= required_halo()
    halo rows each side (garbage decays one row per stencil op; the
    caller slices the owned rows off the result). Mc2: (7, B, n1y)
    stencil planes for the same rows. row0: () int32 traced — GLOBAL row
    index of block row 0 (negative above the grid top); bc/cell masks
    use global indices via _make_lib(row0=...). abs_term: () traced —
    the step's single global RV reduction, psum'd by the caller.

    cheby-only: a CG/BiCGStab inner solve takes block-local dots, which
    diverge from the global solve; Chebyshev's three-term recurrence is
    reduction-free, so the block run is EXACTLY the global algorithm
    restricted to the block (identity-tested vs fused_rv_step).
    """
    if inner_solver != "cheby":
        raise NotImplementedError(
            "fused_rv_block_step is communication-avoiding by "
            "construction: CG/BiCGStab dots would need a psum per "
            "iteration inside the kernel — use inner_solver='cheby' "
            "(HyperbolicConfig.inner_solver)")
    B, n1y = u2.shape
    if interpret is None:
        interpret = _interpret_default()
    dtype = u2.dtype
    st, h_ = _statics(dtype, dt, area, h, grads, phi, qw)
    fpx, fpy = _fp_components(fprime, fprime_xy)
    body_kw = dict(dt=st["dt"], h=h_, Cvel=Cvel, CRV=CRV, tiny=st["tiny"],
                   fprime_norm=fprime_norm, cg_iters=cg_iters,
                   newton_iters=newton_iters, lin_iters=lin_iters,
                   freeze_jacobian=freeze_jacobian,
                   residual_scheme=residual_scheme,
                   stabilization=stabilization,
                   inner_solver=inner_solver, mass_bounds=mass_bounds,
                   lin_bounds=lin_bounds)

    def kernel(row0_ref, abs_ref, u_ref, uo_ref, uoo_ref, g_ref, Mc_ref,
               o1):
        u, uo, uoo, g = u_ref[:], uo_ref[:], uoo_ref[:], g_ref[:]
        Mc = tuple(Mc_ref[k] for k in range(len(OFFSETS)))
        L = _make_lib(B, n1y, dtype, fpx=fpx, fpy=fpy,
                      row0=row0_ref[0], n_rows=n_rows, n_cols=n_cols,
                      **st)
        o1[:] = _step_body(L, u, uo, uoo, g, Mc,
                           abs_term=abs_ref[0], **body_kw)

    sds = jax.ShapeDtypeStruct((B, n1y), dtype)
    return pl.pallas_call(
        kernel,
        out_shape=[sds],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        interpret=bool(interpret),
        **_compiler_params(interpret),
    )(jnp.asarray(row0, jnp.int32).reshape(1),
      jnp.asarray(abs_term, dtype).reshape(1),
      u2, uo2, uoo2, g2, Mc2)[0]


def fused_rv_step_split(u2, uo2, uoo2, g2, Mc2, *, nx, ny, dt, area, h,
                        grads, phi, qw, Cvel, CRV, fprime, fprime_norm,
                        cg_iters, newton_iters, lin_iters, freeze_jacobian,
                        residual_scheme="bdf2", stabilization="rv",
                        fprime_xy=None, interpret=None,
                        inner_solver="bicgstab", mass_bounds=(0.5, 2.0),
                        lin_bounds=(0.4, 2.2)):
    """The same step as ``fused_rv_step`` in 1 + newton_iters Pallas
    launches: a setup kernel (CG residual projection, RV epsilon,
    eps-stiffness planes, frozen terms) and one kernel per Newton
    iteration (linearize + fixed-iteration BiCGStab + new residual).
    Each kernel's live set fits the VMEM the single kernel exceeds at
    mesh 128 f32 (measured 162.7 MB of 128 MiB), at the cost of
    newton_iters extra launch overheads per step."""
    n1x, n1y = nx + 1, ny + 1
    if interpret is None:
        interpret = _interpret_default()
    dtype = u2.dtype
    st, h_ = _statics(dtype, dt, area, h, grads, phi, qw)
    fpx, fpy = _fp_components(fprime, fprime_xy)
    dt_, tiny = st["dt"], st["tiny"]
    nP = len(OFFSETS)
    cp = _compiler_params(interpret)

    def setup_kernel(u_ref, uo_ref, uoo_ref, g_ref, Mc_ref,
                     Kc_ref, aux_ref, uk_ref, F_ref):
        u, uo, uoo, g = u_ref[:], uo_ref[:], uoo_ref[:], g_ref[:]
        Mc = tuple(Mc_ref[k] for k in range(nP))
        L = _make_lib(n1x, n1y, dtype, fpx=fpx, fpy=fpy, **st)
        f, bc = L.f, L.bc

        if residual_scheme == "bdf1":
            du = (u - uo) / f(dt_)
        else:
            du = (3.0 * u - 4.0 * uo + uoo) / f(2.0 * dt_)
        rhs = jnp.where(bc, 0.0, L.plane_mv(Mc, du) + L.nl_rhs(u))
        dMinv = 1.0 / jnp.where(bc, 1.0, Mc[0])
        mass_op = L.pinned(lambda v: L.plane_mv(Mc, v))
        if inner_solver == "cheby":
            RH = L.cheby_fixed(mass_op, rhs, dMinv, cg_iters, *mass_bounds)
        else:
            RH = L.cg_fixed(mass_op, rhs, dMinv, cg_iters)

        if stabilization == "rv":
            abs_term = jnp.abs(u - jnp.mean(u)).max()
            u_max = L.patch_reduce(u, jnp.maximum, -np.inf)
            u_min = L.patch_reduce(u, jnp.minimum, np.inf)
            n_i = jnp.abs((u_max - u_min) - abs_term)
            Rh_i = L.patch_reduce(jnp.abs(RH), jnp.maximum, -np.inf)
            beta = L.patch_reduce(fprime_norm(u), jnp.maximum, -np.inf)
            eps = jnp.minimum(
                f(Cvel * h_) * beta,
                f(CRV * h_ * h_) * jnp.abs(Rh_i / jnp.maximum(n_i, f(tiny))))
        else:
            eps = jnp.zeros_like(u)
        ec = L.cells(eps)
        e_cell = [(ec[t][0] + ec[t][1] + ec[t][2]) / 3.0 for t in range(2)]

        Kc = L.keps_planes(e_cell)
        N_un = L.nl_rhs(u)
        K_un = L.plane_mv(Kc, u)
        uk0 = jnp.where(bc, g, u)
        F0 = (L.plane_mv(Mc, uk0 - u)
              + f(0.5 * dt_) * (L.nl_rhs(uk0) + N_un)
              + f(0.5 * dt_) * (L.plane_mv(Kc, uk0) + K_un))
        F0 = jnp.where(bc, uk0 - g, F0)
        for k in range(nP):
            Kc_ref[k] = Kc[k]
        aux_ref[0] = N_un
        aux_ref[1] = K_un
        uk_ref[:] = uk0
        F_ref[:] = F0

    def newton_kernel(uk_ref, F_ref, u_ref, g_ref, Mc_ref, Kc_ref,
                      aux_ref, w_ref, uk_out, F_out):
        uk, F, u, g = uk_ref[:], F_ref[:], u_ref[:], g_ref[:]
        Mc = tuple(Mc_ref[k] for k in range(nP))
        Kc = tuple(Kc_ref[k] for k in range(nP))
        N_un, K_un = aux_ref[0], aux_ref[1]
        w = w_ref[:]                 # linearization point
        L = _make_lib(n1x, n1y, dtype, fpx=fpx, fpy=fpy, **st)
        f, bc = L.f, L.bc

        Cc = L.conv_planes(w)
        Jc = tuple(Mc[k] + f(0.5 * dt_) * (Kc[k] + Cc[k])
                   for k in range(nP))
        dJinv = 1.0 / jnp.where(bc, 1.0, Jc[0])
        jmv = L.pinned(lambda v: L.plane_mv(Jc, v))
        if inner_solver == "cheby":
            uk = uk + L.cheby_fixed(jmv, -F, dJinv, lin_iters, *lin_bounds)
        else:
            uk = uk + L.bicgstab_fixed(jmv, dJinv, F, lin_iters)
        Fn = (L.plane_mv(Mc, uk - u)
              + f(0.5 * dt_) * (L.nl_rhs(uk) + N_un)
              + f(0.5 * dt_) * (L.plane_mv(Kc, uk) + K_un))
        uk_out[:] = uk
        F_out[:] = jnp.where(bc, uk - g, Fn)

    sds = jax.ShapeDtypeStruct
    Kc2, aux2, uk, F = pl.pallas_call(
        setup_kernel,
        out_shape=[sds((nP, n1x, n1y), dtype), sds((2, n1x, n1y), dtype),
                   sds((n1x, n1y), dtype), sds((n1x, n1y), dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        interpret=bool(interpret), **cp,
    )(u2, uo2, uoo2, g2, Mc2)

    newton_call = pl.pallas_call(
        newton_kernel,
        out_shape=[sds((n1x, n1y), dtype), sds((n1x, n1y), dtype)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=bool(interpret), **cp,
    )
    w_frozen = uk
    for _ in range(newton_iters):
        w = w_frozen if freeze_jacobian else uk
        uk, F = newton_call(uk, F, u2, g2, Mc2, Kc2, aux2, w)
    return uk
