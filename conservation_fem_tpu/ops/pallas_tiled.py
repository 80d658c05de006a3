"""HBM-resident row-tiled fused whole-step kernel (mesh sizes past VMEM).

The single fused kernel (ops/pallas_fused.py) keeps every field in VMEM
and dies at mesh 128 f32 (162.7 MB live set vs 128 MiB physical VMEM);
the split kernel stretches to 128 and everything larger fell back to
composed XLA at ~50 separate launches x ~290 us per-launch overhead of
the axon runtime (the measured binding resource, scripts/roofline.py).

This kernel runs the SAME stabilized step (BDF2/BDF1 residual projection,
RV epsilon, stabilized CN Newton — semantics of pallas_fused._step_body
with inner_solver="cheby") in ONE Pallas launch at ANY mesh size: every
field lives in HBM (pl.ANY refs), and the step executes as a sequence of
~50 row-tile SWEEPS — each sweep DMAs a (T + 2H)-row tile of its operands
into VMEM scratch, computes, and DMAs the T interior rows back. Tile
geometry:

  * HBM buffers carry pad rows (zeroed, masked invalid) so every tile DMA
    is a uniform static-size slice — no clamping anywhere.
  * In-tile neighbour access reuses pallas_fused._make_shifts with a
    GLOBAL row offset (row0 = t*T - H): rolls that wrap inside the tile
    are masked wherever the global neighbour does not exist, and the halo
    H = 3 >= every sweep's shift-chain depth, so wrapped garbage never
    reaches an interior row (see _make_shifts docstring).
  * Sweeps are sequential (single instruction stream, DMAs waited), so a
    sweep may read any previous sweep's output with halo; within a sweep
    only the Chebyshev direction d is read with halo while being
    rewritten, so d ping-pongs between two HBM buffers.

Inner solves: the dot-free Chebyshev semi-iteration (cf.
krylov.chebyshev_fixed) — one sweep per iteration, no reductions — or,
since round 5, Jacobi-PCG (mass projection) + BiCGStab (Newton solves)
whose global inner products are accumulated tile-by-tile into SMEM
scalars across the sequential fori_loop sweeps (2 sweeps per CG
iteration, 3 per BiCGStab iteration; exact twins of krylov.cg_fixed /
bicgstab_fixed incl. breakdown guards, tested at 2e-15). This closes the
r4 accuracy-gate failure at mesh 256: the dot-free Chebyshev config the
one-pass sweep required was the diagnosed cause (L2rel 1.564e-2 vs gate
1e-2, reproduced bit-for-bit on CPU), while BiCGStab configs pass at
every mesh. The two global scalars the RV epsilon needs (mean(u),
max|u - mean|) ride the same SMEM mechanism (sequential execution makes
it race-free).

Identity with the XLA fixed-iteration cheby step is tested in interpret
mode (tests/test_pallas_tiled.py); bench.py gates the compiled kernel's
accuracy against the f64 anchor on-chip.

ref workload: Code/KPP/KPP_NodeRV.py:127-172 (the step being fused);
there is no reference analog of the kernel itself — the reference's
PETSc stack launches hundreds of host-driven kernels per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conservation_fem_tpu.ops.pallas_fused import (
    _fp_components,
    _interpret_default,
    _make_lib,
    _statics,
)
from conservation_fem_tpu.ops.structured import OFFSETS

# halo rows: must cover the deepest shift chain of any sweep (3) AND be a
# multiple of 8 so every HBM tile slice's dim-0 offset/size stays aligned
# to the (8, 128) tiling ("Slice shape along dimension 0 must be aligned
# to tiling (8)" is a hard Mosaic error otherwise)
_H = 8
_NP = len(OFFSETS)


def _cheby_schedule(iters, lmin, lmax):
    """Python-time Chebyshev recurrence scalars (theta, [(c1, c2)]) —
    the same recurrence as krylov.chebyshev_fixed, unrolled to floats."""
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rho = 1.0 / sigma1
    cs = []
    for _ in range(iters):
        rho_new = 1.0 / (2.0 * sigma1 - rho)
        cs.append((rho_new * rho, 2.0 * rho_new / delta))
        rho = rho_new
    return theta, cs


def default_tile_rows(n1x, n1y, itemsize, vmem_budget=24 * 2**20,
                      align=8):
    """Row tile for the sweep buffers: fits the VMEM scratch pool
    (3 plane-slab equivalents + 8 field slots = 29 tile buffers; the
    bf16-plane variant swaps the f32 Jc slab for two half-size bf16
    slabs — same total) AND stays small — measured: T=512 tiles at mesh
    128 made Mosaic's register allocator spill 95 MB of VMEM (OOM) and
    compile for ~16 min, while T<=128 compiles in ~2 min with no spills.
    The halo overhead at T=128 is 2H/T = 12.5% extra DMA — negligible
    against those failure modes.

    The 24 MB budget is calibrated to Mosaic's TOTAL scoped-VMEM stack,
    which measures ~3.1x the declared scratch pool (kernel temporaries
    scale with tile size): the mesh-512 sweep (Yp=2176, T=128 -> 36.3 MB
    scratch) OOMed the 100 MB scoped limit at 113.51M, so wide grids now
    pick T with scratch <= 24 MB (est. total <= ~80M at the measured
    ratio). Meshes <= 256 still saturate the T=128 cap — only lane
    widths past ~1550 shrink. Override with CFT_TILE_ROWS."""
    import os

    env = os.environ.get("CFT_TILE_ROWS")
    if env:
        return max(align, (int(env) // align) * align)
    n_bufs = 3 * _NP + 8
    t = int(vmem_budget // (n_bufs * n1y * itemsize)) - 2 * max(align, _H)
    t = max(align, min(t, n1x, 128))
    return max(align, (t // align) * align)


def tiled_rv_step(u2, uo2, uoo2, g2, Mc2, *, nx, ny, dt, area, h, grads,
                  phi, qw, Cvel, CRV, fprime, fprime_norm, cg_iters,
                  newton_iters, lin_iters, freeze_jacobian,
                  residual_scheme="bdf2", stabilization="rv",
                  fprime_xy=None, interpret=None, tile_rows=None,
                  mass_bounds=(0.5, 2.0), lin_bounds=(0.4, 2.2),
                  inner_solver="cheby", row0_base=None, n_rows=None,
                  abs_term=None, bf16_planes=False):
    """One stabilized time step, HBM-resident, ONE Pallas launch.

    Arguments mirror pallas_fused.fused_rv_step; the inner solver is
    always the dot-free Chebyshev semi-iteration (mass_bounds /
    lin_bounds — see HyperbolicConfig.cheby_*_bounds). Returns uh
    (n1x, n1y).

    Block mode (row0_base is not None): the input is a DEEP-HALO row
    block of a global (n_rows, n1y) grid starting at global row
    row0_base (traced; negative above the grid top) — the HBM-scale
    per-device kernel of parallel/structured_fused_sharded.py, for
    blocks too large for the VMEM-resident fused_rv_block_step. The
    step's single global RV reduction must then be hoisted by the caller
    and passed as abs_term (traced scalar); everything else is local, so
    owned rows come out exactly equal to the global algorithm's as long
    as the halo covers pallas_fused.required_halo() rows. Returns the
    whole block (caller slices its owned rows).

    bf16_planes (f32 inputs only; silent no-op at f64, matching
    blocked.sweep_form): stream the operator planes of the two Chebyshev
    solve families as bfloat16 HBM copies — the mass planes as a
    once-per-step cast input, the CN Jacobian planes written bf16
    directly by the linearize sweep (the f32 Jc buffer is then never
    materialized). Planes are upcast to f32 in-register for the VPU
    multiply-adds. Every residual/F evaluation (rhs, RV projection
    source, Newton F) keeps full-f32 planes, so the bf16 rounding is an
    INEXACT-SOLVER perturbation only: the Newton/defect-correction fixed
    point is unchanged, convergence shifts at ~bf16 eps. Cuts the
    dominant per-Chebyshev-iteration HBM stream (7 planes vs 4 fields)
    in half. Geometry cost: bf16 HBM tile slices must align to the
    (16, 128) bf16 tiling, so the halo doubles to 16 rows and tile rows
    round to multiples of 16 (2H/T = 25% extra load DMA at T=128).
    """
    if inner_solver not in ("cheby", "bicgstab"):
        raise NotImplementedError(
            "tiled_rv_step inner_solver must be 'cheby' or 'bicgstab'")
    use_bicg = inner_solver == "bicgstab"
    if use_bicg and row0_base is not None:
        raise NotImplementedError(
            "block mode hoists its global reductions outside the kernel; "
            "the in-kernel BiCGStab dots are single-device only — use "
            "inner_solver='cheby' for the sharded block path")
    n1x, n1y = nx + 1, ny + 1
    external = row0_base is not None
    if external and stabilization == "rv" and abs_term is None:
        raise ValueError("block mode needs the hoisted abs_term scalar")
    n_rows_g = n1x if n_rows is None else int(n_rows)
    if interpret is None:
        interpret = _interpret_default()
    dtype = u2.dtype
    use_bf16 = bool(bf16_planes) and dtype == jnp.float32
    align = 16 if use_bf16 else 8
    H = 16 if use_bf16 else _H
    if tile_rows is None:
        tile_rows = default_tile_rows(n1x, n1y, u2.dtype.itemsize,
                                      align=align)
    T = max(align, (int(tile_rows) // align) * align)
    tiles = -(-n1x // T)
    T2 = T + 2 * H
    R = tiles * T + 2 * H
    # lane padding: HBM tile slices require 128-multiple widths ("Slice
    # shape along dimension 1 must be aligned to tiling (128)"); columns
    # [n1y, Yp) are masked invalid everywhere (n_cols in _make_lib)
    Yp = -(-n1y // 128) * 128

    st, h_ = _statics(dtype, dt, area, h, grads, phi, qw)
    fpx, fpy = _fp_components(fprime, fprime_xy)
    dt_, tiny = st["dt"], st["tiny"]
    th_m, cs_m = _cheby_schedule(cg_iters, *mass_bounds)
    th_l, cs_l = _cheby_schedule(lin_iters, *lin_bounds)
    n_nodes = float(n1x * n1y)

    def padrows(a):
        return jnp.pad(a, ((H, R - H - n1x), (0, Yp - n1y)))

    def padrows3(a):
        return jnp.pad(a, ((0, 0), (H, R - H - n1x), (0, Yp - n1y)))

    def kernel(*refs):
        if external:
            (u_h, uo_h, uoo_h, g_h, Mc_h, r0_h, ab_h, *rest) = refs
        else:
            (u_h, uo_h, uoo_h, g_h, Mc_h, *rest) = refs
            r0_h = ab_h = None
        if use_bf16:
            # the f32 Jc HBM buffer and VMEM slab are never materialized;
            # Jc lives only as the bf16 stream (Jc16_h / slab C16), and
            # the mass planes additionally stream from the bf16 cast
            # input Mc16_h via slab A16
            (Mc16_h, uk_h, cx_h, cr_h, cd0_h, cd1_h, eps_h, dJ_h, Nun_h,
             Kun_h, F_h, uk2_h, Kc_h, Jc16_h, *rest2) = rest
            Jc_h = C = None
        else:
            (uk_h, cx_h, cr_h, cd0_h, cd1_h, eps_h, dJ_h, Nun_h, Kun_h,
             F_h, uk2_h, Kc_h, Jc_h, *rest2) = rest
            Mc16_h = Jc16_h = A16 = C16 = None
        if use_bicg:
            (s_h, t_h, p2_h, v2_h, *rest2) = rest2
        else:
            s_h = t_h = p2_h = v2_h = None
        if use_bf16:
            (A, B, A16, C16, V, sems, sm) = rest2
        else:
            (A, B, C, V, sems, sm) = rest2
        f = lambda c: jnp.asarray(c, dtype)
        stiny = f(1e-30 if dtype == jnp.float32 else 1e-300)

        def sdiv(num, den):
            """bicgstab_fixed.safe_div twin (breakdown-safe scalars)."""
            ok = jnp.abs(den) > stiny
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

        def tdot(L, a, b):
            """Per-tile masked partial dot: interior rows & valid region
            only — the global dot is the SMEM accumulation over the
            sequential tile sweeps (this kernel's whole reason the
            r4 gate failure existed: the one-pass sweep could not do
            this; accumulating in SMEM across the fori_loop can)."""
            li = jax.lax.broadcasted_iota(jnp.int32, (T2, Yp), 0)
            interior = (li >= H) & (li < H + T)
            return jnp.sum(jnp.where(L.valid & interior, a * b, 0.0))
        # solver-plane rounding: 1/diag preconditioners are computed from
        # the SAME bf16-rounded diagonal the sweeps stream, so the
        # Chebyshev polynomial sees one consistent operator
        rnd = ((lambda v: v.astype(jnp.bfloat16).astype(dtype))
               if use_bf16 else (lambda v: v))

        # --- DMA helpers: start all, wait all (overlaps latency) --------
        def load(t, pairs):
            """pairs: (hbm_field_ref | (hbm_plane_ref, slab), vmem_dst)."""
            cps = []
            for i, (src, dst) in enumerate(pairs):
                cp = pltpu.make_async_copy(src, dst, sems.at[i])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()

        def rows(hbm, t):
            return hbm.at[pl.ds(t * T, T2)]

        def planes(hbm, t):
            return hbm.at[:, pl.ds(t * T, T2)]

        def store(t, pairs, plane_pairs=()):
            """pairs: (V_slot, hbm_field_ref); plane_pairs:
            (plane_slab, hbm_plane_ref). Interior T rows only."""
            cps = []
            i = 12
            for slot, hbm in pairs:
                cp = pltpu.make_async_copy(
                    V.at[slot, pl.ds(H, T)],
                    hbm.at[pl.ds(t * T + H, T)], sems.at[i])
                cp.start()
                cps.append(cp)
                i += 1
            for slab, hbm in plane_pairs:
                cp = pltpu.make_async_copy(
                    slab.at[:, pl.ds(H, T)],
                    hbm.at[:, pl.ds(t * T + H, T)], sems.at[i])
                cp.start()
                cps.append(cp)
                i += 1
            for cp in cps:
                cp.wait()

        def lib_for(t):
            row0 = t * T - H + (r0_h[0] if external else 0)
            return _make_lib(T2, Yp, dtype, fpx=fpx, fpy=fpy,
                             row0=row0, n_rows=n_rows_g, n_cols=n1y, **st)

        # --- sweep 1: residual-projection rhs + Chebyshev init ----------
        def s1_body(t, _):
            L = lib_for(t)
            load(t, [(rows(u_h, t), V.at[0]), (rows(uo_h, t), V.at[1]),
                     (rows(uoo_h, t), V.at[2]), (planes(Mc_h, t), A)])
            u, uo, uoo = V[0], V[1], V[2]
            Mc = tuple(A[k] for k in range(_NP))
            if residual_scheme == "bdf1":
                du = (u - uo) / f(dt_)
            else:
                du = (3.0 * u - 4.0 * uo + uoo) / f(2.0 * dt_)
            rhs = jnp.where(L.bc, 0.0, L.plane_mv(Mc, du) + L.nl_rhs(u))
            dMinv = 1.0 / jnp.where(L.bc | ~L.valid, 1.0, rnd(Mc[0]))
            V[3] = rhs                                  # cr
            V[4] = jnp.zeros_like(rhs)                  # cx
            if use_bicg:
                V[5] = dMinv * rhs                      # p0 = z0 (PCG)
                sm[2] += tdot(L, rhs, V[5])             # rz0
            else:
                V[5] = dMinv * rhs / f(th_m)            # cd (Chebyshev)
            # interior rows only — the halo rows belong to the
            # neighbouring tiles' accumulation
            if not external:
                li = jax.lax.broadcasted_iota(jnp.int32, (T2, Yp), 0)
                interior = (li >= H) & (li < H + T)
                sm[0] += jnp.sum(jnp.where(L.valid & interior, u, 0.0))
            store(t, [(3, cr_h), (4, cx_h), (5, cd0_h)])
            return 0

        sm[0] = jnp.zeros((), dtype)
        sm[1] = jnp.zeros((), dtype)
        sm[2] = jnp.zeros((), dtype)
        jax.lax.fori_loop(0, tiles, s1_body, 0)

        def mass_planes_pair(t):
            return ((planes(Mc16_h, t), A16) if use_bf16
                    else (planes(Mc_h, t), A))

        def mass_from_slab():
            src = A16 if use_bf16 else A
            return tuple(src[j].astype(dtype) for j in range(_NP))

        if use_bicg:
            # --- mass solve: Jacobi-PCG, 2 sweeps per iteration ----------
            # (mirrors krylov.cg_fixed: same guards, same update order;
            # dots are SMEM accumulations across the sequential tile
            # sweeps). State: x=cx, r=cr, q=cd1; p PING-PONGS between
            # cd0_h and eps_h (free until s3): the p-update sweep
            # halo-reads p_old while rewriting p — in place, tile t+1's
            # upper halo would see tile t's already-updated rows (the
            # update_sweep hazard).
            rz = sm[2]
            beta = f(0.0)
            cur_p, alt_p = cd0_h, eps_h
            for k in range(cg_iters):
                first = k == 0
                sm[3] = jnp.zeros((), dtype)
                p_in, p_out = cur_p, (cur_p if first else alt_p)

                def mA_body(t, _, first=first, beta=beta, p_in=p_in,
                            p_out=p_out):
                    L = lib_for(t)
                    pairs = [mass_planes_pair(t), (rows(p_in, t), V.at[0]),
                             (rows(cr_h, t), V.at[1])]
                    if first and not external:
                        pairs.append((rows(u_h, t), V.at[2]))
                    load(t, pairs)
                    Mc = mass_from_slab()
                    dMinv = 1.0 / jnp.where(L.bc | ~L.valid, 1.0, Mc[0])
                    p = V[0]
                    if not first:
                        p = dMinv * V[1] + beta * p     # p = z + beta p
                    q = L.pinned(lambda v: L.plane_mv(Mc, v))(p)
                    sm[3] += tdot(L, p, q)
                    if first and not external:
                        mean = sm[0] / f(n_nodes)
                        dev = jnp.where(L.valid, jnp.abs(V[2] - mean), 0.0)
                        sm[1] = jnp.maximum(sm[1], jnp.max(dev))
                    V[0] = p
                    V[3] = q
                    outs = [(3, cd1_h)]
                    if not first:
                        outs.append((0, p_out))
                    store(t, outs)
                    return 0

                jax.lax.fori_loop(0, tiles, mA_body, 0)
                if not first:
                    cur_p, alt_p = p_out, cur_p
                pAp = sm[3]
                alpha = rz / jnp.where(jnp.abs(pAp) > 0, pAp, stiny)
                alpha = jnp.where(rz > 0, alpha, 0.0)
                sm[4] = jnp.zeros((), dtype)

                def mB_body(t, _, alpha=alpha, cur_p=cur_p):
                    L = lib_for(t)
                    load(t, [mass_planes_pair(t), (rows(cx_h, t), V.at[0]),
                             (rows(cr_h, t), V.at[1]),
                             (rows(cur_p, t), V.at[2]),
                             (rows(cd1_h, t), V.at[3])])
                    Mc = mass_from_slab()
                    dMinv = 1.0 / jnp.where(L.bc | ~L.valid, 1.0, Mc[0])
                    x = V[0] + alpha * V[2]
                    r = V[1] - alpha * V[3]
                    sm[4] += tdot(L, r, dMinv * r)
                    V[0] = x
                    V[1] = r
                    store(t, [(0, cx_h), (1, cr_h)])
                    return 0

                jax.lax.fori_loop(0, tiles, mB_body, 0)
                rz_new = sm[4]
                beta = rz_new / jnp.where(rz > 0, rz, stiny)
                rz = rz_new
        else:
            # --- sweeps: mass Chebyshev (cg_iters) -----------------------
            for k, (c1, c2) in enumerate(cs_m):
                cd_in = cd0_h if k % 2 == 0 else cd1_h
                cd_out = cd1_h if k % 2 == 0 else cd0_h
                first = k == 0

                def s2_body(t, _, c1=c1, c2=c2, cd_in=cd_in, cd_out=cd_out,
                            first=first):
                    L = lib_for(t)
                    pairs = [mass_planes_pair(t), (rows(cd_in, t), V.at[0]),
                             (rows(cr_h, t), V.at[1]),
                             (rows(cx_h, t), V.at[2])]
                    if first:
                        pairs.append((rows(u_h, t), V.at[3]))
                    load(t, pairs)
                    Mc = mass_from_slab()
                    d, r, x = V[0], V[1], V[2]
                    dMinv = 1.0 / jnp.where(L.bc | ~L.valid, 1.0, Mc[0])
                    op = L.pinned(lambda v: L.plane_mv(Mc, v))
                    x = x + d
                    r = r - op(d)
                    dn = f(c1) * d + f(c2) * (dMinv * r)
                    if first and not external:
                        mean = sm[0] / f(n_nodes)
                        dev = jnp.where(L.valid, jnp.abs(V[3] - mean), 0.0)
                        sm[1] = jnp.maximum(sm[1], jnp.max(dev))
                    V[1] = r
                    V[2] = x
                    V[0] = dn
                    store(t, [(1, cr_h), (2, cx_h), (0, cd_out)])
                    return 0

                jax.lax.fori_loop(0, tiles, s2_body, 0)

        # --- sweep: RV epsilon (cx holds RH) -----------------------------
        if stabilization == "rv":
            def s3_body(t, _):
                L = lib_for(t)
                load(t, [(rows(u_h, t), V.at[0]), (rows(cx_h, t), V.at[1])])
                u, RH = V[0], V[1]
                abs_t = ab_h[0] if external else sm[1]
                u_max = L.patch_reduce(u, jnp.maximum, -np.inf)
                u_min = L.patch_reduce(u, jnp.minimum, np.inf)
                n_i = jnp.abs((u_max - u_min) - abs_t)
                Rh_i = L.patch_reduce(jnp.abs(RH), jnp.maximum, -np.inf)
                beta = L.patch_reduce(fprime_norm(u), jnp.maximum, -np.inf)
                eps = jnp.minimum(
                    f(Cvel * h_) * beta,
                    f(CRV * h_ * h_)
                    * jnp.abs(Rh_i / jnp.maximum(n_i, f(tiny))))
                V[2] = eps
                store(t, [(2, eps_h)])
                return 0

            jax.lax.fori_loop(0, tiles, s3_body, 0)

        # --- sweep: eps-stiffness planes + frozen terms + uk0/F0 ---------
        def s4_body(t, _):
            L = lib_for(t)
            pairs = [(rows(u_h, t), V.at[0]), (rows(g_h, t), V.at[1]),
                     (planes(Mc_h, t), A)]
            if stabilization == "rv":
                pairs.append((rows(eps_h, t), V.at[2]))
            load(t, pairs)
            u, g = V[0], V[1]
            Mc = tuple(A[k] for k in range(_NP))
            if stabilization == "rv":
                ec = L.cells(V[2])
                e_cell = [(ec[s][0] + ec[s][1] + ec[s][2]) / 3.0
                          for s in range(2)]
                Kc = L.keps_planes(e_cell)
            else:
                Kc = tuple(jnp.zeros((T2, Yp), dtype) for _ in range(_NP))
            N_un = L.nl_rhs(u)
            K_un = L.plane_mv(Kc, u)
            uk0 = jnp.where(L.bc, g, u)
            F0 = (L.plane_mv(Mc, uk0 - u)
                  + f(0.5 * dt_) * (L.nl_rhs(uk0) + N_un)
                  + f(0.5 * dt_) * (L.plane_mv(Kc, uk0) + K_un))
            F0 = jnp.where(L.bc, uk0 - g, F0)
            for k in range(_NP):
                B[k] = Kc[k]
            V[3] = N_un
            V[4] = K_un
            V[5] = uk0
            V[6] = F0
            store(t, [(3, Nun_h), (4, Kun_h), (5, uk_h), (6, F_h)],
                  plane_pairs=[(B, Kc_h)])
            return 0

        jax.lax.fori_loop(0, tiles, s4_body, 0)

        # --- Newton sweeps ----------------------------------------------
        def linearize_sweep(uk_cur):
            """Jc = Mc + dt/2 (Kc + conv_planes(uk)) + Chebyshev init."""
            def s5_body(t, _):
                L = lib_for(t)
                load(t, [(rows(uk_cur, t), V.at[0]), (planes(Mc_h, t), A),
                         (planes(Kc_h, t), B), (rows(F_h, t), V.at[1])])
                w, F = V[0], V[1]
                Mc = tuple(A[k] for k in range(_NP))
                Kc = tuple(B[k] for k in range(_NP))
                Cc = L.conv_planes(w)
                Jc = tuple(Mc[k] + f(0.5 * dt_) * (Kc[k] + Cc[k])
                           for k in range(_NP))
                dJinv = 1.0 / jnp.where(L.bc | ~L.valid, 1.0, rnd(Jc[0]))
                if use_bf16:
                    for k in range(_NP):
                        C16[k] = Jc[k].astype(jnp.bfloat16)
                    jc_pair = (C16, Jc16_h)
                else:
                    for k in range(_NP):
                        C[k] = Jc[k]
                    jc_pair = (C, Jc_h)
                V[2] = dJinv
                V[3] = -F                                   # cr
                V[4] = jnp.zeros_like(F)                    # cx
                if use_bicg:
                    V[5] = -F                               # p0 = rhat = r0
                    sm[5] += tdot(L, V[3], V[3])            # rho0
                    store(t, [(2, dJ_h), (3, cr_h), (4, cx_h), (5, cd0_h),
                              (5, eps_h)], plane_pairs=[jc_pair])
                else:
                    V[5] = dJinv * (-F) / f(th_l)           # cd
                    store(t, [(2, dJ_h), (3, cr_h), (4, cx_h), (5, cd0_h)],
                          plane_pairs=[jc_pair])
                return 0

            if use_bicg:
                sm[5] = jnp.zeros((), dtype)
            jax.lax.fori_loop(0, tiles, s5_body, 0)

        def solver_init_sweep():
            """Re-arm the inner-solver state from the current F (frozen
            Jacobian: Jc/dJinv stay)."""
            def s5b_body(t, _):
                L = lib_for(t)
                load(t, [(rows(F_h, t), V.at[0]), (rows(dJ_h, t), V.at[1])])
                F, dJinv = V[0], V[1]
                V[2] = -F
                V[3] = jnp.zeros_like(F)
                if use_bicg:
                    V[4] = -F
                    sm[5] += tdot(L, V[2], V[2])
                    store(t, [(2, cr_h), (3, cx_h), (4, cd0_h), (4, eps_h)])
                else:
                    V[4] = dJinv * (-F) / f(th_l)
                    store(t, [(2, cr_h), (3, cx_h), (4, cd0_h)])
                return 0

            if use_bicg:
                sm[5] = jnp.zeros((), dtype)
            jax.lax.fori_loop(0, tiles, s5b_body, 0)

        def jc_planes_pair(t):
            return ((planes(Jc16_h, t), C16) if use_bf16
                    else (planes(Jc_h, t), C))

        def jc_from_slab():
            src = C16 if use_bf16 else C
            return tuple(src[j].astype(dtype) for j in range(_NP))

        def lin_bicg_sweeps():
            """Jacobi-preconditioned BiCGStab (krylov.bicgstab_fixed
            twin), 3 sweeps per iteration with SMEM dot accumulation.
            State: x=cx, r=cr, rhat=eps_h (frozen), s/t own buffers;
            p ping-pongs cd0<->p2 and v cd1<->v2 (bA halo-reads p_old/
            v_old while writing p_new/v_new — the update_sweep hazard)."""
            rho = sm[5]
            alpha = f(1.0)
            omega = f(1.0)
            beta = f(0.0)
            cur_p, alt_p = cd0_h, p2_h
            cur_v, alt_v = cd1_h, v2_h
            for k in range(lin_iters):
                first = k == 0
                sm[6] = jnp.zeros((), dtype)
                if first:
                    # p0 already sits in cur_p; v is fresh data — writing
                    # it to cur_v is hazard-free (nothing reads v at k=0)
                    p_in = p_out = cur_p
                    v_in = v_out = cur_v
                else:
                    p_in, p_out = cur_p, alt_p
                    v_in, v_out = cur_v, alt_v

                def bA_body(t, _, first=first, beta=beta, omega=omega,
                            p_in=p_in, p_out=p_out, v_in=v_in,
                            v_out=v_out):
                    L = lib_for(t)
                    pairs = [jc_planes_pair(t), (rows(p_in, t), V.at[0]),
                             (rows(cr_h, t), V.at[1]),
                             (rows(dJ_h, t), V.at[2]),
                             (rows(eps_h, t), V.at[3])]
                    if not first:
                        pairs.append((rows(v_in, t), V.at[4]))
                    load(t, pairs)
                    Jc = jc_from_slab()
                    p = V[0]
                    if not first:
                        p = V[1] + beta * (p - omega * V[4])
                    phat = V[2] * p
                    v = L.pinned(lambda w: L.plane_mv(Jc, w))(phat)
                    sm[6] += tdot(L, V[3], v)               # rhat . v
                    V[5] = p
                    V[6] = v
                    outs = [(6, v_out)]
                    if not first:
                        outs.append((5, p_out))
                    store(t, outs)
                    return 0

                jax.lax.fori_loop(0, tiles, bA_body, 0)
                if not first:
                    cur_p, alt_p = alt_p, cur_p
                    cur_v, alt_v = alt_v, cur_v
                # cur_p/cur_v now hold the CURRENT p/v
                alpha = sdiv(rho, sm[6])
                sm[7] = jnp.zeros((), dtype)
                sm[8] = jnp.zeros((), dtype)

                def bB_body(t, _, alpha=alpha, v_buf=cur_v):
                    L = lib_for(t)
                    load(t, [jc_planes_pair(t), (rows(cr_h, t), V.at[0]),
                             (rows(v_buf, t), V.at[1]),
                             (rows(dJ_h, t), V.at[2])])
                    Jc = jc_from_slab()
                    s = V[0] - alpha * V[1]
                    shat = V[2] * s
                    tt = L.pinned(lambda w: L.plane_mv(Jc, w))(shat)
                    sm[7] += tdot(L, tt, s)
                    sm[8] += tdot(L, tt, tt)
                    V[3] = s
                    V[4] = tt
                    store(t, [(3, s_h), (4, t_h)])
                    return 0

                jax.lax.fori_loop(0, tiles, bB_body, 0)
                omega = sdiv(sm[7], sm[8])
                sm[9] = jnp.zeros((), dtype)

                def bC_body(t, _, alpha=alpha, omega=omega, p_cur=cur_p):
                    L = lib_for(t)
                    load(t, [(rows(cx_h, t), V.at[0]),
                             (rows(p_cur, t), V.at[1]),
                             (rows(dJ_h, t), V.at[2]),
                             (rows(s_h, t), V.at[3]),
                             (rows(t_h, t), V.at[4]),
                             (rows(eps_h, t), V.at[5])])
                    x = V[0] + alpha * (V[2] * V[1]) + omega * (V[2] * V[3])
                    r = V[3] - omega * V[4]
                    sm[9] += tdot(L, V[5], r)               # rhat . r
                    V[6] = x
                    V[7] = r
                    store(t, [(6, cx_h), (7, cr_h)])
                    return 0

                jax.lax.fori_loop(0, tiles, bC_body, 0)
                rho_new = sm[9]
                beta = sdiv(rho_new, rho) * sdiv(alpha, omega)
                rho = rho_new

        def lin_cheby_sweeps():
            for k, (c1, c2) in enumerate(cs_l):
                cd_in = cd0_h if k % 2 == 0 else cd1_h
                cd_out = cd1_h if k % 2 == 0 else cd0_h

                def s6_body(t, _, c1=c1, c2=c2, cd_in=cd_in,
                            cd_out=cd_out):
                    L = lib_for(t)
                    jc_pair = ((planes(Jc16_h, t), C16) if use_bf16
                               else (planes(Jc_h, t), C))
                    load(t, [jc_pair, (rows(cd_in, t), V.at[0]),
                             (rows(cr_h, t), V.at[1]),
                             (rows(cx_h, t), V.at[2]),
                             (rows(dJ_h, t), V.at[3])])
                    src = C16 if use_bf16 else C
                    Jc = tuple(src[j].astype(dtype) for j in range(_NP))
                    d, r, x, dJinv = V[0], V[1], V[2], V[3]
                    op = L.pinned(lambda v: L.plane_mv(Jc, v))
                    x = x + d
                    r = r - op(d)
                    dn = f(c1) * d + f(c2) * (dJinv * r)
                    V[1] = r
                    V[2] = x
                    V[0] = dn
                    store(t, [(1, cr_h), (2, cx_h), (0, cd_out)])
                    return 0

                jax.lax.fori_loop(0, tiles, s6_body, 0)

        def update_sweep(uk_cur, uk_nxt):
            """uk_nxt = uk_cur + x; F = residual(uk_nxt). The update
            writes a DIFFERENT buffer than it halo-reads (ping-pong):
            in-place would let tile t+1's lower halo see tile t's
            already-updated rows and double-apply the Newton step."""
            def s7_body(t, _):
                L = lib_for(t)
                load(t, [(rows(uk_cur, t), V.at[0]), (rows(cx_h, t), V.at[1]),
                         (rows(u_h, t), V.at[2]), (rows(g_h, t), V.at[3]),
                         (planes(Mc_h, t), A), (planes(Kc_h, t), B),
                         (rows(Nun_h, t), V.at[4]),
                         (rows(Kun_h, t), V.at[5])])
                uk = V[0] + V[1]
                u, g = V[2], V[3]
                Mc = tuple(A[k] for k in range(_NP))
                Kc = tuple(B[k] for k in range(_NP))
                Fn = (L.plane_mv(Mc, uk - u)
                      + f(0.5 * dt_) * (L.nl_rhs(uk) + V[4])
                      + f(0.5 * dt_) * (L.plane_mv(Kc, uk) + V[5]))
                V[6] = jnp.where(L.bc, uk - g, Fn)
                V[7] = uk
                store(t, [(7, uk_nxt), (6, F_h)])
                return 0

            jax.lax.fori_loop(0, tiles, s7_body, 0)

        def copy_sweep(src, dst):
            def sc_body(t, _):
                load(t, [(rows(src, t), V.at[0])])
                V[1] = V[0]
                store(t, [(1, dst)])
                return 0

            jax.lax.fori_loop(0, tiles, sc_body, 0)

        lin_sweeps = lin_bicg_sweeps if use_bicg else lin_cheby_sweeps
        cur, nxt = uk_h, uk2_h
        if freeze_jacobian:
            linearize_sweep(cur)
            for n in range(newton_iters):
                if n > 0:
                    solver_init_sweep()
                lin_sweeps()
                update_sweep(cur, nxt)
                cur, nxt = nxt, cur
        else:
            for n in range(newton_iters):
                linearize_sweep(cur)
                lin_sweeps()
                update_sweep(cur, nxt)
                cur, nxt = nxt, cur
        if cur is not uk_h:
            copy_sweep(cur, uk_h)

    sds = jax.ShapeDtypeStruct
    fld = sds((R, Yp), dtype)
    pln = sds((_NP, R, Yp), dtype)
    pln16 = sds((_NP, R, Yp), jnp.bfloat16)
    kw = {}
    if not interpret:
        # 112 MB of the 128 MiB physical: headroom over the measured
        # mesh-512 stack (113.51M at T=128 tiles; default_tile_rows now
        # also shrinks T on wide grids — both margins together)
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20)
    # explicit HBM (not pl.ANY): the compiler otherwise promotes small
    # buffers to VMEM, where the dynamic-offset sublane-unaligned tile
    # slices fail to lower (tpu.memref_slice on a tiled vmem memref);
    # as DMA descriptors on HBM refs arbitrary offsets are fine
    space = pltpu.HBM if not interpret else pl.ANY
    in_specs = [pl.BlockSpec(memory_space=space)] * 5
    operands = [padrows(u2), padrows(uo2), padrows(uoo2), padrows(g2),
                padrows3(Mc2)]
    if external:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        operands += [jnp.asarray(row0_base, jnp.int32).reshape(1),
                     jnp.asarray(0.0 if abs_term is None else abs_term,
                                 dtype).reshape(1)]
    if use_bf16:
        in_specs += [pl.BlockSpec(memory_space=space)]
        operands += [padrows3(Mc2.astype(jnp.bfloat16))]
        out_shape = [fld] * 11 + [pln, pln16]
        if use_bicg:
            out_shape += [fld] * 4       # s, t, p2, v2
        plane_slabs = [
            pltpu.VMEM((_NP, T2, Yp), dtype),            # A: Mc tile
            pltpu.VMEM((_NP, T2, Yp), dtype),            # B: Kc tile
            pltpu.VMEM((_NP, T2, Yp), jnp.bfloat16),     # A16: Mc16 tile
            pltpu.VMEM((_NP, T2, Yp), jnp.bfloat16),     # C16: Jc16 tile
        ]
    else:
        out_shape = [fld] * 11 + [pln, pln]
        if use_bicg:
            out_shape += [fld] * 4       # s, t, p2, v2
        plane_slabs = [
            pltpu.VMEM((_NP, T2, Yp), dtype),            # A: Mc tile
            pltpu.VMEM((_NP, T2, Yp), dtype),            # B: Kc tile
            pltpu.VMEM((_NP, T2, Yp), dtype),            # C: Jc tile
        ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=space)] * len(out_shape),
        scratch_shapes=plane_slabs + [
            pltpu.VMEM((8, T2, Yp), dtype),         # V: field slots
            pltpu.SemaphoreType.DMA((24,)),
            pltpu.SMEM((12,), dtype),
        ],
        interpret=bool(interpret),
        **kw,
    )(*operands)
    return outs[0][H:H + n1x, :n1y]
