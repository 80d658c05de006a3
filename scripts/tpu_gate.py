"""On-chip Mosaic/TPU kernel identity gate — runs in minutes.

Compiles every Pallas kernel family plus the bf16 blocked einsum paths on
TINY shapes and asserts identity against the plain XLA step at f32
tolerance. This is the cheap per-kernel regression gate the headline
benches (bench.py / bench_blocked / bench_pk) are too coarse for: a
Mosaic toolchain update that silently mis-lowers one kernel fails HERE,
named, in minutes — not as an accuracy-gate mystery hours later.

Families gated (12 gate entries; fused bicgstab/cheby share family 3;
cf. VERDICT round 3 item 3):
  1. pallas_stencil.stencil_matvec      (7-plane SpMV)
  2. pallas_stencil.cg_solve            (whole-CG single kernel)
  3. pallas_fused.fused_rv_step         (single-launch step; bicgstab+cheby)
  4. pallas_fused.fused_rv_step_split   (setup + newton kernels)
  5. pallas_tiled.tiled_rv_step         (HBM row-tiled; multi-tile geometry)
  6. pallas_fused.fused_rv_block_step   (deep-halo sharded-path kernel)
  7. pallas_tiled block mode            (HBM-scale sharded-path kernel)
  8. ops/blocked  P1 KPP step           (bf16 one-hot einsum backend)
  9. ops/blocked_pk  P2 SI Burgers step (component-major Pk einsums)
 10. pallas_tiled bf16 solver planes    (16-row bf16 HBM stream geometry)
 11. ops/blocked PRECISE advection      (f32 one-hots + HIGHEST dots)

Tolerances: the Pallas kernels run the SAME fixed-iteration algorithm as
the XLA twin, so only summation order differs -> L2rel 1e-3 is generous.
The blocked backends round gathered operands to bf16 on TPU by design
(ops/blocked.py) -> 2e-2 / 5e-2 (mirrors the bench gates).

Usage:   python scripts/tpu_gate.py            # on TPU (or CPU interpret)
Exit 0 = all kernels PASS; nonzero lists the failures.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def _gate(name, fn):
    t0 = time.perf_counter()
    try:
        metric = fn()
        print(f"PASS {name:28s} {metric:.3e}  "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — gate must report every family
        FAILURES.append(name)
        print(f"FAIL {name:28s} {e}", flush=True)


def _l2rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert np.isfinite(a).all(), "non-finite output"
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300))


def main():
    import jax

    if "--cpu" in sys.argv:   # interpret-mode dry run of the gate itself
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from conservation_fem_tpu.models import burgers, kpp
    from conservation_fem_tpu.ops import pallas_stencil as psk
    from conservation_fem_tpu.ops import structured as st
    from conservation_fem_tpu.ops.krylov import cg, jacobi_preconditioner
    from conservation_fem_tpu.ops.mesh import (
        rcm_permutation, rectangle_mesh, reorder_mesh,
    )
    from conservation_fem_tpu.ops.pallas_fused import (
        fused_rv_step, fused_rv_step_split,
    )
    from conservation_fem_tpu.ops.pallas_tiled import tiled_rv_step

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})", flush=True)

    dt32 = jnp.float32

    # ---- stencil matvec + whole-CG kernel --------------------------
    host = rectangle_mesh((-2, -2), (2, 2), nx=12)
    sd = st.build_structured(host, 12, 12, dt32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(13, 13)), dt32)

    def gate_matvec():
        y_ref = st.matvec(sd, sd.M_coef, x)
        y_pk = psk.stencil_matvec(sd.M_coef, x)
        rel = _l2rel(y_pk, y_ref)
        assert rel < 1e-5, rel
        return rel

    def gate_cg():
        b = jnp.where(sd.bc2, 0.0, x)
        x_pk = psk.cg_solve(sd.M_coef, b, sd.bc2, sd.diagM2, rtol=1e-5)
        op = lambda v: jnp.where(
            sd.bc2, v, st.matvec(sd, sd.M_coef, jnp.where(sd.bc2, 0.0, v)))
        pre = jacobi_preconditioner(jnp.where(sd.bc2, 1.0, sd.diagM2))
        x_ref = cg(op, b, precond=pre, rtol=1e-5).x
        rel = _l2rel(x_pk, x_ref)
        assert rel < 1e-3, rel
        return rel

    _gate("stencil_matvec", gate_matvec)
    _gate("pallas_cg", gate_cg)

    # ---- 3-5: fused step kernels (direct calls, 3 steps each) -----------
    def fused_compare(step_fn, cfg, steps=3, tol=1e-3, **extra):
        p = kpp.build(cfg)
        sdp, sh = p.sd, (p.sd.nx + 1, p.sd.ny + 1)
        carry = (p.u0, p.u0, p.u0)
        t = jnp.asarray(p.dt, p.u0.dtype)
        worst = 0.0
        for _ in range(steps):
            (u_x, _, _), _ = p.step(carry, t)
            u2, uo2, uoo2 = (v.reshape(sh) for v in carry)
            g2 = p.bc_value(p.mesh.points, t).reshape(sh)
            out = step_fn(
                u2, uo2, uoo2, g2, sdp.M_coef,
                nx=sdp.nx, ny=sdp.ny, dt=p.dt, area=float(sdp.area),
                h=float(sdp.h_cg2[0, 0]), grads=np.asarray(sdp.grads),
                phi=np.asarray(sdp.phi), qw=np.asarray(sdp.qw),
                Cvel=p.cfg.Cvel, CRV=p.cfg.CRV,
                fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
                fprime_xy=getattr(p, "flux_prime_xy", None),
                cg_iters=p.cfg.cg_iters, newton_iters=p.cfg.newton_iters,
                lin_iters=p.cfg.newton_linear_iters,
                freeze_jacobian=p.cfg.modified_newton,
                stabilization=p.cfg.stabilization,
                inner_solver=p.cfg.inner_solver,
                mass_bounds=p.cfg.cheby_mass_bounds,
                lin_bounds=p.cfg.cheby_lin_bounds,
                **extra)
            u_p = (out[0] if isinstance(out, tuple) else out).reshape(-1)
            worst = max(worst, _l2rel(u_p, u_x))
            carry = (u_x, carry[0], carry[1])
        assert worst < tol, worst
        return worst

    base = dict(mesh_size=6, T=0.05, backend="stencil", dtype="float32",
                cg_iters=10, newton_iters=2, modified_newton=True)

    _gate("fused_single_bicgstab", lambda: fused_compare(
        fused_rv_step,
        kpp.KPPConfig(**base, newton_linear_iters=4,
                      inner_solver="bicgstab")))
    _gate("fused_single_cheby", lambda: fused_compare(
        fused_rv_step,
        kpp.KPPConfig(**base, newton_linear_iters=12,
                      inner_solver="cheby")))
    _gate("fused_split", lambda: fused_compare(
        fused_rv_step_split,
        kpp.KPPConfig(**base, newton_linear_iters=4,
                      inner_solver="bicgstab")))
    _gate("tiled_multitile", lambda: fused_compare(
        tiled_rv_step,
        kpp.KPPConfig(**base, newton_linear_iters=12,
                      inner_solver="cheby"), tile_rows=8))
    # r5: in-kernel PCG/BiCGStab with cross-tile SMEM dot reductions —
    # the gate compares against the XLA bicgstab_fixed step, so the
    # Mosaic lowering of the SMEM scalar accumulators is what's tested
    _gate("tiled_bicgstab_dots", lambda: fused_compare(
        tiled_rv_step,
        kpp.KPPConfig(**base, newton_linear_iters=4,
                      inner_solver="bicgstab"), tile_rows=8))
    # bf16 solver-plane streams (16-row-aligned geometry, 2 tiles over
    # the 25-row grid); rounding is an inexact-solver perturbation only,
    # so the f32-tolerance identity widens to ~bf16-eps of field scale
    _gate("tiled_bf16_planes", lambda: fused_compare(
        tiled_rv_step,
        kpp.KPPConfig(**base, newton_linear_iters=12,
                      inner_solver="cheby"), tile_rows=16, tol=5e-3,
        bf16_planes=True))

    # deep-halo block kernel (the per-device kernel of the sharded fused
    # path, parallel/structured_fused_sharded.py): zero-halo framing of
    # the whole grid must reproduce the plain step
    def gate_block():
        from conservation_fem_tpu.ops.pallas_fused import (
            fused_rv_block_step, required_halo,
        )

        cfg = kpp.KPPConfig(**base, newton_linear_iters=12,
                            inner_solver="cheby")
        p = kpp.build(cfg)
        sdp, sh = p.sd, (p.sd.nx + 1, p.sd.ny + 1)
        t = jnp.asarray(p.dt, p.u0.dtype)
        (u_x, _, _), _ = p.step((p.u0, p.u0, p.u0), t)
        D = required_halo(cfg.cg_iters, cfg.newton_iters,
                          cfg.newton_linear_iters)
        u2 = p.u0.reshape(sh)
        g2 = p.bc_value(p.mesh.points, t).reshape(sh)
        pad = lambda a: jnp.pad(a, ((D, D), (0, 0)))
        Mc_ext = jnp.pad(sdp.M_coef, ((0, 0), (D, D), (0, 0)))
        abs_term = jnp.abs(u2 - jnp.mean(u2)).max()
        u_b = fused_rv_block_step(
            pad(u2), pad(u2), pad(u2), pad(g2), Mc_ext, -D, abs_term,
            n_rows=sh[0], n_cols=sh[1], dt=p.dt, area=float(sdp.area),
            h=float(sdp.h_cg2[0, 0]), grads=np.asarray(sdp.grads),
            phi=np.asarray(sdp.phi), qw=np.asarray(sdp.qw),
            Cvel=p.cfg.Cvel, CRV=p.cfg.CRV,
            fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
            fprime_xy=getattr(p, "flux_prime_xy", None),
            cg_iters=cfg.cg_iters, newton_iters=cfg.newton_iters,
            lin_iters=cfg.newton_linear_iters,
            freeze_jacobian=cfg.modified_newton,
            mass_bounds=p.cfg.cheby_mass_bounds,
            lin_bounds=p.cfg.cheby_lin_bounds)
        rel = _l2rel(u_b[D:D + sh[0]].reshape(-1), u_x)
        assert rel < 1e-3, rel
        return rel

    _gate("fused_block_deephalo", gate_block)

    # tiled kernel in block mode (the HBM-scale per-device kernel of the
    # sharded fused path): zero-halo framing + hoisted abs_term, forced
    # multi-tile geometry
    def gate_tiled_block():
        from conservation_fem_tpu.ops.pallas_fused import required_halo

        cfg = kpp.KPPConfig(**base, newton_linear_iters=12,
                            inner_solver="cheby")
        p = kpp.build(cfg)
        sdp, sh = p.sd, (p.sd.nx + 1, p.sd.ny + 1)
        t = jnp.asarray(p.dt, p.u0.dtype)
        (u_x, _, _), _ = p.step((p.u0, p.u0, p.u0), t)
        D = required_halo(cfg.cg_iters, cfg.newton_iters,
                          cfg.newton_linear_iters)
        u2 = p.u0.reshape(sh)
        g2 = p.bc_value(p.mesh.points, t).reshape(sh)
        pad = lambda a: jnp.pad(a, ((D, D), (0, 0)))
        Mc_ext = jnp.pad(sdp.M_coef, ((0, 0), (D, D), (0, 0)))
        abs_term = jnp.abs(u2 - jnp.mean(u2)).max()
        B = sh[0] + 2 * D
        u_b = tiled_rv_step(
            pad(u2), pad(u2), pad(u2), pad(g2), Mc_ext,
            nx=B - 1, ny=sh[1] - 1, row0_base=-D, n_rows=sh[0],
            abs_term=abs_term, tile_rows=8,
            dt=p.dt, area=float(sdp.area),
            h=float(sdp.h_cg2[0, 0]), grads=np.asarray(sdp.grads),
            phi=np.asarray(sdp.phi), qw=np.asarray(sdp.qw),
            Cvel=p.cfg.Cvel, CRV=p.cfg.CRV,
            fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
            fprime_xy=getattr(p, "flux_prime_xy", None),
            cg_iters=cfg.cg_iters, newton_iters=cfg.newton_iters,
            lin_iters=cfg.newton_linear_iters,
            freeze_jacobian=cfg.modified_newton,
            mass_bounds=p.cfg.cheby_mass_bounds,
            lin_bounds=p.cfg.cheby_lin_bounds)
        rel = _l2rel(u_b[D:D + sh[0]].reshape(-1), u_x)
        assert rel < 1e-3, rel
        return rel

    _gate("tiled_block_deephalo", gate_tiled_block)

    # ---- blocked P1 einsum backend (bf16 one-hots on TPU) ---------------
    def gate_blocked_p1():
        hm = rectangle_mesh((-2, -2), (2, 2), nx=12)
        hm = reorder_mesh(hm, rcm_permutation(hm))
        common = dict(mesh_size=12, T=0.05, backend="ell", dtype="float32",
                      cg_iters=12, newton_iters=3, newton_linear_iters=8)
        u_g = kpp.build(kpp.KPPConfig(**common,
                                      ell_matvec_backend="gather"),
                        host_mesh=hm).solve().u
        u_b = kpp.build(kpp.KPPConfig(**common,
                                      ell_matvec_backend="blocked"),
                        host_mesh=hm).solve().u
        rel = _l2rel(u_b, u_g)
        assert rel < 2e-2, rel
        return rel

    _gate("blocked_p1_kpp", gate_blocked_p1)

    # ---- blocked Pk (P2 SI Burgers, component-major einsums) ------------
    def gate_blocked_pk():
        common = dict(mesh_size=8, degree=2, stabilization="si", T=0.05,
                      dtype="float32", cg_iters=16, newton_iters=3,
                      newton_linear_iters=16, inner_solver="cheby")
        pg = burgers.build(burgers.BurgersConfig(**common))
        pb = burgers.build(burgers.BurgersConfig(
            **common, ell_matvec_backend="blocked"))
        ug = np.asarray(pg.solve().u)
        ub = np.asarray(pb.solve().u)
        inv = np.argsort(pb.dof_perm)
        rel = _l2rel(ub, ug[inv])
        assert rel < 5e-2, rel
        return rel

    _gate("blocked_pk_p2si", gate_blocked_pk)

    # ---- blocked PRECISE mode (f32 one-hots + HIGHEST dots) -------------
    # On TPU, Precision.HIGHEST must recover plain-f32 arithmetic (the
    # 6-pass bf16 emulation); the gather twin computes f32 without MXU
    # rounding, so a short smooth rotation must agree tightly — the bf16
    # streams would sit ~1e-2 here (ops/blocked.make_blocked_plan).
    def gate_blocked_precise():
        from conservation_fem_tpu.models import linear_advection as la

        common = dict(mesh_size=8, T=0.25, stabilization="rv_node",
                      dtype="float32")
        pg = la.build(la.AdvectionConfig(**common))
        ug = la.solve(pg).u
        pb = la.build(la.AdvectionConfig(**common,
                                         ell_matvec_backend="blocked"))
        assert pb.blkplan.precise
        ub = la.solve(pb).u
        # permutation from the ORIGINAL mesh (pb.host_mesh is already
        # RCM-reordered inside build — recomputing from it is wrong)
        inv = np.argsort(rcm_permutation(pg.host_mesh))
        rel = _l2rel(np.asarray(ub), np.asarray(ug)[inv])
        assert rel < 5e-3, rel
        return rel

    _gate("blocked_precise_adv", gate_blocked_precise)

    if FAILURES:
        print(f"TPU GATE FAILED: {FAILURES}", flush=True)
        sys.exit(1)
    print("TPU GATE: all kernel families PASS", flush=True)


if __name__ == "__main__":
    main()
