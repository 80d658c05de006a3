"""Fused whole-step Pallas kernel == fixed-iteration XLA stencil step
(interpret mode on CPU; the TPU bench exercises the compiled kernel)."""

import jax
import jax.numpy as jnp
import numpy as np

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.ops.pallas_fused import fused_rv_step


def _fused_step_like(p, carry, t):
    sd = p.sd
    sh = (sd.nx + 1, sd.ny + 1)
    u2, uo2, uoo2 = (v.reshape(sh) for v in carry)
    g2 = p.bc_value(p.mesh.points, t).reshape(sh)
    return fused_rv_step(
        u2, uo2, uoo2, g2, sd.M_coef,
        nx=sd.nx, ny=sd.ny, dt=p.dt, area=float(sd.area),
        h=float(sd.h_cg2[0, 0]), grads=np.asarray(sd.grads),
        phi=np.asarray(sd.phi), qw=np.asarray(sd.qw),
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
        interpret=True,
    )[0].reshape(-1)


def _compare(cfg, steps=3):
    p = kpp.build(cfg)
    carry = (p.u0, p.u0, p.u0)
    t = jnp.asarray(p.dt, p.u0.dtype)
    for k in range(steps):
        (u_x, a, b), _ = p.step(carry, t)
        u_p = _fused_step_like(p, carry, t)
        np.testing.assert_allclose(
            np.asarray(u_p), np.asarray(u_x), atol=1e-11,
            err_msg=f"step {k}")
        carry = (u_p, carry[0], carry[1])


def test_fused_rv_step_matches_xla_fixed():
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=8, modified_newton=True))


def test_fused_rv_step_cheby():
    """Dot-free Chebyshev inner solves: fused kernel == XLA fixed step
    (both running chebyshev_fixed, so identity is exact up to roundoff)."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=12, modified_newton=True,
                           inner_solver="cheby"))


def test_cheby_full_run_matches_adaptive():
    """Chebyshev fixed-iteration config reproduces the adaptive f64
    anchor on a full KPP run (same gate as the bicgstab fixed config)."""
    anchor = np.asarray(
        kpp.build(kpp.KPPConfig(mesh_size=8, T=0.2)).solve().u)
    u = np.asarray(kpp.build(kpp.KPPConfig(
        mesh_size=8, T=0.2, modified_newton=True, cg_iters=10,
        newton_iters=2, newton_linear_iters=12,
        inner_solver="cheby")).solve().u)
    rel = np.linalg.norm(u - anchor) / np.linalg.norm(anchor)
    assert rel < 2e-3, rel


def test_fused_rv_step_exact_newton():
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=3,
                           newton_linear_iters=10, modified_newton=False))


def test_fused_solve_path_matches_plain():
    """Drive the REAL solve() path (scan + _jit_state tracing) with
    use_pallas on — catches static-vs-traced mix-ups that calling the
    kernel directly cannot (sd fields are tracers inside the jitted run)."""
    import dataclasses as dc

    cfg = kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                        cg_iters=10, newton_iters=2,
                        newton_linear_iters=8, modified_newton=True)
    p = kpp.build(cfg)
    p.cfg = dc.replace(p.cfg, use_pallas=True)
    assert p._fused_pallas_ok()
    u_f = np.asarray(p.solve().u)
    u_x = np.asarray(kpp.build(cfg).solve().u)
    np.testing.assert_allclose(u_f, u_x, atol=1e-11)


def test_multistep_solve_matches_plain():
    """K-steps-per-launch mode (fused_substeps) == the plain path over a
    run with both full chunks and a remainder (10 = 2x4 + 2)."""
    import dataclasses as dc

    cfg = kpp.KPPConfig(mesh_size=8, T=0.1, backend="stencil",
                        cg_iters=10, newton_iters=2,
                        newton_linear_iters=8, modified_newton=True)
    p = kpp.build(cfg)
    p.cfg = dc.replace(p.cfg, use_pallas=True, fused_substeps=4)
    assert p._fused_multistep_ok()
    u_m = np.asarray(p.solve().u)
    u_x = np.asarray(kpp.build(cfg).solve().u)
    np.testing.assert_allclose(u_m, u_x, atol=1e-11)


def test_split_kernel_matches_single():
    """fused_rv_step_split (1 + newton_iters launches, the large-mesh
    variant) == fused_rv_step, exact and frozen Newton."""
    from conservation_fem_tpu.ops.pallas_fused import fused_rv_step_split

    for frozen in (True, False):
        cfg = kpp.KPPConfig(mesh_size=6, T=0.03, backend="stencil",
                            cg_iters=10, newton_iters=2,
                            newton_linear_iters=8, modified_newton=frozen)
        p = kpp.build(cfg)
        carry = (p.u0, p.u0, p.u0)
        t = jnp.asarray(p.dt, p.u0.dtype)
        sd = p.sd
        sh = (sd.nx + 1, sd.ny + 1)
        args = [v.reshape(sh) for v in carry]
        g2 = p.bc_value(p.mesh.points, t).reshape(sh)
        kw = dict(
            nx=sd.nx, ny=sd.ny, dt=p.dt, area=float(sd.area),
            h=float(sd.h_cg2[0, 0]), grads=np.asarray(sd.grads),
            phi=np.asarray(sd.phi), qw=np.asarray(sd.qw),
            Cvel=p.cfg.Cvel, CRV=p.cfg.CRV,
            fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
            fprime_xy=getattr(p, "flux_prime_xy", None),
            cg_iters=p.cfg.cg_iters, newton_iters=p.cfg.newton_iters,
            lin_iters=p.cfg.newton_linear_iters,
            freeze_jacobian=frozen, interpret=True)
        u_single = fused_rv_step(*args, g2, sd.M_coef, **kw)[0]
        u_split = fused_rv_step_split(*args, g2, sd.M_coef, **kw)
        np.testing.assert_allclose(np.asarray(u_split),
                                   np.asarray(u_single), atol=1e-12,
                                   err_msg=f"frozen={frozen}")


def test_fused_burgers_solve_matches_plain():
    """Second workload through the fused kernel: Burgers RV with the
    time-dependent exact-solution Dirichlet data (g2 varies per step)."""
    import dataclasses as dc

    from conservation_fem_tpu.models import burgers

    cfg = burgers.BurgersConfig(mesh_size=16, T=0.1, backend="stencil",
                                stabilization="rv", cg_iters=10,
                                newton_iters=2, newton_linear_iters=8,
                                modified_newton=True)
    p = burgers.build(cfg)
    p.cfg = dc.replace(p.cfg, use_pallas=True)
    assert p._fused_pallas_ok()
    u_f = np.asarray(p.solve().u)
    u_x = np.asarray(burgers.build(cfg).solve().u)
    np.testing.assert_allclose(u_f, u_x, atol=1e-11)


def test_fused_gfem_step():
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           stabilization="gfem",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=8, modified_newton=True))
