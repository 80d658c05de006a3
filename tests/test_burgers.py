"""Burgers 2D Riemann tests against the closed-form exact solution
(ref Code/Burgers_equation/Exact_Burger_RV_conv.py, Burger_CPP/res.m)."""

import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import burgers


def test_exact_solution_band_continuity():
    """The rarefaction fan matches its neighbors at the band edges:
    u = 0.5 at x = 1/2 + t/2, u = 0.8 at x = 1/2 + 4t/5 (below the shock)."""
    t = 0.3
    y = jnp.asarray([0.1])  # below all separating curves
    x_left = jnp.asarray([0.5 + 0.5 * t])
    x_right = jnp.asarray([0.5 + 0.8 * t])
    u_left = burgers.exact_solution(x_left, y, t)
    u_right = burgers.exact_solution(x_right, y, t)
    np.testing.assert_allclose(float(u_left[0]), 0.5, atol=1e-12)
    np.testing.assert_allclose(float(u_right[0]), 0.8, atol=1e-12)


def test_exact_solution_at_t0_is_ic():
    x = jnp.asarray([0.2, 0.7, 0.2, 0.7])
    y = jnp.asarray([0.7, 0.7, 0.2, 0.2])
    u = burgers.exact_solution(x, y, 0.0)
    np.testing.assert_allclose(np.asarray(u), [-0.2, -1.0, 0.5, 0.8])


def test_rv_n50_error():
    """RV at N=50: shock-limited error, must beat the trivial bound and the
    unstabilized run."""
    res, err = burgers.run(mesh_size=50, stabilization="rv", record_metrics=True)
    assert bool(res.metrics["newton_converged"].all())
    assert err < 0.15, err
    # solution stays within Riemann bounds + small overshoot
    assert float(res.u.min()) > -1.1 and float(res.u.max()) < 0.9


def test_si_n100_matches_reference_cpp():
    """SI at N=100 with smoothing l=4 vs the stored C++ benchmark errors
    (ref Burger_CPP/res.m:1 — L1=0.0146037, L2=0.0928357). Scheme details
    differ (BDF2 residual + CN here vs the C++ forward scheme), so assert
    the same error regime: within 35% on L1 and not worse on L2."""
    p = burgers.build(mesh_size=100, stabilization="si", smooth_l=4.0)
    res = p.solve()
    l1 = float(burgers.l1_error_vs_exact(p, res.u, 0.5))
    l2 = float(burgers.l2_error_vs_exact(p, res.u, 0.5))
    assert l1 < 0.0146037 * 1.35, l1
    assert l2 < 0.0928357 * 1.05, l2


def test_dt_formula():
    """dt = 0.5 * min(h_CG) (ref Exact_Burger_RV.py:105-108)."""
    p = burgers.build(mesh_size=50)
    assert p.num_steps == int(np.ceil(0.5 / p.dt))
    # structured unit square N=50: h = min edge = 1/50, h_CG ~ 1/50
    assert 0.009 < p.dt < 0.011


def test_p2_si_burgers_runs():
    """P2 SI Burgers — higher_order_SI.py parity (dt scaled by 1/degree^2).

    Error magnitudes measured in round 2 (f64, T=0.25): L1/L2 vs exact =
    0.0277/0.1152 at mesh 25 and 0.0135/0.0773 at mesh 50 — first-order L1
    convergence at the shock, as expected for a discontinuous solution."""
    p = burgers.build(burgers.BurgersConfig(
        mesh_size=25, degree=2, stabilization="si", T=0.25,
        record_metrics=True))
    res = p.solve()
    assert bool(res.metrics["newton_converged"].all())
    l2 = float(burgers.l2_error_vs_exact(p, res.u, 0.25))
    l1 = float(burgers.l1_error_vs_exact(p, res.u, 0.25))
    assert 0.02 < l1 < 0.04, l1      # measured 0.0277, gated at +-40%
    assert 0.08 < l2 < 0.16, l2      # measured 0.1152
    # dt scaling vs the P1 problem
    p1 = burgers.build(burgers.BurgersConfig(mesh_size=25, T=0.25))
    assert abs(p.dt - p1.dt / 4) < 1e-12


def test_p2_si_burgers_converges():
    """Mesh refinement reduces the L1 error at ~first order (shock case):
    measured 0.0277 -> 0.0135 -> 0.0078 over mesh 25/50/100."""
    errs = []
    for ms in (25, 50):
        p = burgers.build(burgers.BurgersConfig(
            mesh_size=ms, degree=2, stabilization="si", T=0.25))
        res = p.solve()
        errs.append(float(burgers.l1_error_vs_exact(p, res.u, 0.25)))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 0.7, (errs, rate)


def test_p2_rv_burgers_runs():
    p = burgers.build(burgers.BurgersConfig(
        mesh_size=25, degree=2, stabilization="rv", T=0.25))
    res = p.solve()
    assert np.isfinite(np.asarray(res.u)).all()


def test_p2_si_fixed_cheby_matches_adaptive():
    """P2 SI Burgers with fixed-iteration dot-free Chebyshev inner
    solves (per-degree Jacobi-mass spectral bounds, BurgersConfig
    defaults) reproduces the adaptive-solver anchor — the Pk pipeline's
    throughput config is accuracy-gated like the P1 ones."""
    import numpy as np

    from conservation_fem_tpu.models import burgers

    base = dict(mesh_size=12, degree=2, stabilization="si", smooth_l=4.0,
                T=0.05, dtype="float64")
    anchor = np.asarray(burgers.build(burgers.BurgersConfig(**base)).solve().u)
    cfg = burgers.BurgersConfig(**base, modified_newton=True, cg_iters=12,
                                newton_iters=2, newton_linear_iters=16,
                                inner_solver="cheby")
    u = np.asarray(burgers.build(cfg).solve().u)
    rel = np.linalg.norm(u - anchor) / np.linalg.norm(anchor)
    assert rel < 2e-4, rel


def test_lazy_operators_concrete_after_solve():
    """h_cg/K_bc must be forced OUTSIDE jit traces. Before round 3 they
    were first touched inside the solve trace: the cache kept a leaked
    tracer (poisoning any later re-trace with UnexpectedTracerError) and
    their builds — a CG mass solve + bc-stiffness assembly — were inlined
    into the scan body, silently re-executing every time step."""
    import jax

    p = burgers.build(burgers.BurgersConfig(
        mesh_size=8, degree=2, stabilization="si", T=0.05))
    p.solve()
    assert not isinstance(p._h_cg, jax.core.Tracer)
    assert not isinstance(p._K_bc, jax.core.Tracer)

    # a second, structurally different trace must not see stale tracers
    @jax.jit
    def one_step(state, u0):
        with p.bound_jit_state(state):
            return p.step((u0, u0, u0), p.dt)[0][0]

    u = one_step(p._jit_state(), p.u0)
    assert np.isfinite(np.asarray(u)).all()
