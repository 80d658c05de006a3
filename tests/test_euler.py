"""Compressible Euler tests: exact Riemann oracle (Sod), conservation and
stability checks (the reference's Euler was abandoned without tests —
ref LOG.md; BASELINE.json requires Sod + 2D Riemann with RV)."""

import numpy as np
import pytest

from conservation_fem_tpu.models import euler
from conservation_fem_tpu.utils.riemann_exact import sod_exact, solve_star


def test_exact_riemann_star_state():
    p, u = solve_star(1.0, 0.0, 1.0, 0.125, 0.0, 0.1)
    np.testing.assert_allclose(p, 0.30313, atol=2e-5)
    np.testing.assert_allclose(u, 0.92745, atol=2e-5)


def test_sod_density_profile():
    p = euler.build(problem="sod", nx=100)
    res = euler.solve(p)
    rho = np.asarray(res.U[:, 0])
    # positivity and bounds
    assert rho.min() > 0.1 and rho.max() <= 1.0 + 1e-8
    err = euler.sod_density_error(p, res.U, res.num_steps * res.dt)
    assert err < 0.035, err  # slip-wall fix: 0.021 @ nx=100 (was 0.066)


def test_sod_quasi_1d():
    """With end-Dirichlet + slip walls the tube stays quasi-1D: the
    y-variation of rho at fixed x is bounded by shock-local noise."""
    p = euler.build(problem="sod", nx=100)
    res = euler.solve(p)
    rho = np.asarray(res.U[:, 0])
    x = np.asarray(p.mesh.points[:, 0]).round(9)
    import collections

    byx = collections.defaultdict(list)
    for xi, ri in zip(x, rho):
        byx[xi].append(ri)
    scatter = max(np.ptp(v) for v in byx.values())
    assert scatter < 0.2, scatter


def test_sod_converges_under_refinement():
    errs = []
    for nx in (50, 100):
        p = euler.build(problem="sod", nx=nx)
        res = euler.solve(p)
        errs.append(euler.sod_density_error(p, res.U, res.num_steps * res.dt))
    assert errs[1] < errs[0], errs


def test_uniform_state_exactly_preserved():
    """The reference prototype's constant IC (ref euler_RV.py:66-72) is a
    steady state; drift must be machine-zero."""
    p = euler.build(problem="uniform", nx=10)
    res = euler.solve(p)
    assert float(np.abs(np.asarray(res.U) - np.asarray(p.U0)).max()) < 1e-12


def test_riemann2d_stable_positive():
    p = euler.build(problem="riemann2d", nx=40)
    res = euler.solve(p)
    rho = np.asarray(res.U[:, 0])
    assert np.isfinite(np.asarray(res.U)).all()
    assert rho.min() > 0.0
    # guarded pressure stays at/above the floor
    _, _, _, pr = euler.primitives(res.U, 1.4, 1e-10)
    assert float(pr.min()) >= 1e-10
    # overshoot bounded: config-3 max density ~1.75 behind the four shocks
    assert rho.max() < 2.5


def test_stencil_backend_matches_ell():
    p1 = euler.build(problem="sod", nx=40, backend="auto")
    p2 = euler.build(problem="sod", nx=40, backend="ell")
    r1, r2 = euler.solve(p1), euler.solve(p2)
    np.testing.assert_allclose(
        np.asarray(r1.U), np.asarray(r2.U), atol=1e-12
    )


def test_ssp_rk3_option():
    """SSP-RK3 runs and lands in the same accuracy regime as RK2 (spatial
    error dominates at this resolution)."""
    p = euler.build(problem="sod", nx=60, rk_order=3)
    res = euler.solve(p)
    err = euler.sod_density_error(p, res.U, res.num_steps * res.dt)
    assert err < 0.035, err


def test_dt_dtype_invariant():
    """dt/num_steps come from a HOST f64 wavespeed on f64 mesh points —
    an f32 bench and its f64 anchor must integrate identical steps (a
    ceil(T/dt) flip from f32 wavespeed rounding would shift the end
    state by one dt and trip the bench gate spuriously)."""
    p64 = euler.build(problem="riemann2d", nx=24, dtype="float64")
    p32 = euler.build(problem="riemann2d", nx=24, dtype="float32")
    assert p64.dt == p32.dt and p64.num_steps == p32.num_steps
    # riemann2d resolves CRV=None to the stable 4.0 (EulerConfig.CRV)
    assert p64.cfg.CRV == 4.0
    assert euler.build(problem="sod", nx=16).cfg.CRV == 1.0
