"""HBM-resident row-tiled fused whole-step kernel == the XLA
fixed-iteration Chebyshev stencil step (interpret mode on CPU; bench.py
gates the compiled kernel on-chip). Exercises multi-tile geometry
(tile_rows smaller than the grid) so halo DMA, ping-pong buffers, and
the SMEM scalar accumulators are all on the tested path."""

import jax.numpy as jnp
import numpy as np

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.ops.pallas_tiled import tiled_rv_step


def _tiled_step_like(p, carry, t, tile_rows, dtype=None, **kw):
    sd = p.sd
    sh = (sd.nx + 1, sd.ny + 1)
    u2, uo2, uoo2 = (v.reshape(sh) for v in carry)
    g2 = p.bc_value(p.mesh.points, t).reshape(sh)
    Mc = sd.M_coef
    if dtype is not None:
        u2, uo2, uoo2, g2 = (a.astype(dtype) for a in (u2, uo2, uoo2, g2))
        Mc = jnp.asarray(Mc, dtype)
    return tiled_rv_step(
        u2, uo2, uoo2, g2, Mc,
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
        interpret=True, tile_rows=tile_rows, **kw,
    ).reshape(-1)


def _compare(cfg, tile_rows, steps=3, atol=1e-11):
    p = kpp.build(cfg)
    carry = (p.u0, p.u0, p.u0)
    t = jnp.asarray(p.dt, p.u0.dtype)
    for k in range(steps):
        (u_x, _, _), _ = p.step(carry, t)
        u_t = _tiled_step_like(p, carry, t, tile_rows)
        np.testing.assert_allclose(np.asarray(u_t), np.asarray(u_x),
                                   atol=atol, err_msg=f"step {k}")
        carry = (u_x, carry[0], carry[1])


def test_tiled_multi_tile_frozen_newton():
    """4 tiles of 8 rows over the 25-row grid; frozen Jacobian."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=12, modified_newton=True,
                           inner_solver="cheby"), tile_rows=8)


def test_tiled_exact_newton_odd_iters():
    """Exact Newton rebuilds the Jacobian per iteration; odd iteration
    count exercises the final uk ping-pong copy sweep."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=3,
                           newton_linear_iters=12, modified_newton=False,
                           inner_solver="cheby"), tile_rows=8)


def test_tiled_single_tile():
    """tile_rows >= grid: degenerate one-tile geometry must also match."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=12, modified_newton=True,
                           inner_solver="cheby"), tile_rows=32, steps=2)


def test_tiled_gfem():
    """gfem (eps = 0) skips the RV sweeps; ragged last tile (25 = 3x8+1)."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           stabilization="gfem",
                           cg_iters=10, newton_iters=2,
                           newton_linear_iters=12, modified_newton=True,
                           inner_solver="cheby"), tile_rows=8, steps=2)


def test_tiled_bf16_planes():
    """bf16 solver-plane streams: at f32 the rounding is an inexact-
    solver perturbation only (residual/F evaluations keep f32 planes),
    so the step matches the all-f32 tiled step to ~1e-3 of the field
    scale — exercised through the 16-row-aligned multi-tile geometry
    (2 tiles of 16 over the 25-row grid). At f64 the flag is a silent
    no-op (bit-identical), matching blocked.sweep_form's contract."""
    p = kpp.build(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                                cg_iters=10, newton_iters=2,
                                newton_linear_iters=12,
                                modified_newton=True,
                                inner_solver="cheby"))
    carry = (p.u0, p.u0, p.u0)
    t = jnp.asarray(p.dt, p.u0.dtype)
    u_off = _tiled_step_like(p, carry, t, 8, bf16_planes=False)
    u_noop = _tiled_step_like(p, carry, t, 8, bf16_planes=True)
    np.testing.assert_array_equal(np.asarray(u_noop), np.asarray(u_off))

    u32_off = _tiled_step_like(p, carry, t, 16, dtype=jnp.float32)
    u32_on = _tiled_step_like(p, carry, t, 16, dtype=jnp.float32,
                              bf16_planes=True)
    scale = float(np.max(np.abs(np.asarray(u32_off))))
    diff = float(np.max(np.abs(np.asarray(u32_on) - np.asarray(u32_off))))
    assert diff <= 2e-3 * scale, (diff, scale)
    # and the bf16 step stays within the f32 envelope of the f64 step
    err = float(np.max(np.abs(np.asarray(u32_on, np.float64)
                              - np.asarray(u_off))))
    assert err <= 5e-3 * scale, (err, scale)


def test_tiled_rejects_bicgstab_block_mode():
    """BiCGStab needs global dots; block mode (sharded twin) hoists its
    reductions outside the kernel, so the combination is rejected."""
    import pytest

    p = kpp.build(kpp.KPPConfig(mesh_size=6, backend="stencil",
                                cg_iters=10, newton_iters=2))
    sd = p.sd
    sh = (sd.nx + 1, sd.ny + 1)
    u2 = p.u0.reshape(sh)
    with pytest.raises(NotImplementedError):
        tiled_rv_step(
            u2, u2, u2, u2, sd.M_coef, nx=sd.nx, ny=sd.ny, dt=p.dt,
            area=float(sd.area), h=float(sd.h_cg2[0, 0]),
            grads=np.asarray(sd.grads), phi=np.asarray(sd.phi),
            qw=np.asarray(sd.qw), Cvel=0.5, CRV=4.0,
            fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
            cg_iters=10, newton_iters=2, lin_iters=8,
            freeze_jacobian=True, inner_solver="bicgstab",
            row0_base=0, n_rows=sd.nx + 1, abs_term=0.0)


def test_tiled_bicgstab_frozen():
    """r5: in-kernel Jacobi-PCG mass solve + BiCGStab Newton solves with
    cross-tile SMEM dot reductions — the BiCGStab-accuracy config the
    one-pass sweep could not run in r4 (VERDICT item 3). Multi-tile, so
    the p/v ping-pong buffers and per-iteration dot accumulators are on
    the tested path."""
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=6, newton_iters=2,
                           newton_linear_iters=4, modified_newton=True,
                           inner_solver="bicgstab"), tile_rows=8,
             atol=1e-10)


def test_tiled_bicgstab_exact_newton():
    _compare(kpp.KPPConfig(mesh_size=6, T=0.05, backend="stencil",
                           cg_iters=6, newton_iters=3,
                           newton_linear_iters=4, modified_newton=False,
                           inner_solver="bicgstab"), tile_rows=8, steps=2,
             atol=1e-10)
