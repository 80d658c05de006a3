"""Sharded fused-kernel structured path == the single-device fused kernel
(8-virtual-device CPU mesh, interpret mode; tpu_gate exercises the
compiled block kernel on-chip).

The sharded step hoists the single global RV reduction into psum/pmax
and runs the identical dot-free step per device on a deep-halo block, so
agreement with the single-device fused solve is roundoff-only (the only
divergence source is the psum summation order inside abs_term).
"""

import dataclasses

import jax
import numpy as np
import pytest

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.parallel.structured_fused_sharded import (
    ShardedFusedStructured,
)


def _dmesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return jax.sharding.Mesh(np.array(devs[:n]), ("i",))


def _fused_single(cfg):
    p = kpp.build(cfg)
    p.cfg = dataclasses.replace(p.cfg, use_pallas=True)
    assert p._fused_mode() == "single"
    return np.asarray(p.solve().u)


def _run_sharded(cfg, n_dev):
    p = kpp.build(cfg)
    sh = ShardedFusedStructured(p, _dmesh(n_dev))
    return np.asarray(sh.solve()), sh


CHEBY = dict(backend="stencil", modified_newton=True, inner_solver="cheby",
             cg_iters=10, newton_iters=2, newton_linear_iters=12)


def test_allgather_path_matches_single_device():
    """mesh 6 over 8 devices: halo (44) > rows/device (4) -> the
    all_gather fallback; full-run agreement at f64 roundoff."""
    cfg = kpp.KPPConfig(mesh_size=6, T=0.05, **CHEBY)
    u_s = _fused_single(cfg)
    u_d, sh = _run_sharded(cfg, 8)
    assert sh.D > sh.L                      # exercised the fallback
    assert np.abs(u_d - u_s).max() < 1e-11


def test_ppermute_path_matches_single_device():
    """mesh 16 over 2 devices with trimmed iteration counts: halo (32)
    <= rows/device (33) -> the production single-ppermute exchange."""
    cfg = kpp.KPPConfig(mesh_size=16, T=0.03, **{
        **CHEBY, "cg_iters": 4, "newton_linear_iters": 4})
    u_s = _fused_single(cfg)
    u_d, sh = _run_sharded(cfg, 2)
    assert sh.D <= sh.L                     # exercised the ppermute path
    assert np.abs(u_d - u_s).max() < 1e-11


def test_gfem_and_uneven_rows():
    """gfem (no RV sweep) on 3 devices with 25 % padding rows."""
    cfg = kpp.KPPConfig(mesh_size=5, T=0.04, stabilization="gfem", **{
        k: v for k, v in CHEBY.items() if k != "backend"},
        backend="stencil")
    u_s = _fused_single(cfg)
    u_d, _ = _run_sharded(cfg, 3)
    assert np.abs(u_d - u_s).max() < 1e-11


def test_tiled_block_kernel_matches_single_device():
    """kernel='tiled' (HBM row-tiled block mode — the production-scale
    per-device kernel): multi-tile geometry inside each device's block
    (tile_rows=8 < B), 2 devices, full-run f64 agreement."""
    cfg = kpp.KPPConfig(mesh_size=16, T=0.02, **{
        **CHEBY, "cg_iters": 4, "newton_linear_iters": 4})
    u_s = _fused_single(cfg)
    p = kpp.build(cfg)
    sh = ShardedFusedStructured(p, _dmesh(2), kernel="tiled", tile_rows=8)
    assert sh.kernel == "tiled" and sh.B > 8
    u_d = np.asarray(sh.solve())
    assert np.abs(u_d - u_s).max() < 1e-11


def test_config_guard():
    p = kpp.build(kpp.KPPConfig(mesh_size=6, backend="stencil"))
    with pytest.raises(NotImplementedError):
        ShardedFusedStructured(p, _dmesh(2))
