"""Distributed IPCS Stokes == single-device solver on the 8-virtual-device
CPU mesh (conftest pins platform + device count)."""

import jax
import numpy as np
import pytest

from conservation_fem_tpu.models import stokes
from conservation_fem_tpu.parallel.stokes_sharded import ShardedStokes


def _dmesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return jax.sharding.Mesh(np.array(devs[:n]), ("i",))


@pytest.mark.parametrize("n_dev", [4, 8])
def test_sharded_matches_single_device(n_dev):
    cfg = dict(nx=10, num_steps=40, T=0.8)
    p, fd = stokes.build(**cfg)
    res = stokes.solve((p, fd))
    sh = ShardedStokes(*stokes.build(**cfg), _dmesh(n_dev))
    u_d, p_d = sh.solve()
    du = np.abs(u_d - np.asarray(res.u)).max()
    dp = np.abs(p_d - np.asarray(res.p)).max()
    assert du < 1e-9 and dp < 1e-9, (du, dp)


def test_sharded_fixed_solvers_match_single_device():
    """Fixed-iteration (krylov_iters + auto kip) sharded step == the
    single-device fixed step: identical algorithm, psum dots — roundoff
    agreement only."""
    cfg = dict(nx=10, num_steps=40, T=0.8, krylov_iters=20)
    p, fd = stokes.build(**cfg)
    res = stokes.solve((p, fd))
    sh = ShardedStokes(*stokes.build(**cfg), _dmesh(4))
    u_d, p_d = sh.solve()
    du = np.abs(u_d - np.asarray(res.u)).max()
    dp = np.abs(p_d - np.asarray(res.p)).max()
    assert du < 1e-9 and dp < 1e-9, (du, dp)


def test_sharded_uneven_rows():
    """Row count (nx+1 = 8 coarse rows) not divisible by 3 devices."""
    cfg = dict(nx=7, num_steps=20, T=0.4)
    p, fd = stokes.build(**cfg)
    res = stokes.solve((p, fd))
    sh = ShardedStokes(*stokes.build(**cfg), _dmesh(3))
    u_d, p_d = sh.solve()
    du = np.abs(u_d - np.asarray(res.u)).max()
    dp = np.abs(p_d - np.asarray(res.p)).max()
    assert du < 1e-9 and dp < 1e-9, (du, dp)
