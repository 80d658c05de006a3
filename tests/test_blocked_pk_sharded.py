"""DistributedBlockedPk vs single-device BlockedPkHyperbolicProblem."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh as DeviceMesh

from conservation_fem_tpu.models import burgers
from conservation_fem_tpu.parallel.blocked_pk_sharded import \
    DistributedBlockedPk


def _dmesh(n):
    return DeviceMesh(np.array(jax.devices()[:n]), ("i",))


def _build(**kw):
    return burgers.build(burgers.BurgersConfig(
        mesh_size=10, degree=2, T=0.04, dtype="float64",
        krylov_rtol=1e-10, newton_linear_rtol=1e-8,
        ell_matvec_backend="blocked", **kw))


@pytest.mark.parametrize("stab", ["si", "rv"])
def test_distributed_blocked_pk_matches(stab):
    p = _build(stabilization=stab)
    u_single = np.asarray(p.solve().u)
    u_dist = DistributedBlockedPk(_build(stabilization=stab),
                                  _dmesh(4)).solve()
    d = np.abs(u_dist - u_single).max()
    assert d < 1e-9, (stab, d)


def test_distributed_blocked_pk_fast_solvers():
    """Fixed-iteration cheby solvers under shard_map match the adaptive
    single-device run at solver tolerance."""
    kw = dict(stabilization="si", modified_newton=True)
    p = _build(**kw)
    u_adaptive = np.asarray(p.solve().u)
    u_dist = DistributedBlockedPk(
        _build(**kw, cg_iters=12, newton_iters=3, newton_linear_iters=12,
               inner_solver="cheby"), _dmesh(4)).solve()
    rel = (np.linalg.norm(u_dist - u_adaptive)
           / np.linalg.norm(u_adaptive))
    assert rel < 2e-3, rel
