"""Domain-decomposed stencil solver vs single-device: exact agreement on a
virtual 8-device mesh (the reference has no distributed tests — this is
the halo-exchange correctness gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conservation_fem_tpu.models import kpp
from conservation_fem_tpu.parallel.structured_sharded import shard_structured


@pytest.fixture(scope="module")
def device_mesh():
    devs = jax.devices()
    assert len(devs) >= 8
    return jax.sharding.Mesh(np.array(devs[:8]), ("i",))


def test_sharded_structured_matches_single(device_mesh):
    cfg = kpp.KPPConfig(mesh_size=4, T=0.05, backend="stencil")
    p_single = kpp.build(cfg)
    res_single = p_single.solve()

    p = kpp.build(cfg)
    sh = shard_structured(p, device_mesh)
    u_sh = sh.solve()
    np.testing.assert_allclose(
        np.asarray(u_sh), np.asarray(res_single.u), atol=1e-10
    )


def test_sharded_structured_uneven_rows(device_mesh):
    """Row count not divisible by device count exercises the padding path
    (mesh_size=3 -> 13 node rows over 8 devices)."""
    cfg = kpp.KPPConfig(mesh_size=3, T=0.03, backend="stencil")
    res_single = kpp.build(cfg).solve()
    sh = shard_structured(kpp.build(cfg), device_mesh)
    u_sh = sh.solve()
    np.testing.assert_allclose(
        np.asarray(u_sh), np.asarray(res_single.u), atol=1e-10
    )


def test_sharded_burgers_time_dependent_bc(device_mesh):
    """Sharded solver with time-dependent Dirichlet data (Burgers exact-bc)
    matches the single-device stencil backend."""
    from conservation_fem_tpu.models import burgers

    cfg = burgers.BurgersConfig(mesh_size=12, T=0.05, backend="stencil")
    res_single = burgers.build(cfg).solve()
    sh = shard_structured(burgers.build(cfg), device_mesh)
    u_sh = sh.solve()
    np.testing.assert_allclose(
        np.asarray(u_sh), np.asarray(res_single.u), atol=1e-10
    )


def test_orbax_checkpoint_resume_mesh_reshape(device_mesh, tmp_path):
    """Orbax save of the sharded carry on an 8-device mesh, bit-exact
    restore + continuation on a 4-device mesh (the reshape path), compared
    against a direct device-transfer oracle (no disk round trip)."""
    devs = jax.devices()
    mesh4 = jax.sharding.Mesh(np.array(devs[:4]), ("i",))
    cfg = kpp.KPPConfig(mesh_size=4, T=0.04, backend="stencil")
    path = str(tmp_path / "ck")

    # 8-device run to step 2, checkpoint
    s8 = shard_structured(kpp.build(cfg), device_mesh)
    c8 = s8.run_chunk(s8.init_carry(), 0, 2)
    s8.save_carry(path, 2, c8)

    # restore onto the 4-device mesh: bit-exact vs the saved values
    s4 = shard_structured(kpp.build(cfg), mesh4)
    step, c4 = s4.restore_carry(path)
    assert step == 2
    n1x = s8.nx + 1
    for a, b in zip(c4, c8):
        assert np.array_equal(np.asarray(a)[:n1x], np.asarray(b)[:n1x])

    # continuation on 4 devices: resumed-from-disk == direct transfer
    c4_direct = tuple(
        jax.device_put(s4._pad_global(jnp.asarray(np.asarray(x)[:n1x])),
                       s4.shard)
        for x in c8
    )
    u_resumed = np.asarray(s4.run_chunk(c4, 2, 2)[0])
    u_direct = np.asarray(s4.run_chunk(c4_direct, 2, 2)[0])
    assert np.array_equal(u_resumed, u_direct)


def test_solve_checkpointed_sharded_matches_straight_run(device_mesh, tmp_path):
    """Chunked checkpointed sharded solve == uninterrupted sharded solve
    (bit-exact), and a resume from the midpoint snapshot reproduces it."""
    cfg = kpp.KPPConfig(mesh_size=4, T=0.04, backend="stencil")
    path = str(tmp_path / "ck2")

    sh = shard_structured(kpp.build(cfg), device_mesh)
    u_straight = np.asarray(sh.solve())
    u_chunked = np.asarray(sh.solve_checkpointed(path, every=2))
    np.testing.assert_array_equal(u_chunked, u_straight)

    # simulate an interruption: re-save the midpoint, resume to the end
    c_mid = sh.run_chunk(sh.init_carry(), 0, 2)
    sh.save_carry(path, 2, c_mid)
    u_resumed = np.asarray(sh.solve_checkpointed(path, every=2, resume=True))
    np.testing.assert_array_equal(u_resumed, u_chunked)
