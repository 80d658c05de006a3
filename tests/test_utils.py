"""Aux subsystem tests: plotting, I/O round-trip, checkpoint, guards,
metrics (SURVEY.md section 5 parity)."""

import os

import numpy as np
import pytest

from conservation_fem_tpu.ops.mesh import rectangle_mesh
from conservation_fem_tpu.utils import checkpoint, guards, metrics, plotting
from conservation_fem_tpu.utils.io import XDMFWriter, read_h5_mesh, read_h5_series


@pytest.fixture
def mesh():
    return rectangle_mesh((0, 0), (1, 1), nx=4)


def test_xdmf_roundtrip(tmp_path, mesh):
    u0 = mesh.points[:, 0]
    u1 = mesh.points[:, 1] ** 2
    path = str(tmp_path / "out.xdmf")
    with XDMFWriter(path, mesh) as w:
        w.write_function(u0, 0.1)
        w.write_function(u1, 0.2)
    m2 = read_h5_mesh(str(tmp_path / "out.h5"))
    assert m2.n_nodes == mesh.n_nodes
    times, vals = read_h5_series(str(tmp_path / "out.h5"), "uh")
    np.testing.assert_allclose(times, [0.1, 0.2])
    np.testing.assert_allclose(vals[0], u0)
    np.testing.assert_allclose(vals[1], u1)
    assert os.path.exists(str(tmp_path / "out.xdmf"))
    assert "<Xdmf" in open(str(tmp_path / "out.xdmf")).read()


def test_plotting(tmp_path, mesh):
    u = np.sin(mesh.points[:, 0] * 3)
    p1 = plotting.plot_field(mesh, u, "t", "field2d", str(tmp_path))
    p2 = plotting.plot_field(mesh, u, "t", "field3d", str(tmp_path), three_d=True)
    p3 = plotting.plot_grid(mesh, "grid", str(tmp_path), node_labels=True)
    p4, slope = plotting.plot_convergence(
        [0.1, 0.025, 0.00625], [4, 8, 16], "conv", "conv", str(tmp_path)
    )
    assert all(os.path.getsize(p) > 1000 for p in (p1, p2, p3, p4))
    np.testing.assert_allclose(slope, 2.0, atol=1e-10)


def test_realtime_gif(tmp_path, mesh):
    rp = plotting.RealtimePlot(mesh, str(tmp_path), "anim.gif", fps=5)
    for k in range(3):
        rp.add_frame(np.sin(mesh.points[:, 0] + k), eps=mesh.points[:, 1], t=0.1 * k)
    path = rp.close()
    assert path is None or os.path.getsize(path) > 500


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ck.npz")
    u = np.random.default_rng(0).normal(size=10)
    checkpoint.save_checkpoint(path, step=7, t=0.35, u_n=u, u_old=u * 2)
    ck = checkpoint.load_checkpoint(path)
    assert ck.step == 7 and np.isclose(ck.t, 0.35)
    np.testing.assert_allclose(ck.arrays["u_n"], u)
    np.testing.assert_allclose(ck.arrays["u_old"], 2 * u)


def test_guards():
    import jax.numpy as jnp

    assert not bool(guards.blown_up(jnp.ones(4)))
    assert bool(guards.blown_up(jnp.asarray([1e5, 0.0])))
    assert bool(guards.blown_up(jnp.asarray([jnp.nan, 0.0])))
    with pytest.raises(guards.BlowupError):
        guards.check_state(np.array([np.inf]))
    with pytest.raises(guards.BlowupError):
        guards.check_state(np.array([2e3]))
    assert guards.check_state(np.array([0.5])) == 0.5
    assert float(guards.clamp_final_dt(0.95, 0.1, 1.0)) == pytest.approx(0.05)


def test_metrics_summary():
    m = {"eps_max": np.array([0.1, 0.2]), "newton_converged": np.array([True, True])}
    s = metrics.metrics_to_json(m)
    assert "eps_max" in s and '"all": true' in s
    timer = metrics.StepTimer(1000)
    with timer:
        pass
    timer.count(10)
    assert timer.summary()["steps"] == 10


def test_cli_advection():
    from conservation_fem_tpu.__main__ import main

    assert main(["advection", "--mesh_size", "8", "--T", "0.05"]) == 0


def test_checkpoint_resume_bitexact(tmp_path):
    """Chunked + resumed KPP runs equal the single-scan run exactly."""
    import jax.numpy as jnp

    from conservation_fem_tpu.models import kpp

    ck = str(tmp_path / "kpp.npz")
    cfg = kpp.KPPConfig(mesh_size=4, T=0.1)
    r_plain = kpp.build(cfg).solve()
    r_ck = kpp.build(cfg).solve(checkpoint_path=ck, checkpoint_every=3)
    np.testing.assert_array_equal(np.asarray(r_plain.u), np.asarray(r_ck.u))
    # interrupt after 6 steps, then resume to the end
    p = kpp.build(cfg)
    p.num_steps = 6
    p.solve(checkpoint_path=ck + "2", checkpoint_every=3)
    r_res = kpp.build(cfg).solve(checkpoint_path=ck + "2",
                                 checkpoint_every=3, resume=True)
    np.testing.assert_array_equal(np.asarray(r_plain.u), np.asarray(r_res.u))


def test_streaming_xdmf_during_jitted_run(tmp_path):
    """Per-step streaming from INSIDE the jitted scan (io_callback):
    the written series matches the reference pattern of in-loop
    xdmf.write_function and round-trips through read_h5_series."""
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.utils.io import read_h5_series
    from conservation_fem_tpu.utils.streaming import StreamingXDMF

    p = kpp.build(kpp.KPPConfig(mesh_size=4, T=0.05))
    path = str(tmp_path / "stream.xdmf")
    with StreamingXDMF(path, p.host_mesh) as stream:
        res = p.solve(stream=stream)
    times, vals = read_h5_series(str(tmp_path / "stream.h5"), "uh")
    assert len(times) == p.num_steps
    np.testing.assert_allclose(times, (np.arange(p.num_steps) + 1) * p.dt,
                               rtol=1e-12)
    # last streamed frame == final solution
    np.testing.assert_allclose(vals[-1], np.asarray(res.u), atol=1e-12)


def test_streaming_sink_thinning(tmp_path):
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.utils.streaming import StreamingSink

    p = kpp.build(kpp.KPPConfig(mesh_size=4, T=0.05))
    got = []
    sink = StreamingSink(lambda u, t: got.append(t), every=2)
    p.solve(stream=sink)
    assert len(got) == -(-p.num_steps // 2)
