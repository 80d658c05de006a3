"""Probe: n=1 SPMD forms of the sharded twins on ONE real TPU chip.

VERDICT r4 item 6: every parallel/ twin was correctness-validated on the
virtual CPU mesh only; the grid-Stokes probe proved an SPMD form can WIN
on a single chip (5.3-7.2x — it became the single-chip default). This
probe runs the 1-device SPMD forms of

  * DistributedBlocked — blocked P1 KPP on the reference gmsh mesh,
    bench fixed-iteration config (the bench_blocked headline row), and
  * ShardedFusedStructured — the fused structured kernel at mesh 64
    (kernel="block"), the bench.py headline config,

with amortized chained-rep timing, and reports sharded-form vs
single-form per-step cost plus end-state agreement and the per-step
collective-byte estimate (what a real n-chip run would ship over ICI:
the band/deep-row halos plus the psum/pmax scalars).

Usage: python scripts/probe_sharded_onchip.py   (on the TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _amortized(run_r, sync, reps=(1, 3), trials=2):
    """run_r(R) -> jitted callable chaining R solves; differenced."""
    times = {}
    out = None
    for R in reps:
        fn = run_r(R)
        o = fn()
        sync(o)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            o = fn()
            sync(o)
            best = min(best, time.perf_counter() - t0)
        times[R] = best
        if R == reps[0]:
            out = o
    per_solve = (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0])
    return per_solve, out


def probe_blocked(jax, jnp):
    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.parallel.blocked_sharded import (
        DistributedBlocked,
    )

    cfg = kpp.KPPConfig(mesh_source=kpp.KPP_REFERENCE_H5, dtype="float32",
                        backend="ell", ell_matvec_backend="blocked",
                        modified_newton=True, cg_iters=10, newton_iters=3,
                        newton_linear_iters=8,
                        T=float(os.environ.get("PROBE_T", 1.0)))
    p = kpp.build(cfg)
    n = int(p.u0.shape[0])
    num_steps = p.num_steps
    sync = lambda u: float(np.asarray(jnp.sum(u)))

    # single-chip form
    def single_r(R):
        @jax.jit
        def run(state, u0):
            with p.bound_jit_state(state):
                ts = (jnp.arange(num_steps, dtype=u0.dtype) + 1.0) * p.dt

                def rep(u, _):
                    def body(c, t):
                        return p.step(c, t)[0], None

                    (uh, _, _), _ = jax.lax.scan(body, (u, u, u), ts)
                    return uh, None

                u, _ = jax.lax.scan(rep, u0, None, length=R)
            return u

        return lambda: run(p._jit_state(), p.u0)

    t_single, u_single = _amortized(single_r, sync)

    # 1-device SPMD form
    dmesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("i",))
    tw = DistributedBlocked(kpp.build(cfg), dmesh)
    step = tw.make_step()
    state = (tw.M_s, tw.Kbc_s, tw.Gcell_s, tw.Sv_s, tw.Abool_s,
             tw.area_s, tw.grads_s, tw.bcrow_s, tw.patchdeg_s,
             tw.diag_eye, tw.h_s, tw.pts_s, tw.valid_s)

    def spmd_r(R):
        @jax.jit
        def run(state, u0):
            ts = (jnp.arange(num_steps, dtype=u0.dtype) + 1.0) * tw.p.dt

            def rep(u, _):
                def body(c, t):
                    return step(*state, *c, t), None

                (uh, _, _), _ = jax.lax.scan(body, (u, u, u), ts)
                return uh, None

            u, _ = jax.lax.scan(rep, u0, None, length=R)
            return u

        return lambda: run(state, tw.u0_s)

    t_spmd, u_spmd = _amortized(spmd_r, sync)
    u_spmd_n = np.asarray(u_spmd).reshape(-1)[:tw.plan.n]
    agree = float(np.abs(u_spmd_n - np.asarray(u_single)).max())
    # per-step ICI budget at n chips: 2 band halos (B rows) each side per
    # windowed operator application + psum scalars. Dominant: the halo'd
    # window reads — ship 2*B rows * 4 B per exchange; count exchanges/step
    B = tw.plan.B
    halo_bytes = 2 * B * 4
    print(f"blocked refmesh N={n}: single {t_single/num_steps*1e6:.1f} "
          f"us/step, 1-dev SPMD {t_spmd/num_steps*1e6:.1f} us/step "
          f"(ratio {t_spmd/t_single:.2f}); end-state max-abs {agree:.2e}; "
          f"band-halo {halo_bytes/1024:.1f} KiB per exchange per side",
          flush=True)


def probe_fused_structured(jax, jnp):
    import dataclasses as _dc

    from conservation_fem_tpu.models import kpp
    from conservation_fem_tpu.parallel.structured_fused_sharded import (
        ShardedFusedStructured,
    )

    cfg = kpp.KPPConfig(mesh_size=64, dtype="float32", dt=0.01,
                        modified_newton=True, cg_iters=10, newton_iters=2,
                        newton_linear_iters=16, inner_solver="cheby",
                        T=float(os.environ.get("PROBE_T", 1.0)))
    p1 = kpp.build(cfg)
    p1.cfg = _dc.replace(p1.cfg, use_pallas=True)
    n = int(p1.u0.shape[0])
    num_steps = p1.num_steps
    sync = lambda u: float(np.asarray(jnp.sum(u)))

    def single_r(R):
        @jax.jit
        def run(state, u0):
            with p1.bound_jit_state(state):
                ts = (jnp.arange(num_steps, dtype=u0.dtype) + 1.0) * p1.dt

                def rep(u, _):
                    def body(c, t):
                        return p1.step(c, t)[0], None

                    (uh, _, _), _ = jax.lax.scan(body, (u, u, u), ts)
                    return uh, None

                u, _ = jax.lax.scan(rep, u0, None, length=R)
            return u

        return lambda: run(p1._jit_state(), p1.u0)

    t_single, u_single = _amortized(single_r, sync)

    dmesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("i",))
    tw = ShardedFusedStructured(kpp.build(cfg), dmesh, kernel="block")
    step = tw.make_step()
    u0 = jnp.pad(tw.p.u0.reshape(tw.n1x, tw.n1y), ((0, tw.pad_rows), (0, 0)))
    u0 = jax.device_put(u0, tw.shard)

    def spmd_r(R):
        @jax.jit
        def run(Mc, pts, valid, u0):
            ts = (jnp.arange(num_steps, dtype=u0.dtype) + 1.0) * tw.p.dt

            def rep(u, _):
                def body(c, t):
                    return step(Mc, pts, valid, *c, t), None

                (uh, _, _), _ = jax.lax.scan(body, (u, u, u), ts)
                return uh, None

            u, _ = jax.lax.scan(rep, u0, None, length=R)
            return u

        return lambda: run(tw.Mc_s, tw.pts_s, tw.valid_s, u0)

    t_spmd, u_spmd = _amortized(spmd_r, sync)
    u_spmd_n = np.asarray(u_spmd)[:tw.n1x].reshape(-1)
    agree = float(np.abs(u_spmd_n - np.asarray(u_single)).max())
    from conservation_fem_tpu.ops.pallas_fused import required_halo

    halo = required_halo(cfg.cg_iters, cfg.newton_iters,
                         cfg.newton_linear_iters)
    halo_bytes = 4 * halo * (64 * 4 + 1) * 4   # 4 fields x halo rows x n1y f32
    print(f"fused structured mesh 64 N={n}: single "
          f"{t_single/num_steps*1e6:.1f} us/step, 1-dev SPMD "
          f"{t_spmd/num_steps*1e6:.1f} us/step "
          f"(ratio {t_spmd/t_single:.2f}); end-state max-abs {agree:.2e}; "
          f"deep halo {halo} rows -> {halo_bytes/1024:.1f} KiB per "
          f"exchange per side", flush=True)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)
    probe_blocked(jax, jnp)
    probe_fused_structured(jax, jnp)


if __name__ == "__main__":
    main()
