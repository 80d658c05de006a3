"""Probe: the grid-native (gather-free) Stokes step on one TPU chip.

probe_stokes_cost measured a ~16.2 ms solve-INDEPENDENT floor at nx=64:
the single-device lattice backend still builds its per-step RHS terms
(convection quadrature, pressure-div/edge, div, grad) through the
gather/scatter ELL ops — only the three solves ride the lattice planes.
ShardedStokes already computes the ENTIRE step in grid space (R-plane
blockmv rhs, strided-slice convection, COO-plane couplings); on a
1-device mesh it is exactly the gather-free single-chip step.

This times that step (amortized: two scan lengths differenced inside
fresh jits, cancelling the per-call tunnel constant) and checks Linf
against the current lattice path. If the win holds, the grid-space step
becomes the single-device lattice formulation.

Usage: python scripts/probe_stokes_grid.py [nx ...]   (default 32 64)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_grid(sh, num_steps, reps=(1, 3)):
    import jax

    step = sh.make_step()
    u0, p0 = sh.init_state()

    times = {}
    u = None
    for R in reps:
        @jax.jit
        def _run(u0, p0):
            def rep(carry, _):
                def body(c, _):
                    return step(*c), None

                c, _ = jax.lax.scan(body, carry, None, length=num_steps)
                return c, None

            (u, pn), _ = jax.lax.scan(rep, (u0, p0), None, length=R)
            return u, pn

        u, pn = _run(u0, p0)
        s = float(np.asarray(u).sum())
        assert np.isfinite(s), "grid step produced non-finite state"
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            u, pn = _run(u0, p0)
            s = float(np.asarray(u).sum())
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    per_step = (times[reps[1]] - times[reps[0]]) / (
        (reps[1] - reps[0]) * num_steps)
    return per_step, np.asarray(u)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()

    import jax

    from conservation_fem_tpu.models import stokes
    from conservation_fem_tpu.parallel.stokes_sharded import ShardedStokes

    from bench_stokes import run as run_lattice

    sizes = [int(s) for s in sys.argv[1:]] or [32, 64]
    steps = 10
    for nx in sizes:
        base = dict(nx=nx, num_steps=500, T=10.0, dtype="float32",
                    krylov_rtol=1e-6, backend="lattice")
        # oracle + baseline time: the current single-device lattice path
        # (same chained horizon: reps (1,3) x 10 steps -> u after 30)
        t_ref, u_ref = run_lattice(stokes.build(**base), steps)
        print(f"nx {nx:4d}  lattice (gather rhs) {t_ref * 1e3:8.2f} ms/step",
              flush=True)
        dmesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("i",))
        for label, kw in [("grid adaptive", {}),
                          ("grid fixed ki=nx", dict(krylov_iters=nx)),
                          ("grid MG ki=6", dict(multigrid=True,
                                                krylov_iters=6))]:
            sh = ShardedStokes(*stokes.build(**dict(base, **kw)), dmesh)
            t, u_grid = time_grid(sh, steps)
            # grid layout -> dof vectors (same mapping as ShardedStokes.solve)
            uh = u_grid[:, :sh.nI2]
            u_dof = np.stack([uh[s].reshape(-1)[np.asarray(sh.plan2.idx)]
                              for s in range(2)])
            d = np.abs(u_dof - u_ref).max()
            print(f"nx {nx:4d}  {label:18s} {t * 1e3:8.2f} ms/step   "
                  f"Linf vs lattice {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
