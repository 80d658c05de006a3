"""TPU timing: Stokes IPCS step — gather-ELL vs lattice-plane backend.

Usage: python scripts/bench_stokes.py [nx ...]   (default 32 64)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(prob_fd, num_steps):
    import jax
    import jax.numpy as jnp
    from conservation_fem_tpu.models.stokes import make_step

    p, fd = prob_fd
    step = make_step(p, fd)

    @jax.jit
    def _run(u0, p0):
        (u, pn), _ = jax.lax.scan(step, (u0, p0), None, length=num_steps)
        return u, pn

    u, pn = _run(p.u0, p.p0)
    jax.block_until_ready(u)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        u, pn = _run(p.u0, p.p0)
        jax.block_until_ready(u)
        best = min(best, time.perf_counter() - t0)
    return best / num_steps, np.asarray(u)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    from conservation_fem_tpu.models import stokes

    sizes = [int(s) for s in sys.argv[1:]] or [32, 64]
    steps = 10
    for nx in sizes:
        n2 = (2 * nx + 1) ** 2
        base = dict(nx=nx, num_steps=500, T=10.0, dtype="float32",
                    krylov_rtol=1e-6)
        t_e, u_e = run(stokes.build(**base), steps)
        print(f"nx {nx:4d} (N2={n2})  ell:     {t_e*1e3:8.2f} ms/step",
              flush=True)
        t_l, u_l = run(stokes.build(**base, backend="lattice"), steps)
        d = np.abs(u_l - u_e).max()
        print(f"nx {nx:4d} (N2={n2})  lattice: {t_l*1e3:8.2f} ms/step   "
              f"speedup {t_e/t_l:.2f}x   Linf vs ell {d:.2e}", flush=True)
        t_f, u_f = run(stokes.build(**base, backend="lattice",
                                    krylov_iters=25), steps)
        d = np.abs(u_f - u_e).max()
        print(f"nx {nx:4d} (N2={n2})  lattice+fixed(25): {t_f*1e3:8.2f} "
              f"ms/step   speedup {t_e/t_f:.2f}x   Linf vs ell {d:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
