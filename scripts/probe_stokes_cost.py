"""Where does the Stokes lattice step's time go? (TPU probe)

Motivation: the r4 stokes_mg capture showed nx=64 step time is ~18 ms
for Jacobi-fixed (ki=64, kip=192), MG-fixed (ki=6, kip=6) AND adaptive
alike — a ~10x drop in solver matvecs moved nothing, so the step is
bound by something OUTSIDE the Krylov iterations (convection quadrature,
fixed per-step operator applications, or layout/transpose traffic).

Times the full step at several fixed iteration counts (amortized
chained-repetition harness reused from bench_stokes). Run on the TPU,
serialized with other TPU jobs; CPU numbers don't transfer.

Usage: python scripts/probe_stokes_cost.py [nx]   (default 64)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from bench_stokes import run

    from conservation_fem_tpu.models import stokes

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    base = dict(nx=nx, num_steps=500, T=10.0, dtype="float32",
                krylov_rtol=1e-6, backend="lattice")
    rows = [
        ("jacobi ki=1 kip=1", dict(krylov_iters=1, krylov_iters_pressure=1)),
        ("jacobi ki=8 kip=8", dict(krylov_iters=8, krylov_iters_pressure=8)),
        ("jacobi ki=nx kip=3nx", dict(krylov_iters=nx)),
        ("mg ki=1 kip=1", dict(multigrid=True, krylov_iters=1,
                               krylov_iters_pressure=1)),
        ("mg ki=6", dict(multigrid=True, krylov_iters=6)),
    ]
    for label, kw in rows:
        t, _ = run(stokes.build(**dict(base, **kw)), 10)
        print(f"nx {nx:4d}  {label:24s} {t * 1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
