"""Calibrate the Stokes fixed-iteration pressure solve (CPU, f64).

The pressure Poisson's Jacobi-CG condition grows ~1/h^2, so the fixed
iteration count must scale ~nx (sqrt of the condition). This script runs
the adaptive 1e-11 solution per nx, then fixed configs with
krylov_iters=ki and krylov_iters_pressure = alpha*nx, and reports
Linf/L2rel vs adaptive plus the Poiseuille oracle error — the data behind
StokesConfig's auto-scaled kip default.

Usage: python scripts/calibrate_stokes_ki.py [nx ...]  (default 32 64)
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conservation_fem_tpu.models import stokes  # noqa: E402


def run(nx, **kw):
    t0 = time.perf_counter()
    res = stokes.solve(cfg=stokes.StokesConfig(nx=nx, **kw))
    el = time.perf_counter() - t0
    return res, el


def main():
    meshes = [int(a) for a in sys.argv[1:]] or [32, 64]
    for nx in meshes:
        ra, ta = run(nx)
        ua = np.asarray(ra.u)
        print(f"nx {nx} adaptive: oracle L2 {ra.error_l2:.3e}  ({ta:.0f}s)",
              flush=True)
        # BOTH counts must scale with nx (momentum kappa ~ 1 + dt*mu/h^2,
        # pressure kappa ~ 1/h^2) — the nx-64 calibration showed ki=25
        # under-converging; probe the historical 25 and the ~nx scaling
        for ki in sorted({25, nx} if nx <= 64 else {nx}):
            for alpha in ((1, 2, 3) if nx <= 64 else (3,)):
                kip = alpha * nx
                rf, tf = run(nx, krylov_iters=ki, krylov_iters_pressure=kip)
                uf = np.asarray(rf.u)
                d = np.abs(uf - ua)
                print(f"  ki={ki:3d} kip={kip:3d}: Linf {d.max():.3e}  "
                      f"L2rel {np.linalg.norm(d)/np.linalg.norm(ua):.3e}  "
                      f"oracle L2 {rf.error_l2:.3e}  ({tf:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
