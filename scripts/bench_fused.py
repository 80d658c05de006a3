"""TPU timing: fused whole-step Pallas kernel vs XLA fixed-iteration step.

Usage: python scripts/bench_fused.py [mesh_size ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(p):
    import jax

    res = p.solve()
    jax.block_until_ready(res.u)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = p.solve()
        jax.block_until_ready(res.u)
        best = min(best, time.perf_counter() - t0)
    return best / p.num_steps, np.asarray(res.u)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import dataclasses as dc

    from conservation_fem_tpu.models import kpp

    sizes = [int(s) for s in sys.argv[1:]] or [32, 64]
    for ms in sizes:
        n_dofs = (4 * ms + 1) ** 2
        cfg = kpp.KPPConfig(
            mesh_size=ms, dtype="float32",
            modified_newton=(ms <= 64), cg_iters=10,
            newton_iters=2 if ms <= 64 else 3,
            newton_linear_iters=8 if ms <= 64 else 10)
        p = kpp.build(cfg)
        t_x, u_x = run(p)
        print(f"mesh {ms} XLA fixed:   {t_x*1e3:8.3f} ms/step = "
              f"{n_dofs/t_x/1e6:8.1f} M DOF-steps/s", flush=True)
        p2 = kpp.build(cfg)
        p2.cfg = dc.replace(p2.cfg, use_pallas=True)
        if not p2._fused_pallas_ok():
            print(f"mesh {ms}: fused kernel does not fit VMEM, skipped",
                  flush=True)
            continue
        t_p, u_p = run(p2)
        d = np.abs(u_p - u_x)
        print(f"mesh {ms} fused pallas:{t_p*1e3:8.3f} ms/step = "
              f"{n_dofs/t_p/1e6:8.1f} M DOF-steps/s   "
              f"Linf vs XLA {d.max():.2e}  speedup {t_x/t_p:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
