"""Roofline / MFU accounting for the structured KPP bench step.

Uses XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) for ONE jitted stabilized step at the bench configuration, then
measures the achieved step time inside lax.scan and reports achieved
GFLOP/s and GB/s against the v5e peaks.

v5e peaks used (public spec): HBM bandwidth 819 GB/s; bf16 MXU
197 TFLOP/s. The stencil step is elementwise VPU work (shifted MACs),
not MXU matmuls, so the binding resource is HBM bandwidth — the roofline
ratio to report is bytes/step vs 819 GB/s.

Usage: python scripts/roofline.py [mesh_size ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0


def bench_config(ms):
    from conservation_fem_tpu.models import kpp

    return kpp.KPPConfig(
        mesh_size=ms, dtype="float32",
        modified_newton=True, cg_iters=10,
        newton_iters=2, newton_linear_iters=8)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from conservation_fem_tpu.models import kpp

    sizes = [int(s) for s in sys.argv[1:]] or [64, 128]
    for ms in sizes:
        p = kpp.build(bench_config(ms))
        n = int(p.u0.shape[0])

        def fn(u, uo, uoo, t):
            (uh, a, b), _ = p.step((u, uo, uoo), t)
            return uh, a, b

        t0 = jnp.asarray(p.dt, p.u0.dtype)
        lowered = jax.jit(fn).lower(p.u0, p.u0, p.u0, t0)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        bytes_acc = float(ca.get("bytes accessed", float("nan")))

        # measured per-step time inside the scan (the bench path)
        res = p.solve()
        jax.block_until_ready(res.u)
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            res = p.solve()
            jax.block_until_ready(res.u)
            best = min(best, time.perf_counter() - t1)
        step_s = best / p.num_steps

        gflops = flops / step_s / 1e9
        gbs = bytes_acc / step_s / 1e9
        print(f"mesh {ms} (N={n}):")
        print(f"  XLA cost model: {flops/1e6:.1f} MFLOP/step, "
              f"{bytes_acc/1e6:.1f} MB accessed/step "
              f"(arith intensity {flops/bytes_acc:.2f} flop/byte)")
        print(f"  measured {step_s*1e3:.3f} ms/step = "
              f"{n/step_s/1e6:.1f} M DOF-steps/s")
        print(f"  achieved {gflops:.1f} GFLOP/s "
              f"({100*gflops/1e3/V5E_BF16_TFLOPS:.2f}% of bf16 peak), "
              f"{gbs:.1f} GB/s ({100*gbs/V5E_HBM_GBS:.1f}% of HBM peak)")
        hbm_bound_step = bytes_acc / (V5E_HBM_GBS * 1e9)
        print(f"  HBM speed-of-light step: {hbm_bound_step*1e3:.3f} ms "
              f"(we are {step_s/hbm_bound_step:.1f}x away)", flush=True)


if __name__ == "__main__":
    main()
