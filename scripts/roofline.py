"""Roofline / utilization accounting for the bench KPP-RV step.

For each mesh size: compile the bench-config solve, pull XLA's own cost
model (flops + bytes accessed) from compiled.cost_analysis(), measure the
per-step time, and report effective FLOP/s and HBM GB/s against the v5e
peaks. Answers VERDICT r1 "what bound is the kernel at and how far from
it do we sit".

v5e peaks (public: cloud.google.com/tpu/docs/v5e): 197 TFLOP/s bf16 MXU,
f32 VPU on the order of ~4 TFLOP/s (8 MACs/cycle/lane * 8 lanes * 128 *
0.94 GHz), HBM 819 GB/s. This workload is stencil/elementwise (VPU +
HBM), not MXU.

Usage: python scripts/roofline.py [mesh_size ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PEAK = 819e9          # bytes/s, v5e
VPU_F32_PEAK = 3.9e12     # flop/s, v5e VPU f32 (8*128*8 lanes*2(FMA)*0.94GHz/2)


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()
    import jax

    from conservation_fem_tpu.models import kpp

    sizes = [int(s) for s in sys.argv[1:]] or [32, 64, 128, 256]
    rows = []
    for ms in sizes:
        cfg = kpp.KPPConfig(
            mesh_size=ms, dtype="float32",
            modified_newton=(ms <= 64), cg_iters=10,
            newton_iters=2 if ms <= 64 else 3,
            newton_linear_iters=8 if ms <= 64 else 10)
        p = kpp.build(cfg)
        n = int(p.u0.shape[0])

        res = p.solve()
        jax.block_until_ready(res.u)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            res = p.solve()
            jax.block_until_ready(res.u)
            best = min(best, time.perf_counter() - t0)
        t_step = best / res.num_steps

        # XLA cost model on the solve executable (whole scan)
        ca = None
        try:
            traced = p._solve_jit.lower(p._jit_state(), p.u0)
            ca = traced.compile().cost_analysis()
        except Exception as e:
            print(f"mesh {ms}: cost_analysis unavailable ({e})",
                  file=sys.stderr)
        if ca is None:
            continue
        flops = float(ca.get("flops", 0.0)) / res.num_steps
        bytes_acc = float(ca.get("bytes accessed", 0.0)) / res.num_steps
        eff_flops = flops / t_step
        eff_bw = bytes_acc / t_step
        ai = flops / max(bytes_acc, 1.0)
        rows.append((ms, n, t_step, flops, bytes_acc, eff_flops, eff_bw, ai))
        print(f"mesh {ms:4d} N={n:7d}  {t_step*1e3:7.3f} ms/step  "
              f"{flops/1e6:8.1f} MFLOP/step  {bytes_acc/1e6:8.1f} MB/step  "
              f"{eff_flops/1e9:7.1f} GFLOP/s ({eff_flops/VPU_F32_PEAK*100:5.2f}% VPU)  "
              f"{eff_bw/1e9:7.1f} GB/s ({eff_bw/HBM_PEAK*100:5.1f}% HBM)  "
              f"AI={ai:.2f}", flush=True)

    print("\nbinding resource: HBM if %HBM >> %VPU at the largest mesh; "
          "launch/dispatch overhead if both are small and ms/step ~ flat "
          "with N.")


if __name__ == "__main__":
    main()
