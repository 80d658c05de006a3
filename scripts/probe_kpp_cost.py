"""Where does the composed-XLA KPP-RV step's time go at mesh >= 256?

The mesh-256 capture (docs/tpu_capture_r4/mesh256_xla.log) measured
9.21 ms/step for the bench BiCGStab config (cg 6, frozen Newton 2x4).
A crude byte count (≈30 seven-plane matvecs x 29.4 MB + plane builds
≈ 0.9 GB/step) puts the HBM-bound floor near 1.1 ms — 12% of peak.
This probe decomposes the step by differencing solver-iteration and
stabilization knobs on-chip (amortized chained-repetition timing, the
bench.py `_measure` harness):

  * cg_iters 0-extra: mass-solve marginal cost per CG iteration
  * newton_linear_iters: Jacobian matvec marginal cost per BiCGStab it
  * newton_iters: per-Newton fixed cost (linearize + residual passes)
  * stabilization gfem vs rv: the RV-epsilon pass (patch reductions)

Run on the TPU, serialized with other TPU jobs.

Usage: python scripts/probe_kpp_cost.py [mesh_size]   (default 256)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import __graft_entry__ as ge

    ge._enable_compile_cache()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    sys.modules["benchmod"] = bench
    spec.loader.exec_module(bench)

    from conservation_fem_tpu.models import kpp

    ms = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    base = bench._config(kpp, ms, "float32")
    # short horizon: the probe differencing needs per-step cost, not the
    # full bench trajectory (80 steps keeps each variant ~2 min)
    base = dc.replace(base, T=0.1)

    rows = [
        ("bench config (cg6, 2x4)", {}),
        ("cg 12 (mass +6 iters)", dict(cg_iters=12)),
        ("nl 8 (J +8 matvecs)", dict(newton_linear_iters=8)),
        ("newton 3 (+1 lin+resid)", dict(newton_iters=3)),
        ("no final residual eval", dict(newton_final_residual=False)),
        ("bf16 sweep planes", dict(xla_bf16_planes=True)),
    ]
    for label, kw in rows:
        p = kpp.build(dc.replace(base, **kw))
        try:
            t, _ = bench._measure(p, jnp, jax)
        except RuntimeError as e:  # e.g. an unstabilized variant blows up
            print(f"mesh {ms}  {label:28s} FAILED: {e}", flush=True)
            continue
        print(f"mesh {ms}  {label:28s} {t * 1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
