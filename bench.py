"""Benchmark: KPP rotating-wave RV throughput (DOF-steps/sec/chip).

The driver-defined north-star metric (BASELINE.json): DOF-steps/sec/chip on
the KPP RV workload, compared against the reference stack's throughput. The
reference stack (DOLFINx+PETSc LU+Python RV loops) is not installable here;
the baseline is a measured scipy sparse-direct proxy with the same
algorithmic structure (see conservation_fem_tpu/utils/baseline_proxy.py —
if anything faster than real DOLFINx because it reuses factorizations the
reference rebuilds each step).

Prints ONE JSON line:
  {"metric": ..., "value": DOF-steps/s on this chip,
   "unit": "DOF-steps/s", "vs_baseline": value / proxy_DOF-steps/s}
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: repeat bench runs (e.g. the driver's)
    # skip the multi-minute TPU compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from conservation_fem_tpu.models import kpp

    mesh_size = int(os.environ.get("BENCH_MESH_SIZE", 64))
    steps_proxy = int(os.environ.get("BENCH_PROXY_STEPS", 3))
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = "float32" if on_tpu else "float64"

    if dtype == "float32":
        # fixed-iteration unrolled solvers (ops/krylov.cg_fixed /
        # newton_fixed): each adaptive while-loop iteration costs ~270 us
        # of launch overhead on this TPU runtime, so the throughput path
        # unrolls. Iteration counts are accuracy-validated per mesh size:
        #   <=64: frozen-Jacobian Newton, 2 its x 8 BiCGStab — L2rel vs
        #         f64 ground truth 6.2e-3 (adaptive round-1 config: 5.1e-3)
        #   >=128: exact-Jacobian Newton, 3 its x 10 — L2rel 4.4e-3 vs the
        #          adaptive exact-Newton anchor (frozen Newton needs CFL<~1)
        # Default mesh 64 + the fused whole-step Pallas kernel (ONE Mosaic
        # launch per step, ops/pallas_fused.py): 0.47 ms/step = 141 M
        # DOF-steps/s, 1.6x over the composed XLA step, and MORE accurate
        # (L2rel vs f64 truth: 7.6e-4 vs 3.6e-3 at mesh 32 — the in-kernel
        # accumulation order is closer to f64). Past the single kernel's
        # VMEM ceiling the SPLIT fused kernel runs (mesh 128: 141.5 M,
        # 1 + newton_iters launches); mesh >=256 falls back to the
        # composed XLA path (73 M). See _fused_mode / RESULTS.md.
        cfg = kpp.KPPConfig(
            mesh_size=mesh_size, dtype=dtype,
            modified_newton=(mesh_size <= 64),
            cg_iters=10,
            newton_iters=2 if mesh_size <= 64 else 3,
            newton_linear_iters=8 if mesh_size <= 64 else 10,
        )
    else:
        cfg = kpp.KPPConfig(mesh_size=mesh_size, dtype=dtype,
                            krylov_rtol=1e-12)
    p = kpp.build(cfg)
    if dtype == "float32" and not os.environ.get("BENCH_NO_FUSED"):
        import dataclasses as _dc

        p.cfg = _dc.replace(p.cfg, use_pallas=True)  # gate decides per mesh
    n_dofs = int(p.u0.shape[0])

    verbose = os.environ.get("BENCH_VERBOSE")

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    # compile + warm run
    t0 = time.perf_counter()
    res = p.solve()
    jax.block_until_ready(res.u)
    log(f"compile+first solve: {time.perf_counter()-t0:.1f}s")
    elapsed = float("inf")
    for _ in range(3):                      # best-of-3: the solve is fast
        t0 = time.perf_counter()            # enough that dispatch jitter
        res = p.solve()                     # matters
        jax.block_until_ready(res.u)
        elapsed = min(elapsed, time.perf_counter() - t0)
    log(f"timed solve (best of 3): {elapsed:.3f}s")
    u = np.asarray(res.u)
    if not np.isfinite(u).all() or u.min() < 0.5 or u.max() > 12.0:
        print(json.dumps({"metric": "KPP-RV DOF-steps/sec/chip",
                          "value": 0, "unit": "DOF-steps/s",
                          "vs_baseline": 0,
                          "error": "solution sanity check failed"}))
        sys.exit(1)
    value = n_dofs * res.num_steps / elapsed

    # measured proxy baseline (scipy sparse LU + python RV loop). Measured
    # at mesh <=32 regardless of the bench mesh: the proxy's per-DOF cost
    # GROWS with N (sparse LU fill-in + per-node Python loops — mesh 128
    # would take hours), so normalizing by its mesh-32 per-DOF throughput
    # is conservative for vs_baseline at larger bench meshes.
    from conservation_fem_tpu.models import kpp as _kpp
    from conservation_fem_tpu.utils.baseline_proxy import make_kpp_proxy

    proxy_ms = min(mesh_size, 32)
    p_proxy = (p if proxy_ms == mesh_size
               else _kpp.build(_kpp.KPPConfig(mesh_size=proxy_ms, dtype=dtype)))
    proxy = make_kpp_proxy(p_proxy.host_mesh, dt=cfg.dt)
    u0 = np.asarray(p_proxy.u0, dtype=np.float64)
    proxy.step(u0, u0, u0)  # warm numpy caches
    t0 = time.perf_counter()
    proxy.solve(u0, steps_proxy)
    proxy_elapsed = time.perf_counter() - t0
    n_dofs_proxy = int(p_proxy.u0.shape[0])
    # baseline DOF-steps/s at the proxy mesh (its per-DOF throughput only
    # degrades at larger N, so this denominator is conservative)
    proxy_value = n_dofs_proxy * steps_proxy / proxy_elapsed
    log(f"proxy (mesh {proxy_ms}) {steps_proxy} steps: {proxy_elapsed:.1f}s")

    out = {
        "metric": f"KPP-RV DOF-steps/sec/chip (N={n_dofs}, {res.num_steps} steps, {dtype})",
        "value": round(value, 1),
        "unit": "DOF-steps/s",
        "vs_baseline": round(value / proxy_value, 2),
    }
    if os.environ.get("BENCH_SWEEP"):
        # optional mesh-size sweep (same per-mesh validated configs)
        sweep = {}
        for ms in (32, 64, 128, 256):
            if ms == mesh_size:
                sweep[str(ms)] = round(value / 1e6, 2)
                continue
            c2 = kpp.KPPConfig(
                mesh_size=ms, dtype=dtype,
                modified_newton=(ms <= 64), cg_iters=10,
                newton_iters=2 if ms <= 64 else 3,
                newton_linear_iters=8 if ms <= 64 else 10,
            ) if dtype == "float32" else kpp.KPPConfig(
                mesh_size=ms, dtype=dtype)
            p2 = kpp.build(c2)
            if dtype == "float32" and not os.environ.get("BENCH_NO_FUSED"):
                import dataclasses as _dc

                p2.cfg = _dc.replace(p2.cfg, use_pallas=True)
            r2 = p2.solve()
            jax.block_until_ready(r2.u)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                r2 = p2.solve()
                jax.block_until_ready(r2.u)
                best = min(best, time.perf_counter() - t0)
            sweep[str(ms)] = round(
                int(p2.u0.shape[0]) * r2.num_steps / best / 1e6, 2)
        out["sweep_M_dofsteps_per_s"] = sweep
    print(json.dumps(out))


if __name__ == "__main__":
    main()
