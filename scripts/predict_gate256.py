"""CPU f32 gate prediction for the mesh-256 bench path.

The TPU capture chain saw bench.py rc=1 twice at mesh 256 (accuracy
gate suspected: the tiled kernel is forced onto the dot-free Chebyshev
inner solver, whose mesh-64 L2rel was already measured at 1.1e-2 vs
BiCGStab's 3.8e-3 — bench.py:_config comment). The stencil step has no
MXU einsums, so CPU f32 tracks TPU f32 closely; running the SAME bench
config on CPU f32 against the committed f64 anchor predicts the gate
verdict per inner-solver config without burning tunnel time.

Usage: python scripts/predict_gate256.py [mesh] [cheby|bicgstab ...]
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import jax.numpy as jnp  # noqa: E402

from conservation_fem_tpu.models import kpp


def run_cfg(mesh, name):
    dt = 0.01 * min(1.0, 64.0 / mesh)
    if name == "cheby":
        cfg = kpp.KPPConfig(mesh_size=mesh, dtype="float32", dt=dt,
                            modified_newton=True, cg_iters=10,
                            newton_iters=2, newton_linear_iters=16,
                            inner_solver="cheby")
    else:
        cfg = kpp.KPPConfig(mesh_size=mesh, dtype="float32", dt=dt,
                            modified_newton=True, cg_iters=6,
                            newton_iters=2, newton_linear_iters=4,
                            inner_solver="bicgstab")
    p = kpp.build(cfg)

    @jax.jit
    def run(state, u0):
        with p.bound_jit_state(state):
            ts = (jnp.arange(p.num_steps, dtype=u0.dtype) + 1.0) * p.dt
            (uh, _, _), _ = jax.lax.scan(p.step, (u0, u0, u0), ts)
        return uh

    t0 = time.perf_counter()
    u = np.asarray(run(p._jit_state(), p.u0))
    dtp = time.perf_counter() - t0
    ref = np.load(f"golden/kpp_rv_anchor_mesh{mesh}.npy").astype(np.float64)
    rel = float(np.linalg.norm(u - ref) / np.linalg.norm(ref))
    print(f"mesh {mesh} {name:9s}: L2rel vs f64 anchor = {rel:.3e} "
          f"(gate 1e-2) [{dtp:.0f}s, {p.num_steps} steps]", flush=True)
    return rel


if __name__ == "__main__":
    mesh = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = sys.argv[2:] or ["cheby", "bicgstab"]
    for n in names:
        run_cfg(mesh, n)
