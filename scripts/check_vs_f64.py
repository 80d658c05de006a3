"""Three-way accuracy: f64 adaptive (ground truth) vs f32 adaptive
(round-1 bench config) vs f32 fixed-iteration (round-2 bench config).

Run in two processes (platform pinning is per-process):
  python scripts/check_vs_f64.py tpu   # writes /tmp/kpp_f32_*.npy
  python scripts/check_vs_f64.py cpu   # runs f64, compares
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MS = int(os.environ.get("MS", 32))


def main():
    mode = sys.argv[1]
    if mode == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import __graft_entry__ as ge

    if mode == "tpu":
        ge._enable_compile_cache()

    from conservation_fem_tpu.models import kpp

    if mode == "tpu":
        pa = kpp.build(kpp.KPPConfig(mesh_size=MS, dtype="float32",
                                     krylov_rtol=1e-5,
                                     newton_linear_rtol=1e-3,
                                     modified_newton=True))
        np.save(f"/tmp/kpp_f32_adaptive_{MS}.npy", np.asarray(pa.solve().u))
        pf = kpp.build(kpp.KPPConfig(mesh_size=MS, dtype="float32",
                                     modified_newton=True, cg_iters=10,
                                     newton_iters=2, newton_linear_iters=8))
        np.save(f"/tmp/kpp_f32_fixed_{MS}.npy", np.asarray(pf.solve().u))
        print("saved")
    else:
        p64 = kpp.build(kpp.KPPConfig(mesh_size=MS, dtype="float64"))
        u64 = np.asarray(p64.solve().u)
        ua = np.load(f"/tmp/kpp_f32_adaptive_{MS}.npy")
        uf = np.load(f"/tmp/kpp_f32_fixed_{MS}.npy")
        for tag, u in (("f32 adaptive(r1 cfg)", ua), ("f32 fixed(r2 cfg)", uf)):
            d = np.abs(u - u64)
            print(f"{tag}: Linf {d.max():.3e}  "
                  f"L2rel {np.linalg.norm(d)/np.linalg.norm(u64):.3e}")


if __name__ == "__main__":
    main()
