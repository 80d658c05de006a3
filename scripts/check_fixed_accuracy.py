"""Validate fixed-iteration configs: per-step Newton convergence flags on
TPU (f32) + field agreement with the adaptive tight config."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import __graft_entry__ as ge

    ge._enable_compile_cache()

    from conservation_fem_tpu.models import kpp

    for ms, cgi, ni, li, frz in [(32, 10, 2, 8, True), (64, 10, 2, 8, True),
                                 (128, 10, 3, 10, False),
                                 (128, 10, 2, 8, True)]:
        cfg = kpp.KPPConfig(
            mesh_size=ms, dtype="float32", modified_newton=frz,
            cg_iters=cgi, newton_iters=ni, newton_linear_iters=li,
            record_metrics=True)
        p = kpp.build(cfg)
        res = p.solve()
        m = res.metrics
        conv = np.asarray(m["newton_converged"])
        rn = np.asarray(m["residual_norm"])
        u = np.asarray(res.u)
        print(f"mesh {ms} cg={cgi} n={ni} l={li} frz={frz}: "
              f"converged {conv.sum()}/{len(conv)} steps, "
              f"max resnorm {rn.max():.3e}, range [{u.min():.3f},{u.max():.3f}]",
              flush=True)

    # field agreement vs adaptive tight at mesh 64
    pa = kpp.build(kpp.KPPConfig(mesh_size=64, dtype="float32",
                                 krylov_rtol=1e-6, newton_linear_rtol=1e-4))
    ua = np.asarray(pa.solve().u)
    pf = kpp.build(kpp.KPPConfig(mesh_size=64, dtype="float32",
                                 modified_newton=True, cg_iters=10,
                                 newton_iters=2, newton_linear_iters=8))
    uf = np.asarray(pf.solve().u)
    d = np.abs(ua - uf)
    print(f"mesh64 fixed-vs-adaptive: Linf {d.max():.3e} "
          f"L2rel {np.linalg.norm(d)/np.linalg.norm(ua):.3e}")


if __name__ == "__main__":
    main()
