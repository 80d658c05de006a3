"""Generate the demo figure gallery (parity with the reference's per-method
Figures/ directories, ref Code/*/Figures/*): field snapshots, convergence
plots, the Sod density profile vs the exact Riemann solution, and an
evolution GIF.

Usage:  python examples/make_figures.py [outdir]   (CPU, ~2 min)
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main(outdir="figures"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from conservation_fem_tpu.models import burgers, euler, kpp, linear_advection as la
    from conservation_fem_tpu.utils import plotting
    from conservation_fem_tpu.utils.convergence import run_convergence

    # 1. linear advection: solution + epsilon after one rotation (RV)
    p = la.build(la.AdvectionConfig(mesh_size=16, stabilization="rv_node"))
    res = la.solve(p)
    plotting.plot_field(p.host_mesh, res.u, "Advection RV, t=1", "adv_rv_sol",
                        outdir)
    plotting.plot_field(p.host_mesh, res.u, "Advection RV (3D)", "adv_rv_3d",
                        outdir, three_d=True)
    print("advection figures done")

    # 2. convergence plot with slope annotation (ref PDE_plot.plot_convergence)
    conv = run_convergence(
        lambda n: la.run(mesh_size=n, stabilization="gfem").error_l2, (4, 8, 16)
    )
    plotting.plot_convergence(conv.errors, [4, 8, 16], "GFEM advection",
                              "adv_gfem_conv", outdir)
    print(f"convergence figure done (slope {conv.slope:.2f})")

    # 3. KPP rotating wave
    rk = kpp.run(kpp.KPPConfig(mesh_size=16))
    pk_ = kpp.build(kpp.KPPConfig(mesh_size=16))
    plotting.plot_field(pk_.host_mesh, rk.u, "KPP RV, t=1", "kpp_rv_sol", outdir)
    print("kpp figure done")

    # 4. Burgers Riemann solution vs exact
    pb = burgers.build(burgers.BurgersConfig(mesh_size=60))
    rb = pb.solve()
    plotting.plot_field(pb.host_mesh, rb.u, "Burgers RV, t=0.5",
                        "burgers_rv_sol", outdir)
    ex = burgers.exact_solution(
        pb.host_mesh.points[:, 0] * 1.0, pb.host_mesh.points[:, 1] * 1.0, 0.5
    )
    plotting.plot_field(pb.host_mesh, np.asarray(ex), "Burgers exact, t=0.5",
                        "burgers_exact", outdir)
    print("burgers figures done")

    # 5. Sod shock tube profile vs exact Riemann solution
    pe = euler.build(problem="sod", nx=200)
    re = euler.solve(pe)
    from conservation_fem_tpu.utils.riemann_exact import sod_exact

    x = np.asarray(pe.mesh.points[:, 0])
    order = np.argsort(x)
    t_end = re.num_steps * re.dt
    rho_ex, _, _ = sod_exact(np.sort(x), t_end)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(x[order], np.asarray(re.U[:, 0])[order], ".", ms=2, label="FEM+RV")
    ax.plot(np.sort(x), rho_ex, "k-", lw=1, label="exact")
    ax.set_xlabel("x"); ax.set_ylabel("rho"); ax.legend()
    ax.set_title(f"Sod shock tube, t={t_end:.3f}")
    fig.savefig(f"{outdir}/sod_profile.png", dpi=130, bbox_inches="tight")
    plt.close(fig)
    print("sod figure done")

    # 6. short evolution GIF (ref PDE_realtime_plot)
    p = la.build(la.AdvectionConfig(mesh_size=8, stabilization="rv_node", T=0.2))
    rp = plotting.RealtimePlot(p.host_mesh, outdir, "advection.gif", fps=5)
    import jax.numpy as jnp

    carry = (p.u0, p.u0)
    for k in range(8):
        carry, _ = la._step_rv_node(p, carry, None)
        rp.add_frame(np.asarray(carry[0]), t=(k + 1) * p.dt)
    rp.close()
    print("gif done")


if __name__ == "__main__":
    main(*(sys.argv[1:] or ["figures"]))
