"""Sharded structured grid x the fused whole-step Pallas kernel:
communication-avoiding row decomposition.

The single-chip structured fast path (ops/pallas_fused) runs the whole
stabilized step — residual projection, RV epsilon, Newton-CN with
Chebyshev inner solves — in one Mosaic launch. This module composes it
with the row decomposition of parallel/structured_sharded.py WITHOUT
putting collectives inside the kernel:

  * the step's ONE global reduction (the RV normalization scalar
    ``abs_term = max|u - mean u|``) is hoisted into XLA psum/pmax before
    the launch (pallas_fused._step_body's abs_term argument);
  * everything else in the step is a chain of depth-1 stencil ops, so
    each device gets a DEEP-HALO block — its L owned rows plus
    required_halo() rows from each neighbour — and runs the kernel
    (fused_rv_block_step) on the extended block; halo garbage decays one
    row per stencil op, so owned rows come out EXACTLY equal to the
    global algorithm's (identity-tested vs the single-device kernel);
  * per step, per device: ONE psum, ONE pmax, ONE neighbour exchange of
    4 fields x halo rows (ppermute when halo <= L; all_gather fallback
    for toy meshes where the halo exceeds a device's row count).

This trades redundant compute (2*halo rows per device, amortized away as
the per-device block grows) for a ~50x reduction in exchange count vs
the XLA sharded step (which halo-exchanges EVERY matvec inside every
Krylov iteration) — the communication-avoiding trade TPU ICI latency
wants. Only possible with the dot-free Chebyshev inner solver: CG/
BiCGStab would need a psum per iteration inside the kernel.

ref: SURVEY.md section 2.8 (halo-exchange parallelism); the reference has
no analog — DOLFINx ghost updates fire per SpMV, like our XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, NamedSharding, PartitionSpec as P

from conservation_fem_tpu.ops import structured as st
from conservation_fem_tpu.ops.pallas_fused import (
    fused_rv_block_step,
    required_halo,
)
from conservation_fem_tpu.ops.pallas_tiled import tiled_rv_step

OFFSETS = st.OFFSETS


class ShardedFusedStructured:
    """Row-sharded fused-kernel solver for a StructuredHyperbolicProblem.

    Requires the fused-eligible fixed-iteration config with the dot-free
    Chebyshev inner solver (cfg.cg_iters / newton_iters set,
    inner_solver="cheby", stabilization rv|gfem, smooth_l == 0).
    solve() matches the single-device API (flat global vector out).
    """

    def __init__(self, problem, device_mesh: DeviceMesh, axis: str = "i",
                 kernel: str = "auto", tile_rows=None):
        """kernel: "block" (VMEM-resident fused_rv_block_step — fastest
        while the extended block fits the ~270 KB/field single-kernel
        ceiling), "tiled" (HBM-resident tiled_rv_step block mode — any
        block size), or "auto" (block if it fits, else tiled).
        tile_rows: tiled-kernel row-tile override (tests force multi-tile
        geometry on small blocks)."""
        p, cfg = problem, problem.cfg
        self.tile_rows = tile_rows
        if (cfg.inner_solver != "cheby" or cfg.cg_iters is None
                or cfg.newton_iters is None
                or cfg.stabilization not in ("rv", "gfem")
                or cfg.smooth_l != 0):
            raise NotImplementedError(
                "ShardedFusedStructured needs the fused-eligible config: "
                "fixed iterations (cg_iters, newton_iters) with "
                "inner_solver='cheby' (dot-free — the property that lets "
                "the whole step run per-device), stabilization rv|gfem, "
                "no smoothing. Other configs: ShardedStructuredKPP.")
        self.p = p
        self.dmesh = device_mesh
        self.axis = axis
        sd = p.sd
        self.nx, self.ny = sd.nx, sd.ny
        n1x, n1y = self.nx + 1, self.ny + 1
        self.n1x, self.n1y = n1x, n1y
        n_dev = device_mesh.shape[axis]
        self.n_dev = n_dev
        L = -(-n1x // n_dev)
        self.L = L
        rows = L * n_dev
        self.pad_rows = rows - n1x
        dtype = p.u0.dtype
        self.dtype = dtype
        D = required_halo(cfg.cg_iters, cfg.newton_iters,
                          cfg.newton_linear_iters)
        self.D = D
        self.B = L + 2 * D
        if kernel == "auto":
            kernel = ("block" if self.B * n1y * dtype.itemsize
                      <= 270 * 2**10 else "tiled")
        assert kernel in ("block", "tiled"), kernel
        self.kernel = kernel

        shard = NamedSharding(device_mesh, P(axis, None))
        self.shard = shard

        # static per-device data ------------------------------------------
        # Mc extended blocks host-side once: (n_dev, 7, B, n1y), axis-0
        # sharded — operators never move at runtime.
        Mc = np.stack([np.asarray(sd.M_coef[k], dtype)
                       for k in range(len(OFFSETS))])        # (7,n1x,n1y)
        Mc_pad = np.zeros((len(OFFSETS), rows + 2 * D, n1y), Mc.dtype)
        Mc_pad[:, D:D + n1x] = Mc
        Mc_ext = np.stack([Mc_pad[:, d * L:d * L + self.B]
                           for d in range(n_dev)])
        self.Mc_s = jax.device_put(
            jnp.asarray(Mc_ext),
            NamedSharding(device_mesh, P(axis, None, None, None)))

        pts2 = np.asarray(p.mesh.points, dtype).reshape(n1x, n1y, 2)
        pts_pad = np.pad(pts2, ((0, self.pad_rows), (0, 0), (0, 0)))
        self.pts_s = jax.device_put(
            jnp.asarray(pts_pad),
            NamedSharding(device_mesh, P(axis, None, None)))
        valid = np.zeros((rows, n1y), dtype)
        valid[:n1x] = 1.0
        self.valid_s = jax.device_put(jnp.asarray(valid), shard)

        self._fs = p._fused_static          # area/h/grads/phi/qw statics

    # -- deep-halo exchange (inside shard_map) ------------------------------

    def _extend(self, x, fill=0.0):
        """(L, n1y) owned rows -> (B, n1y) deep-halo block."""
        ax, n, D, L = self.axis, self.n_dev, self.D, self.L
        idx = jax.lax.axis_index(ax)
        if n == 1:
            z = jnp.full((D, x.shape[1]), fill, x.dtype)
            return jnp.concatenate([z, x, z], 0)
        if D <= L:
            up = jax.lax.ppermute(x[-D:], ax,
                                  [(d, d + 1) for d in range(n - 1)])
            down = jax.lax.ppermute(x[:D], ax,
                                    [(d, d - 1) for d in range(1, n)])
            up = jnp.where(idx == 0, fill, up)
            down = jnp.where(idx == n - 1, fill, down)
            return jnp.concatenate([up, x, down], 0)
        # toy meshes (halo deeper than a device's rows): gather the grid
        xa = jax.lax.all_gather(x, ax, tiled=True)          # (rows, n1y)
        xa = jnp.pad(xa, ((D, D), (0, 0)), constant_values=fill)
        return jax.lax.dynamic_slice(
            xa, (idx * L, jnp.zeros((), idx.dtype)), (self.B, x.shape[1]))

    # -- the SPMD step -------------------------------------------------------

    def make_step(self):
        p, cfg = self.p, self.p.cfg
        fs = self._fs
        axis = self.axis
        n1x, n1y, L, D = self.n1x, self.n1y, self.L, self.D

        def step_local(Mc_ext, pts, valid, u, uo, uoo, t):
            if cfg.stabilization == "rv":
                # the step's one global reduction, in XLA collectives
                nvalid = jax.lax.psum(valid.sum(), axis)
                mean_u = jax.lax.psum((u * valid).sum(), axis) / nvalid
                abs_term = jax.lax.pmax(
                    jnp.abs(jnp.where(valid > 0, u - mean_u, 0.0)).max(),
                    axis)
            else:
                # gfem/si never read abs_term — skip the two collectives
                # (per-step ICI latency) entirely
                abs_term = jnp.asarray(0.0, u.dtype)
            g = p.bc_value(pts.reshape(-1, 2), t).reshape(u.shape)

            ue = self._extend(u)
            uoe = self._extend(uo)
            uooe = self._extend(uoo)
            ge = self._extend(g)
            row0 = jax.lax.axis_index(axis) * L - D
            common = dict(
                dt=p.dt, area=fs["area"], h=fs["h"], grads=fs["grads"],
                phi=fs["phi"], qw=fs["qw"], Cvel=cfg.Cvel, CRV=cfg.CRV,
                fprime=p.flux_prime, fprime_norm=p.flux_prime_norm,
                fprime_xy=getattr(p, "flux_prime_xy", None),
                cg_iters=cfg.cg_iters, newton_iters=cfg.newton_iters,
                lin_iters=cfg.newton_linear_iters,
                freeze_jacobian=cfg.modified_newton,
                residual_scheme=cfg.residual_scheme,
                stabilization=cfg.stabilization,
                mass_bounds=cfg.cheby_mass_bounds,
                lin_bounds=cfg.cheby_lin_bounds)
            if self.kernel == "block":
                uh = fused_rv_block_step(
                    ue, uoe, uooe, ge, Mc_ext[0], row0, abs_term,
                    n_rows=n1x, n_cols=n1y, **common)
            else:   # HBM-resident row-tiled block kernel
                uh = tiled_rv_step(
                    ue, uoe, uooe, ge, Mc_ext[0],
                    nx=self.B - 1, ny=n1y - 1, row0_base=row0,
                    n_rows=n1x, abs_term=abs_term,
                    tile_rows=self.tile_rows,
                    bf16_planes=cfg.tiled_bf16_planes, **common)
            # zero the grid-padding rows: the kernel leaves NaN there
            # (0-coefficient Jacobi inverses), which would poison the
            # next step's psum'd mean through u * valid
            return jnp.where(valid > 0, uh[D:D + L], 0.0), u, uo

        return shard_map(
            step_local,
            mesh=self.dmesh,
            in_specs=((P(axis, None, None, None), P(axis, None, None))
                      + (P(axis, None),) * 4 + (P(),)),
            out_specs=(P(axis, None),) * 3,
            # pallas_call's out_shape carries no varying-mesh-axes info,
            # so the vma checker cannot see through it
            check_vma=False,
        )

    # -- public API ----------------------------------------------------------

    def solve(self):
        p = self.p
        step = self.make_step()
        u0 = jnp.pad(p.u0.reshape(self.n1x, self.n1y),
                     ((0, self.pad_rows), (0, 0)))
        u0 = jax.device_put(u0, self.shard)

        @jax.jit
        def _run(u0):
            ts = (jnp.arange(p.num_steps, dtype=u0.dtype) + 1.0) * p.dt

            def body(carry, t):
                u, uo, uoo = carry
                return step(self.Mc_s, self.pts_s, self.valid_s,
                            u, uo, uoo, t), None

            (u, _, _), _ = jax.lax.scan(body, (u0, u0, u0), ts)
            return u

        return _run(u0)[: self.n1x].reshape(-1)


def shard_structured_fused(problem, device_mesh: DeviceMesh, axis="i"):
    return ShardedFusedStructured(problem, device_mesh, axis)
