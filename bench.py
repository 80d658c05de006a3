"""Benchmark: KPP rotating-wave RV throughput (DOF-steps/sec/chip).

The driver-defined north-star metric (BASELINE.json): DOF-steps/sec/chip on
the KPP RV workload, compared against the reference stack's throughput. The
reference stack (DOLFINx+PETSc LU+Python RV loops) is not installable here;
the baseline is a measured scipy sparse-direct proxy with the same
algorithmic structure (see conservation_fem_tpu/utils/baseline_proxy.py —
if anything faster than real DOLFINx because it reuses factorizations the
reference rebuilds each step).

Round-3 methodology fixes:
  * AMORTIZED timing: every Python-level jitted call costs a ~30 ms
    constant on the axon tunnel (scripts/timeharness.py) that inflated
    round-1/2 denominators; the metric now times R chained full solves
    inside ONE jitted call for two values of R and differences them, so
    the constant cancels and the number is true on-device throughput.
  * ACCURACY GATE: after timing, the f32 solution is compared against a
    committed f64 CPU anchor (golden/kpp_rv_anchor_mesh*.npy, generated
    by the adaptive-solver f64 path); L2rel must stay inside the
    recorded envelope or the bench exits nonzero — a Mosaic lowering
    regression cannot ship a fast-but-wrong number.
  * Default config: fused whole-step Pallas kernels with DOT-FREE
    Chebyshev inner solves (mesh <= 64 fully VMEM-resident single
    kernel; larger meshes the HBM-resident row-tiled kernel).

Prints ONE JSON line:
  {"metric": ..., "value": DOF-steps/s on this chip,
   "unit": "DOF-steps/s", "vs_baseline": value / proxy_DOF-steps/s}

Round-5 unlosable-artifact architecture (the round-4 driver artifact was
rc=124/parsed:null — tunnel down, probe retries + f64 CPU fallback blew
the driver's wall clock): `python bench.py` now runs a SUPERVISOR that
does no jax work itself. It spawns the measurement as a `--child`
subprocess under a global wall-clock budget (BENCH_BUDGET_S, default
1140 s), reserving a tail slice for a bounded fast CPU fallback
(mesh 32, T=0.1 short-anchor gate, 1 trial) if the TPU child dies,
hangs, or times out. Whatever happens, ONE parsable JSON line is
printed before the budget expires:
  * TPU child succeeds  -> its JSON, child's rc.
  * TPU child fails     -> fast CPU fallback JSON labeled
                           tpu_unreachable_cpu_fallback, rc=0.
  * everything fails    -> a value-0 JSON with an error field, rc=2.
Verified by killing the tunnel: `timeout 1800 python bench.py` -> rc=0
with a parsable metric. Capture chains that want a hard failure instead
of degradation still set BENCH_REQUIRE_TPU=1 (rc=3 passthrough).
"""

import json
import os
import sys
import time

import numpy as np

ACCURACY_GATE = 1e-2     # L2rel vs the f64 anchor (recorded envelope ~4e-3)


def _config(kpp, mesh_size, dtype):
    # accuracy-validated per mesh against the committed f64 anchors (the
    # gate below), at CFL-MATCHED time steps — the reference's own KPP
    # run is hmax=1/64, dt=0.01 (CFL 0.64, ref Code/KPP/KPP_exact.py:
    # 75-78); refining the mesh without refining dt pushes CFL past 1
    # where the CN Jacobian's Jacobi-preconditioned spectrum leaves the
    # right-half-plane ellipse (measured: CFL 1.28 -> |im| 1.66;
    # CFL 2.56 -> indefinite), so mesh > 64 scales dt to keep CFL = 0.64
    # like any practitioner (and like the convergence harness). The
    # metric is per-step throughput; trajectory length T = 1.0 unchanged.
    #
    # Inner solver: frozen-Jacobian Newton 2 x BiCGStab(4). Measured
    # (mesh 64, amortized): bicgstab 2x4 = 175 us/step @ L2rel 3.8e-3 vs
    # cheby 2x16 = 201 us @ 1.1e-2 — with the per-launch-overhead myth
    # corrected, BiCGStab's 2-matvec+dots iteration beats Chebyshev's
    # dot-free matvec per unit accuracy on-device. The dot-free cheby
    # path remains REQUIRED for the HBM-tiled kernel (mesh >= 256:
    # cross-tile dot reductions don't fit the one-pass sweep).
    dt = 0.01 * min(1.0, 64.0 / mesh_size)
    # mesh >= 256 default: composed-XLA BiCGStab (fused mode resolves to
    # None past the split kernel's VMEM ceiling). BENCH_TILED=1 runs the
    # one-launch HBM row-tiled kernel instead — since r5 with the SAME
    # BiCGStab config (in-kernel cross-tile SMEM dot reductions,
    # ops/pallas_tiled); the r4 dot-free-Chebyshev gate failure
    # (L2rel 1.564e-2, scripts/predict_gate256.py) no longer applies.
    # BENCH_TILED=cheby recovers the old dot-free config for A/Bs.
    tiled_env = os.environ.get("BENCH_TILED", "")
    tiled = mesh_size >= 256 and bool(tiled_env)
    tiled_cheby = tiled and tiled_env == "cheby"
    return kpp.KPPConfig(
        mesh_size=mesh_size, dtype=dtype, dt=dt,
        modified_newton=True,
        cg_iters=6 if not tiled_cheby else 10,
        newton_iters=2,
        newton_linear_iters=4 if not tiled_cheby else 16,
        # the final-iterate residual eval feeds only the converged flag
        # (trajectory identical, documented in HyperbolicConfig); at
        # mesh 256 the probe measured ~1 ms/step for one quadrature pass,
        # so the throughput config drops it — the accuracy gate below is
        # the correctness check
        newton_final_residual=False,
        inner_solver="bicgstab" if not tiled_cheby else "cheby",
        # BENCH_BF16_PLANES=1: stream the solver operator planes as bf16
        # HBM copies — the tiled kernel's Chebyshev planes when tiled,
        # else the composed-XLA mass/Jacobian sweep planes
        # (structured.sweep_form). The accuracy gate below applies
        # unchanged either way.
        tiled_bf16_planes=bool(tiled and os.environ.get(
            "BENCH_BF16_PLANES")),
        xla_bf16_planes=bool(not tiled and os.environ.get(
            "BENCH_BF16_PLANES")),
        # mesh >= 256: fori_loop solver bodies — the UNROLLED
        # componentwise composed-XLA step crashed the remote compile
        # service (r5 capture: "response body closed before all bytes
        # were read"); on-device throughput is identical (round-3 timing
        # model). Smaller meshes keep the r4-validated unrolled programs.
        solver_unroll=mesh_size < 256,
    )


def _measure_chunked(p, jnp, jax, chunk, trials):
    """Per-call timing of a trajectory split into `chunk`-step jitted
    segments (carry crosses segment calls on device). Workaround for the
    mesh-512 full-horizon TPU-worker crash (docs/tpu_capture_r4/
    mesh512.log): the single 800-step (x R chained reps) program is what
    crashed; segments bound per-launch exposure. The ~30 ms per-call
    constant is paid once per SEGMENT (n_seg * 30 ms over num_steps *
    tens-of-ms steps at this size: <0.1% inflation — per-call timing is
    honest here, unlike the small-mesh rows that need the amortized
    model)."""
    import time as _t

    if p.num_steps % chunk:
        raise ValueError(
            f"BENCH_CHUNK_STEPS={chunk} must divide num_steps={p.num_steps}")
    n_seg = p.num_steps // chunk

    @jax.jit
    def seg(state, carry, t0):
        with p.bound_jit_state(state):
            ts = t0 + (jnp.arange(chunk, dtype=p.u0.dtype) + 1.0) * p.dt
            carry, _ = jax.lax.scan(p.step, carry, ts)
        return carry

    def solve_once():
        carry = (p.u0, p.u0, p.u0)
        for i in range(n_seg):
            t0 = jnp.asarray(i * chunk * p.dt, p.u0.dtype)
            carry = seg(p._jit_state(), carry, t0)
        u = carry[0]
        return u, float(jnp.sum(u))           # hard sync

    u, s = solve_once()                        # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = _t.perf_counter()
        u, s = solve_once()
        best = min(best, _t.perf_counter() - t0)
    if not np.isfinite(s):
        raise RuntimeError("bench solve produced non-finite values")
    return best / p.num_steps, np.asarray(u)


def _measure(p, jnp, jax, reps=(1, 4), trials=3):
    """True per-step seconds: difference chained-repetition timings."""
    import time as _t

    if os.environ.get("BENCH_REPS"):
        reps = tuple(int(x) for x in os.environ["BENCH_REPS"].split(","))
    trials = int(os.environ.get("BENCH_TRIALS", trials))
    chunk = int(os.environ.get("BENCH_CHUNK_STEPS", 0))
    if chunk:
        return _measure_chunked(p, jnp, jax, chunk, trials)

    def runner(R):
        @jax.jit
        def run(state, u0):
            with p.bound_jit_state(state):
                ts = (jnp.arange(p.num_steps, dtype=u0.dtype) + 1.0) * p.dt

                def rep(u, _):
                    (uh, _, _), _ = jax.lax.scan(p.step, (u, u, u), ts)
                    return uh, None

                u, _ = jax.lax.scan(rep, u0, None, length=R)
            return u

        return run

    times = {}
    u_single = None
    for R in reps:
        run = runner(R)
        u = run(p._jit_state(), p.u0)
        s = float(jnp.sum(u))                    # hard sync (compile+warm)
        best = float("inf")
        for _ in range(trials):
            t0 = _t.perf_counter()
            u = run(p._jit_state(), p.u0)
            s = float(jnp.sum(u))
            best = min(best, _t.perf_counter() - t0)
        if not np.isfinite(s):
            raise RuntimeError("bench solve produced non-finite values")
        times[R] = best
        if R == 1:
            # the accuracy anchor is the SINGLE-trajectory end state;
            # higher R chains R full solves (timing only)
            u_single = np.asarray(u)
    per_step = (times[reps[1]] - times[reps[0]]) / (
        (reps[1] - reps[0]) * p.num_steps)
    assert u_single is not None, "reps must include R=1 for the accuracy gate"
    return per_step, u_single


def _accuracy(u, mesh_size):
    """(L2rel vs committed f64 anchor, anchor_found)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "golden", f"kpp_rv_anchor_mesh{mesh_size}.npy")
    if not os.path.exists(path):
        return None, False
    ref = np.load(path).astype(np.float64)
    rel = float(np.linalg.norm(u - ref) / np.linalg.norm(ref))
    return rel, True


def _accuracy_short(build_fn, mesh_size):
    """Fallback gate when no full-T anchor is committed: a SHORT-horizon
    f64 anchor `kpp_rv_anchor_mesh{N}_T{x}.npy` (make_anchor.py "N:Tx" —
    a full T=1.0 f64 trajectory at mesh 512 costs ~12 h CPU, the 80-step
    T=0.1 horizon ~1 h and still exercises shock formation + RV). Reruns
    the bench config at that T and returns (L2rel, found)."""
    import glob

    gdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
    hits = sorted(glob.glob(os.path.join(
        gdir, f"kpp_rv_anchor_mesh{mesh_size}_T*.npy")))
    if not hits:
        return None, False
    path = hits[0]
    T = float(os.path.basename(path).rsplit("_T", 1)[1][:-4])
    p = build_fn(mesh_size, T=T)
    u = np.asarray(p.solve().u, np.float64)
    ref = np.load(path).astype(np.float64)
    return float(np.linalg.norm(u - ref) / np.linalg.norm(ref)), True


def _backend_alive(timeout=None):
    """Probe the pinned platform (the axon TPU tunnel) in a SUBPROCESS
    with a timeout: when the tunnel is down, jax.devices() in-process
    hangs indefinitely (observed for hours — CLAUDE.md), which would
    leave the driver's bench artifact with rc!=0 and no number at all.
    The subprocess inherits the sitecustomize platform pin, so it probes
    exactly what this process would initialize."""
    import subprocess

    if timeout is None:
        timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", 60))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); "
             "import jax.numpy as jnp; "
             "assert float(jnp.sum(jnp.ones(8))) == 8.0"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def main():
    fallback = False
    force_cpu = bool(os.environ.get("BENCH_FORCE_CPU"))
    if force_cpu:
        # sitecustomize's axon register() pins the platform IN-PROCESS at
        # interpreter start, so JAX_PLATFORMS=cpu in a subprocess env is
        # silently ignored (measured: the r5 supervisor's first "CPU"
        # fallback child ran on the TPU and contended with a live
        # capture). The only reliable CPU pin is the in-process config
        # update before the first jax op — same pattern as conftest and
        # make_anchor.
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    elif os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
        # The axon tunnel refuses a fresh client for a short window after
        # the previous one exits (observed r4: back-to-back bench phases
        # failed their first probe while a later probe passed), so ALWAYS
        # retry the probe before concluding the TPU is down.
        # BENCH_REQUIRE_TPU=1: a capture chain wants a hard failure (rc=3)
        # instead of the driver's honest CPU degradation.
        # BENCH_PROBE_ATTEMPTS: budget override for flapping-tunnel days.
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 2))
        alive = False
        for i in range(attempts):
            if _backend_alive():
                alive = True
                break
            if i + 1 < attempts:
                print(f"bench: TPU probe attempt {i + 1} failed, retrying",
                      file=sys.stderr, flush=True)
                time.sleep(15)
        if not alive:
            if os.environ.get("BENCH_REQUIRE_TPU"):
                print("bench: TPU unreachable and BENCH_REQUIRE_TPU set",
                      file=sys.stderr, flush=True)
                sys.exit(3)
            fallback = True
    import jax

    if fallback:
        # honest degradation: a labeled CPU measurement (f64 adaptive
        # path, same accuracy anchors) instead of a hang / empty artifact
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        # a mesh sweep at f64 CPU would run for days — drop it here
        os.environ.pop("BENCH_SWEEP", None)
        print("bench: TPU backend unreachable -> CPU fallback "
              "(platform labeled in JSON)", file=sys.stderr, flush=True)

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses as _dc

    import jax.numpy as jnp

    from conservation_fem_tpu.models import kpp

    # CPU fallback default: mesh 32 — the smallest ANCHORED mesh (the
    # accuracy gate still engages) whose f64 adaptive path finishes in
    # minutes on this host; mesh 64 would cost hours, and a small honest
    # number beats a timeout
    mesh_size = int(os.environ.get("BENCH_MESH_SIZE",
                                   32 if fallback else 64))
    steps_proxy = int(os.environ.get("BENCH_PROXY_STEPS", 3))
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = "float32" if on_tpu else "float64"
    verbose = os.environ.get("BENCH_VERBOSE")

    def log(msg):
        if verbose:
            print(msg, file=sys.stderr, flush=True)

    def build(ms, T=None):
        if dtype == "float32":
            cfg = _config(kpp, ms, dtype)
            if T is not None:
                cfg = _dc.replace(cfg, T=T)
            p = kpp.build(cfg)
            # mesh >= 256 stays composed-XLA by default (the validated
            # 221 M r5 path); BENCH_TILED=1 opts into the one-launch
            # kernel, whose bicgstab mode now _fused_mode-resolves there
            if not os.environ.get("BENCH_NO_FUSED") and (
                    ms < 256 or os.environ.get("BENCH_TILED")):
                p.cfg = _dc.replace(p.cfg, use_pallas=True)
        else:
            # the SAME CFL-scaled dt as the f32 config and the anchor
            # recipe (make_anchor.py): mesh > 64 anchors were generated
            # at dt = 0.01*64/mesh — the default dt=0.01 would gate a
            # different discrete trajectory and fail spuriously
            p = kpp.build(kpp.KPPConfig(mesh_size=ms, dtype=dtype,
                                        dt=0.01 * min(1.0, 64.0 / ms),
                                        krylov_rtol=1e-12,
                                        **({} if T is None else {"T": T})))
        return p

    # BENCH_T: measure at a shortened horizon (e.g. 0.1). Used where the
    # full-T run's exposure window keeps hitting TPU-worker crashes
    # (mesh 512, docs/tpu_capture_r4/mesh512.log). Gating: if a committed
    # short anchor matches this exact horizon, the measured end state is
    # gated directly against it; the full-T anchor is skipped (different
    # discrete trajectory length).
    bench_T = (float(os.environ["BENCH_T"])
               if os.environ.get("BENCH_T") else None)
    p = build(mesh_size, T=bench_T)
    n_dofs = int(p.u0.shape[0])
    log(f"mesh {mesh_size}: fused mode = "
        f"{p._fused_mode() if hasattr(p, '_fused_mode') else None}")

    t0 = time.perf_counter()
    per_step, u = _measure(p, jnp, jax)
    log(f"measure (incl compile): {time.perf_counter()-t0:.1f}s "
        f"-> {per_step*1e6:.1f} us/step")

    if not np.isfinite(u).all() or u.min() < 0.5 or u.max() > 12.0:
        print(json.dumps({"metric": "KPP-RV DOF-steps/sec/chip",
                          "value": 0, "unit": "DOF-steps/s",
                          "vs_baseline": 0,
                          "error": "solution sanity check failed"}))
        sys.exit(1)
    if bench_T is not None:
        gdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "golden")
        spath = os.path.join(
            gdir, f"kpp_rv_anchor_mesh{mesh_size}_T{bench_T}.npy")
        if os.path.exists(spath):
            ref = np.load(spath).astype(np.float64)
            rel = float(np.linalg.norm(u - ref) / np.linalg.norm(ref))
            found = True
        else:
            rel, found = None, False
    else:
        rel, found = _accuracy(u, mesh_size)
        if not found:
            rel, found = _accuracy_short(build, mesh_size)
    if found and rel > ACCURACY_GATE:
        print(json.dumps({"metric": "KPP-RV DOF-steps/sec/chip",
                          "value": 0, "unit": "DOF-steps/s",
                          "vs_baseline": 0,
                          "error": f"accuracy gate failed: L2rel vs f64 "
                                   f"anchor {rel:.2e} > {ACCURACY_GATE}"}))
        sys.exit(1)
    log(f"accuracy vs f64 anchor: "
        f"{f'{rel:.2e}' if found else 'no anchor committed'}")
    value = n_dofs / per_step

    # measured proxy baseline (scipy sparse LU + python RV loop). Measured
    # at mesh <=32 regardless of the bench mesh: the proxy's per-DOF cost
    # GROWS with N (sparse LU fill-in + per-node Python loops), so
    # normalizing by its mesh-32 per-DOF throughput is conservative.
    from conservation_fem_tpu.utils.baseline_proxy import make_kpp_proxy

    proxy_ms = min(mesh_size, 32)
    p_proxy = (p if proxy_ms == mesh_size and dtype == "float64"
               else kpp.build(kpp.KPPConfig(mesh_size=proxy_ms,
                                            dtype=dtype)))
    proxy = make_kpp_proxy(p_proxy.host_mesh, dt=p.dt)
    u0 = np.asarray(p_proxy.u0, dtype=np.float64)
    proxy.step(u0, u0, u0)
    t0 = time.perf_counter()
    proxy.solve(u0, steps_proxy)
    proxy_elapsed = time.perf_counter() - t0
    proxy_value = int(p_proxy.u0.shape[0]) * steps_proxy / proxy_elapsed
    log(f"proxy (mesh {proxy_ms}) {steps_proxy} steps: {proxy_elapsed:.1f}s")

    out = {
        "metric": f"KPP-RV DOF-steps/sec/chip (N={n_dofs}, "
                  f"{p.num_steps}-step trajectories, {dtype}, "
                  f"amortized per-call overhead)",
        "value": round(value, 1),
        "unit": "DOF-steps/s",
        "vs_baseline": round(value / proxy_value, 2),
        "platform": jax.default_backend(),
    }
    if fallback:
        out["tpu_unreachable_cpu_fallback"] = True
    if found:
        out["l2rel_vs_f64_anchor"] = round(rel, 6)
    if os.environ.get("BENCH_SWEEP"):
        sweep = {}
        sw = os.environ["BENCH_SWEEP"]
        meshes = ([int(x) for x in sw.split(",")] if "," in sw
                  else (32, 64, 128, 256))
        for ms in meshes:
            if ms == mesh_size:
                sweep[str(ms)] = round(value / 1e6, 2)
                continue
            # one mesh failing (e.g. a Mosaic compile regression at the
            # largest size) must not lose the whole sweep artifact — the
            # r4 mesh-512 scoped-VMEM OOM cost every smaller mesh's number
            print(f"bench: sweep mesh {ms} starting", file=sys.stderr,
                  flush=True)
            try:
                p2 = build(ms)
                ps2, u2 = _measure(p2, jnp, jax)
            except Exception as e:
                sweep[str(ms)] = f"RUN FAIL {type(e).__name__}: {str(e)[:200]}"
                continue
            rel2, found2 = _accuracy(u2, ms)
            if not found2:
                rel2, found2 = _accuracy_short(build, ms)
            if found2 and rel2 > ACCURACY_GATE:
                sweep[str(ms)] = f"ACCURACY FAIL {rel2:.1e}"
                continue
            sweep[str(ms)] = round(int(p2.u0.shape[0]) / ps2 / 1e6, 2)
        out["sweep_M_dofsteps_per_s"] = sweep
    print(json.dumps(out))


def _run_child(env, timeout):
    """Run `bench.py --child` under `env` with a hard timeout; return
    (rc, last-parsable-JSON-stdout-line-or-None). stderr is inherited so
    BENCH_VERBOSE logs stream through."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, timeout=timeout, stdout=subprocess.PIPE)
    except subprocess.TimeoutExpired:
        print(f"bench: child exceeded {timeout:.0f}s, killed",
              file=sys.stderr, flush=True)
        return 124, None
    except Exception as e:
        print(f"bench: child spawn failed: {e}", file=sys.stderr, flush=True)
        return 125, None
    line = None
    for raw in (r.stdout or b"").decode(errors="replace").splitlines():
        raw = raw.strip()
        if raw.startswith("{"):
            try:
                json.loads(raw)
                line = raw
            except ValueError:
                pass
    return r.returncode, line


def supervise():
    """Unlosable-artifact orchestration (module docstring, round 5)."""
    budget = float(os.environ.get("BENCH_BUDGET_S", 1140))
    t_end = time.monotonic() + budget
    cpu_pinned = (os.environ.get("JAX_PLATFORMS", "") == "cpu"
                  or bool(os.environ.get("BENCH_FORCE_CPU")))
    require_tpu = bool(os.environ.get("BENCH_REQUIRE_TPU"))
    # tail reserve for the bounded CPU fallback (fallback child observed
    # ~120-180 s incl. compiles; 330 keeps margin)
    reserve = 0 if (cpu_pinned or require_tpu) else 330

    child_env = dict(os.environ)
    if not cpu_pinned:
        # make the TPU child fail FAST (rc=3) instead of attempting its
        # own slow in-process f64 fallback — the supervisor owns fallback
        child_env["BENCH_REQUIRE_TPU"] = "1"
    rc, line = _run_child(
        child_env, max(60.0, t_end - time.monotonic() - reserve))
    if line is not None:
        print(line, flush=True)
        sys.exit(rc)
    if require_tpu:
        sys.exit(rc if rc else 4)
    if cpu_pinned:
        # CPU-pinned child died with no JSON — nothing cheaper to try
        print(json.dumps({"metric": "KPP-RV DOF-steps/sec/chip",
                          "value": 0, "unit": "DOF-steps/s",
                          "vs_baseline": 0,
                          "error": f"cpu child died rc={rc}, no JSON"}),
              flush=True)
        sys.exit(2)

    print("bench: TPU child produced no result -> bounded CPU fallback",
          file=sys.stderr, flush=True)
    fb_env = dict(os.environ)
    fb_env.update(BENCH_FORCE_CPU="1",
                  BENCH_MESH_SIZE=os.environ.get("BENCH_FALLBACK_MESH", "32"),
                  BENCH_T="0.1", BENCH_TRIALS="1", BENCH_REPS="1,2")
    for k in ("BENCH_SWEEP", "BENCH_REQUIRE_TPU", "BENCH_TILED",
              "BENCH_CHUNK_STEPS"):
        fb_env.pop(k, None)
    rc2, line2 = _run_child(fb_env, max(60.0, t_end - time.monotonic() - 10))
    if line2 is not None:
        try:
            obj = json.loads(line2)
            obj["tpu_unreachable_cpu_fallback"] = True
            print(json.dumps(obj), flush=True)
        except ValueError:
            print(line2, flush=True)
        sys.exit(rc2)
    print(json.dumps({"metric": "KPP-RV DOF-steps/sec/chip",
                      "value": 0, "unit": "DOF-steps/s", "vs_baseline": 0,
                      "error": f"tpu child rc={rc} and cpu fallback "
                               f"rc={rc2} both produced no JSON"}),
          flush=True)
    sys.exit(2)


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        supervise()
