from conservation_fem_tpu.utils import (  # noqa: F401
    baseline_proxy,
    checkpoint,
    convergence,
    guards,
    interpolate,
    io,
    metrics,
    plotting,
    riemann_exact,
    sweeps,
)
