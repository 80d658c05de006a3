from conservation_fem_tpu.utils import convergence  # noqa: F401
