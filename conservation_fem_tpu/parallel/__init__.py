from conservation_fem_tpu.parallel import sharded  # noqa: F401
