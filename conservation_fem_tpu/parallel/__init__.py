from conservation_fem_tpu.parallel import sharded, structured_sharded  # noqa: F401
