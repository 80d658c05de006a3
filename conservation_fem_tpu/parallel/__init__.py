from conservation_fem_tpu.parallel import (  # noqa: F401
    euler_sharded,
    partition,
    sharded,
    structured_sharded,
    unstructured_sharded,
)
