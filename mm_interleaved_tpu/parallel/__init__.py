from .partition import (
    DEFAULT_RULES,
    make_mesh,
    params_shardings,
    batch_sharding,
)

__all__ = [
    "DEFAULT_RULES",
    "make_mesh",
    "params_shardings",
    "batch_sharding",
]
