from .mesh import DATA_AXIS, make_mesh
from .sharded import sharded_candidates, sharded_scan_fn
from .multihost import (
    gather_results,
    host_byte_range,
    initialize_distributed,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "sharded_candidates",
    "sharded_scan_fn",
    "gather_results",
    "host_byte_range",
    "initialize_distributed",
]
