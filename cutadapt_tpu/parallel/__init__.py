"""Multi-chip execution: data-parallel sharding over a device mesh."""

from .mesh import make_sharded_trim_step, make_mesh
from .stats import DeviceStatsReducer

__all__ = ["make_sharded_trim_step", "make_mesh", "DeviceStatsReducer"]
