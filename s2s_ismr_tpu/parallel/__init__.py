from .mesh import sweep_mesh, shard_lanes, lane_sharding  # noqa: F401
