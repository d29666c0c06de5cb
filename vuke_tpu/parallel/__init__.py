"""Mesh construction, sharded sweeps, multi-host distribution."""

from .mesh import get_mesh, seeds_sharding  # noqa: F401
