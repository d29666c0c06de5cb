"""Device mesh for the seed lattice: a 1-D "seeds" data-parallel axis.

The workload is embarrassingly parallel over seeds (SURVEY.md §2.7), so the
mesh is one axis spanning all local (or all global) devices; every tensor in
the fused pipeline is sharded on its leading seed axis and XLA partitions
the whole program with zero collectives until the final hit reduction.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), axis_names=("seeds",))


def seeds_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("seeds"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
