"""Device mesh and sharding for the column axis.

Reference parallelism: 2D MPI domain decomposition over grid columns
(mpp/module_mpp_land.F90 — partition :163-332, halo :335-642,
scatter/gather :645-857).  TPU-native mapping (SURVEY §5.8): a 1-D
``Mesh`` over all chips with the flattened column axis sharded via
``NamedSharding(P("col"))``; XLA inserts any needed collectives.  The
only cross-column coupling (the MMF lateral-flow stencil) keeps the 2-D
(y, x) layout as auto-sharded ``jnp.roll`` shifts in
``noahmp_tpu.grid.lateral`` — XLA lowers the wrap-around row shifts to
collective-permutes at shard seams (equivalence with a single device is
pinned by tests/test_sharding.py).

The reference's WRF-coupler topology discovery
(mpp/module_cpl_land.F90:23-87 — each rank gossips its tile extents and
matches neighbors) has no TPU analogue to implement: ``Mesh``
construction IS the topology, and neighbor relationships are implied by
sharding specs, so that component is subsumed by ``make_mesh``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_AXIS = "col"


def make_mesh(devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (COL_AXIS,))


def col_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(COL_AXIS))


def pad_columns(n: int, n_shards: int) -> int:
    """Columns padded so the axis divides evenly across shards."""
    return ((n + n_shards - 1) // n_shards) * n_shards


def shard_columns(tree, mesh: Mesh):
    """Place every leaf with its leading (column) axis sharded over the
    mesh; scalars/replicated leaves get fully-replicated sharding."""
    ns = col_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, ns)
        return jax.device_put(x, rep)

    return jtu.tree_map(put, tree)
