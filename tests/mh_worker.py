"""Multi-host test worker: one process of an N-process LandModel run.

Launched by tests/test_multihost.py as
``python mh_worker.py <procid> <nprocs> <coordinator> <namelist>
<steps> <out.npz> [mesh_ndev]``.  Initializes jax.distributed, runs
the model on this process's row block, and dumps the block-expanded
final state.

With ``mesh_ndev`` > 0 the worker additionally shards its block's
column axis over a mesh of that many LOCAL devices — the actual
TPU-pod topology (process grid x per-process device mesh; the
reference's analogue is the 2-D rank grid of
mpp/module_mpp_land.F90:53-121, which has no intra-rank level at
all).  Column physics stays collective-free on the local mesh while
the MMF WTD halo crosses processes through the KV store.
"""

import sys


def main():
    procid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, namelist = sys.argv[3], sys.argv[4]
    steps, out = int(sys.argv[5]), sys.argv[6]
    mesh_ndev = int(sys.argv[7]) if len(sys.argv) > 7 else 0

    import jax
    jax.distributed.initialize(coordinator, num_processes=nprocs,
                               process_id=procid)

    import numpy as np
    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.grid import multihost as mh

    cfg, rs = read_namelist(namelist)
    m = LandModel.from_namelist(cfg, rs)
    if mesh_ndev > 0:
        import jax.tree_util as jtu
        from jax.sharding import NamedSharding, PartitionSpec as P
        from noahmp_tpu.grid.sharding import make_mesh
        mesh = make_mesh(jax.local_devices()[:mesh_ndev])
        ns = NamedSharding(mesh, P("col"))
        rep = NamedSharding(mesh, P())

        def put_tree(t):
            return jtu.tree_map(
                lambda x: jax.device_put(
                    x, ns if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] % mesh_ndev == 0)
                    else rep), t)

        m.params, m.state, m.masks, m.accum = (
            put_tree(t) for t in (m.params, m.state, m.masks, m.accum))
        if m.mmf is not None:
            m.mmf = put_tree(m.mmf)
    m.run(steps)
    m.flush_io()

    full = m._expand_tree(m.state)
    np.savez(out, row0=m._shard[1], ny=m.domain.ny, nx=m.domain.nx,
             col0=(m._shard[3] if len(m._shard) > 3 else 0),
             **{f: np.asarray(getattr(full, f))
                for f in full.__dataclass_fields__})
    mh.barrier("mh-test-done", 2_400_000)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
