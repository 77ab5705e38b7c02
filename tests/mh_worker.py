"""Multi-host test worker: one process of an N-process LandModel run.

Launched by tests/test_multihost.py as
``python mh_worker.py <procid> <nprocs> <coordinator> <namelist>
<steps> <out.npz>``.  Initializes jax.distributed, runs the model on
this process's row block, and dumps the block-expanded final state.
"""

import sys


def main():
    procid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, namelist = sys.argv[3], sys.argv[4]
    steps, out = int(sys.argv[5]), sys.argv[6]

    import jax
    jax.distributed.initialize(coordinator, num_processes=nprocs,
                               process_id=procid)

    import numpy as np
    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.grid import multihost as mh

    cfg, rs = read_namelist(namelist)
    m = LandModel.from_namelist(cfg, rs)
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
