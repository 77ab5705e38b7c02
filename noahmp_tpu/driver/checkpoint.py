"""TPU-native checkpointing via Orbax (beyond-reference capability).

The reference's only fault-tolerance story is its NetCDF restart file
(SURVEY §5.3-5.4), which this framework reproduces byte-compatibly in
io/netcdf_io.write_restart — that path requires a device->host gather
and a full-grid re-expansion, and stays the cross-validation format
the Fortran tooling can read.

For large sharded production runs, this module adds the TPU-idiomatic
alternative: an Orbax checkpoint of the EXACT device pytrees (state /
accumulators / MMF / clock), written asynchronously per shard with no
host-side expansion or layout conversion.  Resume restores bit-exact
device state — including the compacted [veg|bare|glacier] column
layout and any jax.sharding placement — so a restored run continues as
if never interrupted.

    from noahmp_tpu.driver import checkpoint as ckpt
    ckpt.save(model, "ckpts")               # ckpts/step_000024/...
    ckpt.restore(model, "ckpts")            # latest, in place

NetCDF restarts remain the default cadence output (reference parity);
Orbax checkpoints are opt-in for TPU-scale deployments.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


def _tree(model):
    """The checkpointed pytree: everything a resume cannot rebuild
    from the namelist + setup files."""
    t = {"state": dataclasses.asdict(model.state),
         "accum": model.accum._asdict()}
    if model.mmf is not None:
        t["mmf"] = model.mmf._asdict()
    for k in ("fpar", "gvfmin", "gvfmax"):
        v = getattr(model, k)
        if v is not None:
            t[k] = v
    return t


def save(model, directory, async_=False):
    """Write ckpt step_<itime> under directory; returns its path.
    async_=True returns immediately (call wait() before exiting)."""
    import orbax.checkpoint as ocp
    d = Path(directory).resolve()
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"step_{model.itime:09d}"
    ckptr = _checkpointer(async_)
    ckpt_tree = _tree(model)
    # clock (string date + int step) rides a JSON sidecar
    meta = {"date": model.date, "itime": int(model.itime)}
    ckptr.save(path, args=ocp.args.Composite(
        tree=ocp.args.StandardSave(ckpt_tree),
        meta=ocp.args.JsonSave(meta)))
    if not async_:
        ckptr.wait_until_finished()
    return str(path)


_ASYNC = None


def _checkpointer(async_):
    import orbax.checkpoint as ocp
    global _ASYNC
    if _ASYNC is None:
        _ASYNC = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
    return _ASYNC


def wait():
    if _ASYNC is not None:
        _ASYNC.wait_until_finished()


def latest(directory):
    d = Path(directory)
    steps = sorted(p for p in d.glob("step_*") if p.is_dir())
    return steps[-1] if steps else None


def restore(model, directory, path=None):
    """Restore the latest (or a given) checkpoint INTO model, bit-exact
    device state included.  Returns the restored itime."""
    import orbax.checkpoint as ocp
    path = Path(path) if path else latest(directory)
    if path is None:
        raise FileNotFoundError(f"no step_* checkpoints in {directory}")
    ckptr = _checkpointer(False)
    ckptr.wait_until_finished()
    ref = _tree(model)
    restored = ckptr.restore(path, args=ocp.args.Composite(
        tree=ocp.args.StandardRestore(ref),
        meta=ocp.args.JsonRestore()))
    tree, meta = restored["tree"], restored["meta"]
    model.state = model.state.__class__(**tree["state"])
    model.accum = model.accum.__class__(**tree["accum"])
    if model.mmf is not None and "mmf" in tree:
        model.mmf = model.mmf.__class__(**tree["mmf"])
    for k in ("fpar", "gvfmin", "gvfmax"):
        if k in tree:
            setattr(model, k, np.asarray(tree[k]))
    model.itime = int(meta["itime"])
    model.date = str(meta["date"])
    # the next chunk re-reads its snapshots from the restored clock
    model._snap_cache = None
    return model.itime
