"""Multi-host execution (SURVEY §5.8; reference mpp/module_mpp_land.F90).

Column physics is embarrassingly parallel, so multi-host runs are pure
data parallelism: each process owns a contiguous block of the domain's
ROWS (the reference's 2D block partition, mpp_land_partition_calc
:227-332, collapses to a 1-D row partition here — rows are contiguous
in the NetCDF files, so a per-host read is one hyperslab), steps its own
compacted/bucketed column set on its local devices, and communicates
only for (a) the MMF lateral-flow row halo and (b) nothing else:

- **I/O**: every process reads its own row block straight from the
  forcing/domain files and writes its own history/restart shard files
  (suffix ``.pNNNN`` + ROW0/GLOBAL_NY attrs).  The reference funnels
  ALL I/O through one rank and MPI-scatters (:645-721, :724-794) — an
  O(nproc) serial bottleneck this design deliberately does not
  reproduce; ``merge_shards`` reassembles reference-layout files
  offline, and restart shards are read back per-host so a restarted
  run needs no merge.
- **MMF halo**: the D8 stencil needs one row of WTD from each
  neighbouring block per STEPWTD.  Blocks exchange edge rows through
  the jax.distributed coordination-service KV store — a few KB per
  exchange at a 30-minute model cadence, so a host-side hop is
  negligible; the stencil itself stays jitted on device
  (grid.lateral.wtable_mmf halo mode).
- **No per-step collectives at all** otherwise — the reference
  broadcasts the date string every step (:329); here every host owns
  the clock deterministically (SURVEY §5.8).
"""

from __future__ import annotations

import base64

import numpy as np
import jax

# generous default: a peer may be inside a cold XLA compile (minutes on
# a loaded host) when we first wait on its halo row or a barrier
_TIMEOUT_MS = 900_000


def initialize(coordinator=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """jax.distributed.initialize passthrough (no-op when already
    initialized).  With no arguments, relies on JAX's cluster
    auto-detection (TPU pods set the env automatically)."""
    if jax.distributed.is_initialized():
        return
    kw = {}
    if coordinator is not None:
        kw.update(coordinator_address=coordinator,
                  num_processes=int(num_processes),
                  process_id=int(process_id))
    if local_device_ids is not None:
        kw.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kw)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def row_partition(ny: int, nproc: int, rank: int):
    """Contiguous row block [r0, r1) for ``rank`` — base ny//nproc rows
    plus one of the remainder to the low ranks, mirroring the
    reference's partition math (mpp_land_partition_calc :245-260)."""
    base, rem = divmod(ny, nproc)
    r0 = rank * base + min(rank, rem)
    return r0, r0 + base + (1 if rank < rem else 0)


# -- KV-store array exchange -------------------------------------------------

def _client():
    from jax._src.distributed import global_state
    if global_state.client is None:
        raise RuntimeError("jax.distributed not initialized")
    return global_state.client


def kv_put(key: str, arr) -> None:
    a = np.ascontiguousarray(arr)
    payload = (a.dtype.str.encode() + b"|"
               + repr(a.shape).encode() + b"|" + a.tobytes())
    _client().key_value_set(key, base64.b64encode(payload).decode())


def kv_get(key: str, timeout_ms: int = _TIMEOUT_MS) -> np.ndarray:
    raw = base64.b64decode(_client().blocking_key_value_get(key, timeout_ms))
    dt, shape, data = raw.split(b"|", 2)
    return np.frombuffer(data, dtype=np.dtype(dt.decode())) \
        .reshape(eval(shape.decode()))  # noqa: S307 - trusted peer payload


def barrier(tag: str, timeout_ms: int = _TIMEOUT_MS) -> None:
    _client().wait_at_barrier(tag, timeout_ms)


def kv_delete(key: str) -> None:
    try:
        _client().key_value_delete(key)
    except Exception:
        pass   # best-effort: a missing key or an old jaxlib is fine


def exchange_edge_rows(tag: str, top_row, bottom_row,
                       rank=None, nproc=None):
    """Give neighbours this block's first/last row; receive theirs.

    Returns (above, below): the global row just above/below this block
    (zeros at the domain edges — the stencil's interior ring masks
    those contributions anyway, grid.lateral.lateralflow).

    Every key has exactly one consumer (the adjacent rank), which
    deletes it after the read — so the coordination service holds at
    most O(nproc) halo keys at any time instead of growing by one
    key-pair per rank per STEPWTD over the run.
    """
    rank = process_index() if rank is None else rank
    nproc = process_count() if nproc is None else nproc
    top = np.asarray(top_row)
    bot = np.asarray(bottom_row)
    if rank > 0:
        kv_put(f"{tag}/edge/{rank}/top", top)
    if rank < nproc - 1:
        kv_put(f"{tag}/edge/{rank}/bot", bot)
    if rank > 0:
        above = kv_get(f"{tag}/edge/{rank - 1}/bot")
        kv_delete(f"{tag}/edge/{rank - 1}/bot")
    else:
        above = np.zeros_like(top)
    if rank < nproc - 1:
        below = kv_get(f"{tag}/edge/{rank + 1}/top")
        kv_delete(f"{tag}/edge/{rank + 1}/top")
    else:
        below = np.zeros_like(bot)
    return above, below


# -- shard-file merge ---------------------------------------------------------

def merge_shards(paths, out_path):
    """Concatenate per-process history/restart shard files (each with
    ROW0/GLOBAL_NY global attrs and a south_north-leading layout) into
    one reference-layout file, carrying over every per-variable
    attribute (units/description/MemoryOrder/...) and every global
    attribute except the shard bookkeeping pair."""
    from ..io.netcdf_io import _wfile
    from ..io.nc4 import open_nc

    shards = []
    for p in paths:
        nc = open_nc(str(p))
        shards.append((int(np.asarray(nc.ROW0)), nc))
    shards.sort(key=lambda t: t[0])
    ny_global = int(np.asarray(shards[0][1].GLOBAL_NY))

    first = shards[0][1]
    with _wfile(str(out_path)) as out:
        for gname, gval in _attr_dict(first).items():
            if gname in ("ROW0", "GLOBAL_NY"):
                continue
            setattr(out, gname, gval)
        for name, size in first.dimensions.items():
            out.createDimension(
                name, ny_global if name == "south_north" else size)
        for name, var in first.variables.items():
            dims = _var_dims(first, name)
            if "south_north" in dims:
                ax = dims.index("south_north")
                data = np.concatenate(
                    [np.asarray(nc.variables[name][:]) for _, nc in shards],
                    axis=ax)
            else:
                data = np.asarray(var[:])
            typ = {"f": "f", "i": "i"}.get(
                np.asarray(data).dtype.kind, "f")
            if np.asarray(data).dtype.kind in ("S", "U"):
                typ = "c"
            v = out.createVariable(name, typ, dims)
            v[:] = data
            for aname, aval in _attr_dict(var).items():
                setattr(v, aname, aval)
    for _, nc in shards:
        nc.close()


def _attr_dict(obj):
    """All attributes of an nc4/scipy file or variable handle."""
    if hasattr(obj, "attrs"):            # nc4 _Var
        return obj.attrs()
    if hasattr(obj, "global_attrs"):     # nc4 file
        return obj.global_attrs()
    return dict(getattr(obj, "_attributes", {}) or {})   # scipy


def _var_dims(nc, name):
    """Dimension names of a variable, for either backend."""
    var = nc.variables[name]
    if hasattr(var, "dimensions"):       # scipy
        return tuple(var.dimensions)
    # nc4 backend: map dimids back to names
    id2name = {}
    for dname in nc.dimensions:
        import ctypes
        did = ctypes.c_int()
        nc._lib.nc_inq_dimid(nc._ncid, dname.encode(), ctypes.byref(did))
        id2name[did.value] = dname
    return tuple(id2name[d] for d in var._dimids)
