"""Multi-host execution (SURVEY §5.8; reference mpp/module_mpp_land.F90).

Column physics is embarrassingly parallel, so multi-host runs are pure
data parallelism: processes form an npx x npy grid (procs_xy mirrors
mpp_land_get_nprocsxy :124-141; ties prefer ROW splits because rows
are contiguous in the NetCDF files, so a per-host read is one
hyperslab), each owning a contiguous 2-D block
(mpp_land_partition_calc :227-332).  Each process steps its own
compacted/bucketed column set on its local devices and communicates
only for (a) the MMF lateral-flow edge ring and (b) nothing else:

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


def procs_xy(nproc: int, ny: int, nx: int):
    """(npx, npy) factorization of nproc minimizing |npx - npy|
    (mpp_land_get_nprocsxy, module_mpp_land.F90:124-141), constrained
    to npx <= nx and npy <= ny.  Ties and infeasible square splits
    fall back toward more ROW parallelism (rows are contiguous in the
    NetCDF files, so row splits read cheaper hyperslabs)."""
    best = None
    for px in range(1, nproc + 1):
        if nproc % px:
            continue
        py = nproc // px
        if px > nx or py > ny:
            continue
        score = (abs(px - py), px)   # tie -> smaller npx (more rows)
        if best is None or score < best[0]:
            best = (score, (px, py))
    if best is None:
        raise ValueError(f"cannot place {nproc} processes on a "
                         f"{ny}x{nx} domain")
    return best[1]


def block_partition(ny: int, nx: int, nproc: int, rank: int):
    """2D block decomposition (mpp_land_partition_calc :227-332):
    rank -> (r0, r1, c0, c1) with the row-major rank layout
    ipy = rank // npx, ipx = rank % npx (:83-84).  Collapses to the
    row partition when npx == 1."""
    npx, npy = procs_xy(nproc, ny, nx)
    ipy, ipx = divmod(rank, npx)
    r0, r1 = row_partition(ny, npy, ipy)
    c0, c1 = row_partition(nx, npx, ipx)
    return r0, r1, c0, c1


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


def exchange_edges_2d(tag: str, rows, cols, npx: int, npy: int,
                      rank=None):
    """Full 8-neighbour (D8) halo exchange of one 2-D field for an
    npx x npy process grid (the reference's mpp_land_comlr/comub pair,
    module_mpp_land.F90:335-600, plus the diagonal terms its stencil
    never needed; here corners DO matter because LATERALFLOW is D8).

    ``rows`` = (2, nx_local) block first/last row, ``cols`` =
    (2, ny_local) block first/last column (strips only — the full
    block never leaves the device).  Publishes the 4 edge strips + 4
    corner scalars; returns the assembled neighbour ring:
      top/bot : (nx_local + 2,)  — includes the diagonal corners
      left/right : (ny_local,)
    Zeros at physical domain edges (masked by the stencil's global
    interior ring).  Each key has exactly one consumer, which deletes
    it after the read, so the KV store stays O(nproc)."""
    rank = process_index() if rank is None else rank
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    nx, ny = rows.shape[1], cols.shape[1]
    ipy, ipx = divmod(rank, npx)

    def nbr(dy, dx):
        """Neighbour rank at process-grid offset, or None."""
        jy, jx = ipy + dy, ipx + dx
        if 0 <= jy < npy and 0 <= jx < npx:
            return jy * npx + jx
        return None

    sends = {
        "top": (nbr(-1, 0), rows[0]), "bot": (nbr(1, 0), rows[1]),
        "left": (nbr(0, -1), cols[0]), "right": (nbr(0, 1), cols[1]),
        "nw": (nbr(-1, -1), rows[0, :1]), "ne": (nbr(-1, 1), rows[0, -1:]),
        "sw": (nbr(1, -1), rows[1, :1]), "se": (nbr(1, 1), rows[1, -1:]),
    }
    for edge, (to, data) in sends.items():
        if to is not None:
            kv_put(f"{tag}/e/{rank}/{edge}", data)

    def recv(frm, edge, shape):
        if frm is None:
            return np.zeros(shape, rows.dtype)
        key = f"{tag}/e/{frm}/{edge}"
        out = kv_get(key)
        kv_delete(key)
        return out

    # what this rank receives: the north neighbour's BOTTOM row is the
    # row above this block, etc.; diagonals give the ring corners
    above = np.concatenate([recv(nbr(-1, -1), "se", (1,)),
                            recv(nbr(-1, 0), "bot", (nx,)),
                            recv(nbr(-1, 1), "sw", (1,))])
    below = np.concatenate([recv(nbr(1, -1), "ne", (1,)),
                            recv(nbr(1, 0), "top", (nx,)),
                            recv(nbr(1, 1), "nw", (1,))])
    left = recv(nbr(0, -1), "right", (ny,))
    right = recv(nbr(0, 1), "left", (ny,))
    return {"top": above, "bot": below, "left": left, "right": right}


# -- shard-file merge ---------------------------------------------------------

def merge_shards(paths, out_path):
    """Reassemble per-process history/restart shard files (each with
    ROW0/GLOBAL_NY [+ COL0/GLOBAL_NX for 2-D process grids] global
    attrs and a south_north-leading layout) into one reference-layout
    file, carrying over every per-variable attribute
    (units/description/MemoryOrder/...) and every global attribute
    except the shard bookkeeping attrs."""
    from ..io.netcdf_io import _wfile
    from ..io.nc4 import open_nc

    shards = []
    for p in paths:
        nc = open_nc(str(p))
        col0 = (int(np.asarray(nc.COL0))
                if "COL0" in _attr_dict(nc) else 0)
        shards.append((int(np.asarray(nc.ROW0)), col0, nc))
    shards.sort(key=lambda t: (t[0], t[1]))
    ny_global = int(np.asarray(shards[0][2].GLOBAL_NY))
    first = shards[0][2]
    fattrs = _attr_dict(first)
    nx_global = (int(np.asarray(first.GLOBAL_NX))
                 if "GLOBAL_NX" in fattrs
                 else first.dimensions["west_east"])
    # row bands: all shards with the same ROW0 sit side by side
    bands = {}
    for r0, c0, nc in shards:
        bands.setdefault(r0, []).append(nc)

    def assemble(name, dims):
        """Concatenate one variable across the 2-D shard grid."""
        yax = dims.index("south_north")
        xax = dims.index("west_east") if "west_east" in dims else None
        rows = []
        for r0 in sorted(bands):
            blocks = [np.asarray(nc.variables[name][:])
                      for nc in bands[r0]]
            rows.append(np.concatenate(blocks, axis=xax)
                        if xax is not None and len(blocks) > 1
                        else blocks[0])
        return np.concatenate(rows, axis=yax)

    with _wfile(str(out_path)) as out:
        for gname, gval in fattrs.items():
            if gname in ("ROW0", "GLOBAL_NY", "COL0", "GLOBAL_NX"):
                continue
            setattr(out, gname, gval)
        for name, size in first.dimensions.items():
            out.createDimension(
                name, {"south_north": ny_global,
                       "west_east": nx_global}.get(name, size))
        for name, var in first.variables.items():
            dims = _var_dims(first, name)
            if "south_north" in dims:
                data = assemble(name, dims)
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
    for _, _, nc in shards:
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
