"""HRLDAS-style land driver: init, time loop, output/restart cadence.

Reference: module_hrldas_noahmp_driver.F90 — land_driver_init
(:89-306) and land_driver_exe (:309-595).

The device-side work per step is one jitted grid_step (vmapped column
physics); the host side builds forcing (file reads + time interp +
CALC_DECLIN), steers output/restart cadence, and keeps the per-step
timing heartbeat (:567-585).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from .. import constants as C
from ..config import NoahMPConfig
from ..state.state import ColumnState, Forcing
from ..params.tables import load_tables
from ..params.hydrate import hydrate
from ..grid.driver import (GridMasks, GridAccum, classify, grid_step,
                           static_bare_mask, column_layout,
                           first_step_guess)
from ..grid.lateral import (MMFState, wtable_mmf, eqsmoisture,
                            groundwater_init)
from .dates import declin_scalars, geth_newdate, parse_date, yearlen
from .init import cold_start
from .namelist import RunSettings
from .pack import TreePacker, unpack
from ..io import netcdf_io as ncio

WTDDT_MINUTES = 30.0  # groundwater cadence (module_hrldas_noahmp_vars.F90:165)

# reference ERROR tolerances (module_sf_noahmplsm.F90:1164-1223)
SW_TOL = 0.01      # W/m2
ENG_TOL = 0.01     # W/m2
WAT_TOL = 0.1      # mm per step


class ConservationError(RuntimeError):
    """Raised when a step violates the reference's fatal conservation
    tolerances (the TPU analogue of ERROR's wrf_error_fatal aborts,
    module_sf_noahmplsm.F90:1164-1223)."""


@dataclasses.dataclass
class LandModel:
    """A running land model instance over a (ny, nx) domain.

    Water/sea-ice columns are COMPACTED away at init (the TPU analogue
    of the reference's per-cell skip, module_sf_noahmpdrv.F90:434-441):
    the device state covers only the land columns, and full-grid layout
    is restored host-side for history/restart files and the MMF 2D
    stencil.  `land_idx` is None when every cell is land."""
    cfg: NoahMPConfig
    rs: RunSettings
    domain: "ncio.Domain"
    params: object
    state: ColumnState
    masks: GridMasks
    accum: GridAccum
    date: str
    itime: int = 0
    mmf: MMFState = None
    smceq: np.ndarray = None
    stepwtd: int = 1
    forcing_reader: object = None
    history: object = None
    land_idx: np.ndarray = None      # per-device-column full-grid source
                                     # index (padding duplicates), or None
    real_pos: np.ndarray = None      # device positions of authoritative
                                     # land columns (see ColumnLayout)
    check_mode: str = "abort"        # "abort" | "warn" | "off"
    chunk_steps: int = 0             # on-device steps per dispatch
                                     # (0 = auto, 1 = legacy per-step)
    # driver-level green-veg-fraction fields, full-grid numpy
    # (module_hrldas_noahmp_vars.F90:146-149; restart :645-649).  fpar
    # tracks the last VEGFRA forcing; gvfmin/gvfmax track the annual
    # envelope when the setup file has no climatology.
    fpar: np.ndarray = None
    gvfmin: np.ndarray = None
    gvfmax: np.ndarray = None
    shdmax_grid: np.ndarray = None
    _warned_shdfac: bool = False
    _core: object = None             # unjitted single-step fn (scan body)
    _chunk_fns: dict = None          # (K, n_out, O, flags) -> jitted chunk
    _geo: dict = None                # device solar-geometry constants
    _fc_tmpl: object = None          # device Forcing template (constants)
    _snap_cache: dict = None         # input-boundary idx -> host snapshot
    _shd_host: tuple = None          # last constant (shdfac, shdmax) host
    _shd_dev: tuple = None           # ... and their device copies
    _lai_last: object = None         # last-seen LAI forcing (host, compacted)
    io_procs: int = None             # parallel history-encode worker
                                     # processes (None = $NOAHMP_IO_PROCS,
                                     # 0 = encode on the drain thread)
    _hist_pool: object = None
    _hist_args: tuple = None
    _wtd_fn: object = None
    _land_full: object = None        # full-grid land mask (MMF)
    _params_full: object = None      # full-grid params (MMF)
    _full_tmpl: dict = None          # full-grid templates for scatter
    _shard: tuple = None             # multi-host (rank, row0, ny_global)
    _static_halo: dict = None        # MMF stencil static edge rows
    _io_queue: object = None         # async history/restart writer
    _io_thread: object = None
    _io_error: object = None
    _packer: object = None           # one-transfer readback (pack.py)
    _plane_fns: dict = None          # (has_mmf, stacked) -> jitted
                                     # device history-plane derivation

    # -- async file output ---------------------------------------------
    # History/restart writes run on a daemon thread so the device can
    # start the next step while NetCDF encodes (the reference blocks
    # the whole run on its io-rank gather+write, SURVEY §3.4; its
    # checkpoint cadence is the fault-tolerance story, §5.3).  The
    # expensive device->host transfer still happens on the step thread
    # (numpy conversion in _expand_tree); only file encoding overlaps.
    def _submit_io(self, fn, *args):
        import os as _os
        import queue as _queue
        import threading as _threading
        if self._io_error is not None:
            err, self._io_error = self._io_error, None
            raise err
        if self._io_queue is None:
            self._io_queue = _queue.Queue(maxsize=4)

            def drain():
                while True:
                    item = self._io_queue.get()
                    try:
                        if item is not None:
                            item[0](*item[1])
                    except Exception as e:   # surfaced on next submit/flush
                        self._io_error = e
                    finally:
                        self._io_queue.task_done()

            # exactly ONE drain thread: libnetcdf (io/nc4.py ctypes
            # binding) is not thread-safe — concurrent nc_create/
            # nc_put_var across threads corrupts its global state
            # (observed: spurious "Not a valid ID" on close).  The
            # knob exists for builds against a thread-safe NetCDF.
            nio = max(int(_os.environ.get("NOAHMP_IO_THREADS", "1")), 1)
            self._io_thread = [
                _threading.Thread(target=drain, daemon=True)
                for _ in range(nio)]
            for t in self._io_thread:
                t.start()
            # the drain threads are daemons: without a shutdown hook a
            # process exiting right after step() could lose the final
            # queued write (run() flushes; step()-level callers may not)
            import atexit
            import weakref
            ref = weakref.ref(self)
            atexit.register(
                lambda: ref() is not None and ref().flush_io())
        self._io_queue.put((fn, args))

    def _history_job(self, date, state, diag, accum, forc, mmf):
        """Runs ON the writer thread: device->host expansion + NetCDF
        encode both overlap the next chunk's compute (the captured
        device arrays are immutable, so snapshotting them is free).
        ``forc`` is either a full Forcing or the small forcing-echo
        dict (soldn/cosz/lwdn/prcp) the chunked scan emits.

        With io_procs > 0 the encode is handed to a worker-process
        pool (io/procwriter.py) so N history files deflate
        concurrently — libnetcdf's thread-unsafety forbids doing that
        with threads — and this thread goes straight back to
        transferring the next payload."""
        f = self._expand_tree(forc)
        if isinstance(f, dict):
            from types import SimpleNamespace
            f = SimpleNamespace(**f)
        ex = (self._expand_tree(state), self._expand_tree(diag),
              self._expand_tree(accum))
        pool = self._get_hist_pool()
        if pool is not None:
            pool.submit(date, *ex, f.__dict__ if f is not None else None,
                        None if mmf is None
                        else jtu.tree_map(np.asarray, mmf))
        else:
            self.history.write(date, *ex, f, mmf)

    # -- one-transfer readback -----------------------------------------
    # Each device->host message through the remote-TPU tunnel pays its
    # own round trip; a ~150-leaf tree read back leaf-by-leaf costs
    # seconds per chunk (the measured 52%-of-link-ceiling gap of r4).
    # The whole payload is therefore concatenated ON DEVICE into one
    # flat buffer (driver/pack.py, bit-exact via int32 bitcast),
    # transferred as ONE message, and split host-side on the writer
    # thread.  Reference analogue: the io-rank gathers the full field
    # before writing (module_hrldas_netcdf_io.F90:1773-1884).
    def _pack_async(self, tree):
        """(packed buffer, meta) with the host copy already started,
        or None when a leaf dtype is unsupported (caller falls back to
        the per-leaf path).  NOAHMP_NO_PACK=1 forces the per-leaf path
        (A/B debugging of the readback plumbing)."""
        import os as _os
        if _os.environ.get("NOAHMP_NO_PACK"):
            return None
        if self._packer is None:
            self._packer = TreePacker()
        packed = self._packer.pack(tree)
        if packed is None:
            return None
        buf, meta = packed
        if hasattr(buf, "copy_to_host_async"):
            try:
                buf.copy_to_host_async()
            except Exception:
                pass      # a real transfer error resurfaces at unpack
        return buf, meta

    # -- device-computed history planes --------------------------------
    # The writer consumes ~104 registry planes but the model state it
    # derives them from spans ~136 — so the planes are computed ON
    # DEVICE (exactly the selected registry subset, including LH and
    # the STC soil/snow splits) and only those bytes cross the link.
    # With HISTORY_PACK16 each f32 plane is additionally quantized to
    # int16 over its per-write land range (CF scale_factor/add_offset
    # packing), halving the payload again.
    def _get_plane_fn(self, has_mmf, stacked):
        if self._plane_fns is None:
            self._plane_fns = {}
        key = (has_mmf, stacked)
        fn = self._plane_fns.get(key)
        if fn is not None:
            return fn
        sel = self.rs.history_fields
        entries = [e for e in ncio.HISTORY_FIELDS
                   if (sel is None or e[0] in sel)
                   and e[5] != "sosn"
                   and not (e[1] == "mmf" and not has_mmf)]
        nsnow = self.cfg.nsnow
        pack16 = self.rs.history_pack16

        def quant16(x, land):
            lm = land if x.ndim == land.ndim else land[..., None]
            mx = jnp.max(jnp.where(lm, x, -jnp.inf))
            mn = jnp.min(jnp.where(lm, x, jnp.inf))
            off = jnp.float32(0.5) * (mx + mn)
            # floor the scale at |off|*2.5e-10: the f32 rounding of
            # `off` shifts the whole quantization grid by up to
            # eps(off)/scale ~ |off|*2^-24/scale steps, and the clip
            # below only has ~266 steps of headroom past the nominal
            # ±32500 span — without the floor a near-constant plane
            # (range << |mean|, e.g. TRAD) saturates at the clip and
            # decodes with the full grid-shift error
            scale = jnp.maximum(
                jnp.maximum((mx - mn) / jnp.float32(65000.0),
                            jnp.abs(off) * jnp.float32(2.5e-10)),
                jnp.float32(1e-30))
            q = jnp.clip(jnp.round((x - off) / scale),
                         -32766.0, 32766.0)
            return (q.astype(jnp.int16),
                    jnp.stack([off, scale]).astype(jnp.float32))

        def derive(s, d, a, hf, mmf, land, land_full):
            planes, scales = {}, {}
            for (name, src, field, _u, _d, kind) in entries:
                if src == "state":
                    x = getattr(s, field)
                elif src == "diag":
                    x = getattr(d, field)
                elif src == "accum":
                    x = getattr(a, field)
                elif src == "forc":
                    x = hf[field]
                elif src == "lh":
                    x = d.fcev + d.fgev + d.fctr
                elif src == "mmf":
                    x = getattr(mmf, field)
                elif src == "state_stc_soil":
                    x = s.stc[..., nsnow:]
                elif src == "state_stc_snow":
                    x = s.stc[..., :nsnow]
                elif src == "state_zsnso_snow":
                    x = s.zsnso[..., :nsnow]
                else:
                    raise ValueError(f"unknown history source {src}")
                if pack16 and kind != "int2d":
                    # MMF planes live on the FULL grid (the 2-D
                    # stencil's layout), every other source on the
                    # compacted column axis — mask accordingly
                    planes[name], scales[name] = quant16(
                        x, land_full if src == "mmf" else land)
                else:
                    planes[name] = x
            return planes, scales

        fn = jax.jit(jax.vmap(derive,
                              in_axes=(0, 0, 0, 0, 0, None, None))
                     if stacked else derive)
        self._plane_fns[key] = fn
        return fn

    def _plane_outputs(self, s, d, a, hf, mmf, stacked):
        """Derive the history planes on device and start their ONE
        packed host copy; None when packing is disabled
        (NOAHMP_NO_PACK — the per-leaf full-tree path then runs)."""
        import os as _os
        if _os.environ.get("NOAHMP_NO_PACK"):
            return None
        fn = self._get_plane_fn(mmf is not None, stacked)
        return self._pack_async(
            fn(s, d, a, hf, mmf, self.masks.land, self._land_full))

    def _write_named(self, date, planes, scales):
        """Writer thread: expand compacted planes to the full grid and
        hand them to the encoder (worker pool when io_procs > 0)."""
        planes = self._expand_tree(planes)
        scales = ({k: np.asarray(v) for k, v in scales.items()}
                  if scales else None)
        pool = self._get_hist_pool()
        if pool is not None:
            pool.submit_named(date, planes, scales)
        else:
            self.history.write_named(date, planes, scales)

    def _history_named_job(self, date, packed):
        planes, scales = unpack(*packed)
        self._write_named(date, planes, scales)

    def _history_named_stack_job(self, dates, packed):
        planes, scales = unpack(*packed)
        for i, date in enumerate(dates):
            self._write_named(
                date, {k: v[i] for k, v in planes.items()},
                {k: v[i] for k, v in scales.items()})

    def _history_stack_job(self, dates, ys):
        """Runs ON the writer thread: move a whole chunk's stacked
        history ys (n_out output intervals) to the host in one async
        transfer batch, then expand/encode each interval from host
        memory — with io_procs, the per-interval encodes fan out to
        the worker pool immediately."""
        for x in jtu.tree_leaves(ys):
            if hasattr(x, "copy_to_host_async"):
                try:
                    x.copy_to_host_async()
                except Exception:
                    break
        host = jtu.tree_map(np.asarray, ys)
        state_s, diag_s, accum_s, hf_s, mmf_s = host
        for i, date in enumerate(dates):
            sl = jtu.tree_map(lambda v, _i=i: v[_i],
                              (state_s, diag_s, accum_s, hf_s, mmf_s))
            self._history_job(date, sl[0], sl[1], sl[2], sl[3], sl[4])

    def _get_hist_pool(self):
        import os as _os
        n = self.io_procs
        if n is None:
            n = _os.environ.get("NOAHMP_IO_PROCS", "0")
        if isinstance(n, str):
            n = -1 if n.strip().lower() == "auto" else int(n)
        if n < 0:
            # auto-size: one encode worker per core, minus one core
            # kept for the transfer/drain thread (namelist IO_PROCS=-1
            # or NOAHMP_IO_PROCS=auto)
            n = max((_os.cpu_count() or 2) - 1, 1)
        if n == 0:
            return None
        if self._hist_pool is None:
            from ..io.procwriter import ProcHistoryPool
            self._hist_pool = ProcHistoryPool(self._hist_args, n)
        return self._hist_pool

    def flush_io(self):
        """Block until all queued history/restart writes hit disk.
        Mandatory at shutdown when using step()/low-level APIs directly
        (``run()`` flushes on return): a failed async write only
        surfaces on the next submit or on this call."""
        if self._io_queue is not None:
            self._io_queue.join()
        if self._hist_pool is not None:
            self._hist_pool.flush()
        if self._io_error is not None:
            err, self._io_error = self._io_error, None
            raise err

    # -- compacted <-> full-grid layout helpers ------------------------
    @property
    def n_full(self):
        return self.domain.ny * self.domain.nx

    def _cp(self, arr):
        """Gather a full-grid (ny*nx,)-leading host array to the
        compacted land-column axis."""
        arr = np.asarray(arr)
        return arr if self.land_idx is None else arr[self.land_idx]

    def _expand_tree(self, tree, fill=C.UNDEFINED):
        """Scatter a compacted pytree back to full-grid numpy layout
        (water cells = fill; int fields = 0).

        All device->host copies are started asynchronously up front:
        through the remote-TPU tunnel a blocking per-leaf transfer
        costs a full round trip each (measured ~2.4 s per ~60-leaf
        tree), while the batched async path overlaps them."""
        for x in jtu.tree_leaves(tree):
            if hasattr(x, "copy_to_host_async"):
                try:
                    x.copy_to_host_async()
                except Exception as e:
                    # expected on backends without async copies; a real
                    # transfer error resurfaces in np.asarray below —
                    # log once so it isn't silently masked until then
                    if not getattr(self, "_warned_async_copy", False):
                        self._warned_async_copy = True
                        print(f"WARNING: copy_to_host_async unavailable "
                              f"({type(e).__name__}: {e}); falling back "
                              f"to blocking transfers", flush=True)
                    break
        if self.land_idx is None:
            return jtu.tree_map(np.asarray, tree)
        ndev = self.land_idx.shape[0]
        auth = self.land_idx[self.real_pos]

        def ex(x):
            x = np.asarray(x)
            if x.ndim == 0 or x.shape[0] != ndev:
                return x
            f = 0 if np.issubdtype(x.dtype, np.integer) else fill
            full = np.full((self.n_full,) + x.shape[1:], f, x.dtype)
            full[auth] = x[self.real_pos]
            return full

        return jtu.tree_map(ex, tree)

    # ------------------------------------------------------------------
    @classmethod
    def from_namelist(cls, cfg, rs: RunSettings, table_dir=None):
        """land_driver_init (:89-306)."""
        if table_dir is None:
            from ..params import default_table_dir
            table_dir = default_table_dir()
        dom = ncio.read_domain(rs.const_file)
        # namelist run subwindow (XSTART/XEND/YSTART/YEND, 1-based
        # inclusive; the reference crops its reads to this window)
        win_y0 = max(rs.ystart - 1, 0)
        win_x0 = max(rs.xstart - 1, 0)
        win_y1 = rs.yend if rs.yend > 0 else dom.ny
        win_x1 = rs.xend if rs.xend > 0 else dom.nx
        if (win_y0, win_x0, win_y1, win_x1) != (0, 0, dom.ny, dom.nx):
            dom = ncio.crop_domain(dom, win_y0, win_y1, win_x0, win_x1)
        # multi-host: each process owns a contiguous 2-D block of the
        # (windowed) domain (grid.multihost; the reference's
        # nprocx x nprocy decomposition, mpp_land_partition_calc
        # :227-332) — everything below operates on the local block,
        # and I/O is per-host
        nproc, rank = jax.process_count(), jax.process_index()
        ny_global, row0 = dom.ny, 0
        nx_global, col0 = dom.nx, 0
        pgrid = (1, 1)
        dom_full = dom
        if nproc > 1:
            from ..grid import multihost as mh
            pgrid = mh.procs_xy(nproc, dom.ny, dom.nx)
            row0, r1, col0, c1 = mh.block_partition(
                dom.ny, dom.nx, nproc, rank)
            dom = ncio.crop_domain(dom, row0, r1, col0, c1)
        n = dom.ny * dom.nx
        # the domain file's MMINLU attribute picks the landuse scheme
        # (module_hrldas_netcdf_io.F90:239); namelist is the fallback
        if dom.llanduse:
            lu = ("MODIFIED_IGBP_MODIS_NOAH"
                  if "MODIS" in dom.llanduse.upper() else "USGS")
            if lu != cfg.llanduse:
                cfg = dataclasses.replace(cfg, llanduse=lu)
        tables = load_tables(table_dir, cfg.llanduse)
        vegtyp = dom.vegtyp.reshape(n)
        soiltyp = dom.soiltyp.reshape(n)
        params = hydrate(tables, vegtyp, soiltyp)
        masks = classify(jnp.asarray(vegtyp),
                         jnp.asarray(dom.xland.reshape(n)),
                         jnp.asarray(dom.seaice.reshape(n)),
                         dom.iswater, dom.isice)
        accum = GridAccum.zeros(n)

        mf = {}
        rst_extras = {}
        if rs.from_restart:
            path = Path(rs.resdir) / rs.restart_file
            if nproc > 1:
                # multi-host runs write and resume per-host restart
                # shards (no merge needed on the resume path)
                path = Path(str(path) + f".p{rank:04d}")
            date, sf, af, mf, rst_extras = ncio.read_restart(
                str(path), cfg, dom.ny, dom.nx)
            base = cold_start(cfg, tables, vegtyp, soiltyp,
                              tsk=np.full(n, 285.0, np.float32),
                              smois=sf["smc"], stemp=sf["stc"][:, cfg.nsnow:])
            fields = {f.name: getattr(base, f.name)
                      for f in dataclasses.fields(base)}
            for k, v in sf.items():
                dt_ = jnp.int32 if k == "isnow" else jnp.float32
                fields[k] = jnp.asarray(v, dt_)
            state = ColumnState(**fields)
            accum = GridAccum(**{k: jnp.asarray(v, jnp.float32)
                                 for k, v in af.items()})
        else:
            if rs.init_file and Path(rs.init_file).exists():
                # hrldas_init_read (:263-266): fields from the init
                # file; SNOW = WEASD[m] * 1000 -> mm
                ini, fndsnowh = ncio.read_init(rs.init_file, cfg.nsoil)
                swe = ini["weasd"].reshape(n) * 1000.0
                state = cold_start(
                    cfg, tables, vegtyp, soiltyp,
                    tsk=ini["skintemp"].reshape(n),
                    smois=ini["smois"].reshape(cfg.nsoil, n).T,
                    stemp=ini["stemp"].reshape(cfg.nsoil, n).T,
                    swe=swe,
                    snodep=(ini["snodep"].reshape(n) if fndsnowh
                            else swe * 0.005),
                    canwat=ini["canwat"].reshape(n),
                    tmn=dom.tmn.reshape(n))
            else:
                # no init file: domain TMN + neutral defaults
                state = cold_start(
                    cfg, tables, vegtyp, soiltyp,
                    tsk=dom.tmn.reshape(n),
                    smois=np.full((n, cfg.nsoil), 0.3, np.float32),
                    stemp=np.tile(dom.tmn.reshape(n, 1), (1, cfg.nsoil)))
            date = rs.start_date

        mmf = None
        smceq = np.full((n, cfg.nsoil), 0.25, np.float32)
        if "smceq" in rst_extras:           # SMOISEQ restart carry (:661)
            smceq = rst_extras["smceq"]
        stepwtd = 1
        static_halo = None
        if cfg.opt_run == 5:
            if "smceq" not in rst_extras:
                smceq = eqsmoisture(cfg, tables, soiltyp)
            z = jnp.zeros(n, jnp.float32)

            mr2d = (ncio.read_mmf_runoff(rs.mmf_runoff_file)
                    if rs.mmf_runoff_file
                    and Path(rs.mmf_runoff_file).exists() else None)

            if nproc > 1:
                # static stencil halo ring straight from the GLOBAL
                # setup files — no exchange needed for time-invariant
                # fields; only WTD is exchanged at runtime
                def edge_ring(a2d, fillv=0.0):
                    """1-cell neighbour ring of this block cut from a
                    global (ny_global, nx_global) array; top/bot rows
                    include the diagonal corners (zeros/fill past the
                    physical domain edge — masked by the stencil's
                    global interior ring)."""
                    pd = np.pad(a2d.astype(np.float32), 1,
                                constant_values=np.float32(fillv))
                    r, c = row0 + 1, col0 + 1   # block org in padded
                    return {
                        "top": pd[r - 1, c - 1:c + dom.nx + 1],
                        "bot": pd[r + dom.ny, c - 1:c + dom.nx + 1],
                        "left": pd[r:r + dom.ny, c - 1],
                        "right": pd[r:r + dom.ny, c + dom.nx],
                    }

                stf = dom_full.soiltyp
                sv_e = np.clip(stf - 1, 0, tables.soil.ncat - 1)
                from ..grid.lateral import KLATFACTOR
                klat_full = (tables.soil.dksat[sv_e]
                             * KLATFACTOR[np.clip(stf - 1, 0, 18)])
                water_f = ((dom_full.xland > 1.5)
                           | (dom_full.vegtyp == dom.iswater))
                land_f = ~water_f & ~(dom_full.seaice > 0.5)
                gshape = (ny_global, nx_global)
                static_halo = {
                    "klat": edge_ring(klat_full.astype(np.float32)),
                    "topo": edge_ring(dom_full.hgt),
                    "lm": edge_ring(
                        np.where(land_f, 1.0, -1.0).astype(np.float32)),
                    "area": edge_ring(dom_full.cell_area()),
                    "fdepth": (edge_ring(mr2d["fdepth"])
                               if mr2d is not None
                               else edge_ring(
                                   np.full(gshape, 100.0, np.float32))),
                }

            if mr2d is not None:
                # read_mmf_runoff (:170-174, io:326-392); multi-host
                # slices this process's block out of the global file
                sl = (slice(row0, row0 + dom.ny),
                      slice(col0, col0 + dom.nx))
                mr = {k: jnp.asarray((v[sl] if nproc > 1 else v)
                                     .reshape(n))
                      for k, v in mr2d.items()}
                mmf = MMFState(
                    eqzwt=mr["eqzwt"], riverbed=mr["riverbed"],
                    rivercond=mr["rivercond"], pexp=mr["pexp"],
                    fdepth=mr["fdepth"],
                    area=jnp.asarray(dom.cell_area().reshape(n)),
                    topo=jnp.asarray(dom.hgt.reshape(n)),
                    qrfs=z, qsprings=z, qslat=z, qrf=z, qspring=z,
                    rech_acc=z)
                if not rs.from_restart:
                    # GROUNDWATER_INIT (module_sf_noahmpdrv.F90:1286-1471)
                    # MMF files carry WTD in the negative-down metres
                    # convention (compared directly to ZSOIL :1402)
                    wtd0 = np.asarray(mr["zwt"])
                    init_halo = None
                    if nproc > 1:
                        init_halo = dict(static_halo,
                                         wtd=edge_ring(mr2d["zwt"]))
                    wtd, smois2, sh2o2, smceq, smcwtd = groundwater_init(
                        cfg, tables, soiltyp, vegtyp, tables.veg.isurban,
                        np.asarray(masks.land), mmf, (dom.ny, dom.nx),
                        wtd0, np.asarray(state.smc), np.asarray(state.sh2o),
                        WTDDT_MINUTES, halo=init_halo, row0=row0,
                        ny_global=ny_global if nproc > 1 else None,
                        col0=col0,
                        nx_global=nx_global if nproc > 1 else None)
                    state = dataclasses.replace(
                        state, zwt=jnp.asarray(wtd),
                        smc=jnp.asarray(smois2), sh2o=jnp.asarray(sh2o2),
                        smcwtd=jnp.asarray(smcwtd),
                        deeprech=jnp.zeros(n, jnp.float32),
                        rech=jnp.zeros(n, jnp.float32))
            else:
                mmf = MMFState(
                    eqzwt=z, riverbed=z, rivercond=z + 0.01, pexp=z + 1.0,
                    fdepth=z + 100.0,
                    area=jnp.asarray(dom.cell_area().reshape(n)),
                    topo=jnp.asarray(dom.hgt.reshape(n)),
                    qrfs=z, qsprings=z, qslat=z, qrf=z, qspring=z,
                    rech_acc=z)
            if rs.from_restart and mf:
                # restore MMF flux accumulators (driver :660-673)
                mmf = mmf._replace(**{k: jnp.asarray(v)
                                      for k, v in mf.items()})
            stepwtd = max(int(round(WTDDT_MINUTES * 60.0 / cfg.dt)), 1)

        # ---- land compaction: drop water/sea-ice columns from the
        # device state (reference skips them per cell, :434-441) and
        # lay out the remaining land columns [veg | bare | glacier]
        # with lane-aligned padded buckets so the canopy solver runs
        # only on the veg slice and the glacier solver on a static
        # tail slice (grid_step glacier_idx / bare_idx; the
        # reference's per-cell VEG and ICE branches)
        land_np = np.asarray(masks.land)
        glacier_np = np.asarray(masks.glacier)
        bare_np = static_bare_mask(cfg, vegtyp) & land_np & ~glacier_np
        land_idx = None
        real_pos = None
        bare_start = glacier_start = None
        params_full = params
        land_full = masks.land
        full_tmpl = None
        if not land_np.all() or glacier_np.any() or bare_np.any():
            lay = column_layout(cfg, vegtyp, land_np, glacier_np)
            land_idx, real_pos = lay.src, lay.real_pos
            bare_start, glacier_start = lay.bare_start, lay.glacier_start
            idxd = jnp.asarray(land_idx)

            def take(tree):
                return jtu.tree_map(
                    lambda x: x[idxd] if (hasattr(x, "ndim") and x.ndim >= 1
                                          and x.shape[0] == n) else x, tree)

            if cfg.opt_run == 5:
                # full-grid templates for the MMF 2D stencil scatter
                full_tmpl = {"zwt": state.zwt, "smc": state.smc,
                             "sh2o": state.sh2o, "smcwtd": state.smcwtd,
                             "deeprech": state.deeprech, "rech": state.rech}
            params, state, accum = take(params), take(state), take(accum)
            masks = GridMasks(land=jnp.asarray(lay.land),
                              glacier=jnp.asarray(lay.glacier))

        m = cls(cfg=cfg, rs=rs, domain=dom, params=params, state=state,
                masks=masks, accum=accum, date=date, mmf=mmf,
                smceq=smceq, stepwtd=stepwtd, land_idx=land_idx,
                real_pos=real_pos)
        if rs.from_restart:
            # resume the step counter from the restart timestamp (the
            # reference sets ITIMESTEP on resume, driver :177-179) so
            # output/restart/STEPWTD cadences continue seamlessly
            from .dates import geth_idts
            m.itime = geth_idts(date, rs.start_date) // int(cfg.dt)
        if static_halo is not None:
            m._static_halo = jtu.tree_map(jnp.asarray, static_halo)
        m._land_full = land_full
        m._params_full = params_full
        m._full_tmpl = full_tmpl
        # green-veg-fraction fields: restart carry wins, else setup-file
        # climatology, else tracked from forcing as the run progresses
        def _gvf(key, dom_arr):
            if key in rst_extras:
                return rst_extras[key].reshape(n)
            return (np.asarray(dom_arr, np.float32).reshape(n)
                    if dom_arr is not None else None)
        m.fpar = _gvf("FPAR", None)
        m.gvfmin = _gvf("GVFMIN", dom.gvfmin)
        m.gvfmax = _gvf("GVFMAX", dom.gvfmax)
        m.shdmax_grid = _gvf("SHDMAX", dom.shdmax)
        if rs.indir:
            # forcing hyperslab: the namelist window offset plus this
            # process's block; full-file reads when neither applies
            frow0 = win_y0 + row0
            fcol0 = win_x0 + col0
            has_window = (win_y0, win_x0) != (0, 0) or rs.yend > 0 \
                or rs.xend > 0
            m.forcing_reader = ncio.ForcingReader(
                rs.indir, rs.input_timestep,
                row_range=((frow0, frow0 + dom.ny)
                           if (nproc > 1 or has_window) else None),
                col_range=((fcol0, fcol0 + dom.nx)
                           if (nproc > 1 or has_window) else None))
        shard = ((rank, row0, ny_global, col0, nx_global)
                 if nproc > 1 else None)
        m._shard = shard
        m._pgrid = pgrid
        m._hist_args = (rs.outdir, cfg, dom.ny, dom.nx, vegtyp,
                        soiltyp, dom.iswater, shard)
        m.history = ncio.HistoryWriter(*m._hist_args)
        if rs.io_procs:       # namelist IO_PROCS (0 = env/default)
            m.io_procs = rs.io_procs
        # the encode pool MUST be built on the main thread with no jit
        # tracing in flight (ProcHistoryPool.__init__ flips the
        # parent's JAX env around the spawn); build it eagerly here
        # rather than lazily on the writer thread
        m._get_hist_pool()
        # static slices when compacted; "auto" on the uncompacted
        # layout (glaciers interleaved or absent)
        gidx = glacier_start if land_idx is not None else "auto"
        bidx = bare_start if land_idx is not None else None
        m._build_step_fn(gidx, bidx)
        return m

    def _build_step_fn(self, gidx, bidx=None):
        """Build the unjitted per-step core (the scan body): column
        physics + (opt_run=5) the MMF groundwater update folded in
        under a ``lax.cond`` keyed on the step counter — no host
        round-trip per STEPWTD, and the whole step is a single XLA
        program so the stencil's halo collectives schedule alongside
        the per-column UPDATEWTD work (SURVEY L10).  The compacted<->
        full-grid moves are device-side gathers/scatters executed only
        on MMF steps."""
        cfg = self.cfg
        if cfg.opt_run != 5:
            fn = lambda p, s, f, mk, a, mmf, it: grid_step(
                cfg, p, s, f, mk, a, glacier_idx=gidx,
                bare_idx=bidx) + (mmf,)
            self._core = fn
            return

        shape = (self.domain.ny, self.domain.nx)
        stepwtd = self.stepwtd
        idxd = (jnp.asarray(self.land_idx) if self.land_idx is not None
                else None)
        if idxd is not None:
            rp = jnp.asarray(self.real_pos)
            idx_auth = jnp.asarray(self.land_idx[self.real_pos])
        tmpl = self._full_tmpl
        params_full = self._params_full
        land_full = self._land_full
        smceq_full = jnp.asarray(self.smceq, jnp.float32)
        shard = self._shard
        row0 = shard[1] if shard else 0
        nyg = shard[2] if shard else None
        col0 = shard[3] if shard else 0
        nxg = shard[4] if shard else None

        def mmf_update(s, mmf, halo=None):
            if idxd is None:
                w, sm, sh = s.zwt, s.smc, s.sh2o
                sw, dr, rc = s.smcwtd, s.deeprech, s.rech
            else:
                # scatter only the authoritative copies (padding
                # duplicates would race the real cell's value)
                scat = lambda t, c: t.at[idx_auth].set(c[rp])
                w, sm, sh = (scat(tmpl["zwt"], s.zwt),
                             scat(tmpl["smc"], s.smc),
                             scat(tmpl["sh2o"], s.sh2o))
                sw, dr, rc = (scat(tmpl["smcwtd"], s.smcwtd),
                              scat(tmpl["deeprech"], s.deeprech),
                              scat(tmpl["rech"], s.rech))
            wtd, smc, sh2o, smcwtd, deeprech, mmf2 = wtable_mmf(
                cfg, params_full, mmf, shape, land_full, smceq_full,
                w, sm, sh, sw, dr, rc, WTDDT_MINUTES,
                halo=halo, row0=row0, ny_global=nyg,
                col0=col0, nx_global=nxg)
            if idxd is None:
                s2 = dataclasses.replace(
                    s, zwt=wtd, smc=smc, sh2o=sh2o, smcwtd=smcwtd,
                    deeprech=deeprech)
            else:
                s2 = dataclasses.replace(
                    s, zwt=wtd[idxd], smc=smc[idxd], sh2o=sh2o[idxd],
                    smcwtd=smcwtd[idxd], deeprech=deeprech[idxd])
            return s2, mmf2

        if shard is not None:
            # multi-host: MMF runs per STEPWTD from step(), with the
            # WTD edge strips exchanged through the KV store — only
            # the stencil's 1-cell ring dependency crosses hosts; the
            # column step itself stays communication-free
            def full_wtd_edges(s):
                w = (s.zwt if idxd is None
                     else tmpl["zwt"].at[idx_auth].set(s.zwt[rp]))
                w2 = w.reshape(shape)
                return (jnp.stack([w2[0], w2[-1]]),        # rows
                        jnp.stack([w2[:, 0], w2[:, -1]]))  # cols

            self._edge_fn = jax.jit(full_wtd_edges)
            self._wtd_fn = jax.jit(
                lambda s, mmf, halo_wtd: mmf_update(
                    s, mmf, dict(self._static_halo, wtd=halo_wtd)))
            fn = lambda p, s, f, mk, a, mmf, it: grid_step(
                cfg, p, s, f, mk, a, glacier_idx=gidx,
                bare_idx=bidx) + (mmf,)
            self._core = fn
            return

        def fused(params, state, forcing, masks, accum, mmf, itime):
            s, d, a = grid_step(cfg, params, state, forcing, masks, accum,
                                glacier_idx=gidx, bare_idx=bidx)
            s, mmf = jax.lax.cond((itime + 1) % stepwtd == 0,
                                  lambda op: mmf_update(*op),
                                  lambda op: op, (s, mmf))
            return s, d, a, mmf

        self._core = fused

    # ---- on-device forcing -------------------------------------------
    # The production path ships only the RAW bracketing forcing
    # snapshots per input_timestep (the reference's lastread/nextread
    # two-slot buffer, module_hrldas_netcdf_io.F90:1167-1302) plus (K,)
    # per-step scalars; linear time interpolation, the per-column half
    # of CALC_DECLIN (driver :813-863), the Q2D mixing-ratio->specific-
    # humidity conversion (module_sf_noahmpdrv.F90:458) and the CO2/O2
    # partial pressures are all computed ON DEVICE inside the scanned
    # body.  At dt=3600/input_timestep=10800 this cuts host->device
    # bytes ~3.4x vs per-step field stacks (8 fields x K/3+1 snapshots
    # vs 9 fields x K steps) and removes all per-step host numpy work.
    _SNAP_INTERP = ("T2D", "Q2D", "PSFC", "U2D", "V2D", "LWDOWN",
                    "SWDOWN")
    _DEGRAD = 3.14159265 / 180.0

    def _snapshot(self, sidx):
        """Host-side raw forcing snapshot at input-boundary index
        ``sidx`` (epoch = sidx * input_timestep from the run start),
        compacted to the land-column axis and cached.  Handles the
        optional VEGFRA/LAI carry and the hold-last-at-end-of-run
        semantics of hrldas_input_read (:1369-1403)."""
        if self._snap_cache is None:
            self._snap_cache = {}
        hit = self._snap_cache.get(sidx)
        if hit is not None:
            return hit
        if self.forcing_reader is None:
            raise ValueError("no forcing source configured (INDIR empty)")
        itt = self.rs.input_timestep
        date = geth_newdate(self.rs.start_date, sidx * itt)
        raw = self.forcing_reader.raw_at(date)
        if raw is None:
            prev = self._snap_cache.get(sidx - 1)
            if prev is None:
                raise FileNotFoundError(f"no forcing file for {date}")
            self._snap_cache[sidx] = prev   # hold last at end of run
            return prev
        n, cp = self.n_full, self._cp
        snap = {F: np.asarray(cp(raw[F].reshape(n)), np.float32)
                for F in self._SNAP_INTERP + ("RAINRATE",)}
        nc = snap["T2D"].shape[0]
        # optional vegetation forcing (hrldas_input_read :1238-1255;
        # VEGFRA -> SHDFAC, LAI replaces the state LAI).  fpar carries
        # the last-seen VEGFRA across steps and restarts (driver :645
        # restarts it as FPAR); gvfmin/gvfmax track the annual envelope
        # when the setup file has no climatology.
        if "VEGFRA" in raw:
            self.fpar = np.asarray(raw["VEGFRA"].reshape(n), np.float32)
            self.gvfmin = (self.fpar.copy() if self.gvfmin is None
                           else np.minimum(self.gvfmin, self.fpar))
            self.gvfmax = (self.fpar.copy() if self.gvfmax is None
                           else np.maximum(self.gvfmax, self.fpar))
        if self.fpar is not None:
            shdfac = np.asarray(cp(self.fpar), np.float32)
        elif self.gvfmax is not None:
            shdfac = np.asarray(cp(self.gvfmax), np.float32)
        else:
            if not self._warned_shdfac:
                print("WARNING: no VEGFRA forcing and no GVFMIN/"
                      "GVFMAX in the setup file; using SHDFAC=0.8 "
                      "(demo default)", flush=True)
                self._warned_shdfac = True
            shdfac = np.full(nc, 0.8, np.float32)
        if self.shdmax_grid is not None:
            shdmax = np.asarray(cp(self.shdmax_grid), np.float32)
        elif self.gvfmax is not None:
            shdmax = np.maximum(cp(self.gvfmax), shdfac)
        else:
            shdmax = np.maximum(np.float32(0.9), shdfac)
        snap["shdfac"] = shdfac
        snap["shdmax"] = np.ascontiguousarray(
            np.broadcast_to(np.asarray(shdmax, np.float32), (nc,)))
        if "LAI" in raw:
            self._lai_last = np.asarray(cp(raw["LAI"].reshape(n)),
                                        np.float32)
        snap["lai"] = self._lai_last    # None until first seen
        self._snap_cache[sidx] = snap
        return snap

    def _ensure_device_consts(self):
        """Device-resident per-column constants shipped ONCE: the
        CALC_DECLIN per-column terms (sin/cos latitude, longitude/15)
        and the constant Forcing fields (tbot, lat, foln, smceq, zero
        qc/pblh)."""
        if self._geo is not None:
            return
        dom, n, cp = self.domain, self.n_full, self._cp
        lat = np.asarray(cp(dom.xlat.reshape(n)), np.float32)
        lon = np.asarray(cp(dom.xlong.reshape(n)), np.float32)
        dg = np.float32(self._DEGRAD)
        self._geo = {
            "sinlat": jnp.asarray(np.sin(lat * dg), jnp.float32),
            "coslat": jnp.asarray(np.cos(lat * dg), jnp.float32),
            "lon15": jnp.asarray(lon / np.float32(15.0), jnp.float32),
        }
        nc = lat.shape[0]
        z = jnp.zeros(nc, jnp.float32)
        self._fc_tmpl = Forcing(
            sfctmp=z, sfcprs=z, psfc=z, uu=z, vv=z, q2=z, qc=z,
            soldn=z, lwdn=z, prcp=z,
            tbot=jnp.asarray(cp(dom.tmn.reshape(n)), jnp.float32),
            pblh=z, cosz=z,
            lat=jnp.asarray(np.deg2rad(lat), jnp.float32),
            julian=z, yearlen=jnp.zeros(nc, jnp.int32),
            shdfac=z, shdmax=z, co2air=z, o2air=z,
            foln=jnp.full((nc,), C.FOLN_DEFAULT, jnp.float32),
            ficeold=jnp.zeros((nc, self.cfg.nsnow), jnp.float32),
            smceq=jnp.asarray(cp(self.smceq), jnp.float32))

    def _plan_chunk(self, maxk):
        """(K, n_out, O) for the next dispatch: the largest K <= maxk
        such that restart cadence and (multi-host MMF) the STEPWTD halo
        exchange land exactly on the chunk boundary.  When the output
        cadence is shorter than the chunk, history snapshots ride the
        scan ys instead of capping K: the chunk covers n_out output
        intervals of O steps each (n_out = 0 means no mid-chunk
        output)."""
        dt = int(self.cfg.dt)
        it = self.itime
        k = max(int(maxk), 1)
        rc = self.rs.restart_timestep
        if rc and rc > 0:
            for j in range(1, k):
                if ((it + j) * dt) % rc == 0:
                    k = j
                    break
        if self.cfg.opt_run == 5 and self._shard is not None:
            # the WTD halo is exchanged host-side after the step where
            # (itime+1) % stepwtd == 0 — that step must end the chunk
            k = min(k, self.stepwtd - (it % self.stepwtd))
        n_out, O = 0, 0
        oc = self.rs.output_timestep
        if oc and oc > 0:
            ocs = max(oc // dt, 1)
            r = next((j for j in range(1, k)
                      if ((it + j) * dt) % oc == 0), k)
            if r < k:
                if r == ocs and k >= 2 * ocs:
                    # aligned: integrate multiple output intervals in
                    # one dispatch, history snapshots through scan ys
                    n_out, O = k // ocs, ocs
                    k = n_out * ocs
                else:
                    k = r   # realign to the boundary first
        return max(k, 1), n_out, O

    def _prep_chunk(self, K, n_out, O):
        """Host-side chunk preparation: read/stack the bracketing raw
        forcing snapshots, build the (K,) per-step scalars, and submit
        the (async) host->device transfers.  Needs only the clock —
        never the device state — so it can overlap the previous chunk's
        device compute."""
        self._ensure_device_consts()
        dt = int(self.cfg.dt)
        itt = self.rs.input_timestep
        e0 = self.itime * dt
        lo_idx = [(e0 + j * dt) // itt for j in range(K)]
        s_lo, s_hi = lo_idx[0], lo_idx[-1] + 1
        # prefetch this chunk's files plus lookahead for the next chunk
        for s in range(s_lo, s_hi + 1 + max((K * dt) // itt, 1)):
            self.forcing_reader.prefetch_date(
                geth_newdate(self.rs.start_date, s * itt))
        snaps_h = [self._snapshot(s) for s in range(s_lo, s_hi + 1)]
        self._snap_cache = {k2: v for k2, v in self._snap_cache.items()
                            if k2 >= lo_idx[-1]}

        snaps = {F: jnp.asarray(np.stack([sn[F] for sn in snaps_h]))
                 for F in self._SNAP_INTERP + ("RAINRATE",)}
        # SHDFAC/SHDMAX: constant within nearly every chunk (VEGFRA is
        # an optional, slow forcing) — keep a device copy and reship
        # only on change; ship (S, nc) stacks when it varies mid-chunk
        sh0 = snaps_h[0]
        has_shd = not all(
            np.array_equal(sn["shdfac"], sh0["shdfac"])
            and np.array_equal(sn["shdmax"], sh0["shdmax"])
            for sn in snaps_h[1:])
        if has_shd:
            shd = (jnp.asarray(np.stack([sn["shdfac"]
                                         for sn in snaps_h])),
                   jnp.asarray(np.stack([sn["shdmax"]
                                         for sn in snaps_h])))
        else:
            if (self._shd_host is None
                    or not np.array_equal(sh0["shdfac"],
                                          self._shd_host[0])
                    or not np.array_equal(sh0["shdmax"],
                                          self._shd_host[1])):
                self._shd_host = (sh0["shdfac"], sh0["shdmax"])
                self._shd_dev = (jnp.asarray(sh0["shdfac"]),
                                 jnp.asarray(sh0["shdmax"]))
            shd = self._shd_dev
        has_lai = any(sn["lai"] is not None for sn in snaps_h)
        if has_lai:
            cur = None
            stack = []
            for sn in snaps_h:
                if sn["lai"] is None and cur is None:
                    cur = np.asarray(self.state.lai, np.float32)
                stack.append(cur if sn["lai"] is None else sn["lai"])
            lai = jnp.asarray(np.stack(stack))
        else:
            lai = jnp.zeros((0,), jnp.float32)

        w = np.empty(K, np.float32)
        lor = np.empty(K, np.int32)
        sind = np.empty(K, np.float32)
        cosd = np.empty(K, np.float32)
        jul = np.empty(K, np.float32)
        gmt = np.empty(K, np.float32)
        yl = np.empty(K, np.int32)
        date = self.date
        for j in range(K):
            e = e0 + j * dt
            w[j] = (e - lo_idx[j] * itt) / itt
            lor[j] = lo_idx[j] - s_lo
            sind[j], cosd[j], jul[j], gmt[j] = declin_scalars(date)
            yl[j] = yearlen(parse_date(date).year)
            date = geth_newdate(date, dt)
        steps = {
            "w": jnp.asarray(w), "lo": jnp.asarray(lor),
            "sindecl": jnp.asarray(sind), "cosdecl": jnp.asarray(cosd),
            "julian": jnp.asarray(jul), "gmt": jnp.asarray(gmt),
            "yearlen": jnp.asarray(yl),
            "itime": jnp.arange(self.itime, self.itime + K,
                                dtype=jnp.int32)}
        out_dates = [geth_newdate(self.date, (i + 1) * O * dt)
                     for i in range(n_out)]
        # green-veg restart extras captured NOW: under pipelining the
        # next chunk's prep may advance fpar/gvf tracking before this
        # chunk's restart job runs
        extras = {k: v for k, v in
                  (("FPAR", self.fpar), ("GVFMIN", self.gvfmin),
                   ("GVFMAX", self.gvfmax), ("SHDMAX", self.shdmax_grid))
                  if v is not None}
        return {"K": K, "n_out": n_out, "O": O, "has_shd": has_shd,
                "has_lai": has_lai,
                "snaps": snaps, "shd": shd, "lai": lai, "steps": steps,
                "end_date": date, "out_dates": out_dates,
                "first_date": self.date, "extras": extras,
                "t0": time.perf_counter()}

    def _get_chunk_fn(self, K, n_out, O, has_shd, has_lai):
        """Jitted K-step on-device chain: ``lax.scan`` over the per-step
        core with host-free carries (the reference's whole-run loop,
        module_hrldas_noahmp_driver.F90:309-595, dispatches once per
        step — here one dispatch integrates K steps).

        Inside the scanned body:
        - the per-step Forcing is DERIVED on device from the raw
          snapshot stacks (interp/cosz/q2/CO2/O2; see _SNAP_INTERP);
        - FICEOLD is recomputed from the carried snow state
          (module_sf_noahmpdrv.F90:516-518);
        - conservation residuals are max-accumulated into a (3,) carry;
        - (opt_run=5, single host) the MMF groundwater update fires
          under a ``lax.cond`` on the carried step counter.
        With n_out > 0 the chunk is structured as n_out output
        intervals of O steps; each interval emits its end-of-interval
        (state, diag, accum, forcing-echo, mmf) as scan ys for the
        async history writer — so output cadence no longer caps the
        dispatch granularity."""
        if self._chunk_fns is None:
            self._chunk_fns = {}
        key = (K, n_out, O, has_shd, has_lai)
        if key in self._chunk_fns:
            return self._chunk_fns[key]
        core = self._core
        degrad = jnp.float32(self._DEGRAD)

        def make_forcing(snaps, shd, geo, fc, s, x):
            idx = lambda A, k: jax.lax.dynamic_index_in_dim(
                A, k, keepdims=False)
            wj = x["w"]
            itp = lambda A: ((1.0 - wj) * idx(A, x["lo"])
                             + wj * idx(A, x["lo"] + 1))
            psfc = itp(snaps["PSFC"])
            q2d = itp(snaps["Q2D"])
            # local solar hour angle from device-resident lon/lat terms
            tloc = jnp.mod(x["gmt"] + geo["lon15"] + 24.0, 24.0)
            hrang = jnp.float32(15.0) * (tloc - jnp.float32(12.0)) \
                * degrad
            cosz = (geo["sinlat"] * x["sindecl"]
                    + geo["coslat"] * x["cosdecl"] * jnp.cos(hrang))
            tot = s.snice + s.snliq
            fice = jnp.where(tot > 0.0,
                             s.snice / jnp.maximum(tot, 1e-12), 0.0)
            nc = fc.qc.shape[0]
            shdfac, shdmax = ((idx(shd[0], x["lo"]), idx(shd[1], x["lo"]))
                              if has_shd else shd)
            return dataclasses.replace(
                fc,
                sfctmp=itp(snaps["T2D"]), sfcprs=psfc, psfc=psfc,
                uu=itp(snaps["U2D"]), vv=itp(snaps["V2D"]),
                q2=q2d / (1.0 + q2d),
                soldn=itp(snaps["SWDOWN"]), lwdn=itp(snaps["LWDOWN"]),
                prcp=idx(snaps["RAINRATE"], x["lo"]),
                cosz=cosz,
                julian=jnp.full((nc,), x["julian"], fc.julian.dtype),
                yearlen=jnp.full((nc,), x["yearlen"],
                                 fc.yearlen.dtype),
                shdfac=shdfac, shdmax=shdmax,
                co2air=jnp.float32(C.CO2_FRAC) * psfc,
                o2air=jnp.float32(C.O2_FRAC) * psfc,
                ficeold=fice)

        def one(params, masks, geo, fc, snaps, shd, lai, s, a, mmf, x):
            f = make_forcing(snaps, shd, geo, fc, s, x)
            # first-timestep EAH/TAH/CH/CM guess (driver :374-384) —
            # a cond on the carried step counter keeps the chunk a
            # single uniform scan (the K=1 and K=N programs then share
            # the identical body and stay bit-equal)
            s = jax.lax.cond(x["itime"] == 0,
                             lambda s_: first_step_guess(s_, f),
                             lambda s_: s_, s)
            if has_lai:
                s = dataclasses.replace(
                    s, lai=jax.lax.dynamic_index_in_dim(
                        lai, x["lo"], keepdims=False))
            s, d, a, mmf = core(params, s, f, masks, a, mmf, x["itime"])
            g = lambda e: jnp.max(jnp.abs(jnp.where(masks.land, e, 0.0)))
            err = jnp.stack([g(d.errsw), g(d.erreng), g(d.errwat)])
            hf = {"soldn": f.soldn, "cosz": f.cosz, "lwdn": f.lwdn,
                  "prcp": f.prcp}
            return s, d, a, mmf, err, hf

        def chunk(params, masks, geo, fc, state, accum, mmf, snaps,
                  shd, lai, steps):
            import functools
            one_ = functools.partial(one, params, masks, geo, fc,
                                     snaps, shd, lai)

            def body(carry, x):
                s, d, a, mmf, err, hf = carry
                s, d, a, mmf, e, hf = one_(s, a, mmf, x)
                return (s, d, a, mmf, jnp.maximum(err, e), hf), None

            # zero-seed the diag/forcing-echo carry structure (both
            # are fully overwritten by the first iteration)
            x0 = jtu.tree_map(lambda v: v[0], steps)
            sh = jax.eval_shape(
                lambda s_, a_, m_, x_: (
                    lambda r: (r[1], r[5]))(one_(s_, a_, m_, x_)),
                state, accum, mmf, x0)
            zeros = lambda t: jtu.tree_map(
                lambda v: jnp.zeros(v.shape, v.dtype), t)
            d0, hf0 = zeros(sh[0]), zeros(sh[1])
            carry0 = (state, d0, accum, mmf, jnp.zeros(3, jnp.float32),
                      hf0)
            if n_out == 0:
                (s, d, a, mmf, err, hf), _ = jax.lax.scan(
                    body, carry0, steps)
                return s, d, a, mmf, err, hf, ()

            # n_out output intervals of O steps: each emits its
            # end-of-interval (state, diag, accum, forcing-echo, mmf)
            # as ys for the async history writer
            xs_o = jtu.tree_map(
                lambda v: v.reshape((n_out, O) + v.shape[1:]), steps)

            def outer(carry, xs):
                carry, _ = jax.lax.scan(body, carry, xs)
                s, d, a, mmf, err, hf = carry
                return carry, (s, d, a, hf, mmf)

            (s, d, a, mmf, err, hf), ys = jax.lax.scan(
                outer, carry0, xs_o)
            return s, d, a, mmf, err, hf, ys

        fn = jax.jit(chunk)
        self._chunk_fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    def step(self, verbose=False):
        """land_driver_exe (:309-595): one model timestep (a K=1
        chunk — same code path as the scan, so per-step and chunked
        runs are bit-identical by construction)."""
        prep = self._prep_chunk(1, 0, 0)
        out = self._dispatch_chunk(prep)
        return self._finish_chunk(prep, out, verbose=verbose)

    def _exchange_wtd(self, tag):
        """Exchange this block's WTD edge strips with its 8 process
        neighbours through the KV store and run the jitted
        stencil+UPDATEWTD on the block (multi-host MMF)."""
        from ..grid import multihost as mh
        rows, cols = self._edge_fn(self.state)
        npx, npy = self._pgrid
        ring = mh.exchange_edges_2d(tag, np.asarray(rows),
                                    np.asarray(cols), npx, npy)
        self.state, self.mmf = self._wtd_fn(
            self.state, self.mmf,
            {k: jnp.asarray(v) for k, v in ring.items()})

    def _raise_conservation(self, esw, een, ewa, where):
        """ERROR (:1106-1228): SW/energy/water closure at the reference
        tolerances over land columns; abort or warn per check_mode."""
        esw, een, ewa = float(esw), float(een), float(ewa)
        msgs = []
        if esw > SW_TOL:
            msgs.append(f"SW radiation budget |err|={esw:.4g} W/m2 "
                        f"> {SW_TOL}")
        if een > ENG_TOL:
            msgs.append(f"energy budget |err|={een:.4g} W/m2 > {ENG_TOL}")
        if ewa > WAT_TOL:
            msgs.append(f"water budget |err|={ewa:.4g} mm > {WAT_TOL}")
        if msgs:
            msg = (f"conservation violated at {where} "
                   f"(itime={self.itime}): " + "; ".join(msgs))
            if self.check_mode == "abort":
                raise ConservationError(msg)
            print(f"WARNING: {msg}", flush=True)

    # -- chunked time loop ----------------------------------------------
    DEFAULT_CHUNK = 24   # device steps per dispatch when nothing caps it

    def _dispatch_chunk(self, prep):
        """Launch one prepared chunk on the device (async) and advance
        the host clock.  The returned handles are consumed by
        _finish_chunk; between the two, the host is free to prepare the
        next chunk (file reads + transfers overlap device compute)."""
        cf = self._get_chunk_fn(prep["K"], prep["n_out"], prep["O"],
                                prep["has_shd"], prep["has_lai"])
        out = cf(self.params, self.masks, self._geo, self._fc_tmpl,
                 self.state, self.accum, self.mmf, prep["snaps"],
                 prep["shd"], prep["lai"], prep["steps"])
        self.state, self.accum, self.mmf = out[0], out[2], out[3]
        self.itime += prep["K"]
        self.date = prep["end_date"]
        prep["end_itime"] = self.itime
        return out

    def _finish_chunk(self, prep, out, verbose=False):
        """Synchronize on a dispatched chunk: multi-host MMF halo
        exchange, conservation check (one (3,) readback — also the
        timing fence), history/restart submission to the writer
        thread."""
        s, d, a, mmf, err, hf, ys = out
        dt = int(self.cfg.dt)
        K, n_out = prep["K"], prep["n_out"]

        # multi-host MMF: the chunk ends exactly on the STEPWTD
        # boundary; exchange the WTD ring and update now (this path
        # runs unpipelined, so self.state is this chunk's end state)
        if (self.cfg.opt_run == 5 and self._shard is not None
                and prep["end_itime"] % self.stepwtd == 0):
            self._exchange_wtd(f"mmf/{prep['end_itime'] - 1}")
            s, a = self.state, self.accum   # post-exchange handles

        err = np.asarray(err)
        if self.check_mode != "off":
            where = (prep["first_date"] if K == 1
                     else f"{prep['first_date']}..{prep['end_date']}")
            self._raise_conservation(err[0], err[1], err[2], where)
        t2 = time.perf_counter()

        if n_out:
            # ONE writer job AND one device->host message per chunk:
            # the registry planes for all n_out intervals are derived
            # on device, packed into a single buffer (_plane_outputs)
            # and sliced host-side — not n_out separate device-slice
            # jobs or ~150 per-leaf transfers (each of which would pay
            # its own tunnel round trip)
            pl = self._plane_outputs(ys[0], ys[1], ys[2], ys[3], ys[4],
                                     stacked=True)
            if pl is not None:
                self._submit_io(self._history_named_stack_job,
                                prep["out_dates"], pl)
            else:
                self._submit_io(self._history_stack_job,
                                prep["out_dates"], ys)
        else:
            epoch = prep["end_itime"] * dt
            if self.rs.output_timestep > 0 \
                    and epoch % self.rs.output_timestep == 0:
                hm = mmf if self._shard is None else self.mmf
                pl = self._plane_outputs(s, d, a, hf, hm, stacked=False)
                if pl is not None:
                    self._submit_io(self._history_named_job,
                                    prep["end_date"], pl)
                else:
                    self._submit_io(self._history_job, prep["end_date"],
                                    s, d, a, hf, hm)
        epoch = prep["end_itime"] * dt
        if self.rs.restart_timestep > 0 \
                and epoch % self.rs.restart_timestep == 0:
            self.write_restart(
                _async=True,
                _snapshot=(prep["end_date"], s, a,
                           mmf if self._shard is None else self.mmf,
                           prep["extras"]))
        if verbose:
            print(f"***DATE={prep['end_date']}  "
                  f"Timing: {t2 - prep['t0']:.3f}s "
                  f"({K} steps/dispatch, {n_out} history snapshots)",
                  flush=True)
        return d

    def run(self, nsteps=None, verbose=False, profile_dir=None,
            chunk=None):
        """Integrate nsteps.  With profile_dir, wrap the loop in a
        jax.profiler trace (the TPU-native equivalent of the
        reference's system_clock SFLX timers,
        module_hrldas_noahmp_driver.F90:46-53, :580-585).

        chunk: max on-device steps per dispatch (None = the model's
        chunk_steps field; 0 = auto; 1 = per-step dispatch — the same
        code path with K=1, restoring the reference's exact-step
        conservation-abort granularity).  The chunked path accumulates
        the conservation residuals device-side and checks them once
        per chunk, so an abort reports a chunk-sized date range rather
        than the exact step; re-run with chunk=1 to localize one."""
        nsteps = nsteps if nsteps is not None else self.rs.ntime
        chunk = self.chunk_steps if chunk is None else chunk
        if chunk == 0:
            chunk = self.DEFAULT_CHUNK
        if profile_dir:
            with jax.profiler.trace(str(profile_dir)):
                last = self._run_loop(nsteps, chunk, verbose)
            self.flush_io()
            return last
        last = self._run_loop(nsteps, chunk, verbose)
        self.flush_io()
        return last

    def _run_loop(self, nsteps, chunk, verbose):
        """Software-pipelined chunk loop: each iteration dispatches
        chunk i (async device call), then synchronizes on chunk i-1 —
        so the host-side preparation of chunk i (forcing file reads,
        snapshot stacking, host->device transfers) overlaps chunk
        i-1's device compute and writer-thread I/O.  Multi-host MMF
        runs unpipelined (the WTD halo exchange needs the chunk-end
        state on the host between chunks)."""
        chunk = max(int(chunk), 1)
        pipelined = not (self.cfg.opt_run == 5 and self._shard
                         is not None)
        last = None
        done = 0
        pend = None
        while done < nsteps or pend is not None:
            nxt = None
            if done < nsteps:
                K, n_out, O = self._plan_chunk(min(chunk,
                                                   nsteps - done))
                prep = self._prep_chunk(K, n_out, O)
                nxt = (prep, self._dispatch_chunk(prep))
                done += K
                if not pipelined:
                    last = self._finish_chunk(*nxt, verbose=verbose)
                    nxt = None
            if pend is not None:
                last = self._finish_chunk(*pend, verbose=verbose)
            pend = nxt
        return last

    def probe(self, file=None):
        """Full-state debug dump (hrldas_noahmp_vars_probe,
        module_hrldas_noahmp_vars.F90:465-601): per-field min/max/mean
        over land columns, one line each."""
        import sys
        out = file or sys.stdout
        land = np.asarray(self.masks.land)
        print(f"--- probe @ {self.date} (itime={self.itime}, "
              f"{int(land.sum())} land / {land.size} columns)", file=out)
        for f in dataclasses.fields(self.state):
            a = np.asarray(getattr(self.state, f.name))
            sel = a[land] if a.shape[:1] == land.shape else a
            if sel.size == 0:
                continue
            print(f"{f.name.upper():>10s}: min={sel.min():14.6g} "
                  f"max={sel.max():14.6g} mean={sel.mean():14.6g}",
                  file=out)
        for name, a in zip(self.accum._fields, self.accum):
            sel = np.asarray(a)[land]
            print(f"{name.upper():>10s}: min={sel.min():14.6g} "
                  f"max={sel.max():14.6g} mean={sel.mean():14.6g}",
                  file=out)

    def write_restart(self, _async=False, _snapshot=None):
        """_snapshot=(date, state, accum, mmf, extras) pins a specific
        chunk's end state (the pipelined loop may have advanced
        self.state and the fpar/gvf tracking past it by the time the
        writer thread runs)."""
        if _snapshot is not None:
            date, state, accum, mmf, extras = _snapshot
        else:
            date, state, accum, mmf, extras = (
                self.date, self.state, self.accum, self.mmf,
                {k: v for k, v in
                 (("FPAR", self.fpar), ("GVFMIN", self.gvfmin),
                  ("GVFMAX", self.gvfmax),
                  ("SHDMAX", self.shdmax_grid)) if v is not None})
        compact = date.replace("-", "").replace(":", "") \
            .replace("_", "T")
        path = Path(self.rs.resdir) / f"restart.{compact}.nc"
        path.parent.mkdir(parents=True, exist_ok=True)
        # snapshots: the writer thread runs later (device arrays are
        # immutable, so the expansion can happen on that thread too and
        # overlap the next chunk's compute)
        kw = dict(extras=extras, smceq=self.smceq, shard=self._shard)
        pstr = str(path)
        if self._shard:
            pstr += f".p{self._shard[0]:04d}"

        def job(state_, accum_, mmf_, _kw=kw):
            ncio.write_restart(pstr, self.cfg, date,
                               self._expand_tree(state_),
                               self._expand_tree(accum_),
                               self.domain.ny, self.domain.nx,
                               mmf=mmf_, **_kw)

        if _async:
            # one packed device->host message for the whole restart
            # payload (state + accum + MMF) — see _pack_async
            packed = self._pack_async((state, accum, mmf))
            if packed is not None:
                self._submit_io(
                    lambda _p=packed: job(*unpack(*_p)))
            else:
                self._submit_io(job, state, accum, mmf)
        else:
            job(state, accum, mmf)
        return str(path)
