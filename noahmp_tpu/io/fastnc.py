"""ctypes bindings for the native fastnc NetCDF-classic reader.

Builds ``native/fastnc.cpp`` on first use (g++ -O3 -shared); falls back
to the scipy reader transparently when the toolchain is unavailable.
Provides the threaded multi-file batch read used by the forcing
prefetcher (the TPU-native replacement for the reference's io-rank
read+scatter funnel, module_hrldas_netcdf_io.F90:394-476).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_PKG = Path(__file__).resolve().parents[1]
_SRC = _PKG / "native" / "fastnc.cpp"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _so_path():
    """Build artifact location: next to the source when writable
    (in-repo dev), else a user cache dir (installed package)."""
    d = _SRC.parent
    if os.access(d, os.W_OK):
        return d / "libfastnc.so"
    cache = Path(os.environ.get("XDG_CACHE_HOME",
                                Path.home() / ".cache")) / "noahmp_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    return cache / "libfastnc.so"


def _build(so):
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         str(_SRC), "-o", str(so)],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            _SO = _so_path()
            if not _SO.exists() or (_SRC.stat().st_mtime > _SO.stat().st_mtime):
                _build(_SO)
            lib = ctypes.CDLL(str(_SO))
            lib.fastnc_read_var.restype = ctypes.c_long
            lib.fastnc_read_var.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long]
            lib.fastnc_read_vars.restype = ctypes.c_long
            lib.fastnc_read_vars.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long]
            lib.fastnc_read_vars_many.restype = None
            lib.fastnc_read_vars_many.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_long)]
            lib.fastnc_var_ndims.restype = ctypes.c_long
            lib.fastnc_var_ndims.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_long), ctypes.c_int]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return get_lib() is not None


def read_var(path, varname, n_elems) -> np.ndarray:
    """Read one variable as float32 (all records), native path."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastnc unavailable")
    out = np.empty(n_elems, np.float32)
    r = lib.fastnc_read_var(
        str(path).encode(), varname.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n_elems))
    if r < 0:
        raise IOError(f"fastnc_read_var({path},{varname}) -> {r}")
    return out[:r]


def var_shape(path, varname):
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastnc unavailable")
    shape = (ctypes.c_long * 8)()
    nd = lib.fastnc_var_ndims(str(path).encode(), varname.encode(),
                              shape, 8)
    if nd < 0:
        raise IOError(f"fastnc_var_ndims({path},{varname}) -> {nd}")
    return tuple(shape[i] for i in range(nd))


def read_vars(path, varnames, per_var_elems) -> np.ndarray:
    """Read several variables from one file -> (nvars, per_var_elems)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastnc unavailable")
    nv = len(varnames)
    out = np.empty((nv, per_var_elems), np.float32)
    names = (ctypes.c_char_p * nv)(*[v.encode() for v in varnames])
    r = lib.fastnc_read_vars(
        str(path).encode(), names, nv,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(per_var_elems))
    if r < 0:
        raise IOError(f"fastnc_read_vars({path}) -> {r}")
    return out


def read_vars_many(paths, varnames, per_var_elems):
    """Threaded batch read -> (nfiles, nvars, per_var_elems), statuses."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("fastnc unavailable")
    np_, nv = len(paths), len(varnames)
    out = np.empty((np_, nv, per_var_elems), np.float32)
    cpaths = (ctypes.c_char_p * np_)(*[str(p).encode() for p in paths])
    cnames = (ctypes.c_char_p * nv)(*[v.encode() for v in varnames])
    status = np.zeros(np_, np.int64)
    lib.fastnc_read_vars_many(
        cpaths, np_, cnames, nv,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(per_var_elems),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    return out, status


class ForcingPrefetcher:
    """Background-thread forcing prefetch: while the device integrates
    step N, the next forcing file is read+decoded on the host
    (SURVEY §5.8 double-buffering of the reference's lastread/nextread
    pair, module_hrldas_netcdf_io.F90:1167-1302)."""

    MAX_PENDING = 16   # bound host memory: ~16 decoded snapshots

    def __init__(self, varnames, per_var_elems, max_workers=2):
        from concurrent.futures import ThreadPoolExecutor
        self.varnames = list(varnames)
        self.per_var_elems = per_var_elems
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._futs = {}    # path -> Future

    def _read(self, path):
        if available():
            data = read_vars(path, self.varnames, self.per_var_elems)
            return {v: data[i] for i, v in enumerate(self.varnames)}
        from .netcdf_io import read_forcing_file
        raw = read_forcing_file(path)
        return {v: raw[v].reshape(-1) for v in self.varnames}

    def start(self, path):
        """Kick off an async read of ``path`` (idempotent per path).
        Multiple paths may be in flight — the chunked driver prefetches
        a whole chunk's worth of snapshot files ahead."""
        p = str(path)
        if p in self._futs or len(self._futs) >= self.MAX_PENDING:
            return
        self._futs[p] = self._pool.submit(self._read, p)

    def get(self, path):
        """Blocking fetch; uses the prefetched buffer when it matches."""
        fut = self._futs.pop(str(path), None)
        if fut is not None:
            return fut.result()
        return self._read(path)
