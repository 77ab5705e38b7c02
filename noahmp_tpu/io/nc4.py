"""NetCDF-4 (HDF5) backend via ctypes on the system libnetcdf.

The reference writes NetCDF-4 history/restart files with
``deflate_level = 6`` (module_hrldas_netcdf_io.F90:1688,
nf90_def_var(... deflate_level=6)).  scipy only speaks NetCDF classic,
so this module binds the system ``libnetcdf`` directly and exposes the
small slice of the ``scipy.io.netcdf_file`` API the framework's I/O
layer uses — ``createDimension`` / ``createVariable`` / item
assignment / attribute assignment on write, and ``.variables`` /
item reads / global attributes on read — so the two backends are
drop-in interchangeable.

No pybind11 in this image; plain ``ctypes`` on ``libnetcdf.so`` is the
binding (zero build step, and the netCDF C API is stable).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

# netcdf.h constants
NC_NOWRITE = 0x0000
NC_CLOBBER = 0x0000
NC_NETCDF4 = 0x1000
NC_GLOBAL = -1
NC_UNLIMITED = 0

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_TYPEMAP = {"f": NC_FLOAT, "i": NC_INT, "c": NC_CHAR, "d": NC_DOUBLE,
            "h": NC_SHORT, "b": NC_BYTE}
_NPMAP = {NC_FLOAT: np.float32, NC_INT: np.int32, NC_DOUBLE: np.float64,
          NC_SHORT: np.int16, NC_BYTE: np.int8, NC_CHAR: "S1"}

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for cand in ("libnetcdf.so.19", "libnetcdf.so",
                 ctypes.util.find_library("netcdf")):
        if not cand:
            continue
        try:
            _lib = ctypes.CDLL(cand)
            break
        except OSError:
            continue
    if _lib is None:
        raise OSError("libnetcdf not found")
    _lib.nc_strerror.restype = ctypes.c_char_p
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def _chk(status, what=""):
    if status != 0:
        msg = _load().nc_strerror(status).decode()
        raise OSError(f"netCDF error {status} ({what}): {msg}")


class _Var:
    """One variable; mirrors the scipy netcdf variable surface used by
    the I/O layer: whole/record item get/set plus attribute set."""

    def __init__(self, nc, varid, name, xtype, shape, dimids,
                 dimnames=()):
        object.__setattr__(self, "_nc", nc)
        object.__setattr__(self, "_varid", varid)
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "_xtype", xtype)
        object.__setattr__(self, "shape", tuple(shape))
        object.__setattr__(self, "_dimids", tuple(dimids))
        object.__setattr__(self, "dimensions", tuple(dimnames))
        object.__setattr__(self, "_cache", None)

    # -- attributes ----------------------------------------------------
    def __setattr__(self, key, value):
        if key.startswith("_") or key in ("name", "shape", "dimensions"):
            object.__setattr__(self, key, value)
            return
        self._nc._put_att(self._varid, key, value)

    def __getattr__(self, key):   # read-side attribute access
        if key.startswith("_"):
            raise AttributeError(key)
        val = self._nc._get_att(self._varid, key)
        if val is None:
            raise AttributeError(key)
        return val

    def attrs(self):
        """{name: value} of this variable's attributes."""
        return {n: self._nc._get_att(self._varid, n)
                for n in self._nc._att_names(self._varid)}

    # -- data ----------------------------------------------------------
    @property
    def data(self):
        return self._read()

    def _read(self):
        if self._cache is None:
            lib = self._nc._lib
            arr = np.empty(self.shape, dtype=_NPMAP[self._xtype])
            n = int(np.prod(self.shape)) if self.shape else 1
            if n:
                if self._xtype == NC_CHAR:
                    buf = ctypes.create_string_buffer(n)
                    _chk(lib.nc_get_var_text(self._nc._ncid, self._varid,
                                             buf), self.name)
                    arr = np.frombuffer(buf.raw[:n], dtype="S1") \
                        .reshape(self.shape).copy()
                elif self._xtype == NC_DOUBLE:
                    _chk(lib.nc_get_var_double(
                        self._nc._ncid, self._varid,
                        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))),
                        self.name)
                elif self._xtype == NC_SHORT:
                    # native int16 (scale/offset-packed history planes
                    # must round-trip their on-disk type)
                    arr = np.empty(self.shape, np.int16)
                    _chk(lib.nc_get_var_short(
                        self._nc._ncid, self._varid,
                        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_short))),
                        self.name)
                elif self._xtype in (NC_INT, NC_BYTE):
                    arr = np.empty(self.shape, np.int32)
                    _chk(lib.nc_get_var_int(
                        self._nc._ncid, self._varid,
                        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))),
                        self.name)
                else:
                    _chk(lib.nc_get_var_float(
                        self._nc._ncid, self._varid,
                        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))),
                        self.name)
            object.__setattr__(self, "_cache", arr)
        return self._cache

    def __getitem__(self, key):
        return self._read()[key]

    def read_rows(self, r0, r1, row_axis=-2):
        """Hyperslab read of rows [r0, r1) along ``row_axis`` (the
        south_north axis of (Time, sn, we) / (sn, we) layouts) without
        touching the rest of the variable — the per-host read the
        reference implements as io-rank scatter
        (module_mpp_land.F90:645-721)."""
        lib = self._nc._lib
        nd = len(self.shape)
        ax = row_axis % nd
        start = [0] * nd
        count = list(self.shape)
        start[ax], count[ax] = int(r0), int(r1 - r0)
        startc = (ctypes.c_size_t * nd)(*start)
        countc = (ctypes.c_size_t * nd)(*count)
        if self._xtype in (NC_INT, NC_SHORT, NC_BYTE):
            arr = np.empty(count, np.int32)
            _chk(lib.nc_get_vara_int(
                self._nc._ncid, self._varid, startc, countc,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))),
                self.name)
        elif self._xtype == NC_DOUBLE:
            arr = np.empty(count, np.float64)
            _chk(lib.nc_get_vara_double(
                self._nc._ncid, self._varid, startc, countc,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))),
                self.name)
        else:
            arr = np.empty(count, np.float32)
            _chk(lib.nc_get_vara_float(
                self._nc._ncid, self._varid, startc, countc,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))),
                self.name)
        return arr

    def __setitem__(self, key, value):
        nc, lib = self._nc, self._nc._lib
        nc._enddef()
        full = self.shape
        # normalize to (start[], count[]) hyperslab
        start = [0] * len(full)
        count = list(full)
        if key != slice(None):
            if isinstance(key, int):
                start[0], count[0] = key, 1
                value = np.asarray(value)[None] if np.ndim(value) \
                    == len(full) - 1 else np.asarray(value)
            else:
                raise TypeError(f"unsupported index {key!r}")
        n = int(np.prod(count))
        startc = (ctypes.c_size_t * len(full))(*start)
        countc = (ctypes.c_size_t * len(full))(*count)
        if self._xtype == NC_CHAR:
            raw = np.asarray(value, dtype="S1").tobytes().ljust(n, b"\0")
            _chk(lib.nc_put_vara_text(nc._ncid, self._varid, startc, countc,
                                      raw), self.name)
        elif self._xtype == NC_INT:
            a = np.ascontiguousarray(np.broadcast_to(
                np.asarray(value, np.int32), count))
            _chk(lib.nc_put_vara_int(
                nc._ncid, self._varid, startc, countc,
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))), self.name)
        elif self._xtype == NC_DOUBLE:
            a = np.ascontiguousarray(np.broadcast_to(
                np.asarray(value, np.float64), count))
            _chk(lib.nc_put_vara_double(
                nc._ncid, self._varid, startc, countc,
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))), self.name)
        elif self._xtype == NC_SHORT:
            a = np.ascontiguousarray(np.broadcast_to(
                np.asarray(value, np.int16), count))
            _chk(lib.nc_put_vara_short(
                nc._ncid, self._varid, startc, countc,
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_short))), self.name)
        else:
            a = np.ascontiguousarray(np.broadcast_to(
                np.asarray(value, np.float32), count))
            _chk(lib.nc_put_vara_float(
                nc._ncid, self._varid, startc, countc,
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))), self.name)


class nc4_file:
    """NetCDF-4 file handle (write: HDF5 + per-variable deflate;
    read: any format libnetcdf understands, incl. classic)."""

    def __init__(self, path, mode="r", deflate=6):
        lib = _load()
        object.__setattr__(self, "_lib", lib)
        object.__setattr__(self, "_mode", mode)
        object.__setattr__(self, "_deflate", int(deflate))
        object.__setattr__(self, "_dims", {})
        object.__setattr__(self, "variables", {})
        object.__setattr__(self, "dimensions", {})
        object.__setattr__(self, "_indef", mode == "w")
        object.__setattr__(self, "_closed", False)
        ncid = ctypes.c_int()
        if mode == "w":
            _chk(lib.nc_create(str(path).encode(),
                               NC_CLOBBER | NC_NETCDF4,
                               ctypes.byref(ncid)), str(path))
        else:
            _chk(lib.nc_open(str(path).encode(), NC_NOWRITE,
                             ctypes.byref(ncid)), str(path))
        object.__setattr__(self, "_ncid", ncid.value)
        if mode == "r":
            self._scan()

    # -- define mode helpers --------------------------------------------
    def _enddef(self):
        if self._indef:
            # NetCDF4 files don't strictly need enddef, but it flushes
            # metadata; ignore "not in define mode"
            self._lib.nc_enddef(self._ncid)
            object.__setattr__(self, "_indef", False)

    def _redef(self):
        if not self._indef and self._mode == "w":
            self._lib.nc_redef(self._ncid)
            object.__setattr__(self, "_indef", True)

    # -- write API -------------------------------------------------------
    def createDimension(self, name, size):
        self._redef()
        dimid = ctypes.c_int()
        _chk(self._lib.nc_def_dim(self._ncid, name.encode(),
                                  ctypes.c_size_t(int(size)),
                                  ctypes.byref(dimid)), name)
        self._dims[name] = (dimid.value, int(size))
        self.dimensions[name] = int(size)

    def createVariable(self, name, typecode, dims):
        self._redef()
        xtype = _TYPEMAP[typecode]
        dimids = [self._dims[d][0] for d in dims]
        shape = [self._dims[d][1] for d in dims]
        arr = (ctypes.c_int * len(dimids))(*dimids)
        varid = ctypes.c_int()
        _chk(self._lib.nc_def_var(self._ncid, name.encode(), xtype,
                                  len(dimids), arr, ctypes.byref(varid)),
             name)
        # reference: deflate_level=6 on every gridded variable
        # (module_hrldas_netcdf_io.F90:1688)
        if self._deflate > 0 and xtype != NC_CHAR and len(dimids) >= 2:
            _chk(self._lib.nc_def_var_deflate(
                self._ncid, varid.value, 1, 1, self._deflate), name)
        v = _Var(self, varid.value, name, xtype, shape, dimids,
                 dimnames=tuple(dims))
        self.variables[name] = v
        return v

    def _put_att(self, varid, key, value):
        self._redef()
        lib = self._lib
        if isinstance(value, str):
            value = value.encode()
        if isinstance(value, bytes):
            _chk(lib.nc_put_att_text(self._ncid, varid, key.encode(),
                                     ctypes.c_size_t(len(value)), value),
                 key)
        elif isinstance(value, np.int16):
            # _FillValue/missing_value on short variables must be
            # attribute-typed NC_SHORT to match the variable type
            a = (ctypes.c_short * 1)(int(value))
            _chk(lib.nc_put_att_short(self._ncid, varid, key.encode(),
                                      NC_SHORT, ctypes.c_size_t(1), a), key)
        elif isinstance(value, (int, np.integer)):
            a = (ctypes.c_int * 1)(int(value))
            _chk(lib.nc_put_att_int(self._ncid, varid, key.encode(),
                                    NC_INT, ctypes.c_size_t(1), a), key)
        else:
            a = (ctypes.c_float * 1)(float(value))
            _chk(lib.nc_put_att_float(self._ncid, varid, key.encode(),
                                      NC_FLOAT, ctypes.c_size_t(1), a), key)

    def _get_att(self, varid, key):
        lib = self._lib
        xtype = ctypes.c_int()
        alen = ctypes.c_size_t()
        st = lib.nc_inq_att(self._ncid, varid, key.encode(),
                            ctypes.byref(xtype), ctypes.byref(alen))
        if st != 0:
            return None
        if xtype.value == NC_CHAR:
            buf = ctypes.create_string_buffer(alen.value + 1)
            _chk(lib.nc_get_att_text(self._ncid, varid, key.encode(), buf),
                 key)
            return buf.raw[:alen.value]
        if xtype.value in (NC_INT, NC_SHORT, NC_BYTE):
            a = (ctypes.c_int * alen.value)()
            _chk(lib.nc_get_att_int(self._ncid, varid, key.encode(), a), key)
            vals = list(a)
            return vals[0] if alen.value == 1 else np.array(vals)
        a = (ctypes.c_double * alen.value)()
        _chk(lib.nc_get_att_double(self._ncid, varid, key.encode(), a), key)
        vals = list(a)
        return (np.float32(vals[0]) if alen.value == 1
                else np.array(vals, np.float32))

    def _att_names(self, varid):
        """Attribute names of a variable (or NC_GLOBAL)."""
        lib = self._lib
        natts = ctypes.c_int()
        if varid == NC_GLOBAL:
            _chk(lib.nc_inq_natts(self._ncid, ctypes.byref(natts)))
        else:
            st = lib.nc_inq_varnatts(self._ncid, varid,
                                     ctypes.byref(natts))
            if st != 0:
                return []
        names = []
        for i in range(natts.value):
            buf = ctypes.create_string_buffer(256)
            _chk(lib.nc_inq_attname(self._ncid, varid, i, buf))
            names.append(buf.value.decode())
        return names

    def global_attrs(self):
        """{name: value} of all global attributes."""
        return {n: self._get_att(NC_GLOBAL, n)
                for n in self._att_names(NC_GLOBAL)}

    # global attributes: scipy exposes them as instance attributes
    def __setattr__(self, key, value):
        if key.startswith("_") or key in ("variables", "dimensions"):
            object.__setattr__(self, key, value)
            return
        if self._mode == "w":
            self._put_att(NC_GLOBAL, key, value)
        else:
            object.__setattr__(self, key, value)

    def __getattr__(self, key):
        if key.startswith("_"):
            raise AttributeError(key)
        val = self._get_att(NC_GLOBAL, key)
        if val is None:
            raise AttributeError(key)
        return val

    # -- read API ----------------------------------------------------------
    def _scan(self):
        lib = self._lib
        ndims = ctypes.c_int()
        nvars = ctypes.c_int()
        _chk(lib.nc_inq_ndims(self._ncid, ctypes.byref(ndims)))
        _chk(lib.nc_inq_nvars(self._ncid, ctypes.byref(nvars)))
        dimlen = {}
        dimname = {}
        for d in range(ndims.value):
            nm = ctypes.create_string_buffer(256)
            ln = ctypes.c_size_t()
            _chk(lib.nc_inq_dim(self._ncid, d, nm, ctypes.byref(ln)))
            dimlen[d] = ln.value
            dimname[d] = nm.value.decode()
            self.dimensions[nm.value.decode()] = ln.value
        for v in range(nvars.value):
            nm = ctypes.create_string_buffer(256)
            xtype = ctypes.c_int()
            nd = ctypes.c_int()
            dimids = (ctypes.c_int * 32)()
            natts = ctypes.c_int()
            _chk(lib.nc_inq_var(self._ncid, v, nm, ctypes.byref(xtype),
                                ctypes.byref(nd), dimids,
                                ctypes.byref(natts)))
            shape = [dimlen[dimids[i]] for i in range(nd.value)]
            self.variables[nm.value.decode()] = _Var(
                self, v, nm.value.decode(), xtype.value, shape,
                dimids[:nd.value],
                dimnames=tuple(dimname[dimids[i]]
                               for i in range(nd.value)))

    # -- lifecycle -----------------------------------------------------------
    def close(self):
        if not self._closed:
            object.__setattr__(self, "_closed", True)
            _chk(self._lib.nc_close(self._ncid), "close")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def is_hdf5(path) -> bool:
    """True if the file is NetCDF-4 (HDF5 container)."""
    try:
        with open(path, "rb") as f:
            return f.read(8).startswith(b"\x89HDF\r\n\x1a\n")
    except OSError:
        return False


def open_nc(path):
    """Open any NetCDF file for reading with the right backend:
    HDF5-container files need libnetcdf; classic files use scipy
    (mmap-free, like the rest of the I/O layer)."""
    if is_hdf5(path):
        return nc4_file(path, "r")
    from scipy.io import netcdf_file
    return netcdf_file(path, "r", mmap=False)
