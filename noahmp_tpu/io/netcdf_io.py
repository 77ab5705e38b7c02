"""NetCDF I/O: domain/init/forcing readers, history & restart writers.

Reference: driver/module_hrldas_netcdf_io.F90 — dim/header/const readers
(:153-324), init readers (:688-808), forcing reader with two-slot time
interpolation (:1140-1303, :1369-1403), history writer (:1536-2043),
restart writer/reader (:2065-2874).

History/restart files are NetCDF-4 with deflate_level=6 via a ctypes
binding of the system libnetcdf (noahmp_tpu.io.nc4), matching the
reference's format (module_hrldas_netcdf_io.F90:1688); set
NOAHMP_NC_FORMAT=classic for scipy CDF-1 output.  Readers sniff the
container magic and handle both.  The reference funnels all I/O
through an MPI io-rank with scatter/gather
(module_hrldas_netcdf_io.F90:59-131); here every host reads/writes
host-local shards of the flat column axis (SURVEY §5.8) — for
single-host runs that is simply the whole domain.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import numpy as np
from scipy.io import netcdf_file

from .. import constants as C
from .nc4 import nc4_file, open_nc
from . import nc4 as _nc4


def _wfile(path):
    """Writable NetCDF handle.  Default format is NetCDF-4 with
    deflate_level=6, matching the reference
    (module_hrldas_netcdf_io.F90:1688); set NOAHMP_NC_FORMAT=classic
    to emit scipy CDF-1 files instead (or when libnetcdf is absent)."""
    fmt = os.environ.get("NOAHMP_NC_FORMAT", "netcdf4").lower()
    if fmt != "classic" and _nc4.available():
        return nc4_file(path, "w", deflate=6)
    return netcdf_file(path, "w")

# history registry: name -> (source, field, units, description, kind)
# source: "diag" (SflxDiag), "state" (ColumnState), "accum", "forc"
# kind: "2d" | "soil" | "snow" | "sosn" | "int2d"
HISTORY_FIELDS = [
    ("FVEG", "diag", "fveg", "-", "Green Vegetation Fraction", "2d"),
    ("FSA", "diag", "fsa", "W m{-2}", "Total absorbed SW radiation", "2d"),
    ("FIRA", "diag", "fira", "W m{-2}", "Total net LW radiation to atmosphere", "2d"),
    ("GRDFLX", "diag", "ssoil", "W m{-2}", "Heat flux into the soil", "2d"),
    ("HFX", "diag", "fsh", "W m{-2}", "Total sensible heat to atmosphere", "2d"),
    ("ECAN", "diag", "ecan", "kg m{-2} s{-1}", "Canopy water evaporation rate", "2d"),
    ("ETRAN", "diag", "etran", "kg m{-2} s{-1}", "Transpiration rate", "2d"),
    ("EDIR", "diag", "edir", "kg m{-2} s{-1}", "Direct from soil evaporation rate", "2d"),
    ("ALBEDO", "diag", "albedo", "-", "Surface albedo", "2d"),
    ("UGDRNOFF", "accum", "udrunoff", "mm", "Accumulated underground runoff", "2d"),
    ("SFCRNOFF", "accum", "sfcrunoff", "mm", "Accumulated surface runoff", "2d"),
    ("CANLIQ", "state", "canliq", "mm", "Canopy liquid water content", "2d"),
    ("CANICE", "state", "canice", "mm", "Canopy ice water content", "2d"),
    ("ZWT", "state", "zwt", "m", "Depth to water table", "2d"),
    ("WA", "state", "wa", "kg m{-2}", "Water in aquifer", "2d"),
    ("WT", "state", "wt", "kg m{-2}", "Water in aquifer and saturated soil", "2d"),
    ("SAV", "diag", "sav", "W m{-2}", "Solar radiative heat flux absorbed by vegetation", "2d"),
    ("SAG", "diag", "sag", "W m{-2}", "Solar radiative heat flux absorbed by ground", "2d"),
    ("TR", "diag", "tr", "W m{-2}", "Transpiration heat", "2d"),
    ("EVC", "diag", "evc", "W m{-2}", "Canopy evap heat", "2d"),
    ("IRC", "diag", "irc", "W m{-2}", "Canopy net LW rad", "2d"),
    ("SHC", "diag", "shc", "W m{-2}", "Canopy sensible heat", "2d"),
    ("IRG", "diag", "irg", "W m{-2}", "Ground net LW rad", "2d"),
    ("SHG", "diag", "shg", "W m{-2}", "Ground sensible heat", "2d"),
    ("EVG", "diag", "evg", "W m{-2}", "Ground evap heat", "2d"),
    ("GHV", "diag", "ghv", "W m{-2}", "Ground heat flux + to soil vegetated", "2d"),
    ("IRB", "diag", "irb", "W m{-2}", "Net LW rad to atm bare", "2d"),
    ("SHB", "diag", "shb", "W m{-2}", "Sensible heat to atm bare", "2d"),
    ("EVB", "diag", "evb", "W m{-2}", "Evaporation heat to atm bare", "2d"),
    ("GHB", "diag", "ghb", "W m{-2}", "Ground heat flux + to soil bare", "2d"),
    ("TRAD", "diag", "trad", "K", "Surface radiative temperature", "2d"),
    ("TG", "state", "tg", "K", "Ground temperature", "2d"),
    ("TV", "state", "tv", "K", "Vegetation temperature", "2d"),
    ("TAH", "state", "tah", "K", "Canopy air temperature", "2d"),
    ("TGV", "diag", "tgv", "K", "Ground surface Temp vegetated", "2d"),
    ("TGB", "diag", "tgb", "K", "Ground surface Temp bare", "2d"),
    ("T2MV", "diag", "t2mv", "K", "2m Air Temp vegetated", "2d"),
    ("T2MB", "diag", "t2mb", "K", "2m Air Temp bare", "2d"),
    ("Q2MV", "diag", "q2v", "kg/kg", "2m mixing ratio vegetated", "2d"),
    ("Q2MB", "diag", "q2b", "kg/kg", "2m mixing ratio bare", "2d"),
    ("EAH", "state", "eah", "Pa", "Canopy air vapor pressure", "2d"),
    ("FWET", "state", "fwet", "fraction", "Wetted or snowed fraction of canopy", "2d"),
    ("SNICE", "state", "snice", "mm", "Snow layer ice", "snow"),
    ("SNLIQ", "state", "snliq", "mm", "Snow layer liquid water", "snow"),
    ("SOIL_M", "state", "smc", "m{3} m{-3}", "volumetric soil moisture", "soil"),
    ("SOIL_W", "state", "sh2o", "m3 m-3", "liquid volumetric soil moisture", "soil"),
    ("SNOWH", "state", "snowh", "m", "Snow depth", "2d"),
    ("SNEQV", "state", "sneqv", "kg m{-2}", "Snow water equivalent", "2d"),
    ("QSNOW", "diag", "qsnow", "mm s{-1}", "Snowfall rate", "2d"),
    ("ISNOW", "state", "isnow", "count", "Number of snow layers", "int2d"),
    ("FSNO", "diag", "fsno", "", "Snow-cover fraction on the ground", "2d"),
    ("ACSNOW", "accum", "acsnow", "mm", "accumulated snow fall", "2d"),
    ("ACSNOM", "accum", "acsnom", "mm", "accumulated melting water out of snow bottom", "2d"),
    ("CM", "state", "cm", "", "Momentum drag coefficient", "2d"),
    ("CH", "state", "ch", "", "Sensible heat exchange coefficient", "2d"),
    ("CHV", "diag", "chv", "m s{-1}", "Exchange coefficient vegetated", "2d"),
    ("CHB", "diag", "chb", "m s{-1}", "Exchange coefficient bare", "2d"),
    ("CHLEAF", "diag", "chleaf", "m s{-1}", "Exchange coefficient leaf", "2d"),
    ("CHUC", "diag", "chuc", "m s{-1}", "Exchange coefficient bare", "2d"),
    ("CHV2", "diag", "chv2", "m s{-1}", "Exchange coefficient 2-meter vegetated", "2d"),
    ("CHB2", "diag", "chb2", "m s{-1}", "Exchange coefficient 2-meter bare", "2d"),
    ("LFMASS", "state", "lfmass", "g m{-2}", "Leaf mass", "2d"),
    ("RTMASS", "state", "rtmass", "g m{-2}", "Mass of fine roots", "2d"),
    ("STMASS", "state", "stmass", "g m{-2}", "Stem mass", "2d"),
    ("WOOD", "state", "wood", "g m{-2}", "Mass of wood and woody roots", "2d"),
    ("STBLCP", "state", "stblcp", "g m{-2}", "Stable carbon in deep soil", "2d"),
    ("FASTCP", "state", "fastcp", "g m{-2}", "Short-lived carbon in shallow soil", "2d"),
    ("NEE", "diag", "nee", "g m{-2} s{-1} CO2", "Net ecosystem exchange", "2d"),
    ("GPP", "diag", "gpp", "g m{-2} s{-1} C", "Net instantaneous assimilation", "2d"),
    ("NPP", "diag", "npp", "g m{-2} s{-1} C", "Net primary productivity", "2d"),
    ("PSN", "diag", "psn", "umol CO2 m{-2} s{-1}", "Total photosynthesis", "2d"),
    ("APAR", "diag", "apar", "W m{-2}", "Photosynthesis active energy by canopy", "2d"),
    ("SOIL_T", "state_stc_soil", "stc", "K", "soil temperature", "soil"),
    ("SNOW_T", "state_stc_snow", "stc", "K", "snow temperature", "snow"),
    ("LAI", "state", "lai", "-", "Leaf area index", "2d"),
    ("SAI", "state", "sai", "-", "Stem area index", "2d"),
    ("SMCWTD", "state", "smcwtd", "m3 m-3", "soil moisture below soil column", "2d"),
    ("RECH", "state", "rech", "m", "water table recharge", "2d"),
    # forcing echo (driver :696-699)
    ("SWFORC", "forc", "soldn", "W m{-2}", "Shortwave forcing", "2d"),
    ("COSZ", "forc", "cosz", "W m{-2}", "Cosine of zenith angle", "2d"),
    ("LWFORC", "forc", "lwdn", "W m{-2}", "Longwave forcing", "2d"),
    ("RAINRATE", "forc", "prcp", "kg m{-2} s{-1}", "Precipitation rate", "2d"),
    ("EMISS", "diag", "emissi", "", "Grid emissivity", "2d"),
    # LH = FCEV + FGEV + FCTR (module_sf_noahmpdrv.F90 driver glue)
    ("LH", "lh", "", "W m{-2}", "Total latent heat to atmosphere", "2d"),
    # snow-layer depths (driver :752: ZSNSOXY(:,-nsnow+1:0,:))
    ("ZSNSO_SN", "state_zsnso_snow", "zsnso", "m",
     "Snow layer depths from snow surface", "snow"),
    # MMF groundwater accumulators, opt_run=5 only (driver :789-794)
    ("QRFS", "mmf", "qrfs", "mm", "groundwater baseflow", "2d"),
    ("QSPRINGS", "mmf", "qsprings", "mm", "seeping water", "2d"),
    ("QSLAT", "mmf", "qslat", "mm", "lateral flow", "2d"),
]

# restart fields: (ncname, state field, kind)
RESTART_FIELDS = [
    ("SOIL_T", "stc_soil", "soil"), ("SNOW_T", "stc_snow", "snow"),
    ("SMC", "smc", "soil"), ("SH2O", "sh2o", "soil"),
    ("ZSNSO", "zsnso", "sosn"), ("SNICE", "snice", "snow"),
    ("SNLIQ", "snliq", "snow"), ("QSNOW", "qsnow", "2d"),
    ("FWET", "fwet", "2d"), ("SNEQVO", "sneqvo", "2d"),
    ("EAH", "eah", "2d"), ("TAH", "tah", "2d"),
    ("ALBOLD", "albold", "2d"), ("CM", "cm", "2d"), ("CH", "ch", "2d"),
    ("ISNOW", "isnow", "int2d"), ("CANLIQ", "canliq", "2d"),
    ("CANICE", "canice", "2d"), ("SNEQV", "sneqv", "2d"),
    ("SNOWH", "snowh", "2d"), ("TV", "tv", "2d"), ("TG", "tg", "2d"),
    ("ZWT", "zwt", "2d"), ("WA", "wa", "2d"), ("WT", "wt", "2d"),
    ("WSLAKE", "wslake", "2d"), ("LFMASS", "lfmass", "2d"),
    ("RTMASS", "rtmass", "2d"), ("STMASS", "stmass", "2d"),
    ("WOOD", "wood", "2d"), ("STBLCP", "stblcp", "2d"),
    ("FASTCP", "fastcp", "2d"), ("LAI", "lai", "2d"),
    ("SAI", "sai", "2d"), ("TAUSS", "tauss", "2d"),
    ("QSFC", "qsfc", "2d"), ("SMCWTDXY", "smcwtd", "2d"),
    ("DEEPRECHXY", "deeprech", "2d"), ("RECHXY", "rech", "2d"),
]
# accumulators; the reference restart names ACSNOM "ACMELT"
# (module_hrldas_noahmp_driver.F90:650)
RESTART_ACCUM = [("SFCRUNOFF", "sfcrunoff"), ("UDRUNOFF", "udrunoff"),
                 ("ACSNOW", "acsnow"), ("ACMELT", "acsnom")]
# driver-level 2D fields carried through restarts (driver :645-649);
# supplied to write_restart via `extras`, returned by read_restart
RESTART_EXTRAS = ["FPAR", "GVFMIN", "GVFMAX", "SHDMAX"]


def _get_state_field(state, field, kind, nsnow):
    import numpy as _np
    if field == "stc" and kind == "soil":
        return _np.asarray(state.stc)[:, nsnow:]
    if field == "stc" and kind == "snow":
        return _np.asarray(state.stc)[:, :nsnow]
    return _np.asarray(getattr(state, field))


@dataclasses.dataclass
class Domain:
    """Static domain info (hrldas_diminfo/hdrinfo/const_read
    :153-324)."""
    nx: int
    ny: int
    xlat: np.ndarray
    xlong: np.ndarray
    xland: np.ndarray
    seaice: np.ndarray
    hgt: np.ndarray
    tmn: np.ndarray
    vegtyp: np.ndarray
    soiltyp: np.ndarray
    dx: float = 1000.0
    dy: float = 1000.0
    iswater: int = 16
    isice: int = 24
    isurban: int = 1
    llanduse: str = ""   # MMINLU global attr ("USGS"/"MODIS..."); "" if absent
    # optional annual green-veg-fraction climatology
    # (hrldas_parm_veg_read, module_hrldas_netcdf_io.F90:1130-1135);
    # None when the setup file has no GVFMIN/GVFMAX/SHDMAX
    gvfmin: np.ndarray = None
    gvfmax: np.ndarray = None
    shdmax: np.ndarray = None
    # map-scale factors (hrldas_const_read MAPFAC_MX/MY, NOT_FATAL
    # :300-305); unity when the setup file has none.  Grid-cell area =
    # (DX*DY)/(MSFTX*MSFTY) per cell (module_sf_noahmpdrv.F90:1109)
    msftx: np.ndarray = None
    msfty: np.ndarray = None

    def cell_area(self):
        """Per-cell grid area (DX*DY)/(MSFTX*MSFTY), (ny, nx) float32
        (module_sf_noahmpdrv.F90:1109); unity map factors when the
        setup file carries none."""
        a = np.full((self.ny, self.nx), self.dx * self.dy, np.float64)
        if self.msftx is not None:
            a = a / np.asarray(self.msftx, np.float64)
        if self.msfty is not None:
            a = a / np.asarray(self.msfty, np.float64)
        return a.astype(np.float32)


def read_domain(path) -> Domain:
    with open_nc(path) as nc:
        v = nc.variables

        def rd(name, default=None):
            if name in v:
                a = v[name][:]
                a = np.array(a[0] if a.ndim == 3 else a)
                return a.astype(a.dtype.newbyteorder("="))
            return default

        xlat = rd("XLAT")
        ny, nx = xlat.shape
        ivg = rd("IVGTYP").astype(np.int32)
        isl = rd("ISLTYP").astype(np.int32)
        xland = rd("XLAND", np.ones((ny, nx), np.float32))
        seaice = rd("SEAICE", np.zeros((ny, nx), np.float32))
        hgt = rd("HGT", np.zeros((ny, nx), np.float32))
        tmn = rd("TMN", np.full((ny, nx), 285.0, np.float32))
        attrs = {k: getattr(nc, k, None) for k in
                 ("DX", "DY", "ISWATER", "ISICE", "ISURBAN")}
        # landuse scheme from the MMINLU global attribute
        # (module_hrldas_netcdf_io.F90:239)
        mminlu = getattr(nc, "MMINLU", b"")
        if isinstance(mminlu, bytes):
            mminlu = mminlu.decode("ascii", "ignore")
        mminlu = mminlu.strip()
        # water/soil consistency fix (:321-322)
        iswater = int(attrs.get("ISWATER") or 16)
        isl = np.where((xland > 1.5) | (ivg == iswater), 14, isl)
        return Domain(nx=nx, ny=ny, xlat=xlat, xlong=rd("XLONG"),
                      xland=xland, seaice=seaice, hgt=hgt, tmn=tmn,
                      vegtyp=ivg, soiltyp=isl,
                      dx=float(attrs.get("DX") or 1000.0),
                      dy=float(attrs.get("DY")
                               or attrs.get("DX") or 1000.0),
                      iswater=iswater,
                      msftx=rd("MAPFAC_MX"), msfty=rd("MAPFAC_MY"),
                      isice=int(attrs.get("ISICE") or 24),
                      isurban=int(attrs.get("ISURBAN") or 1),
                      llanduse=mminlu,
                      gvfmin=rd("GVFMIN"), gvfmax=rd("GVFMAX"),
                      shdmax=rd("SHDMAX"))


def crop_domain(dom: Domain, y0: int, y1: int, x0: int = 0,
                x1: int = None) -> Domain:
    """Window view [y0:y1, x0:x1] of a domain — used for the namelist
    subwindow (XSTART/XEND/YSTART/YEND, the reference's run window)
    and the multi-host row partition.  The domain file is read once at
    init, so a full read + slice is fine; the per-step forcing path
    does true hyperslab reads."""
    x1 = dom.nx if x1 is None else x1

    def cut(a):
        return a[y0:y1, x0:x1] if isinstance(a, np.ndarray) \
            and a.ndim == 2 else a
    return dataclasses.replace(
        dom, ny=y1 - y0, nx=x1 - x0,
        **{f.name: cut(getattr(dom, f.name))
           for f in dataclasses.fields(dom)
           if f.name not in ("ny", "nx")
           and isinstance(getattr(dom, f.name), np.ndarray)})


def slice_domain(dom: Domain, r0: int, r1: int) -> Domain:
    """Row-block view [r0, r1) (multi-host partition)."""
    return crop_domain(dom, r0, r1)


FORCING_VARS = ("T2D", "Q2D", "U2D", "V2D", "PSFC", "LWDOWN", "SWDOWN",
                "RAINRATE")
# optional per-file vegetation forcing (hrldas_input_read :1238-1255)
OPTIONAL_FORCING_VARS = ("VEGFRA", "LAI")


def _grid3d_to_znyx(var, nl):
    """Read one gridded 3-D variable as (nlayers, ny, nx).

    The reference file layout is XZY — C dims (Time, south_north,
    layers, west_east) (make_var_att_3d writes (ix, layers, jx, times)
    in Fortran order, module_hrldas_netcdf_io.F90:1932-1935, and
    netcdf_get_real3d reads start=(x,1,y), :508).  Files this framework
    wrote before round 3 used a layers-leading (Time, layers,
    south_north, west_east) layout; both are accepted, decided by
    dimension names when the handle carries them, else by matching the
    expected layer count."""
    a = np.array(var[:])
    dims = tuple(str(d) for d in getattr(var, "dimensions", ()) or ())
    if a.ndim == 4:
        a = np.array(a[0])
        dims = dims[1:]
    lax = next((i for i, d in enumerate(dims) if "layers" in d), None)
    if lax is None:
        lax = 0 if a.shape[0] == nl else 1
    if lax == 1:
        a = a.transpose(1, 0, 2)     # (ny, nl, nx) -> (nl, ny, nx)
    return np.ascontiguousarray(a, dtype=np.float32)


def read_init(path, nsoil):
    """Cold-start initial-condition reader (hrldas_init_read_seq,
    module_hrldas_netcdf_io.F90:739-808).

    Reads CANWAT, SKINTEMP, WEASD (normalized to METERS from m / mm /
    kg m-2 via the units attribute, :766-781), SNODEP (optional ->
    fndsnowh), STEMP, SMOIS.  Returns (dict of arrays, fndsnowh); 2-D
    fields are (ny, nx), 3-D are (nsoil, ny, nx).
    """
    out = {}
    with open_nc(path) as nc:
        v = nc.variables

        def rd(name):
            a = v[name][:]
            a = np.array(a[0] if a.ndim in (3, 4) else a)
            return np.ascontiguousarray(a, dtype=np.float32)

        for name in ("CANWAT", "SKINTEMP", "WEASD", "STEMP", "SMOIS"):
            if name not in v:
                raise KeyError(f"init file {path} missing {name}")
        out["canwat"] = rd("CANWAT")
        out["skintemp"] = rd("SKINTEMP")
        weasd = rd("WEASD")
        units = getattr(v["WEASD"], "units", b"m")
        if isinstance(units, bytes):
            units = units.decode("ascii", "ignore")
        units = units.strip()
        if units == "m":
            pass
        elif units in ("mm", "kg m{-2}", "kg m-2", "kg/m2"):
            weasd = weasd * 1.0e-3
        else:
            raise ValueError(f"unknown WEASD units: {units!r}")
        out["weasd"] = weasd  # meters, as the reference driver receives
        fndsnowh = "SNODEP" in v
        out["snodep"] = rd("SNODEP") if fndsnowh else np.zeros_like(weasd)
        stemp = _grid3d_to_znyx(v["STEMP"], nsoil)
        smois = _grid3d_to_znyx(v["SMOIS"], nsoil)
        for name, a in (("STEMP", stemp), ("SMOIS", smois)):
            if a.shape[0] < nsoil:
                raise ValueError(f"{name} has {a.shape[0]} layers < {nsoil}")
        out["stemp"] = stemp[:nsoil]
        out["smois"] = smois[:nsoil]
    return out, fndsnowh


def init_vertical_interp(sldpth, src, layer_bottom, layer_top):
    """Center-point vertical regrid of legacy initial conditions
    (hrldas_init_interp, module_hrldas_netcdf_io.F90:951-1067).

    sldpth: (nsoil,) destination layer thicknesses; src: (nvar, ny, nx)
    source levels; layer_bottom/layer_top: (nvar,) depths of each source
    layer's bottom/top below the surface.  Returns (nsoil, ny, nx).

    Rules (in reference order): destination centers shallower than the
    first source center clamp to level 1; deeper than the last clamp to
    level nvar; centers within 0.01 m of a source center copy it;
    otherwise linear interpolation between the bracketing source
    centers.  (The reference's final assignment writes `var(:,:,k)` —
    a transposed-index bug at :1062; this implements the intended
    `var(:,k,:)`.)
    """
    sldpth = np.asarray(sldpth, np.float64)
    nsoil = sldpth.shape[0]
    src = np.asarray(src, np.float32)
    nvar = src.shape[0]
    dst_c = np.cumsum(sldpth) - sldpth / 2.0
    src_c = 0.5 * (np.asarray(layer_bottom, np.float64)[:nvar]
                   + np.asarray(layer_top, np.float64)[:nvar])
    out = np.empty((nsoil,) + src.shape[1:], np.float32)
    for k in range(nsoil):
        d = dst_c[k]
        if d < src_c[0]:
            out[k] = src[0]
            continue
        if d > src_c[-1]:
            out[k] = src[-1]
            continue
        near = np.nonzero(np.abs(d - src_c) < 0.01)[0]
        if near.size:
            out[k] = src[near[0]]
            continue
        ktop = np.nonzero(src_c < d)[0][-1]
        kbot = np.nonzero(src_c > d)[0][0]
        frac = (src_c[kbot] - d) / (src_c[kbot] - src_c[ktop])
        out[k] = src[ktop] * frac + src[kbot] * (1.0 - frac)
    return out


def _weasd_to_meters(weasd, var):
    """Normalize a WEASD read to meters via its units attribute
    (module_hrldas_netcdf_io.F90:902-927, :1506-1523)."""
    units = getattr(var, "units", b"m")
    if isinstance(units, bytes):
        units = units.decode("ascii", "ignore")
    units = units.strip()
    if units == "m":
        return weasd
    if units in ("mm", "kg m{-2}", "kg m-2", "kg/m2"):
        return weasd * 1.0e-3
    raise ValueError(f"unknown WEASD units: {units!r}")


def read_init_legacy(path, nsoil, sldpth):
    """Legacy (pre-v2015) initial-condition reader
    (hrldas_init_read_old, module_hrldas_netcdf_io.F90:811-948).

    Old LDASIN files carry per-level variables STEMP_1..4 / SMOIS_1..4
    with `layer_top`/`layer_bottom` depth attributes instead of a soil
    dimension; they are regridded to the model's nsoil layers by
    center-point interpolation.  Returns (dict, fndsnowh,
    ldasin_version); version is parsed from the TITLE global attribute's
    vYYYYMMDD tag (0 when TITLE is absent, :864-886).
    """
    out = {}
    with open_nc(path) as nc:
        v = nc.variables
        title = getattr(nc, "TITLE", b"")
        if isinstance(title, bytes):
            title = title.decode("ascii", "ignore")
        version = 0
        idx = title.find("v20")
        if idx >= 0:
            try:
                version = int(title[idx + 1:idx + 9])
            except ValueError:
                raise ValueError(
                    f"LDASIN file has a perverse version identifier: {title!r}")

        def rd(name):
            a = v[name][:]
            a = np.array(a[0] if a.ndim == 3 else a)
            return np.ascontiguousarray(a, dtype=np.float32)

        out["canwat"] = rd("CANWAT")
        out["skintemp"] = rd("SKINTEMP")
        out["weasd"] = _weasd_to_meters(rd("WEASD"), v["WEASD"])
        fndsnowh = "SNODEP" in v
        out["snodep"] = (rd("SNODEP") if fndsnowh
                         else np.zeros_like(out["weasd"]))

        def levels(prefix):
            src, bot, top = [], [], []
            for k in range(1, 5):
                var = v[f"{prefix}_{k}"]
                src.append(rd(f"{prefix}_{k}"))
                bot.append(float(np.asarray(var.layer_bottom)))
                top.append(float(np.asarray(var.layer_top)))
            return np.stack(src), np.array(bot), np.array(top)

        stemp, bot, top = levels("STEMP")
        out["stemp"] = init_vertical_interp(sldpth, stemp, bot, top)
        smois, bot, top = levels("SMOIS")
        out["smois"] = init_vertical_interp(sldpth, smois, bot, top)
    return out, fndsnowh, version


def read_snow(path):
    """Standalone snow-field reader (hrldas_readsnow,
    module_hrldas_netcdf_io.F90:1479-1532): WEASD (normalized to
    meters) and SNODEP; when SNODEP is absent it is estimated as
    10x WEASD (:1525-1528).  Returns (weasd_m, snodep_m)."""
    with open_nc(path) as nc:
        v = nc.variables
        a = v["WEASD"][:]
        weasd = np.ascontiguousarray(a[0] if a.ndim == 3 else a,
                                     dtype=np.float32)
        weasd = _weasd_to_meters(weasd, v["WEASD"])
        if "SNODEP" in v:
            a = v["SNODEP"][:]
            snodep = np.ascontiguousarray(a[0] if a.ndim == 3 else a,
                                          dtype=np.float32)
        else:
            snodep = weasd * 10.0
    return weasd, snodep


MMF_RUNOFF_VARS = ("ZWT", "EQZWT", "RIVERBED", "RIVERCOND", "PEXP",
                   "FDEPTH")


def read_mmf_runoff(path):
    """MMF groundwater ancillary reader (read_mmf_runoff,
    module_hrldas_netcdf_io.F90:326-392): ZWT, EQZWT, RIVERBED,
    RIVERCOND, PEXP, FDEPTH -> dict of (ny, nx) float32 arrays."""
    out = {}
    with open_nc(path) as nc:
        for name in MMF_RUNOFF_VARS:
            a = nc.variables[name][:]
            out[name.lower()] = np.ascontiguousarray(
                a[0] if a.ndim == 3 else a, dtype=np.float32)
    return out


def read_forcing_file(path, row_range=None, with_optional=False,
                      col_range=None):
    """Read one forcing file -> dict of (ny, nx) arrays.

    With ``row_range=(r0, r1)`` only those south_north rows are read —
    a true per-host hyperslab (nc_get_vara / mmap pages), the TPU
    replacement for the reference's io-rank read+scatter funnel
    (module_mpp_land.F90:645-721).  ``col_range`` crops west_east after
    the row read (rows are contiguous on disk, so reading full rows IS
    the IO-optimal pattern for a column window)."""
    names = FORCING_VARS + (OPTIONAL_FORCING_VARS if with_optional else ())
    out = {}
    if col_range is not None:
        inner = read_forcing_file(path, row_range=row_range,
                                  with_optional=with_optional)
        return {k: np.ascontiguousarray(v[:, col_range[0]:col_range[1]])
                for k, v in inner.items()}
    if row_range is None:
        with open_nc(path) as nc:
            for name in names:
                if name not in nc.variables:
                    continue
                a = nc.variables[name][:]
                out[name] = np.ascontiguousarray(
                    a[0] if a.ndim == 3 else a, dtype=np.float32)
        return out
    r0, r1 = row_range
    from .nc4 import is_hdf5, nc4_file
    if is_hdf5(path):
        with nc4_file(path, "r") as nc:
            for name in names:
                if name not in nc.variables:
                    continue
                a = nc.variables[name].read_rows(r0, r1)
                out[name] = np.ascontiguousarray(
                    a[0] if a.ndim == 3 else a, dtype=np.float32)
        return out
    # classic format: lazy mmap slice reads only the touched pages
    from scipy.io import netcdf_file as _ncf
    with _ncf(str(path), "r", mmap=True) as nc:
        for name in names:
            if name not in nc.variables:
                continue
            data = nc.variables[name].data
            a = data[0, r0:r1] if data.ndim == 3 else data[r0:r1]
            out[name] = np.array(a, dtype=np.float32)  # copy off the mmap
    return out


class ForcingReader:
    """Two-slot forcing buffer with linear time interpolation
    (hrldas_input_read :1140-1303).

    State variables are interpolated between the bracketing reads;
    RAINRATE is held constant at the last read (:1369-1403).  File
    decode goes through the native fastnc codec with a background
    prefetch thread (the next file is read while the device integrates
    the current interval); scipy is the fallback.
    """

    def __init__(self, indir, input_timestep,
                 filename_tpl="{date}.LDASIN_DOMAIN1", row_range=None,
                 col_range=None):
        self.indir = Path(indir)
        self.input_timestep = int(input_timestep)
        self.tpl = filename_tpl
        self.row_range = row_range   # per-host hyperslab rows (r0, r1)
        self.col_range = col_range   # namelist subwindow cols (x0, x1)
        self.last = None       # (epoch_seconds, dict of flat arrays)
        self.next = None
        self._prefetch = None  # lazily sized ForcingPrefetcher
        self._shape = None

    def _fname(self, date_str):
        """HRLDAS forcing name.  The reference opens ``input.<date>``
        with the full compact stamp YYYYMMDD'T'HHMMSS (driver :321-326,
        hrldas_input_read :1209-1212); prepared datasets commonly use
        YYYYMMDDHH.LDASIN_DOMAIN1.  The configured template is tried
        first, the reference name as fallback."""
        compact = date_str.replace("-", "").replace("_", "").replace(":", "")
        d14 = compact[:8] + "T" + compact[8:14]
        p = self.indir / self.tpl.format(date=compact[:10])
        if not p.exists():
            alt = self.indir / f"input.{d14}"
            if alt.exists():
                return alt
        return p

    def _read_file(self, path):
        if self.row_range is not None or self.col_range is not None:
            # per-host/windowed hyperslab read; the fastnc prefetcher
            # decodes whole variables, so these go direct
            return read_forcing_file(path, row_range=self.row_range,
                                     with_optional=True,
                                     col_range=self.col_range)
        from .fastnc import ForcingPrefetcher, var_shape, available
        if self._prefetch is None:
            if available():
                shape = var_shape(path, "T2D")
                self._shape = tuple(s for s in shape if s != 1)
                n = int(np.prod(self._shape))
            else:
                raw = read_forcing_file(path)
                self._shape = raw["T2D"].shape
                n = int(np.prod(self._shape))
            self._prefetch = ForcingPrefetcher(list(FORCING_VARS), n)
        flat = self._prefetch.get(path)
        out = {k: np.asarray(v).reshape(self._shape)
               for k, v in flat.items()}
        # optional VEGFRA/LAI in the forcing file (:1238-1255); held at
        # the last read when absent (carry-over handled in read())
        try:
            with open_nc(path) as nc:
                for name in OPTIONAL_FORCING_VARS:
                    if name in nc.variables:
                        a = nc.variables[name][:]
                        out[name] = np.ascontiguousarray(
                            a[0] if a.ndim == 3 else a,
                            dtype=np.float32).reshape(self._shape)
        except OSError:
            pass
        return out

    def raw_at(self, date_str):
        """Raw (uninterpolated) snapshot for an input_timestep boundary
        date, or None when the file is missing (end of run — the caller
        holds the last snapshot, matching read()'s behavior).  Used by
        the chunked driver path, which ships bracketing snapshots to
        the device and interpolates there (the reference's
        lastread/nextread two-slot semantics,
        module_hrldas_netcdf_io.F90:1167-1302, moved on device)."""
        p = self._fname(date_str)
        if not p.exists():
            return None
        return self._read_file(p)

    def prefetch_date(self, date_str):
        """Kick off a background decode of a future snapshot file."""
        p = self._fname(date_str)
        if self._prefetch is not None and p.exists():
            self._prefetch.start(p)

    def read(self, date_str, epoch):
        from ..driver.dates import geth_newdate
        it = self.input_timestep
        t0 = (epoch // it) * it
        if self.last is None or self.last[0] != t0:
            if self.next is not None and self.next[0] == t0:
                self.last = self.next
            else:
                off = epoch - t0
                d0 = geth_newdate(date_str, -off)
                self.last = (t0, self._read_file(self._fname(d0)))
            self.next = None
        t1 = t0 + it
        if self.next is None:
            d1 = geth_newdate(date_str, t1 - epoch)
            try:
                self.next = (t1, self._read_file(self._fname(d1)))
            except (FileNotFoundError, OSError, IOError):
                self.next = (t1, self.last[1])  # hold last at end of run
            # prefetch the file after next in the background
            d2 = geth_newdate(date_str, t1 + it - epoch)
            p2 = self._fname(d2)
            if self._prefetch is not None and p2.exists():
                self._prefetch.start(p2)
        w = (epoch - t0) / it
        out = {}
        for k in FORCING_VARS:
            if k == "RAINRATE":
                out[k] = self.last[1][k]
            else:
                out[k] = ((1.0 - w) * self.last[1][k]
                          + w * self.next[1][k]).astype(np.float32)
        # FPAR/LAI are never interpolated, only carried (:1369-1403);
        # propagate the last seen value forward across files without one
        for k in OPTIONAL_FORCING_VARS:
            if k in self.last[1]:
                out[k] = self.last[1][k]
                if k not in self.next[1]:
                    self.next[1][k] = self.last[1][k]
        return out


def write_forcing_file(path, fields, ny, nx):
    """Write one forcing file (test fixture generator)."""
    with netcdf_file(path, "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        for name in FORCING_VARS:
            var = nc.createVariable(name, "f",
                                    ("Time", "south_north", "west_east"))
            var[0] = np.broadcast_to(np.asarray(fields[name], np.float32),
                                     (ny, nx))


class HistoryWriter:
    """History file writer (hrldas_output_* :1536-2043).

    One file per output time: ``output.<YYYYMMDDTHHMMSS>.nc`` with the
    reference's variable names/units; water cells masked to -1e33
    (:1970-1974).
    """

    def __init__(self, outdir, cfg, ny, nx, vegtyp, soiltyp, iswater=16,
                 shard=None):
        self.outdir = Path(outdir)
        self.outdir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        self.ny, self.nx = ny, nx
        self.vegtyp = np.asarray(vegtyp).reshape(ny, nx)
        self.soiltyp = np.asarray(soiltyp).reshape(ny, nx)
        self.water = self.vegtyp == iswater
        # multi-host: (rank, row0, ny_global, col0, nx_global) -> shard file
        # (.pNNNN) with ROW0/GLOBAL_NY attrs for merge_shards
        self.shard = shard

    def write(self, date_str, state, diag, accum, forcing=None, mmf=None):
        """Host-side plane derivation + write (the legacy/fallback
        path; the production driver derives the same planes ON DEVICE
        — driver/model._build_plane_fn — and calls write_named with
        the result of one packed transfer)."""
        nsnow = self.cfg.nsnow
        planes = {}
        for (name, src, field, units, desc, kind) in HISTORY_FIELDS:
            if src == "diag":
                data = np.asarray(getattr(diag, field))
            elif src == "accum":
                data = np.asarray(getattr(accum, field))
            elif src == "forc":
                if forcing is None:
                    continue
                data = np.asarray(getattr(forcing, field))
            elif src == "lh":
                # LH = FCEV + FGEV + FCTR (module_sf_noahmpdrv.F90)
                data = (np.asarray(diag.fcev) + np.asarray(diag.fgev)
                        + np.asarray(diag.fctr))
            elif src == "mmf":
                if mmf is None:
                    continue
                data = np.asarray(getattr(mmf, field))
            elif src == "state_zsnso_snow":
                data = np.asarray(state.zsnso)[:, :nsnow]
            elif src.startswith("state_stc"):
                data = _get_state_field(
                    state, "stc",
                    "soil" if src.endswith("soil") else "snow", nsnow)
            else:
                data = np.asarray(getattr(state, field))
            planes[name] = data
        self.write_named(date_str, planes)

    def write_named(self, date_str, planes, scales=None):
        """Write a history file from named registry planes.

        planes: {HISTORY_FIELDS name: full-grid numpy array}, shape
        (ny*nx,) for 2d/int2d kinds or (ny*nx, nlayers) for soil/snow;
        dtype float32, int32 (int2d), or int16 for scale/offset-packed
        planes (then ``scales[name] = (add_offset, scale_factor)`` and
        the variable is written as NetCDF short with the standard CF
        packing attributes — unpacked = short*scale_factor+add_offset,
        missing_value/_FillValue = -32768).  Fields absent from
        ``planes`` are simply not written (namelist HISTORY_FIELDS
        subsetting)."""
        ny, nx = self.ny, self.nx
        nsnow, nsoil = self.cfg.nsnow, self.cfg.nsoil
        compact = date_str.replace("-", "").replace(":", "").replace("_", "T")
        suffix = f".p{self.shard[0]:04d}" if self.shard else ""
        path = self.outdir / f"output.{compact}.nc{suffix}"
        fill16 = np.int16(C.PACK16_FILL)
        with _wfile(path) as nc:
            if self.shard:
                nc.ROW0 = int(self.shard[1])
                nc.GLOBAL_NY = int(self.shard[2])
                if len(self.shard) > 3:
                    nc.COL0 = int(self.shard[3])
                    nc.GLOBAL_NX = int(self.shard[4])
            nc.createDimension("Time", 1)
            nc.createDimension("DateStrLen", 19)
            nc.createDimension("west_east", nx)
            nc.createDimension("south_north", ny)
            nc.createDimension("soil_layers_stag", nsoil)
            nc.createDimension("snow_layers", nsnow)
            times = nc.createVariable("Times", "c", ("Time", "DateStrLen"))
            times[0] = np.frombuffer(date_str[:19].encode(), dtype="S1")
            iv = nc.createVariable("IVGTYP", "i",
                                   ("Time", "south_north", "west_east"))
            iv[0] = self.vegtyp
            isl = nc.createVariable("ISLTYP", "i",
                                    ("Time", "south_north", "west_east"))
            isl[0] = self.soiltyp
            for (name, src, field, units, desc, kind) in HISTORY_FIELDS:
                data = planes.get(name)
                if data is None or kind == "sosn":
                    continue    # absent (subset/no forc/no mmf) or sosn
                packed = data.dtype == np.int16
                tc = "h" if packed else ("i" if kind == "int2d" else "f")
                miss = fill16 if packed else C.MISSING_OUTPUT
                if kind in ("2d", "int2d"):
                    var = nc.createVariable(
                        name, tc, ("Time", "south_north", "west_east"))
                    d2 = data.reshape(ny, nx)
                    if kind == "int2d":
                        var[0] = d2.astype(np.int32)
                    else:
                        var[0] = np.where(self.water, miss, d2)
                else:
                    dim = ("soil_layers_stag" if kind == "soil"
                           else "snow_layers")
                    nl = nsoil if kind == "soil" else nsnow
                    # reference XZY layout: (Time, south_north, layers,
                    # west_east) (make_var_att_3d :1932-1935)
                    var = nc.createVariable(
                        name, tc, ("Time", "south_north", dim, "west_east"))
                    d3 = data.reshape(ny, nx, nl).transpose(0, 2, 1)
                    if not packed:
                        d3 = d3.astype(np.float32)
                    var[0] = np.where(self.water[:, None, :], miss, d3)
                    var.MemoryOrder = b"XZY"
                    var.stagger = b"Z"
                if packed:
                    off, sc = scales[name]
                    var.add_offset = np.float32(off)
                    var.scale_factor = np.float32(sc)
                    var.missing_value = fill16
                var.units = units.encode()
                var.description = desc.encode()


# MMF groundwater fields restarted for exact continuity, with the
# reference's variable names (driver :660-675): flux accumulators plus
# the static ancillaries, so a restarted opt_run=5 run needs no
# separate runoff file.  RECH_ACC is framework-internal (sub-cadence
# recharge accumulator between STEPWTD calls).
RESTART_MMF = [("QRFSXY", "qrfs"), ("QSPRINGSXY", "qsprings"),
               ("QSLATXY", "qslat"), ("QRFXY", "qrf"),
               ("QSPRINGXY", "qspring"), ("RECH_ACC", "rech_acc"),
               ("AREAXY", "area"), ("FDEPTHXY", "fdepth"),
               ("RIVERCONDXY", "rivercond"), ("RIVERBEDXY", "riverbed"),
               ("EQZWT", "eqzwt"), ("PEXPXY", "pexp")]


def write_restart(path, cfg, date_str, state, accum, ny, nx, mmf=None,
                  extras=None, smceq=None, shard=None):
    """Restart writer (hrldas_restart_* :2065-2524 + driver
    :597-675).  `extras` carries the driver-level 2D fields
    (RESTART_EXTRAS: FPAR/GVFMIN/GVFMAX/SHDMAX, driver :645-649);
    `smceq` the equilibrium soil moisture (SMOISEQ, :661); `shard` the
    multi-host (rank, row0, ny_global, col0, nx_global) tuple."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    with _wfile(path) as nc:
        if shard:
            nc.ROW0 = int(shard[1])
            nc.GLOBAL_NY = int(shard[2])
            if len(shard) > 3:
                nc.COL0 = int(shard[3])
                nc.GLOBAL_NX = int(shard[4])
        # reference restart globals (:2188-2201); the reference reader
        # only warns when TITLE is absent, but faithful files keep
        # downstream HRLDAS tooling quiet
        nc.TITLE = "RESTART FILE FROM HRLDAS noahmp_tpu"
        nc.missing_value = np.float32(C.MISSING_OUTPUT)
        nc.createDimension("Time", 1)
        nc.createDimension("DateStrLen", 19)
        nc.createDimension("west_east", nx)
        nc.createDimension("south_north", ny)
        nc.createDimension("soil_layers_stag", nsoil)
        nc.createDimension("snow_layers", nsnow)
        nc.createDimension("sosn_layers", nsnow + nsoil)
        times = nc.createVariable("Times", "c", ("Time", "DateStrLen"))
        times[0] = np.frombuffer(date_str[:19].encode(), dtype="S1")
        for (ncname, field, kind) in RESTART_FIELDS:
            if field == "stc_soil":
                data = np.asarray(state.stc)[:, nsnow:]
            elif field == "stc_snow":
                data = np.asarray(state.stc)[:, :nsnow]
            else:
                data = np.asarray(getattr(state, field))
            if kind == "2d":
                var = nc.createVariable(ncname, "f",
                                        ("Time", "south_north", "west_east"))
                var[0] = data.reshape(ny, nx).astype(np.float32)
            elif kind == "int2d":
                var = nc.createVariable(ncname, "i",
                                        ("Time", "south_north", "west_east"))
                var[0] = data.reshape(ny, nx).astype(np.int32)
            else:
                dim = {"soil": "soil_layers_stag", "snow": "snow_layers",
                       "sosn": "sosn_layers"}[kind]
                nl = {"soil": nsoil, "snow": nsnow,
                      "sosn": nsnow + nsoil}[kind]
                # reference XZY layout (make_var_att_3d :1932-1935)
                var = nc.createVariable(
                    ncname, "f", ("Time", "south_north", dim, "west_east"))
                var[0] = data.reshape(ny, nx, nl).transpose(0, 2, 1) \
                    .astype(np.float32)
                var.MemoryOrder = b"XZY"
                var.stagger = b"Z"
        for (ncname, field) in RESTART_ACCUM:
            var = nc.createVariable(ncname, "f",
                                    ("Time", "south_north", "west_east"))
            var[0] = np.asarray(getattr(accum, field)).reshape(ny, nx) \
                .astype(np.float32)
        for (ncname, arr) in (extras or {}).items():
            var = nc.createVariable(ncname, "f",
                                    ("Time", "south_north", "west_east"))
            var[0] = np.asarray(arr).reshape(ny, nx).astype(np.float32)
        if smceq is not None:
            var = nc.createVariable(
                "SMOISEQ", "f",
                ("Time", "south_north", "soil_layers_stag", "west_east"))
            var[0] = np.asarray(smceq).reshape(ny, nx, nsoil) \
                .transpose(0, 2, 1).astype(np.float32)
        if mmf is not None:
            for (ncname, field) in RESTART_MMF:
                var = nc.createVariable(
                    ncname, "f", ("Time", "south_north", "west_east"))
                var[0] = np.asarray(getattr(mmf, field)).reshape(ny, nx) \
                    .astype(np.float32)


def read_restart(path, cfg, ny, nx):
    """Restart reader (:2526-2874).  Returns (date_str, state_fields,
    accum_fields, mmf_fields, extras) as plain numpy dicts keyed by
    framework field name (extras keyed by RESTART_EXTRAS nc names,
    plus "smceq" when SMOISEQ is present)."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    n = ny * nx
    state_fields = {}
    accum_fields = {}
    extras = {}

    def lookup(variables, ncname):
        """Find a variable by its reference name, tolerating the
        pre-parity framework names (no XY suffix / ACSNOM)."""
        if ncname in variables:
            return variables[ncname]
        for alt in (ncname[:-2] if ncname.endswith("XY") else None,
                    "ACSNOM" if ncname == "ACMELT" else None):
            if alt and alt in variables:
                return variables[alt]
        return None

    with open_nc(path) as nc:
        date_str = b"".join(nc.variables["Times"][0]).decode()
        # absent optional fields are skipped, like the reference's
        # checkRstV existence probe (:135-150); the driver back-fills
        # them from the cold-start defaults
        for (ncname, field, kind) in RESTART_FIELDS:
            v = lookup(nc.variables, ncname)
            if v is None:
                continue
            if kind in ("2d", "int2d"):
                a = np.ascontiguousarray(
                    np.array(v[0]),
                    dtype=np.int32 if kind == "int2d" else np.float32)
                state_fields[field] = a.reshape(n)
            else:
                nl = {"soil": nsoil, "snow": nsnow,
                      "sosn": nsnow + nsoil}[kind]
                a = _grid3d_to_znyx(v, nl)       # (nl, ny, nx)
                state_fields[field] = a.transpose(1, 2, 0).reshape(n, -1)
        for (ncname, field) in RESTART_ACCUM:
            v = lookup(nc.variables, ncname)
            if v is None:
                continue
            accum_fields[field] = np.ascontiguousarray(
                v[0], dtype=np.float32).reshape(n)
        mmf_fields = {}
        for (ncname, field) in RESTART_MMF:
            v = lookup(nc.variables, ncname)
            if v is not None:
                mmf_fields[field] = np.ascontiguousarray(
                    v[0], dtype=np.float32).reshape(n)
        for ncname in RESTART_EXTRAS:
            if ncname in nc.variables:
                extras[ncname] = np.ascontiguousarray(
                    nc.variables[ncname][0], dtype=np.float32).reshape(n)
        if "SMOISEQ" in nc.variables:
            extras["smceq"] = _grid3d_to_znyx(
                nc.variables["SMOISEQ"], nsoil) \
                .transpose(1, 2, 0).reshape(n, -1)
    # reassemble stc
    if "stc_snow" in state_fields and "stc_soil" in state_fields:
        stc = np.concatenate([state_fields.pop("stc_snow"),
                              state_fields.pop("stc_soil")], axis=1)
        state_fields["stc"] = stc
    for _, field in RESTART_ACCUM:
        accum_fields.setdefault(field, np.zeros(n, np.float32))
    return date_str, state_fields, accum_fields, mmf_fields, extras
