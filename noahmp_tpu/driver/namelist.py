"""HRLDAS namelist reader.

Reference: module_hrldas_noahmp_namelist.F90 — the ``HRLDAS_NOAHMP``
namelist group (:138-164), validation (:207-260) and ``ntime``
computation (:313-318).  Accepts the reference's ``noahmp.namelist``
files unchanged.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from ..config import NoahMPConfig
from ..params.tables import parse_fortran_namelist

# mapping per hrldas_noahmp_namelist_read (:298-309):
# SUPERCOOLED_WATER_OPTION -> opt_frz, FROZEN_SOIL_OPTION -> opt_inf
_OPT_KEYS = {
    "dynamic_veg_option": "dveg",
    "canopy_stomatal_resistance_option": "opt_crs",
    "btr_option": "opt_btr",
    "runoff_option": "opt_run",
    "surface_drag_option": "opt_sfc",
    "supercooled_water_option": "opt_frz",
    "frozen_soil_option": "opt_inf",
    "radiative_transfer_option": "opt_rad",
    "snow_albedo_option": "opt_alb",
    "precipitation_partition_option": "opt_snf",
    "tbot_option": "opt_tbot",
    "temp_time_scheme_option": "opt_stc",
}


@dataclasses.dataclass
class RunSettings:
    """Driver-level run configuration (paths, dates, cadences)."""
    start_date: str                    # YYYY-MM-DD_HH:MM:SS
    kday: int = 1
    khour: int = -999
    const_file: str = ""
    indir: str = ""
    outdir: str = "."
    resdir: str = "."
    init_file: str = ""
    restart_file: str = ""
    from_restart: bool = False
    mmf_runoff_file: str = ""
    input_timestep: int = 10800
    model_timestep: int = 3600
    output_timestep: int = 3600
    restart_timestep: int = 86400
    zlvl: float = 30.0
    # run subwindow, 1-based inclusive like the reference's
    # XSTART/XEND/YSTART/YEND (0 = full extent)
    xstart: int = 1
    ystart: int = 1
    xend: int = 0
    yend: int = 0
    # --- framework extensions beyond the reference namelist ----------
    # HISTORY_FIELDS = "FSA,FSH,TRAD,..." restricts history output to a
    # subset of the registry (the reference always writes all ~90
    # fields, module_hrldas_netcdf_io.F90:1536-2043); None = all.
    history_fields: tuple = None
    # HISTORY_PACK16 = .true. writes history planes as NetCDF shorts
    # with CF scale_factor/add_offset packing (half the bytes; ~1e-4
    # relative quantization over each plane's range).  Default off —
    # full-precision f32 files identical to the reference's layout.
    history_pack16: bool = False
    # IO_PROCS = N parallel history-encode worker processes
    # (io/procwriter.py); -1 = auto-size from cpu_count; 0 = inline.
    io_procs: int = 0

    @property
    def ntime(self) -> int:
        """hrldas_noahmp_namelist_get_ntime (:313-318)."""
        khour = self.khour if self.khour > 0 else self.kday * 24
        return khour * 3600 // self.model_timestep


def _parse_fields(v):
    """HISTORY_FIELDS value -> tuple of registry names (validated) or
    None for the full set."""
    if not v:
        return None
    names = tuple(s.strip().upper() for s in str(v).replace(",", " ")
                  .split() if s.strip())
    from ..io.netcdf_io import HISTORY_FIELDS
    known = {e[0] for e in HISTORY_FIELDS}
    bad = [n for n in names if n not in known]
    if bad:
        raise ValueError(f"unknown HISTORY_FIELDS entries: {bad}; "
                         f"valid names are the history registry "
                         f"(io/netcdf_io.py HISTORY_FIELDS)")
    return names


def read_namelist(path):
    """Parse noahmp.namelist -> (NoahMPConfig, RunSettings)."""
    groups = parse_fortran_namelist(Path(path).read_text())
    g = groups.get("hrldas_noahmp", {})

    opts = {}
    for k, tgt in _OPT_KEYS.items():
        if k in g:
            opts[tgt] = int(g[k])

    nsoil = int(g.get("nsoil", 4))
    dzs = []
    for i in range(1, nsoil + 1):
        key = f"soil_layer_thickness({i})"
        if key in g:
            dzs.append(float(g[key]))
    if len(dzs) != nsoil:
        dzs = [0.1, 0.3, 0.6, 1.0][:nsoil]

    model_timestep = int(g.get("model_timestep", 3600))
    zlvl = float(g.get("zlvl", 30.0))
    cfg = NoahMPConfig(nsoil=nsoil, dzs=tuple(dzs),
                       dt=float(model_timestep), zlvl=zlvl, **opts)

    def date_from_parts():
        y = int(g.get("start_year", 2000))
        mo = int(g.get("start_month", 1))
        d = int(g.get("start_day", 1))
        h = int(g.get("start_hour", 0))
        mi = int(g.get("start_min", 0))
        s = int(g.get("start_sec", 0))
        return f"{y:04d}-{mo:02d}-{d:02d}_{h:02d}:{mi:02d}:{s:02d}"

    rs = RunSettings(
        start_date=date_from_parts(),
        kday=int(g.get("kday", 1)),
        khour=int(g.get("khour", -999)),
        const_file=str(g.get("const_file", "")),
        indir=str(g.get("indir", "")),
        outdir=str(g.get("outdir", ".")),
        resdir=str(g.get("resdir", ".")),
        init_file=str(g.get("init_file", "")),
        restart_file=str(g.get("restart_file", "")),
        from_restart=bool(g.get("from_restart", False)),
        mmf_runoff_file=str(g.get("mmf_runoff_file", "")),
        input_timestep=int(g.get("input_timestep", 10800)),
        model_timestep=model_timestep,
        output_timestep=int(g.get("output_timestep", 3600)),
        restart_timestep=int(g.get("restart_timestep", 86400)),
        zlvl=zlvl,
        xstart=int(g.get("xstart", 1)), ystart=int(g.get("ystart", 1)),
        xend=int(g.get("xend", 0)), yend=int(g.get("yend", 0)),
        history_fields=_parse_fields(g.get("history_fields")),
        history_pack16=bool(g.get("history_pack16", False)),
        io_procs=int(g.get("io_procs", 0)),
    )

    # validation (:234-253)
    for name in ("input_timestep", "output_timestep", "restart_timestep"):
        v = getattr(rs, name)
        if v > 0 and v % rs.model_timestep != 0:
            raise ValueError(
                f"{name}={v} not a multiple of model_timestep")
    return cfg, rs
