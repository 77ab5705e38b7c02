"""Generate a small self-contained demo case and namelist.

Creates a (ny, nx) domain file, three days of 3-hourly forcing with a
diurnal cycle, an initial-condition file, and a `noahmp.namelist`
pointing at them, so the CLI runs end-to-end with no external data:

    python examples/make_demo_case.py demo_case
    python -m noahmp_tpu demo_case/noahmp.namelist --probe

File formats follow the reference HRLDAS conventions exactly (domain
global attrs per module_hrldas_netcdf_io.F90:179-324, init file per
:688-808 with the XZY 3-D layout of make_var_att_3d :1932, LDASIN
forcing variables per :1230-1248) so the SAME case directory also runs
under the reference Fortran `noahmp.exe` (scripts/fortran_parity.py):
forcing files are hard-linked under the reference's `input.<date>`
names (driver :321-326) next to the LDASIN aliases.
"""

import os
import sys
from pathlib import Path

import numpy as np
from scipy.io import netcdf_file

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from noahmp_tpu.io import netcdf_io as ncio            # noqa: E402
from noahmp_tpu.driver.dates import geth_newdate       # noqa: E402

START = "2017-05-01_00:00:00"
INPUT_TIMESTEP = 10800


def write_domain(path, ny, nx, glacier=True):
    with netcdf_file(path, "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        # full global-attribute set hrldas_hdrinfo requires (:208-241)
        nc.DX = np.float32(1000.0)
        nc.DY = np.float32(1000.0)
        nc.TRUELAT1 = np.float32(30.0)
        nc.TRUELAT2 = np.float32(60.0)
        nc.STAND_LON = np.float32(-98.0)
        nc.MAP_PROJ = np.int32(1)
        nc.ISWATER = np.int32(16)
        nc.ISICE = np.int32(24)
        nc.ISURBAN = np.int32(1)
        nc.ISOILWATER = np.int32(14)
        nc.MMINLU = "USGS"

        def mk(name, data, typ="f"):
            v = nc.createVariable(name, typ,
                                  ("Time", "south_north", "west_east"))
            v[0] = data

        yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        mk("XLAT", (38.0 + 0.01 * yy).astype(np.float32))
        mk("XLONG", (-98.0 + 0.01 * xx).astype(np.float32))
        # mixed biomes: grassland / cropland / forest / one lake / one
        # glacier cell
        veg = np.full((ny, nx), 7, np.int32)
        veg[:, nx // 3:2 * nx // 3] = 2
        veg[:, 2 * nx // 3:] = 14
        veg[0, 0] = 16    # water
        if glacier:
            veg[-1, -1] = 24  # land ice
        mk("IVGTYP", veg, "i")
        soil = np.full((ny, nx), 3, np.int32)
        soil[:, nx // 2:] = 8
        mk("ISLTYP", soil, "i")
        mk("XLAND", np.ones((ny, nx), np.float32))
        mk("SEAICE", np.zeros((ny, nx), np.float32))
        mk("HGT", (300.0 - 2.0 * xx + yy).astype(np.float32))
        mk("TMN", np.full((ny, nx), 285.0, np.float32))
        mk("MAPFAC_MX", np.ones((ny, nx), np.float32))
        mk("MAPFAC_MY", np.ones((ny, nx), np.float32))


def write_init(path, ny, nx, nsoil=4):
    """Initial conditions read by both drivers (hrldas_init_read
    :739-808): CANWAT/SKINTEMP/WEASD/SNODEP + STEMP/SMOIS in the
    reference XZY layout (Time, south_north, soil_layers_stag,
    west_east)."""
    with netcdf_file(path, "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("soil_layers_stag", nsoil)
        nc.createDimension("west_east", nx)

        def mk2(name, val, units="-"):
            v = nc.createVariable(name, "f",
                                  ("Time", "south_north", "west_east"))
            v[0] = np.full((ny, nx), val, np.float32)
            v.units = units

        mk2("CANWAT", 0.0, "mm")
        mk2("SKINTEMP", 285.0, "K")
        mk2("WEASD", 0.0, "mm")
        mk2("SNODEP", 0.0, "m")
        stemp = np.array([285.0, 285.5, 286.0, 286.5], np.float32)[:nsoil]
        smois = np.full(nsoil, 0.28, np.float32)
        for name, prof, units in (("STEMP", stemp, "K"),
                                  ("SMOIS", smois, "m3 m-3")):
            v = nc.createVariable(name, "f",
                                  ("Time", "south_north",
                                   "soil_layers_stag", "west_east"))
            v[0] = np.broadcast_to(prof[None, :, None],
                                   (ny, nsoil, nx)).astype(np.float32)
            v.units = units


def write_forcings(indir, ny, nx, ndays):
    date = START
    nfiles = ndays * 86400 // INPUT_TIMESTEP + 1
    for i in range(nfiles):
        hour = (i * INPUT_TIMESTEP // 3600) % 24
        diurnal = np.sin(np.pi * max(0.0, (hour - 6.0)) / 12.0) \
            if 6.0 <= hour <= 18.0 else 0.0
        fields = {
            "T2D": 282.0 + 8.0 * diurnal, "Q2D": 0.007,
            "U2D": 2.5, "V2D": 1.0, "PSFC": 96500.0,
            "LWDOWN": 320.0 + 30.0 * diurnal,
            "SWDOWN": 850.0 * diurnal,
            "RAINRATE": 0.0005 if i % 9 == 4 else 0.0,
        }
        compact = date.replace("-", "").replace("_", "").replace(":", "")
        path = f"{indir}/{compact[:10]}.LDASIN_DOMAIN1"
        ncio.write_forcing_file(
            path,
            {k: np.full((ny, nx), v, np.float32)
             for k, v in fields.items()}, ny, nx)
        # reference driver name: input.YYYYMMDD'T'HHMMSS (:321-326)
        ref = f"{indir}/input.{compact[:8]}T{compact[8:14]}"
        if not os.path.exists(ref):
            os.link(path, ref)
        date = geth_newdate(date, INPUT_TIMESTEP)


NAMELIST = """&HRLDAS_NOAHMP
 CONST_FILE = '{case}/domain.nc'
 INIT_FILE = '{case}/init.nc'
 INDIR = '{case}/input'
 OUTDIR = '{case}/output'
 RESDIR = '{case}/restart'
 START_YEAR = 2017
 START_MONTH = 5
 START_DAY = 1
 START_HOUR = 0
 START_MIN = 0
 START_SEC = 0
 KDAY = {ndays}
 DYNAMIC_VEG_OPTION = 4
 CANOPY_STOMATAL_RESISTANCE_OPTION = 1
 BTR_OPTION = 1
 RUNOFF_OPTION = {opt_run}
 SURFACE_DRAG_OPTION = 1
 FROZEN_SOIL_OPTION = 1
 SUPERCOOLED_WATER_OPTION = 1
 RADIATIVE_TRANSFER_OPTION = 3
 SNOW_ALBEDO_OPTION = 2
 PRECIPITATION_PARTITION_OPTION = 1
 TBOT_OPTION = 2
 TEMP_TIME_SCHEME_OPTION = 1
 INPUT_TIMESTEP = 10800
 MODEL_TIMESTEP = 3600
 OUTPUT_TIMESTEP = 10800
 RESTART_TIMESTEP = 86400
 NSOIL = 4
 soil_layer_thickness(1) = 0.10
 soil_layer_thickness(2) = 0.30
 soil_layer_thickness(3) = 0.60
 soil_layer_thickness(4) = 1.00
 ZLVL = 30.0
/
"""


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("case", nargs="?", default="demo_case")
    ap.add_argument("ny", nargs="?", type=int, default=24)
    ap.add_argument("nx", nargs="?", type=int, default=32)
    ap.add_argument("--ndays", type=int, default=3)
    ap.add_argument("--opt-run", type=int, default=3)
    ap.add_argument("--no-glacier", action="store_true",
                    help="omit the land-ice cell (for runs isolating "
                    "the non-glacier physics)")
    args = ap.parse_args()
    case = Path(args.case)
    (case / "input").mkdir(parents=True, exist_ok=True)
    write_domain(str(case / "domain.nc"), args.ny, args.nx,
                 glacier=not args.no_glacier)
    write_init(str(case / "init.nc"), args.ny, args.nx)
    write_forcings(str(case / "input"), args.ny, args.nx, args.ndays)
    (case / "noahmp.namelist").write_text(
        NAMELIST.format(case=case.resolve(), ndays=args.ndays,
                        opt_run=args.opt_run))
    print(f"demo case written to {case}/ "
          f"({args.ny}x{args.nx}, {args.ndays} days @ 3-hourly forcing)")
    print(f"run it:  python -m noahmp_tpu {case}/noahmp.namelist --probe")


if __name__ == "__main__":
    main()
