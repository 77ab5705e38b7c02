"""Generate a small self-contained demo case and namelist.

Creates a (ny, nx) domain file, three days of 3-hourly forcing with a
diurnal cycle, and a `noahmp.namelist` pointing at them, so the CLI
runs end-to-end with no external data:

    python examples/make_demo_case.py demo_case
    python -m noahmp_tpu demo_case/noahmp.namelist --probe

File formats follow the reference HRLDAS conventions (domain/geogrid
attrs per module_hrldas_netcdf_io.F90:179-324, LDASIN forcing variables
per :1230-1248) so reference-prepared cases drop in unchanged.
"""

import sys
from pathlib import Path

import numpy as np
from scipy.io import netcdf_file

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from noahmp_tpu.io import netcdf_io as ncio            # noqa: E402
from noahmp_tpu.driver.dates import geth_newdate       # noqa: E402

START = "2017-05-01_00:00:00"
NDAYS = 3
INPUT_TIMESTEP = 10800


def write_domain(path, ny, nx):
    with netcdf_file(path, "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        nc.DX = 1000.0
        nc.ISWATER = 16
        nc.ISICE = 24
        nc.ISURBAN = 1
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
        veg[-1, -1] = 24  # land ice
        mk("IVGTYP", veg, "i")
        soil = np.full((ny, nx), 3, np.int32)
        soil[:, nx // 2:] = 8
        mk("ISLTYP", soil, "i")
        mk("XLAND", np.ones((ny, nx), np.float32))
        mk("SEAICE", np.zeros((ny, nx), np.float32))
        mk("HGT", (300.0 - 2.0 * xx + yy).astype(np.float32))
        mk("TMN", np.full((ny, nx), 285.0, np.float32))


def write_forcings(indir, ny, nx):
    date = START
    nfiles = NDAYS * 86400 // INPUT_TIMESTEP + 1
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
        ncio.write_forcing_file(
            f"{indir}/{compact[:10]}.LDASIN_DOMAIN1",
            {k: np.full((ny, nx), v, np.float32)
             for k, v in fields.items()}, ny, nx)
        date = geth_newdate(date, INPUT_TIMESTEP)


NAMELIST = """&HRLDAS_NOAHMP
 CONST_FILE = '{case}/domain.nc'
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
 RUNOFF_OPTION = 3
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
    case = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_case")
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    nx = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    (case / "input").mkdir(parents=True, exist_ok=True)
    write_domain(str(case / "domain.nc"), ny, nx)
    write_forcings(str(case / "input"), ny, nx)
    (case / "noahmp.namelist").write_text(
        NAMELIST.format(case=case.resolve(), ndays=NDAYS))
    print(f"demo case written to {case}/ "
          f"({ny}x{nx}, {NDAYS} days @ 3-hourly forcing)")
    print(f"run it:  python -m noahmp_tpu {case}/noahmp.namelist --probe")


if __name__ == "__main__":
    main()
