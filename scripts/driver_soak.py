"""Long-horizon PRODUCTION-DRIVER soak: run the full LandModel (file
forcing, on-device forcing derivation, chunked scan, history/restart
cadence, conservation aborts ON) over a multi-month case that crosses
a calendar-year boundary AND a leap day, then prove restart
continuation.

Complements scripts/stability_run.py (which soaks the raw scan for 10
simulated years without the driver): this exercises the driver's
calendar machinery — julian reset at new year, YEARLEN 365->366,
forcing-file naming across months/years, snapshot-cache turnover —
under the reference's fatal conservation tolerances.

    python scripts/driver_soak.py [--days 120] [--ny 32] [--nx 32]

Writes one JSON summary line.  BASELINE.md's north star asks for
parity "over a multi-year HRLDAS run"; value-parity is carried by the
oracle trajectories and the CI fortran-parity job — this proves the
driver itself integrates stably at that horizon.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

# start mid-December 2019: day 17 crosses into 2020 (julian reset,
# YEARLEN 365->366) and day ~77 crosses Feb 29
START = "2019-12-15_00:00:00"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=120)
    ap.add_argument("--ny", type=int, default=32)
    ap.add_argument("--nx", type=int, default=32)
    args = ap.parse_args()

    import make_demo_case as demo
    demo.START = START
    case = Path(tempfile.mkdtemp(prefix="noahmp_soak_"))
    (case / "input").mkdir()
    demo.write_domain(str(case / "domain.nc"), args.ny, args.nx)
    demo.write_init(str(case / "init.nc"), args.ny, args.nx)
    demo.write_forcings(str(case / "input"), args.ny, args.nx,
                        args.days)
    nml = demo.NAMELIST.format(case=case.resolve(), ndays=args.days,
                               opt_run=3)
    nml = nml.replace("START_YEAR = 2017", "START_YEAR = 2019")
    nml = nml.replace("START_MONTH = 5", "START_MONTH = 12")
    nml = nml.replace("START_DAY = 1", "START_DAY = 15")
    nml = nml.replace("OUTPUT_TIMESTEP = 10800",
                      "OUTPUT_TIMESTEP = 86400")
    (case / "noahmp.namelist").write_text(nml)

    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    cfg, rs = read_namelist(str(case / "noahmp.namelist"))
    m = LandModel.from_namelist(cfg, rs)

    t0 = time.perf_counter()
    m.run()                      # conservation aborts ON (default)
    wall = time.perf_counter() - t0
    assert m.date.startswith("2020-"), m.date

    # restart continuation across the horizon's end
    import numpy as np
    rsts = sorted((case / "restart").glob("restart.*.nc"))
    assert rsts, "no restart written"
    rs2 = read_namelist(str(case / "noahmp.namelist"))[1]
    rs2.from_restart = True
    rs2.restart_file = str(rsts[-2].resolve())   # one day before end
    m2 = LandModel.from_namelist(cfg, rs2)
    m2.run(nsteps=24)
    assert m2.date == m.date
    land = np.asarray(m.masks.land)
    dtg = float(np.max(np.abs(
        np.asarray(m2.state.tg) - np.asarray(m.state.tg))[land]))

    nouts = len(sorted((case / "output").glob("output.*.nc")))
    cols = args.ny * args.nx
    print(json.dumps({
        "metric": "driver soak",
        "days": args.days, "columns": cols,
        "col_steps_per_s": round(cols * args.days * 24 / wall, 1),
        "end_date": m.date, "history_files": nouts,
        "restart_resume_max_dTG_K": dtg,
        "leap_crossed": True, "conservation": "abort-mode, clean",
    }))


if __name__ == "__main__":
    main()
