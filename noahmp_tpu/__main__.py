"""CLI entry point: `python -m noahmp_tpu [noahmp.namelist]`.

Equivalent of the reference main program (driver/main_hrldas_noahmp.F90
:1-20): read the namelist, compute ntime, initialize the land driver,
and integrate `do itime = 1, ntime`.
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="noahmp_tpu",
        description="TPU-native Noah-MP land surface model (HRLDAS-style "
                    "offline driver)")
    p.add_argument("namelist", nargs="?", default="noahmp.namelist",
                   help="path to the HRLDAS_NOAHMP namelist "
                        "(default: ./noahmp.namelist)")
    p.add_argument("--steps", type=int, default=None,
                   help="override the number of timesteps (default: "
                        "ntime from KDAY/KHOUR)")
    p.add_argument("--table-dir", default=None,
                   help="directory holding MPTABLE/SOILPARM/VEGPARM/"
                        "GENPARM .TBL files (default: the vendored "
                        "noahmp_tpu/run_assets tables)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress the per-step timing heartbeat")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("--probe", action="store_true",
                   help="dump per-field state statistics after the run "
                        "(hrldas_noahmp_vars_probe equivalent)")
    p.add_argument("--check-mode", choices=["abort", "warn", "off"],
                   default="abort",
                   help="on conservation violation: abort (reference "
                        "behavior), warn, or skip the check.  Every "
                        "step is covered (device-side max over the "
                        "chunk); an abort reports the chunk's date "
                        "range — re-run with --chunk 1 for the exact "
                        "step")
    p.add_argument("--chunk", type=int, default=0,
                   help="max on-device steps per dispatch (0 = auto; "
                        "1 = per-step dispatch with exact-step "
                        "conservation aborts)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host: jax.distributed coordinator address "
                        "(with --nprocs/--procid); on TPU pods prefer "
                        "--distributed for auto-detection")
    p.add_argument("--nprocs", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--procid", type=int, default=None,
                   help="multi-host: this process's id")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() with "
                        "cluster auto-detection (TPU pod env)")
    args = p.parse_args(argv)

    if args.coordinator or args.distributed:
        from noahmp_tpu.grid import multihost
        multihost.initialize(args.coordinator, args.nprocs, args.procid)

    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel

    cfg, rs = read_namelist(args.namelist)
    model = LandModel.from_namelist(cfg, rs, table_dir=args.table_dir)
    model.check_mode = args.check_mode
    model.chunk_steps = args.chunk
    nsteps = args.steps if args.steps is not None else rs.ntime
    model.run(nsteps, verbose=not args.quiet, profile_dir=args.profile)
    if args.probe:
        model.probe()
    return 0


if __name__ == "__main__":
    sys.exit(main())
