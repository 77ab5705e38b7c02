"""Multi-year stability / conservation soak run on one chip.

The reference's long-run guarantee is its fatal runtime conservation
checks (ERROR, module_sf_noahmplsm.F90:1164-1223) plus operational
multi-year HRLDAS cycling.  This script is the equivalent soak test:
a 65k-column mixed-biome grid driven by an analytic diurnal+seasonal
forcing cycle for N simulated years, entirely on-device (`lax.scan`
over hours, forcing synthesized inside the step), tracking the worst
per-step SW/energy/water closure errors and final-state sanity.

Usage:  python scripts/stability_run.py [years] [n_columns]
Prints one summary line per simulated year and a final verdict.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from noahmp_tpu.driver.synthetic import synthetic_grid  # noqa: E402
from noahmp_tpu.grid.driver import (grid_step, glacier_order,  # noqa: E402
                                    glacier_slice_start, GridMasks)
from noahmp_tpu.state.state import Forcing  # noqa: E402


def forcing_at(hour_of_year, n, lat, dtype=jnp.float32):
    """Analytic diurnal + seasonal forcing, all jnp (traceable)."""
    h = jnp.mod(hour_of_year, 24.0)
    julian = hour_of_year / 24.0
    # solar declination ~ -23.44 cos(2pi (julian+10)/365)
    decl = jnp.deg2rad(-23.44) * jnp.cos(2.0 * jnp.pi * (julian + 10.0) / 365.0)
    hang = jnp.pi * (h - 12.0) / 12.0
    cosz = (jnp.sin(lat) * jnp.sin(decl)
            + jnp.cos(lat) * jnp.cos(decl) * jnp.cos(hang))
    cosz = jnp.maximum(cosz, 0.0)
    season = jnp.cos(2.0 * jnp.pi * (julian - 200.0) / 365.0)  # warm ~ day 200
    tbase = 278.0 + 12.0 * season * jnp.sign(lat)
    tair = (tbase + 8.0 * cosz).astype(dtype) * jnp.ones((n,), dtype)
    # rain: wet season pulses, mm/s
    wet = 0.5 * (1.0 + jnp.sin(2.0 * jnp.pi * julian / 365.0))
    prcp = jnp.where(jnp.mod(hour_of_year, 72.0) < 6.0,
                     8e-4 * wet, 0.0).astype(dtype) * jnp.ones((n,), dtype)
    o = jnp.ones((n,), dtype)
    return Forcing(
        sfctmp=tair, sfcprs=95000.0 * o, psfc=95000.0 * o,
        uu=2.5 * o, vv=1.0 * o, q2=(0.004 + 0.004 * wet) * o, qc=0.0 * o,
        soldn=(900.0 * cosz) * o, lwdn=(230.0 + 90.0 * wet) * o,
        prcp=prcp, tbot=285.0 * o, pblh=500.0 * o,
        cosz=cosz * o, lat=lat * o,
        julian=jnp.mod(julian, 365.0) * o.astype(dtype),
        yearlen=jnp.full((n,), 365, jnp.int32),
        shdfac=0.8 * o, shdmax=0.9 * o, foln=1.0 * o,
        co2air=95000.0 * 395.0e-6 * o, o2air=95000.0 * 0.209 * o,
        ficeold=jnp.zeros((n, 3), dtype),
        smceq=jnp.full((n, 4), 0.25, dtype))


def main():
    years = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    cfg, params, state, masks, accum, lat, _ = synthetic_grid(n)
    # glacier columns last -> static-slice glacier path
    import jax.tree_util as jtu
    perm, _ = glacier_order(masks.glacier)
    permd = jnp.asarray(perm)
    reorder = lambda tree: jtu.tree_map(
        lambda x: x[permd] if getattr(x, "ndim", 0) >= 1
        and x.shape[0] == n else x, tree)
    params, state, accum = reorder(params), reorder(state), reorder(accum)
    masks = GridMasks(land=masks.land[permd], glacier=masks.glacier[permd])
    lat = jnp.asarray(lat)[permd]
    gidx = glacier_slice_start(masks)

    def hour_step(carry, hour):
        s, a, worst = carry
        f = forcing_at(hour.astype(jnp.float32), n, lat)
        s2, d, a2 = grid_step(cfg, params, s, f, masks, a,
                              glacier_idx=gidx)
        ok = jnp.abs(d.errwat) < 1e10  # skip UNDEFINED fill on non-land
        w = (jnp.maximum(worst[0], jnp.max(jnp.where(ok, jnp.abs(d.errsw), 0.0))),
             jnp.maximum(worst[1], jnp.max(jnp.where(ok, jnp.abs(d.erreng), 0.0))),
             jnp.maximum(worst[2], jnp.max(jnp.where(ok, jnp.abs(d.errwat), 0.0))))
        return (s2, a2, w), None

    from functools import partial

    @partial(jax.jit, static_argnames="nhours")
    def run_chunk(state, accum, worst, start_hour, nhours):
        hours = start_hour + jnp.arange(nhours, dtype=jnp.float32)
        (s, a, w), _ = jax.lax.scan(hour_step, (state, accum, worst), hours)
        return s, a, w

    worst = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    chunk = 24 * 73  # 73 days per device call, 5 chunks/year
    t0 = time.perf_counter()
    hour = 0
    for y in range(years):
        for _c in range(5):
            state, accum, worst = run_chunk(state, accum, worst,
                                            jnp.float32(hour), nhours=chunk)
            hour += chunk
        tg = np.asarray(state.tg)
        land = np.asarray(masks.land)
        w = [float(x) for x in worst]
        wall = time.perf_counter() - t0
        print(f"year {y+1:3d}: tg[land] {tg[land].min():.1f}..{tg[land].max():.1f} K "
              f"sneqv max {float(jnp.max(state.sneqv)):.1f} mm "
              f"worst |errsw| {w[0]:.4f} |erreng| {w[1]:.4f} W/m2 "
              f"|errwat| {w[2]:.4f} mm  ({wall:.0f}s)", flush=True)
        assert np.isfinite(tg[land]).all(), "NaN/Inf in land TG"

    steps = years * 5 * chunk
    wall = time.perf_counter() - t0
    w = [float(x) for x in worst]
    ok = w[0] < 0.01 and w[1] < 0.01 and w[2] < 0.1
    print(f"\n{years} years x {n} columns = {steps*n/1e9:.1f}B column-steps "
          f"in {wall:.0f}s ({steps*n/wall/1e6:.1f}M col-steps/s)")
    print(f"conservation: errsw {w[0]:.4f} erreng {w[1]:.4f} W/m2 "
          f"errwat {w[2]:.4f} mm -> {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
