"""North-star benchmark: grid-columns x steps / second on one chip.

The reference publishes no numbers (BASELINE.md); the comparator is the
reference Fortran's per-step wall print on a CPU — `vs_baseline` is
reported against a conservative single-core Fortran estimate of 2e5
columns*steps/s (scalar column solve ~5 us/column/step), until a
measured noahmp.exe run is available.

The time loop runs as a `lax.scan` on device (the production driver's
jitted step chained without host round-trips), so the metric measures
device throughput rather than per-step dispatch latency through the
remote-TPU tunnel.  Forcing varies per step (a (K, n) stacked buffer
indexed by step) to prevent constant folding across iterations.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

FORTRAN_EST_COL_STEPS_PER_S = 2.0e5


def fortran_baseline():
    """(col*steps/s, note).  Prefers a measured noahmp.exe run
    (scripts/fortran_parity.py writes parity.json; CI publishes it) over
    the conservative estimate."""
    here = os.path.dirname(os.path.abspath(__file__))
    for name in ("BASELINE_measured.json", "parity.json"):
        p = os.path.join(here, name)
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            v = d.get("measured_baseline_col_steps_per_s")
            if v:
                return float(v), (
                    f"measured: noahmp.exe single-core on "
                    f"{d.get('baseline_cpu', 'unknown CPU')} "
                    f"({name})")
    return FORTRAN_EST_COL_STEPS_PER_S, (
        "estimate: 2e5 col*steps/s single-core Fortran (no measured "
        "noahmp.exe run found; scripts/fortran_parity.py produces one "
        "where a Fortran toolchain exists — see CI fortran-parity job)")


def _write_artifact(name, payload):
    """Persist a bench mode's JSON line as a repo-root artifact
    (BENCH_driver.json / BENCH_hourly.json / BENCH_multichip.json) so
    rounds can be diffed on numbers, not PERF.md prose."""
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, name), "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")


def probe_link():
    """(up_MBps, down_MBps) measured in-run, best-of-3 each with 20 MB
    messages.  The remote-TPU tunnel is ASYMMETRIC (measured 2026-08-21:
    up ~50-80 MB/s, down ~30-36 MB/s) and up/down transfers serialize
    rather than overlap, so any end-to-end ceiling must charge each
    direction at its own rate — a single up-probe (the r4 bench)
    overstates the bound by ~2x."""
    import numpy as _np
    n = 5 * 1024 * 1024                      # 20 MB of f32
    host = _np.empty(n, _np.float32)
    up = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        up = max(up, host.nbytes / (time.perf_counter() - t0))
    # down: a FRESH device buffer each rep (jax caches the host copy
    # of an already-read array, which would measure memcpy, not link)
    bump = jax.jit(lambda x, s: x + s)
    d0 = jax.device_put(host)
    down = 0.0
    for i in range(3):
        d = bump(d0, float(i + 1))
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        _np.asarray(d)
        down = max(down, host.nbytes / (time.perf_counter() - t0))
    return up / 1e6, down / 1e6


# production-tuned hourly output: the monitoring subset a forecast
# center actually consumes at hourly cadence (energy + water balance,
# snow, soil columns, forcing echo), written 16-bit-packed.  The
# reference has no such levers — it always writes all ~90 fields as
# f32 (module_hrldas_netcdf_io.F90:1536-2043); the full-field f32
# mode remains the default.  IO_PROCS is NOT enabled here: with the
# packed subset the encode is only ~3 MB/output and on a 2-core box
# the worker pickle + core contention outweigh it (measured 198k
# pooled vs 337k inline); it pays off for full-field output or from
# ~4 cores up.
HOURLY_TUNED = """ HISTORY_FIELDS = "FSA,FIRA,HFX,LH,GRDFLX,TRAD,TG,\
SNEQV,SNOWH,FSNO,SOIL_M,SOIL_T,UGDRNOFF,SFCRNOFF,ECAN,EDIR,ETRAN,\
RAINRATE,SWFORC,LWFORC"
 HISTORY_PACK16 = .true.
"""
HOURLY_TUNED_PLANES = 26          # 18 x 2d + SOIL_M(4) + SOIL_T(4)


def driver_bench(ny=256, nx=256, ndays=4, output_secs=86400,
                 tuned=False):
    """End-to-end production path: generate a demo case (domain + init
    + 3-hourly forcing files + namelist) and time `LandModel.run` —
    file reads, forcing interp, chunked on-device scan, conservation
    guard, history/restart writes, async I/O flush.  This is the
    driver-overhead counterpart of the pure-scan headline (the
    reference's whole-run loop, module_hrldas_noahmp_driver.F90:309-595).

    --hourly measures the reference's canonical OUTPUT_TIMESTEP=3600
    in the production-tuned configuration (HOURLY_TUNED: field subset
    + 16-bit packing + auto io workers); --hourly-full measures the
    same cadence with the default all-fields f32 output."""
    import sys
    import tempfile
    from pathlib import Path

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(here, "examples"))
    import make_demo_case as demo

    case = Path(tempfile.mkdtemp(prefix="noahmp_bench_"))
    (case / "input").mkdir()
    demo.write_domain(str(case / "domain.nc"), ny, nx)
    demo.write_init(str(case / "init.nc"), ny, nx)
    demo.write_forcings(str(case / "input"), ny, nx, ndays)
    nml = demo.NAMELIST.format(case=case.resolve(), ndays=ndays,
                               opt_run=3)
    nml = nml.replace("OUTPUT_TIMESTEP = 10800",
                      f"OUTPUT_TIMESTEP = {output_secs}")
    if tuned:
        nml = nml.replace("/\n", HOURLY_TUNED + "/\n")
    (case / "noahmp.namelist").write_text(nml)

    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    cfg, rs = read_namelist(str(case / "noahmp.namelist"))
    m = LandModel.from_namelist(cfg, rs)

    up0, down0 = probe_link()      # the link drifts: probe both sides
    warm = 24                      # first simulated day: compile etc.
    m.run(nsteps=warm)
    nsteps = rs.ntime - warm
    t0 = time.perf_counter()
    m.run(nsteps=nsteps)           # includes flush of async I/O
    dt = time.perf_counter() - t0

    col_steps_per_s = ny * nx * nsteps / dt

    # host<->device link ceiling: in this environment the TPU sits
    # behind a remote tunnel; the end-to-end number is bounded by the
    # bytes the production path MUST move per column-step (raw forcing
    # snapshots up; history + restart down), not by compute.  The link
    # is asymmetric and its two directions serialize (probe_link), so
    # each direction is charged at its own measured rate.
    up1, down1 = probe_link()
    # the shared link drifts between probes; charge the bound at the
    # best rate seen on each side of the timed region (closest to the
    # capacity the run itself experienced)
    up_mbps, down_mbps = max(up0, up1), max(down0, down1)
    dt_s = 3600.0
    up_bpcs = 8 * 4 / (10800.0 / dt_s)           # forcing snapshots
    # exact payload planes: history = the derived registry planes
    # (device plane fn), restart = state+accum pack (driver/pack.py)
    hist_planes = HOURLY_TUNED_PLANES if tuned else 104
    hist_bytes = 2 if tuned else 4               # int16-packed subset
    rst_planes = 64
    down_bpcs_hist = (hist_planes * hist_bytes) / (output_secs / dt_s)
    down_bpcs_rst = (rst_planes * 4) / (86400.0 / dt_s)
    s_per_cs = (up_bpcs / (up_mbps * 1e6)
                + (down_bpcs_hist + down_bpcs_rst) / (down_mbps * 1e6))
    ceiling = 1.0 / s_per_cs
    base, note = fortran_baseline()
    mode = ("hourly-tuned (20-field subset, 16-bit packed, auto "
            "io workers)" if tuned else
            "full-field f32 history")
    payload = {
        "metric": "driver end-to-end columns*steps/s per chip",
        "value": round(col_steps_per_s, 1),
        "unit": "columns*steps/s",
        "vs_baseline": round(col_steps_per_s / base, 2),
        "baseline_note": note,
        "output_timestep_s": output_secs,
        "history_mode": mode,
        "link_up_MBps": round(up_mbps, 1),
        "link_down_MBps": round(down_mbps, 1),
        "link_bound_col_steps_per_s": round(ceiling, 1),
        "pct_of_link_bound": round(100.0 * col_steps_per_s / ceiling, 1),
        "link_note": (
            "end-to-end is host<->device-link-bound in this remote-TPU"
            " environment: raw 3-hourly forcing up;"
            f" {hist_planes}-plane x{hist_bytes}B history per output +"
            f" {rst_planes}-plane daily restart down, one packed"
            " transfer each (driver/pack.py); the tunnel is asymmetric"
            " and up/down serialize, so the bound charges each"
            " direction at its own measured rate"),
    }
    print(json.dumps(payload))
    _write_artifact("BENCH_driver.json" if output_secs != 3600
                    else ("BENCH_hourly.json" if tuned
                          else "BENCH_hourly_full.json"), payload)


def multichip_bench():
    """Scaling-readiness harness (VERDICT r3 next #6): shard the same
    96-step scan over ALL visible devices via a 1-D column mesh and
    report per-chip throughput + efficiency vs a single device.

    The column axis is the model's only scaling dimension (SURVEY
    §5.7); sharding is pure data parallelism with zero per-step
    collectives, so efficiency measures runtime overhead, not
    algorithm.  On real multi-chip TPU hardware this is the one
    command to run; on a CPU mesh (XLA_FLAGS=
    --xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu) it
    proves the harness only — numbers are labeled with the platform
    and MUST NOT be quoted as TPU scaling."""
    import numpy as np
    import jax.tree_util as jtu
    from noahmp_tpu.driver.synthetic import synthetic_grid, synthetic_forcing
    from noahmp_tpu.grid.driver import grid_step, column_layout, GridMasks
    from noahmp_tpu.grid.sharding import make_mesh, shard_columns

    devs = jax.devices()
    ndev = len(devs)
    platform = devs[0].platform
    n_per = 65536 if platform in ("tpu", "axon") else 2048
    nsteps = 96 if platform in ("tpu", "axon") else 8
    nforc = 8

    def build(n, mesh=None):
        cfg, params, state, masks, accum, _, _ = synthetic_grid(n)
        # buckets must stay lane-aligned (1024) AND divide evenly over
        # the device mesh; pad_to = 1024*ndev satisfies both (the old
        # n//ndev padded every bucket to the full per-device width —
        # 3x the columns on one device)
        lay = column_layout(cfg, np.asarray(params.vegtyp), masks.land,
                            masks.glacier,
                            pad_to=(1024 * ndev
                                    if platform in ("tpu", "axon")
                                    else max(n // 8, 8 * ndev)))
        srcd = jnp.asarray(lay.src)
        reorder = lambda tree: jtu.tree_map(
            lambda x: x[srcd] if getattr(x, "ndim", 0) >= 1
            and x.shape[0] == n else x, tree)
        params, state, accum = (reorder(params), reorder(state),
                                reorder(accum))
        masks = GridMasks(land=jnp.asarray(lay.land),
                          glacier=jnp.asarray(lay.glacier))
        forc = jtu.tree_map(
            lambda *xs: jnp.stack(xs),
            *[reorder(synthetic_forcing(n, hour=24.0 * h / nforc))
              for h in range(nforc)])
        if mesh is not None:
            params, state, accum, masks, forc = (
                shard_columns(t, mesh)
                for t in (params, state, accum, masks, forc))

        def run(params, state, accum, forc_stack):
            def body(carry, t):
                s, a = carry
                f = jtu.tree_map(lambda x: x[t % nforc], forc_stack)
                s, _, a = grid_step(cfg, params, s, f, masks, a,
                                    glacier_idx=lay.glacier_start,
                                    bare_idx=lay.bare_start)
                return (s, a), ()
            (s, a), _ = jax.lax.scan(body, (state, accum),
                                     jnp.arange(nsteps))
            return s, a

        return jax.jit(run), params, state, accum, forc

    def timed(runj, params, state, accum, forc):
        s, a = runj(params, state, accum, forc)
        float(s.tg.sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s, a = runj(params, s, a, forc)
            float(s.tg.sum())
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(*build(n_per))                      # single device
    mesh = make_mesh(devs)
    tn = timed(*build(n_per * ndev, mesh))         # weak scaling
    one = n_per * nsteps / t1
    per_chip = n_per * ndev * nsteps / tn / ndev
    payload = {
        "metric": f"multichip weak-scaling col*steps/s per device "
                  f"({platform} x{ndev})",
        "value": round(per_chip, 1),
        "unit": "columns*steps/s per device",
        "single_device": round(one, 1),
        "efficiency_pct": round(100.0 * per_chip / one, 1),
        "devices": ndev,
        "platform": platform,
        "note": ("data-parallel column sharding, zero per-step "
                 "collectives; CPU-mesh runs validate the harness "
                 "only — not TPU scaling numbers"),
    }
    if platform not in ("tpu", "axon"):
        # On a virtual CPU mesh the N devices time-share the host's
        # physical cores, so weak-scaling efficiency is bounded by
        # cores/devices BEFORE any framework overhead — state the
        # ceiling next to the number so it can be read.
        ncores = os.cpu_count() or 1
        bound = min(100.0, 100.0 * ncores / ndev)
        payload["host_core_bound_efficiency_pct"] = round(bound, 1)
        payload["note"] += (
            f"; {ndev} virtual devices time-share {ncores} physical "
            f"cores, capping ideal weak-scaling efficiency at "
            f"{bound:.0f}% on this host")
    print(json.dumps(payload))
    _write_artifact("BENCH_multichip.json", payload)


def main():
    from noahmp_tpu.driver.synthetic import synthetic_grid, synthetic_forcing
    from noahmp_tpu.grid.driver import grid_step, column_layout, GridMasks
    import numpy as np

    n = 65536
    nsteps = 96          # simulated steps per timed call (4 days at dt=1h)
    nforc = 8            # distinct diurnal forcing snapshots
    cfg, params, state, masks, accum, _, _ = synthetic_grid(n)

    # padded [veg | bare | glacier] layout -> the canopy Newton solver
    # runs only on the veg slice, the glacier solver on the tail slice,
    # and every segment is lane-aligned (measured +11% vs unpadded
    # buckets, +4% vs glacier-tail-only on one v5e; see PERF.md)
    lay = column_layout(cfg, np.asarray(params.vegtyp), masks.land,
                        masks.glacier)
    srcd = jnp.asarray(lay.src)
    reorder = lambda tree: jtu.tree_map(
        lambda x: x[srcd] if getattr(x, "ndim", 0) >= 1
        and x.shape[0] == n else x, tree)
    params, state, accum = reorder(params), reorder(state), reorder(accum)
    masks = GridMasks(land=jnp.asarray(lay.land),
                      glacier=jnp.asarray(lay.glacier))

    forc_stack = jtu.tree_map(
        lambda *xs: jnp.stack(xs),
        *[reorder(synthetic_forcing(n, hour=24.0 * h / nforc))
          for h in range(nforc)])

    def run(params, state, accum, forc_stack):
        def body(carry, t):
            s, a = carry
            f = jtu.tree_map(lambda x: x[t % nforc], forc_stack)
            s, _, a = grid_step(cfg, params, s, f, masks, a,
                                glacier_idx=lay.glacier_start,
                                bare_idx=lay.bare_start)
            return (s, a), ()

        (s, a), _ = jax.lax.scan(body, (state, accum),
                                 jnp.arange(nsteps))
        return s, a

    # NOTE: buffer donation (donate_argnums) is rejected by the remote
    # axon TPU backend at readback time; state buffers here are small,
    # so plain jit costs nothing measurable.
    runj = jax.jit(run)

    s, a = runj(params, state, accum, forc_stack)
    # NOTE: through the remote-TPU tunnel, block_until_ready alone can
    # return before the work is flushed; a scalar readback is the only
    # trustworthy fence, so the timed region ends with one.
    float(s.tg.sum())

    # best-of-3: a single repetition cannot distinguish tunnel-latency
    # noise (~±2% observed between rounds) from a real regression
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, a = runj(params, s, a, forc_stack)
        float(s.tg.sum())
        times.append(time.perf_counter() - t0)

    col_steps_per_s = n * nsteps / min(times)
    base, note = fortran_baseline()
    print(json.dumps({
        "metric": "grid-columns*steps/s per chip",
        "value": round(col_steps_per_s, 1),
        "unit": "columns*steps/s",
        "vs_baseline": round(col_steps_per_s / base, 2),
        "baseline_note": note,
        "timing": "best of 3 (all: "
                  + ", ".join(f"{n * nsteps / t:.3g}" for t in times)
                  + "); layout: padded [veg|bare|glacier] buckets, "
                    "veg-only canopy solver, static glacier tail",
    }))


if __name__ == "__main__":
    import sys
    if "--hourly-full" in sys.argv:
        driver_bench(output_secs=3600, tuned=False)
    elif "--hourly" in sys.argv:
        driver_bench(output_secs=3600, tuned=True)
    elif "--driver" in sys.argv:
        driver_bench(output_secs=86400)
    elif "--multichip" in sys.argv:
        multichip_bench()
    else:
        main()
