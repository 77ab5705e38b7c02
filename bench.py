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


def driver_bench(ny=256, nx=256, ndays=4, output_secs=86400):
    """End-to-end production path: generate a demo case (domain + init
    + 3-hourly forcing files + namelist) and time `LandModel.run` —
    file reads, forcing interp, chunked on-device scan, conservation
    guard, daily history/restart writes, async I/O flush.  This is the
    driver-overhead counterpart of the pure-scan headline (the
    reference's whole-run loop, module_hrldas_noahmp_driver.F90:309-595).
    """
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
    # production cadences: daily restart; history per output_secs
    # (default daily; --hourly measures the reference's canonical
    # OUTPUT_TIMESTEP=3600, where the chunked scan emits per-step
    # history snapshots through ys instead of collapsing to K=1)
    nml = nml.replace("OUTPUT_TIMESTEP = 10800",
                      f"OUTPUT_TIMESTEP = {output_secs}")
    (case / "noahmp.namelist").write_text(nml)

    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    cfg, rs = read_namelist(str(case / "noahmp.namelist"))
    m = LandModel.from_namelist(cfg, rs)

    warm = 24                      # first simulated day: compile etc.
    m.run(nsteps=warm)
    nsteps = rs.ntime - warm
    t0 = time.perf_counter()
    m.run(nsteps=nsteps)           # includes flush of async I/O
    dt = time.perf_counter() - t0

    col_steps_per_s = ny * nx * nsteps / dt

    # host<->device bandwidth ceiling: in this environment the TPU sits
    # behind a remote tunnel (measured ~32 MB/s both ways); the
    # end-to-end number is bounded by the bytes the production path
    # MUST move per column-step (raw forcing snapshots up + history +
    # restart down), not by compute.  Report the measured link and the
    # implied ceiling so the number is interpretable.
    import numpy as _np
    import jax as _jax
    probe = _np.empty(5 * 1024 * 1024, _np.float32)   # 20 MB
    bw = 0.0
    for _ in range(3):      # best-of-3: the link is shared and noisy
        t0 = time.perf_counter()
        _jax.block_until_ready(_jax.device_put(probe))
        bw = max(bw, probe.nbytes / (time.perf_counter() - t0))
    dt_s = 3600.0
    up_bpcs = 8 * 4 / (10800.0 / dt_s)           # forcing snapshots
    down_bpcs = (100 * 4) / (output_secs / dt_s) \
        + (96 * 4) / (86400.0 / dt_s)            # history + restart
    ceiling = bw / (up_bpcs + down_bpcs)
    base, note = fortran_baseline()
    print(json.dumps({
        "metric": "driver end-to-end columns*steps/s per chip",
        "value": round(col_steps_per_s, 1),
        "unit": "columns*steps/s",
        "vs_baseline": round(col_steps_per_s / base, 2),
        "baseline_note": note,
        "link_MBps": round(bw / 1e6, 1),
        "link_bound_col_steps_per_s": round(ceiling, 1),
        "link_note": (
            "end-to-end is host<->device-link-bound in this remote-TPU"
            " environment: ~19 B/col-step of mandatory traffic (raw"
            " 3-hourly forcing up; daily ~100-plane history + ~96-plane"
            " restart down) over the measured link"),
    }))


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
        lay = column_layout(cfg, np.asarray(params.vegtyp), masks.land,
                            masks.glacier,
                            pad_to=max(1024, n // max(ndev, 1)) if
                            platform in ("tpu", "axon") else n // 8)
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
    print(json.dumps({
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
    }))


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
    if "--driver" in sys.argv:
        driver_bench(output_secs=(3600 if "--hourly" in sys.argv
                                  else 86400))
    elif "--multichip" in sys.argv:
        multichip_bench()
    else:
        main()
