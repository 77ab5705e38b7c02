"""North-star benchmark: grid-columns x steps / second on one chip.

The reference publishes no numbers (BASELINE.md); the comparator is the
reference Fortran's per-step wall print on a CPU — `vs_baseline` is
reported against a conservative single-core Fortran estimate of 2e5
columns*steps/s (scalar column solve ~5 us/column/step), until a
measured noahmp.exe run is available.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.
"""

import json
import time

import jax
import numpy as np

FORTRAN_EST_COL_STEPS_PER_S = 2.0e5


def main():
    from noahmp_tpu.driver.synthetic import synthetic_grid, synthetic_forcing
    from noahmp_tpu.grid.driver import grid_step

    n = 65536
    cfg, params, state, masks, accum, _, _ = synthetic_grid(n)

    step = jax.jit(lambda p, s, f, m, a: grid_step(cfg, p, s, f, m, a))

    # distinct forcing per step (avoids constant folding); compile once
    forcings = [synthetic_forcing(n, hour=float(h)) for h in range(6)]
    s, d, a = step(params, state, forcings[0], masks, accum)
    # NOTE: through the remote-TPU tunnel, block_until_ready alone can
    # return before the work is flushed; a scalar readback is the only
    # trustworthy fence, so the timed region ends with one.
    float(s.tg.sum())

    nsteps = 20
    t0 = time.perf_counter()
    for i in range(nsteps):
        s, d, a = step(params, s, forcings[i % len(forcings)], masks, a)
    float(s.tg.sum())
    dt = time.perf_counter() - t0

    col_steps_per_s = n * nsteps / dt
    print(json.dumps({
        "metric": "grid-columns*steps/s per chip",
        "value": round(col_steps_per_s, 1),
        "unit": "columns*steps/s",
        "vs_baseline": round(col_steps_per_s / FORTRAN_EST_COL_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
