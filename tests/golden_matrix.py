"""Option-matrix regression-golden machinery (shared by the freeze
script and tests/test_golden_matrix.py).

The reference's regression-testing practice is frozen multi-day
outputs per physics-option combination (SURVEY §4); here each config
in CONFIGS integrates a 12-column mixed-biome grid (incl. bare and
glacier classes and a cold/snow spell) for 48 steps in one on-device
``lax.scan`` and records the full final state plus accumulated
runoff.  ``scripts/freeze_goldens.py`` writes the expected values to
``tests/goldens/option_matrix.npz``; any physics edit that changes
trajectories trips the diff and must consciously re-freeze.
"""

import dataclasses

import numpy as np

N_COLS = 12
N_STEPS = 48

# one-factor-at-a-time around the base config: every value of every
# physics option is exercised by at least one config
BASE = dict(dveg=1, opt_crs=1, opt_btr=1, opt_run=1, opt_sfc=1,
            opt_frz=1, opt_inf=1, opt_rad=3, opt_alb=2, opt_snf=1,
            opt_tbot=2, opt_stc=1)
CONFIGS = {
    "base": {},
    "dveg2": {"dveg": 2},
    "dveg3": {"dveg": 3},
    "dveg4": {"dveg": 4},
    "dveg5": {"dveg": 5},
    "crs2": {"opt_crs": 2},
    "btr2": {"opt_btr": 2},
    "btr3": {"opt_btr": 3},
    "run2": {"opt_run": 2},
    "run3": {"opt_run": 3},
    "run4": {"opt_run": 4},
    "run5": {"opt_run": 5},
    "sfc2": {"opt_sfc": 2},
    "sfc3": {"opt_sfc": 3},
    "sfc4": {"opt_sfc": 4},
    "frz2": {"opt_frz": 2},
    "inf2": {"opt_inf": 2},
    "rad1": {"opt_rad": 1},
    "rad2": {"opt_rad": 2},
    "alb1": {"opt_alb": 1},
    "snf2": {"opt_snf": 2},
    "snf3": {"opt_snf": 3},
    "tbot1": {"opt_tbot": 1},
    "stc2": {"opt_stc": 2},
}


def run_config(overrides, perturb_sfctmp=0.0):
    """48-step trajectory for one option combo; returns a dict of
    final-state arrays (float64 for stable comparison).

    perturb_sfctmp adds a constant [K] to the air-temperature forcing —
    used by the sensitivity test to prove the regression net still
    trips on a real physics-scale change at the cross-machine
    tolerance."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from noahmp_tpu.config import NoahMPConfig
    from noahmp_tpu.driver.synthetic import (synthetic_grid,
                                             synthetic_forcing)
    from noahmp_tpu.grid.driver import grid_step

    cfg = NoahMPConfig(**{**BASE, **overrides})
    cfg_glacierless = dataclasses.replace(cfg)
    _, params, state, masks, accum, _, _ = synthetic_grid(
        N_COLS, cfg=cfg_glacierless)

    # 8-snapshot forcing cycle with a cold/snow spell in hours 12-24
    nforc = 8
    forc = jtu.tree_map(
        lambda *xs: jnp.stack(xs),
        *[synthetic_forcing(N_COLS, hour=24.0 * h / nforc,
                            cold=(h >= 4)) for h in range(nforc)])
    if perturb_sfctmp:
        forc = dataclasses.replace(
            forc, sfctmp=forc.sfctmp + jnp.float32(perturb_sfctmp))

    def body(carry, t):
        s, a = carry
        f = jtu.tree_map(lambda x: x[t % nforc], forc)
        s, _, a = grid_step(cfg, params, s, f, masks, a)
        return (s, a), ()

    (s, a), _ = jax.jit(lambda s0, a0: jax.lax.scan(
        body, (s0, a0), jnp.arange(N_STEPS)))(state, accum)
    out = {f: np.asarray(getattr(s, f), np.float64)
           for f in s.__dataclass_fields__}
    out["sfcrunoff"] = np.asarray(a.sfcrunoff, np.float64)
    out["udrunoff"] = np.asarray(a.udrunoff, np.float64)
    return out
