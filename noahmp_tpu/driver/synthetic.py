"""Synthetic grid setup for benchmarks, smoke tests, and dry runs.

Builds a mixed-biome flat column grid from the reference parameter
tables with diurnal-cycle forcing — the standalone analogue of the
dongting demo domain (run/noahmp.namelist) when no NetCDF domain is
given.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.tree_util as jtu

from ..config import NoahMPConfig
from ..params import default_table_dir
from ..params.tables import load_tables
from ..params.hydrate import hydrate
from ..state.state import Forcing
from ..driver.init import cold_start
from ..grid.driver import GridMasks, GridAccum

# a deterministic mixed-biome assignment (USGS categories)
_VEG_CYCLE = np.array([7, 11, 14, 2, 8, 15, 5, 19, 10, 24, 7, 13])
_SOIL_CYCLE = np.array([3, 8, 12, 4, 6, 1, 9, 11, 2, 16, 7, 5])


def synthetic_grid(n_cols: int, cfg: NoahMPConfig = None,
                   table_dir: str = None, with_glacier: bool = True):
    """Returns (cfg, params, state, masks, accum, lat, lon)."""
    cfg = cfg or NoahMPConfig()
    tables = load_tables(table_dir or default_table_dir(), cfg.llanduse)
    idx = np.arange(n_cols)
    vegtyp = _VEG_CYCLE[idx % len(_VEG_CYCLE)].copy()
    soiltyp = _SOIL_CYCLE[idx % len(_SOIL_CYCLE)].copy()
    if not with_glacier:
        vegtyp[vegtyp == 24] = 7
    params = hydrate(tables, vegtyp, soiltyp)

    lat = 25.0 + 20.0 * (idx % 64) / 64.0       # degrees
    lon = -120.0 + 50.0 * (idx // 64 % 64) / 64.0

    tsk = np.where(vegtyp == 24, 263.0, 284.0).astype(np.float32)
    swe = np.where(vegtyp == 24, 100.0, 0.0).astype(np.float32)
    smois = np.tile(np.array([0.28, 0.29, 0.30, 0.30], np.float32),
                    (n_cols, 1))
    stemp = np.tile(np.array([284.0, 285.0, 286.0, 287.0], np.float32),
                    (n_cols, 1))
    stemp = np.where(vegtyp[:, None] == 24, 262.0, stemp)

    state = cold_start(cfg, tables, vegtyp, soiltyp, tsk, smois, stemp,
                       swe=swe)
    glacier = jnp.asarray(vegtyp == tables.veg.issnow)
    masks = GridMasks(land=jnp.ones(n_cols, bool), glacier=glacier)
    accum = GridAccum.zeros(n_cols)
    return cfg, params, state, masks, accum, lat, lon


def synthetic_forcing(n_cols: int, hour: float, lat=None, cold=False):
    """Diurnal-cycle forcing for the synthetic grid."""
    h = hour % 24.0
    cosz = max(0.0, float(np.sin(np.pi * (h - 6.0) / 12.0))) \
        if 6.0 <= h <= 18.0 else 0.0
    tair = (266.0 if cold else 282.0) + 8.0 * cosz
    f32 = lambda v: jnp.full((n_cols,), v, jnp.float32)
    return Forcing(
        sfctmp=f32(tair), sfcprs=f32(95000.0), psfc=f32(95000.0),
        uu=f32(2.5), vv=f32(1.0), q2=f32(0.004 if cold else 0.007),
        qc=f32(0.0), soldn=f32(800.0 * cosz),
        lwdn=f32(230.0 if cold else 330.0),
        prcp=f32(0.3 / 3600.0), tbot=f32(285.0), pblh=f32(500.0),
        cosz=f32(cosz), lat=f32(0.7),
        julian=f32((hour / 24.0) % 365.0),
        yearlen=jnp.full((n_cols,), 365, jnp.int32),
        shdfac=f32(0.8), shdmax=f32(0.9),
        co2air=f32(95000.0 * 395.0e-6), o2air=f32(95000.0 * 0.209),
        foln=f32(1.0),
        ficeold=jnp.zeros((n_cols, 3), jnp.float32),
        smceq=jnp.full((n_cols, 4), 0.25, jnp.float32))
