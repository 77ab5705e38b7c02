"""Glacier column physics + MMF groundwater (opt_run=5) integration
tests (BASELINE configs 4 and 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.params.tables import load_tables
from noahmp_tpu.params.hydrate import hydrate
from noahmp_tpu.state.state import initial_column_state
from noahmp_tpu.physics.glacier import noahmp_glacier
from noahmp_tpu.grid.lateral import (wtable_mmf, MMFState, eqsmoisture,
                                     updatewtd)

from test_column import make_forcing, column_params

from noahmp_tpu.params import default_table_dir
RUN = default_table_dir()


def test_glacier_column():
    """High-latitude glacier: energy closure + SWE-only water budget
    (ERROR_GLACIER, module_sf_noahmp_glacier.F90:2898)."""
    cfg = NoahMPConfig()
    p = column_params(vegtyp=24, soiltyp=16)  # Snow/Ice, land-ice soil
    s = initial_column_state(cfg, tsk=262.0, smc0=1.0)
    # glacier init: soil all ice, 100 mm SWE (NOAHMP_INIT :1034-1042)
    s = jtu.tree_map(lambda x: x, s)
    import dataclasses
    s = dataclasses.replace(
        s, smc=jnp.ones(4), sh2o=jnp.zeros(4),
        stc=jnp.full(7, 260.0), sneqv=jnp.float32(100.0),
        snowh=jnp.float32(1.0), tg=jnp.float32(260.0))

    step = jax.jit(lambda s, f: noahmp_glacier(cfg, p, s, f))
    worst = dict(errsw=0.0, erreng=0.0, errwat=0.0)
    melted = False
    for hour in range(120):
        cold = not (48 <= hour < 96)        # warm spell mid-run
        f = make_forcing(hour, cold=cold,
                         prcp_mm_hr=1.0 if 10 <= hour < 20 else 0.0)
        s, d = step(s, f)
        assert np.isfinite(float(s.tg)), f"NaN at {hour}"
        for k in worst:
            worst[k] = max(worst[k], abs(float(getattr(d, k))))
        if float(d.qmelt) > 0:
            melted = True
    assert worst["errsw"] < 0.01, worst
    assert worst["erreng"] < 0.01, worst
    assert worst["errwat"] < 0.1, worst
    assert melted, "warm spell should have produced melt"
    # glacier 'soil' stays ice-dominated
    assert float(s.smc[0]) == 1.0


def test_mmf_column_run():
    """opt_run=5 column: SHALLOWWATERTABLE active, conservation
    holds."""
    cfg = NoahMPConfig(opt_run=5)
    p = column_params()
    s = initial_column_state(cfg, tsk=284.0, smc0=0.3)
    import dataclasses
    s = dataclasses.replace(s, zwt=jnp.float32(1.5),
                            smcwtd=jnp.float32(0.3),
                            wa=jnp.float32(0.0), wt=jnp.float32(0.0))
    from noahmp_tpu.physics.sflx import noahmp_sflx
    step = jax.jit(lambda s, f: noahmp_sflx(cfg, p, s, f))
    worst = dict(errsw=0.0, erreng=0.0, errwat=0.0)
    for hour in range(72):
        f = make_forcing(hour, prcp_mm_hr=2.0 if 10 <= hour < 30 else 0.0)
        s, d = step(s, f)
        for k in worst:
            worst[k] = max(worst[k], abs(float(getattr(d, k))))
    assert worst["errsw"] < 0.01
    assert worst["erreng"] < 0.01
    assert worst["errwat"] < 0.1, worst
    assert np.isfinite(float(s.zwt))


def test_wtable_mmf_grid():
    """Full WTABLE update on a sloped grid: water tables converge
    toward valleys; accumulators move."""
    cfg = NoahMPConfig(opt_run=5)
    t = load_tables(RUN, "USGS")
    ny, nx = 8, 8
    n = ny * nx
    vegtyp = np.full(n, 7)
    soiltyp = np.full(n, 3)
    p = hydrate(t, vegtyp, soiltyp)
    smceq = eqsmoisture(cfg, t, soiltyp)

    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    # curved topography (a linear slope has zero lateral divergence)
    topo = (100.0 - 0.5 * (xx - 4) ** 2 - 0.3 * (yy - 4) ** 2) \
        .astype(np.float32).reshape(n)
    z = jnp.zeros(n, jnp.float32)
    mmf = MMFState(eqzwt=z - 2.0, riverbed=z - 3.0, rivercond=z + 0.01,
                   pexp=z + 1.0, fdepth=z + 100.0, area=z + 1.0e6,
                   topo=jnp.asarray(topo), qrfs=z, qsprings=z, qslat=z,
                   qrf=z, qspring=z, rech_acc=z)
    lm = jnp.ones(n, bool)
    wtd = jnp.full(n, -2.0)
    smc = jnp.full((n, 4), 0.3)
    sh2o = smc
    smcwtd = jnp.full(n, 0.3)
    deeprech = jnp.zeros(n)
    rech = jnp.zeros(n)

    fn = jax.jit(lambda *a: wtable_mmf(cfg, p, mmf, (ny, nx), lm,
                                       jnp.asarray(smceq), *a))
    wtd2, smc2, sh2o2, smcwtd2, deeprech2, mmf2 = fn(
        wtd, smc, sh2o, smcwtd, deeprech, rech)

    assert np.isfinite(np.asarray(wtd2)).all()
    assert np.isfinite(np.asarray(smc2)).all()
    assert np.abs(np.asarray(mmf2.qrfs)).max() >= 0.0
    # lateral flow moved water off the interior high side
    ql = np.asarray(mmf2.qslat).reshape(ny, nx)
    assert np.abs(ql[1:-2, 1:-2]).max() > 0.0


def test_updatewtd_mass_conservation():
    """Random stress: water added == soil gain + qspring (rising)."""
    cfg = NoahMPConfig(opt_run=5)
    t = load_tables(RUN, "USGS")
    p0 = jtu.tree_map(lambda x: x[0],
                      hydrate(t, np.array([7]), np.array([3])))
    smceq = jnp.asarray(eqsmoisture(cfg, t, np.array([3]))[0])
    dzs = np.array(cfg.dzs)
    rng = np.random.RandomState(1)
    for trial in range(20):
        wtd0 = jnp.float32(-rng.uniform(0.1, 4.0))
        smc = jnp.asarray(rng.uniform(0.15, 0.40, 4).astype(np.float32))
        tot = jnp.float32(rng.uniform(0.0, 0.3))
        out = updatewtd(cfg, p0, tot, wtd0, smc, smc,
                        jnp.float32(0.3), smceq)
        wtd1, smc1, sh2o1, smcwtd1, qspring = out
        d_soil = float(np.sum((np.asarray(smc1) - np.asarray(smc)) * dzs))
        d_deep = (float(smcwtd1) - 0.3) * dzs[-1] \
            if float(wtd0) < -1.0 else 0.0
        total_in = float(tot)
        accounted = d_soil + float(qspring)
        # deep-zone cases park water in smcwtd / wtd movement
        assert accounted <= total_in + 1e-4, (trial, accounted, total_in)
        assert float(qspring) >= -1e-6
