"""Column physics integration tests.

Strategy per SURVEY.md §4: the reference guards physics correctness at
runtime via fatal conservation checks (ERROR,
module_sf_noahmplsm.F90:1164-1223).  These tests replicate those checks
as properties over multi-day integrations: SW closure 0.01 W/m2, energy
closure 0.01 W/m2, water closure 0.1 mm/step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from noahmp_tpu.params.tables import load_tables
from noahmp_tpu.params.hydrate import hydrate
from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.state.state import initial_column_state, Forcing
from noahmp_tpu.physics.sflx import noahmp_sflx

from noahmp_tpu.params import default_table_dir
RUN = default_table_dir()
f32 = jnp.float32


def column_params(vegtyp=7, soiltyp=3):
    t = load_tables(RUN, "USGS")
    return jtu.tree_map(lambda x: x[0],
                        hydrate(t, np.array([vegtyp]), np.array([soiltyp])))


def make_forcing(hour, cold=False, prcp_mm_hr=0.0):
    h = hour % 24
    cosz = float(np.sin(np.pi * (h - 6) / 12.0)) if 6 <= h <= 18 else 0.0
    cosz = max(0.0, cosz)
    tair = (265.0 if cold else 282.0) + 8.0 * cosz
    return Forcing(
        sfctmp=f32(tair), sfcprs=f32(95000.), psfc=f32(95000.),
        uu=f32(2.5), vv=f32(1.0), q2=f32(0.004 if cold else 0.007),
        qc=f32(0.0), soldn=f32(800.0 * cosz),
        lwdn=f32(220.0 if cold else 330.0),
        prcp=f32(prcp_mm_hr / 3600.0), tbot=f32(285.0), pblh=f32(500.0),
        cosz=f32(cosz), lat=f32(0.7), julian=f32((hour / 24.0) % 365),
        yearlen=jnp.int32(365), shdfac=f32(0.8), shdmax=f32(0.9),
        co2air=f32(95000. * 395.e-6), o2air=f32(95000. * 0.209),
        foln=f32(1.0), ficeold=jnp.zeros(3, jnp.float32),
        smceq=jnp.full(4, 0.25, jnp.float32))


def integrate(cfg, p, s, hours, scenario):
    step = jax.jit(lambda s, f: noahmp_sflx(cfg, p, s, f))
    worst = dict(errsw=0.0, erreng=0.0, errwat=0.0)
    for hour in range(hours):
        f = scenario(hour)
        s, d = step(s, f)
        for k in worst:
            worst[k] = max(worst[k], abs(float(getattr(d, k))))
        assert not np.isnan(float(s.tg)), f"NaN tg at hour {hour}"
    return s, worst


def check(worst):
    assert worst["errsw"] < 0.01, worst
    assert worst["erreng"] < 0.01, worst
    assert worst["errwat"] < 0.1, worst


@pytest.mark.parametrize("opt_run", [1, 2, 3, 4])
def test_conservation_runoff_options(opt_run):
    cfg = NoahMPConfig(opt_run=opt_run)
    p = column_params()
    s = initial_column_state(cfg, tsk=282.0, smc0=0.3)
    s, worst = integrate(
        cfg, p, s, 72,
        lambda h: make_forcing(h, prcp_mm_hr=3.0 if 10 <= h < 20 else 0.0))
    check(worst)


def test_snow_cycle_conservation():
    """Snow creation, multi-layer growth, melt-out (the COMBINE/DIVIDE
    path, reference :7065-7371)."""
    cfg = NoahMPConfig()
    p = column_params()
    s = initial_column_state(cfg, tsk=280.0, smc0=0.3)

    def scen(h):
        cold = 24 <= h < 96
        return make_forcing(h, cold=cold,
                            prcp_mm_hr=2.0 if 30 <= h < 40 else 0.0)

    saw_layers = False
    step = jax.jit(lambda s, f: noahmp_sflx(cfg, p, s, f))
    worst = dict(errsw=0.0, erreng=0.0, errwat=0.0)
    for hour in range(192):
        s, d = step(s, scen(hour))
        if int(s.isnow) < -1:
            saw_layers = True
        for k in worst:
            worst[k] = max(worst[k], abs(float(getattr(d, k))))
    check(worst)
    assert saw_layers, "snowpack never developed multiple layers"
    assert float(s.sneqv) == 0.0, "snow should have melted by end"


def test_ball_berry_vs_jarvis():
    p = column_params()
    for opt_crs in (1, 2):
        cfg = NoahMPConfig(opt_crs=opt_crs)
        s = initial_column_state(cfg, tsk=285.0, smc0=0.3)
        _, worst = integrate(cfg, p, s, 48, lambda h: make_forcing(h))
        check(worst)


def test_chen97_sfc_scheme():
    cfg = NoahMPConfig(opt_sfc=2)
    p = column_params()
    s = initial_column_state(cfg, tsk=285.0, smc0=0.3)
    _, worst = integrate(cfg, p, s, 48, lambda h: make_forcing(h))
    check(worst)


def test_dynamic_vegetation():
    cfg = NoahMPConfig(dveg=2)
    p = column_params()
    s = initial_column_state(cfg, tsk=285.0, smc0=0.3)
    s2, worst = integrate(cfg, p, s, 72, lambda h: make_forcing(h))
    check(worst)
    assert float(s2.lfmass) > 0.0
    assert float(s2.lai) > 0.0


def test_bare_soil_column():
    """Barren category: FVEG=0, bare-flux-only path."""
    cfg = NoahMPConfig()
    p = column_params(vegtyp=19, soiltyp=1)
    s = initial_column_state(cfg, tsk=285.0, smc0=0.2)
    _, worst = integrate(cfg, p, s, 48, lambda h: make_forcing(h))
    check(worst)


def test_vmap_over_columns():
    """vmapped batch = per-column results (the TPU execution mode)."""
    cfg = NoahMPConfig()
    t = load_tables(RUN, "USGS")
    vt = np.array([7, 11, 19, 1])
    st_ = np.array([3, 8, 1, 12])
    p_all = hydrate(t, vt, st_)
    s0 = initial_column_state(cfg, tsk=284.0, smc0=0.3)
    s_all = jtu.tree_map(lambda x: jnp.stack([x] * 4), s0)
    f = make_forcing(12)
    f_all = jtu.tree_map(lambda x: jnp.stack([x] * 4), f)

    vstep = jax.jit(jax.vmap(lambda p, s, f: noahmp_sflx(cfg, p, s, f)))
    sv, dv = vstep(p_all, s_all, f_all)

    for i in range(4):
        pi = jtu.tree_map(lambda x: x[i], p_all)
        si, di = jax.jit(lambda s, f: noahmp_sflx(cfg, pi, s, f))(s0, f)
        np.testing.assert_allclose(np.asarray(sv.tg)[i], np.asarray(si.tg),
                                   rtol=2e-6)
        np.testing.assert_allclose(np.asarray(dv.fsh)[i], np.asarray(di.fsh),
                                   rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("opt_sfc", [3, 4])
def test_myj_ysu_sfc_schemes(opt_sfc):
    """MYJ (SFCDIF3 :4425) and YSU (SFCDIF4 :4882) exchange schemes."""
    cfg = NoahMPConfig(opt_sfc=opt_sfc)
    p = column_params()
    s = initial_column_state(cfg, tsk=285.0, smc0=0.3)
    _, worst = integrate(cfg, p, s, 48, lambda h: make_forcing(h))
    check(worst)


def test_modis_landuse_column():
    """MODIS (MODIFIED_IGBP_MODIS_NOAH) dataset end-to-end: category
    remapping (water=17/barren=16/snow=15, read_mp_veg_parameters
    module_sf_noahmplsm.F90:274-404) + a conservative 2-day integration
    on an evergreen-needleleaf column (vegtyp=1 in MODIS)."""
    cfg = NoahMPConfig(llanduse="MODIFIED_IGBP_MODIS_NOAH")
    t = load_tables(RUN, "MODIFIED_IGBP_MODIS_NOAH")
    assert t.veg.nveg == 20
    p = jtu.tree_map(lambda x: x[0],
                     hydrate(t, np.array([1]), np.array([3])))
    s = initial_column_state(cfg, tsk=282.0, smc0=0.3)
    s, worst = integrate(
        cfg, p, s, 48,
        lambda h: make_forcing(h, prcp_mm_hr=2.0 if 5 <= h < 12 else 0.0))
    check(worst)
    # MODIS water category must be flagged non-vegetated, not USGS's 16
    pw = jtu.tree_map(lambda x: x[0],
                      hydrate(t, np.array([17]), np.array([14])))
    sw, dw = jax.jit(lambda s, f: noahmp_sflx(cfg, pw, s, f))(
        initial_column_state(cfg), make_forcing(12))
    assert float(dw.elai) == 0.0 and float(dw.esai) == 0.0
