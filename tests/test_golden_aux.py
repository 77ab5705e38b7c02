"""Golden-parity sweeps: ATM / PHENOLOGY / CANWATER / THERMOPROP
(CSNOW, TDFCND) and the ENERGY-prelude pieces vs scalar Fortran
oracles (tests/oracles/energy_aux.py)."""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.physics.atm import atm, phenology
from noahmp_tpu.physics.snow import canwater
from noahmp_tpu.physics.thermal import thermoprop, tdfcnd

from oracles import energy_aux as O

RNG = np.random.default_rng(20260819)
N = 192
NSNOW, NSOIL = 3, 4
DZS = (0.1, 0.3, 0.6, 1.0)


def test_atm_vs_oracle():
    n = N
    sfcprs = RNG.uniform(7e4, 1.03e5, n)
    sfctmp = RNG.uniform(245.0, 315.0, n)
    q2 = RNG.uniform(1e-4, 2e-2, n)
    prcp = RNG.uniform(0.0, 5e-3, n)
    soldn = RNG.uniform(0.0, 1100.0, n)
    cosz = RNG.uniform(-0.5, 1.0, n)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    out = jax.vmap(atm)(f32(sfcprs), f32(sfctmp), f32(q2), f32(prcp),
                        f32(soldn), f32(cosz))
    for i in range(n):
        w = O.atm(sfcprs[i], sfctmp[i], q2[i], prcp[i], soldn[i],
                  cosz[i])
        np.testing.assert_allclose(float(out.thair[i]), w["thair"], rtol=1e-5)
        np.testing.assert_allclose(float(out.eair[i]), w["eair"], rtol=1e-5)
        np.testing.assert_allclose(float(out.rhoair[i]), w["rhoair"], rtol=1e-5)
        np.testing.assert_allclose(float(out.qprecc[i]), w["qprecc"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.solad[i]), w["solad"], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out.solai[i]), w["solai"], rtol=1e-5)


class _PPh(NamedTuple):
    laim: jnp.ndarray
    saim: jnp.ndarray
    hvt: jnp.ndarray
    hvb: jnp.ndarray
    tmin: jnp.ndarray


@pytest.mark.parametrize("dveg", [1, 2])
def test_phenology_vs_oracle(dveg):
    n = N
    cfg = NoahMPConfig(dveg=dveg, opt_crs=1)
    laim = RNG.uniform(0.0, 6.0, (n, 12))
    saim = RNG.uniform(0.0, 2.0, (n, 12))
    hvt = np.where(RNG.uniform(size=n) < 0.3,
                   RNG.uniform(0.1, 1.0, n), RNG.uniform(1.0, 20.0, n))
    hvb = hvt * RNG.uniform(0.05, 0.5, n)
    tmin = np.full(n, 273.0)
    masked = RNG.uniform(size=n) < 0.1
    snowh = np.where(RNG.uniform(size=n) < 0.5, 0.0,
                     RNG.uniform(0.0, 1.5, n))
    tv = RNG.uniform(260.0, 300.0, n)
    lat = RNG.uniform(-1.2, 1.2, n)
    julian = RNG.uniform(0.0, 365.0, n)
    lai_in = RNG.uniform(0.0, 6.0, n)
    sai_in = RNG.uniform(0.0, 2.0, n)

    p = _PPh(jnp.asarray(laim, jnp.float32), jnp.asarray(saim, jnp.float32),
             jnp.asarray(hvt, jnp.float32), jnp.asarray(hvb, jnp.float32),
             jnp.asarray(tmin, jnp.float32))
    flags = dict(is_water=jnp.asarray(masked),
                 is_barren=jnp.zeros(n, bool),
                 is_snow=jnp.zeros(n, bool),
                 is_urban=jnp.zeros(n, bool))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    out = jax.jit(jax.vmap(
        lambda pp, sh, t, la, ju, li, si, fl:
        phenology(cfg, pp, sh, t, la, 365, ju, li, si, fl)))(
        p, f32(snowh), f32(tv), f32(lat), f32(julian),
        f32(lai_in), f32(sai_in), flags)
    for i in range(n):
        elai, esai = float(out.elai[i]), float(out.esai[i])
        lai_e, sai_e, elai_e, esai_e, igs_e, htop_e = O.phenology(
            dveg, snowh[i], tv[i], lat[i], 365, julian[i], laim[i],
            saim[i], hvt[i], hvb[i], tmin[i], lai_in[i], sai_in[i],
            bool(masked[i]))
        msg = f"col={i} dveg={dveg}"
        np.testing.assert_allclose(float(out.lai[i]), lai_e, rtol=1e-4,
                                   atol=1e-5, err_msg=f"lai {msg}")
        np.testing.assert_allclose(float(out.sai[i]), sai_e, rtol=1e-4,
                                   atol=1e-5, err_msg=f"sai {msg}")
        np.testing.assert_allclose(elai, elai_e, rtol=1e-4, atol=1e-5,
                                   err_msg=f"elai {msg}")
        np.testing.assert_allclose(esai, esai_e, rtol=1e-4, atol=1e-5,
                                   err_msg=f"esai {msg}")
        assert float(out.igs[i]) == igs_e, f"igs {msg}"


class _PC(NamedTuple):
    ch2op: jnp.ndarray


@pytest.mark.parametrize("opt_snf", [1, 2, 3])
def test_canwater_vs_oracle(opt_snf):
    n = N
    cfg = NoahMPConfig(opt_snf=opt_snf)
    dt = cfg.dt
    ch2op = RNG.uniform(0.05, 0.2, n)
    sfctmp = RNG.uniform(260.0, 283.0, n)
    uu = RNG.uniform(-8.0, 8.0, n)
    vv = RNG.uniform(-8.0, 8.0, n)
    fcev = RNG.uniform(-120.0, 200.0, n)
    fctr = RNG.uniform(-30.0, 250.0, n)
    prcp = np.where(RNG.uniform(size=n) < 0.3, 0.0,
                    RNG.uniform(0.0, 4e-3, n))
    qprecc = 0.1 * prcp
    qprecl = 0.9 * prcp
    elai = np.where(RNG.uniform(size=n) < 0.15, 0.0,
                    RNG.uniform(0.1, 5.0, n))
    esai = np.where(elai > 0, RNG.uniform(0.05, 1.0, n), 0.0)
    tg = RNG.uniform(260.0, 290.0, n)
    fveg = RNG.uniform(0.05, 0.95, n)
    canliq = RNG.uniform(0.0, 1.5, n)
    canice = np.where(RNG.uniform(size=n) < 0.5, 0.0,
                      RNG.uniform(0.0, 3.0, n))
    tv = RNG.uniform(262.0, 288.0, n)
    frozen = tv <= 273.16

    p = _PC(jnp.asarray(ch2op, jnp.float32))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    out = jax.jit(jax.vmap(lambda pp, *a: canwater(cfg, pp, *a)))(
        p, f32(sfctmp), f32(uu), f32(vv), f32(fcev), f32(fctr),
        f32(qprecc), f32(qprecl), f32(elai), f32(esai), f32(tg),
        f32(fveg), jnp.asarray(frozen), f32(canliq), f32(canice),
        f32(tv))
    for i in range(n):
        w = O.canwater(opt_snf, dt, sfctmp[i], uu[i], vv[i], fcev[i],
                       fctr[i], qprecc[i], qprecl[i], elai[i], esai[i],
                       1, tg[i], fveg[i], bool(frozen[i]), canliq[i],
                       canice[i], tv[i], ch2op[i])
        msg = f"col={i} opt_snf={opt_snf}"
        for k in ("canliq", "canice", "tv", "ecan", "etran", "qrain",
                  "qsnow", "snowhin", "fwet", "fpice"):
            np.testing.assert_allclose(
                float(getattr(out, k)[i]), w[k], rtol=2e-4, atol=2e-5,
                err_msg=f"{k} {msg}")


class _PT(NamedTuple):
    smcmax: jnp.ndarray
    quartz: jnp.ndarray
    csoil: jnp.ndarray
    is_urban: jnp.ndarray


def test_thermoprop_vs_oracle():
    n = N
    cfg = NoahMPConfig()
    smcmax = RNG.uniform(0.35, 0.48, n)
    quartz = RNG.uniform(0.05, 0.9, n)
    csoil = np.full(n, 2.0e6)
    smc = RNG.uniform(0.05, 1.0, (n, NSOIL)) * smcmax[:, None]
    sh2o = smc * RNG.uniform(0.3, 1.0, (n, NSOIL))
    stc = RNG.uniform(255.0, 295.0, (n, NSNOW + NSOIL))
    cols = []
    for i in range(n):
        isnow = int(RNG.integers(-NSNOW, 1))
        dz_sn = np.zeros(NSNOW)
        snice = np.zeros(NSNOW)
        snliq = np.zeros(NSNOW)
        for k in range(NSNOW + isnow, NSNOW):
            dz_sn[k] = RNG.uniform(0.01, 0.3)
            snice[k] = RNG.uniform(1.0, 300.0)
            snliq[k] = RNG.uniform(0.0, 20.0)
        snowh = dz_sn.sum() if isnow < 0 else float(
            RNG.choice([0.0, RNG.uniform(0.0, 0.02)]))
        cols.append(dict(isnow=isnow, dz_sn=dz_sn, snice=snice,
                         snliq=snliq, snowh=snowh))

    dzsnso = np.concatenate(
        [np.stack([c["dz_sn"] for c in cols]),
         np.tile(np.asarray(DZS), (n, 1))], axis=1)
    p = _PT(jnp.asarray(smcmax, jnp.float32), jnp.asarray(quartz, jnp.float32),
            jnp.asarray(csoil, jnp.float32), jnp.zeros(n, bool))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    isnow = jnp.asarray([c["isnow"] for c in cols], jnp.int32)
    out = jax.jit(jax.vmap(lambda pp, *a: thermoprop(cfg, pp, *a)))(
        p, isnow, f32(dzsnso),
        f32(np.asarray([c["snowh"] for c in cols])),
        f32(np.stack([c["snice"] for c in cols])),
        f32(np.stack([c["snliq"] for c in cols])),
        f32(smc), f32(sh2o), f32(stc))
    for i, c in enumerate(cols):
        J = {}
        for j in range(-NSNOW + 1, 1):
            J[j] = float(c["dz_sn"][j + NSNOW - 1])
        for k in range(1, NSOIL + 1):
            J[k] = DZS[k - 1]
        df_e, hc_e, fact_e = O.thermoprop(
            NSOIL, NSNOW, c["isnow"], 1, J, cfg.dt, c["snowh"],
            {j: float(c["snice"][j + NSNOW - 1]) for j in range(-NSNOW + 1, 1)},
            {j: float(c["snliq"][j + NSNOW - 1]) for j in range(-NSNOW + 1, 1)},
            csoil[i],
            {k: float(smc[i, k - 1]) for k in range(1, NSOIL + 1)},
            {k: float(sh2o[i, k - 1]) for k in range(1, NSOIL + 1)},
            0.0,
            {j: float(stc[i, j + NSNOW - 1]) for j in range(-NSNOW + 1, NSOIL + 1)},
            False, smcmax[i], quartz[i])
        msg = f"col={i} isnow={c['isnow']}"
        for jf in range(c["isnow"] + 1, NSOIL + 1):
            k = jf + NSNOW - 1
            np.testing.assert_allclose(
                float(out.df[i, k]), df_e[jf], rtol=2e-4, atol=1e-6,
                err_msg=f"df J={jf} {msg}")
            np.testing.assert_allclose(
                float(out.hcpct[i, k]), hc_e[jf], rtol=2e-4,
                err_msg=f"hcpct J={jf} {msg}")
            np.testing.assert_allclose(
                float(out.fact[i, k]), fact_e[jf], rtol=2e-4,
                err_msg=f"fact J={jf} {msg}")
