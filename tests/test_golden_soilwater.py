"""Golden-parity sweeps: SOILWATER / GROUNDWATER / SHALLOWWATERTABLE
vs scalar Fortran oracles (tests/oracles/soilwater.py).

The soilwater driver test covers the full opt_run x opt_inf matrix,
which transitively exercises WDFCND1/2, INFIL, ZWTEQ, SRT, SSTEP and
ROSR12 with the real sub-stepping (NITER=3|6) and WATMIN plumbing."""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.physics.soil_water import (soilwater, groundwater,
                                           shallowwatertable)

from oracles import soilwater as O

RNG = np.random.default_rng(20260819)
N = 96
NSOIL = 4
DZS = (0.1, 0.3, 0.6, 1.0)
ZSOIL = (-0.1, -0.4, -1.0, -2.0)


class _P(NamedTuple):
    smcmax: jnp.ndarray
    smcwlt: jnp.ndarray
    bexp: jnp.ndarray
    dwsat: jnp.ndarray
    dksat: jnp.ndarray
    psisat: jnp.ndarray
    kdt: jnp.ndarray
    frzx: jnp.ndarray
    slope: jnp.ndarray
    is_urban: jnp.ndarray


def _soil_cols(n):
    smcmax = RNG.uniform(0.35, 0.48, n)
    smcwlt = RNG.uniform(0.02, 0.12, n)
    bexp = RNG.uniform(2.7, 11.5, n)
    dwsat = RNG.uniform(1e-6, 2e-5, n)
    dksat = RNG.uniform(1e-7, 2e-5, n)
    psisat = RNG.uniform(0.03, 0.6, n)
    kdt = RNG.uniform(0.5, 6.0, n)
    frzx = RNG.uniform(0.1, 0.6, n)
    slope = RNG.uniform(0.1, 1.0, n)
    is_urban = np.zeros(n, bool)
    smc = RNG.uniform(0.08, 1.0, (n, NSOIL)) * smcmax[:, None]
    sh2o = smc * RNG.uniform(0.3, 1.0, (n, NSOIL))
    sice = smc - sh2o
    # a few columns fully unfrozen
    thaw = RNG.uniform(size=n) < 0.5
    sh2o = np.where(thaw[:, None], smc, sh2o)
    sice = smc - sh2o
    return dict(smcmax=smcmax, smcwlt=smcwlt, bexp=bexp, dwsat=dwsat,
                dksat=dksat, psisat=psisat, kdt=kdt, frzx=frzx,
                slope=slope, is_urban=is_urban, smc=smc, sh2o=sh2o,
                sice=sice)


def _d1(arr):
    """np 0-based (NSOIL,) -> Fortran dict 1..NSOIL."""
    return {k: float(arr[k - 1]) for k in range(1, NSOIL + 1)}


@pytest.mark.parametrize("opt_run", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("opt_inf", [1, 2])
def test_soilwater_vs_oracle(opt_run, opt_inf):
    n = N
    s = _soil_cols(n)
    cfg = NoahMPConfig(opt_run=opt_run, opt_inf=opt_inf)
    dt = cfg.dt

    qinsur = np.where(RNG.uniform(size=n) < 0.3, 0.0,
                      RNG.uniform(0.0, 8e-6, n))   # m/s
    qseva = RNG.uniform(0.0, 3e-7, n)
    etrani = RNG.uniform(0.0, 5e-8, (n, NSOIL))
    if opt_run == 5:
        zwt = RNG.uniform(-6.0, -0.2, n)            # MMF: negative wtd
    else:
        zwt = RNG.uniform(0.3, 8.0, n)
    smcwtd = RNG.uniform(0.05, s["smcmax"])
    deeprech = RNG.uniform(-0.01, 0.01, n)

    p = _P(*(jnp.asarray(s[k], jnp.float32) for k in
             ("smcmax", "smcwlt", "bexp", "dwsat", "dksat", "psisat",
              "kdt", "frzx", "slope")),
           jnp.asarray(s["is_urban"]))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    fn = jax.jit(jax.vmap(lambda pp, *a: soilwater(cfg, pp, *a)))
    out = fn(p, f32(qinsur), f32(qseva), f32(etrani), f32(s["sice"]),
             f32(s["sh2o"]), f32(s["smc"]), f32(zwt), f32(smcwtd),
             f32(deeprech))

    zs = {k: ZSOIL[k - 1] for k in range(1, NSOIL + 1)}
    dz = {k: DZS[k - 1] for k in range(1, NSOIL + 1)}
    for i in range(n):
        want = O.soilwater(
            NSOIL, dt, zs, dz, qinsur[i], qseva[i],
            _d1(etrani[i]), _d1(s["sice"][i]), _d1(s["sh2o"][i]),
            _d1(s["smc"][i]), float(zwt[i]), False, float(smcwtd[i]),
            float(deeprech[i]), opt_run, opt_inf,
            s["smcmax"][i], s["smcwlt"][i], s["bexp"][i], s["dwsat"][i],
            s["dksat"][i], s["psisat"][i], s["kdt"][i], s["frzx"][i],
            s["slope"][i])
        msg = f"col={i} opt_run={opt_run} opt_inf={opt_inf}"
        for k in range(1, NSOIL + 1):
            np.testing.assert_allclose(
                float(out.sh2o[i, k - 1]), want["sh2o"][k], rtol=2e-4,
                atol=2e-4, err_msg=f"sh2o k={k} {msg}")
        np.testing.assert_allclose(float(out.runsrf[i]), want["runsrf"],
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"runsrf {msg}")
        np.testing.assert_allclose(float(out.qdrain[i]), want["qdrain"],
                                   rtol=2e-3, atol=5e-4,
                                   err_msg=f"qdrain {msg}")
        np.testing.assert_allclose(float(out.runsub[i]), want["runsub"],
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f"runsub {msg}")
        np.testing.assert_allclose(float(out.zwt[i]), want["zwt"],
                                   rtol=1e-4, atol=5e-3,
                                   err_msg=f"zwt {msg}")
        np.testing.assert_allclose(float(out.fcrmax[i]), want["fcrmax"],
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"fcrmax {msg}")


def test_groundwater_vs_oracle():
    n = N
    s = _soil_cols(n)
    cfg = NoahMPConfig(opt_run=1)
    dt = cfg.dt
    zwt = RNG.uniform(0.3, 7.0, n)
    wa = RNG.uniform(3000.0, 5200.0, n)
    wt = wa.copy()
    wcnd = RNG.uniform(1e-8, 2e-5, (n, NSOIL))
    fcrmax = RNG.uniform(0.0, 0.9, n)
    stc = RNG.uniform(260.0, 300.0, (n, NSOIL))

    class _PG(NamedTuple):
        smcmax: jnp.ndarray
        psisat: jnp.ndarray
        bexp: jnp.ndarray

    p = _PG(*(jnp.asarray(s[k], jnp.float32) for k in
              ("smcmax", "psisat", "bexp")))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    fn = jax.jit(jax.vmap(lambda pp, *a: groundwater(cfg, pp, *a)))
    out = fn(p, f32(s["sice"]), f32(stc), f32(wcnd), f32(fcrmax),
             f32(s["sh2o"]), f32(zwt), f32(wa), f32(wt))

    zs = {k: ZSOIL[k - 1] for k in range(1, NSOIL + 1)}
    for i in range(n):
        want = O.groundwater(
            NSOIL, dt, _d1(s["sice"][i]), zs, _d1(wcnd[i]),
            float(fcrmax[i]), _d1(s["sh2o"][i]), float(zwt[i]),
            float(wa[i]), float(wt[i]),
            s["smcmax"][i], s["psisat"][i], s["bexp"][i])
        msg = f"col={i} zwt={zwt[i]:.3f}"
        for k in range(1, NSOIL + 1):
            np.testing.assert_allclose(
                float(out.sh2o[i, k - 1]), want["sh2o"][k], rtol=2e-4,
                atol=2e-4, err_msg=f"sh2o k={k} {msg}")
        np.testing.assert_allclose(float(out.zwt[i]), want["zwt"],
                                   rtol=1e-4, atol=2e-3,
                                   err_msg=f"zwt {msg}")
        np.testing.assert_allclose(float(out.wa[i]), want["wa"],
                                   rtol=1e-4, atol=0.5,
                                   err_msg=f"wa {msg}")
        np.testing.assert_allclose(float(out.qin[i]), want["qin"],
                                   rtol=2e-3, atol=1e-7,
                                   err_msg=f"qin {msg}")
        np.testing.assert_allclose(float(out.qdis[i]), want["qdis"],
                                   rtol=2e-3, atol=1e-9,
                                   err_msg=f"qdis {msg}")


def test_shallowwatertable_vs_oracle():
    n = 256
    s = _soil_cols(n)
    cfg = NoahMPConfig(opt_run=5)
    wtd = RNG.uniform(-5.0, 0.0, n)
    smcwtd = RNG.uniform(0.05, s["smcmax"])
    smceq = RNG.uniform(0.1, 0.9, (n, NSOIL)) * s["smcmax"][:, None]
    smc = s["smc"].copy()
    # force some exact-saturation layers to hit the smc==smcmax branch
    sat_rows = RNG.uniform(size=n) < 0.3
    for i in np.where(sat_rows)[0]:
        k = int(RNG.integers(0, NSOIL))
        smc[i, k] = s["smcmax"][i]

    class _PG(NamedTuple):
        smcmax: jnp.ndarray
        psisat: jnp.ndarray
        bexp: jnp.ndarray

    p = _PG(*(jnp.asarray(s[k], jnp.float32) for k in
              ("smcmax", "psisat", "bexp")))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    qdrain = jnp.zeros(n)
    fn = jax.jit(jax.vmap(lambda pp, *a: shallowwatertable(cfg, pp, *a)))
    out = fn(p, f32(smceq), f32(smc), f32(wtd), f32(smcwtd), qdrain)

    zs = {k: ZSOIL[k - 1] for k in range(1, NSOIL + 1)}
    dz = {k: DZS[k - 1] for k in range(1, NSOIL + 1)}
    for i in range(n):
        # float32 == smcmax test: pass the f32-rounded values so the
        # saturated-branch comparison agrees between impl and oracle
        smc32 = np.asarray(f32(smc[i]), np.float64)
        smcmax32 = float(np.float32(s["smcmax"][i]))
        ewtd, esmcwtd, erech = O.shallowwatertable(
            NSOIL, zs, dz, _d1(smceq[i]), _d1(smc32), float(wtd[i]),
            float(smcwtd[i]), 0.0, smcmax32, s["psisat"][i],
            s["bexp"][i])
        msg = f"col={i} wtd={wtd[i]:.3f}"
        np.testing.assert_allclose(float(out.wtd[i]), ewtd, rtol=1e-4,
                                   atol=2e-3, err_msg=f"wtd {msg}")
        np.testing.assert_allclose(float(out.smcwtd[i]), esmcwtd,
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"smcwtd {msg}")
        np.testing.assert_allclose(float(out.rech[i]), erech, rtol=1e-3,
                                   atol=2e-4, err_msg=f"rech {msg}")
