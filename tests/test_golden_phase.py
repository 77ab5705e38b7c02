"""Golden-parity sweeps: PHASECHANGE / FRH2O vs scalar Fortran oracles
(tests/oracles/phase.py)."""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.physics.phase import frh2o, phasechange

from oracles import phase as O

RNG = np.random.default_rng(20260819)
N = 192
NSNOW, NSOIL = 3, 4


class _P(NamedTuple):
    bexp: jnp.ndarray
    psisat: jnp.ndarray
    smcmax: jnp.ndarray


def _soil_params(n):
    bexp = RNG.uniform(2.7, 11.5, n)
    psisat = RNG.uniform(0.03, 0.6, n)
    smcmax = RNG.uniform(0.35, 0.48, n)
    return bexp, psisat, smcmax


def test_frh2o_vs_oracle():
    n = N
    bexp, psisat, smcmax = _soil_params(n)
    t = RNG.uniform(250.0, 274.5, n)
    smc = RNG.uniform(0.05, smcmax)
    sh2o = smc * RNG.uniform(0.2, 1.0, n)
    p = _P(jnp.asarray(bexp, jnp.float32), jnp.asarray(psisat, jnp.float32),
           jnp.asarray(smcmax, jnp.float32))
    got = jax.vmap(frh2o)(p, jnp.asarray(t, jnp.float32),
                          jnp.asarray(smc, jnp.float32),
                          jnp.asarray(sh2o, jnp.float32))
    for i in range(n):
        want = O.frh2o(t[i], smc[i], sh2o[i], bexp[i], psisat[i], smcmax[i])
        np.testing.assert_allclose(float(got[i]), want, rtol=2e-4,
                                   atol=2e-5, err_msg=f"col={i} t={t[i]}")


def _rand_column(i):
    """One random physically-plausible snow/soil column."""
    isnow = int(RNG.integers(-NSNOW, 1))
    dz_soil = [0.1, 0.3, 0.6, 1.0]
    dz_snow = [0.0] * NSNOW
    snice = [0.0] * NSNOW
    snliq = [0.0] * NSNOW
    for k in range(NSNOW + isnow, NSNOW):  # active snow trailing slots
        dz_snow[k] = RNG.uniform(0.01, 0.3)
        snice[k] = RNG.uniform(1.0, 300.0)
        snliq[k] = RNG.uniform(0.0, 25.0)
    if isnow == 0:
        sneqv = float(RNG.choice([0.0, RNG.uniform(0.01, 20.0)]))
        snowh = sneqv * 0.005
    else:
        sneqv = sum(snice) + sum(snliq)
        snowh = sum(dz_snow)
    stc = RNG.uniform(255.0, 283.0, NSNOW + NSOIL)
    bexp, psisat, smcmax = (float(x[0]) for x in _soil_params(1))
    smc = RNG.uniform(0.08, smcmax, NSOIL)
    sh2o = smc * RNG.uniform(0.2, 1.0, NSOIL)
    # fact = dt/(hcpct*dz): hcpct ~ 1e6..3e6 J/m3/K
    hcpct = RNG.uniform(0.5e6, 3.0e6, NSNOW + NSOIL)
    dz_all = np.asarray(dz_snow + dz_soil)
    dz_safe = np.where(dz_all > 0, dz_all, 1.0)
    fact = np.where(dz_all > 0, 3600.0 / (hcpct * dz_safe), 0.0)
    # soil fact always live
    return dict(isnow=isnow, dz=dz_all, snice=np.asarray(snice),
                snliq=np.asarray(snliq), sneqv=sneqv, snowh=snowh,
                stc=stc, smc=smc, sh2o=sh2o, fact=fact, bexp=bexp,
                psisat=psisat, smcmax=smcmax)


@pytest.mark.parametrize("opt_frz", [1, 2])
def test_phasechange_vs_oracle(opt_frz):
    cols = [_rand_column(i) for i in range(N)]
    cfg = NoahMPConfig(opt_frz=opt_frz)
    f32 = lambda key: jnp.asarray(np.stack([c[key] for c in cols]),
                                  jnp.float32)
    p = _P(f32("bexp"), f32("psisat"), f32("smcmax"))
    isnow = jnp.asarray([c["isnow"] for c in cols], jnp.int32)

    fn = jax.jit(jax.vmap(
        lambda pp, isn, fact, dz, stc, si, sl, se, sh, smc, sh2o:
        phasechange(cfg, pp, isn, fact, dz, stc, si, sl, se, sh,
                    smc, sh2o)), static_argnums=())
    out = fn(p, isnow, f32("fact"), f32("dz"), f32("stc"), f32("snice"),
             f32("snliq"), f32("sneqv"), f32("snowh"), f32("smc"),
             f32("sh2o"))

    for i, c in enumerate(cols):
        J = lambda arr: {j: float(arr[j + NSNOW - 1])
                         for j in range(-NSNOW + 1, len(arr) - NSNOW + 1)}
        want = O.phasechange(
            NSNOW, NSOIL, c["isnow"], 3600.0, J(c["fact"]), J(c["dz"]), 1,
            J(c["stc"]),
            {j: float(c["snice"][j + NSNOW - 1]) for j in range(-NSNOW + 1, 1)},
            {j: float(c["snliq"][j + NSNOW - 1]) for j in range(-NSNOW + 1, 1)},
            c["sneqv"], c["snowh"],
            {j: float(c["smc"][j - 1]) for j in range(1, NSOIL + 1)},
            {j: float(c["sh2o"][j - 1]) for j in range(1, NSOIL + 1)},
            opt_frz, c["bexp"], c["psisat"], c["smcmax"])

        msg = f"col={i} isnow={c['isnow']} opt_frz={opt_frz}"
        for jf in range(c["isnow"] + 1, NSOIL + 1):
            k = jf + NSNOW - 1
            np.testing.assert_allclose(
                float(out.stc[i, k]), want["stc"][jf], rtol=5e-5,
                atol=5e-3, err_msg=f"stc J={jf} {msg}")
            assert int(out.imelt[i, k]) == want["imelt"][jf], \
                f"imelt J={jf} {msg}"
        for jf in range(c["isnow"] + 1, 1):
            k = jf + NSNOW - 1
            np.testing.assert_allclose(
                float(out.snice[i, k]), want["snice"][jf], rtol=1e-4,
                atol=5e-3, err_msg=f"snice J={jf} {msg}")
            np.testing.assert_allclose(
                float(out.snliq[i, k]), want["snliq"][jf], rtol=1e-4,
                atol=5e-3, err_msg=f"snliq J={jf} {msg}")
        for jf in range(1, NSOIL + 1):
            k = jf + NSNOW - 1
            np.testing.assert_allclose(
                float(out.smc[i, jf - 1]), want["smc"][jf], rtol=1e-4,
                atol=1e-5, err_msg=f"smc J={jf} {msg}")
            np.testing.assert_allclose(
                float(out.sh2o[i, jf - 1]), want["sh2o"][jf], rtol=2e-4,
                atol=2e-4, err_msg=f"sh2o J={jf} {msg}")
        np.testing.assert_allclose(float(out.qmelt[i]), want["qmelt"],
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"qmelt {msg}")
        np.testing.assert_allclose(float(out.sneqv[i]), want["sneqv"],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"sneqv {msg}")
        np.testing.assert_allclose(float(out.ponding[i]), want["ponding"],
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"ponding {msg}")
