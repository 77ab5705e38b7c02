"""Golden-parity sweeps: ESAT / STOMATA / CANRES / CALHUM vs scalar
Fortran oracles (tests/oracles/stomata.py)."""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from noahmp_tpu.physics import common as PC
from noahmp_tpu.physics.stomata import stomata, canres, calhum

from oracles import stomata as O

RNG = np.random.default_rng(20260819)
N = 256


def test_esat_vs_oracle():
    tc = RNG.uniform(-50.0, 50.0, N)
    esw, esi, desw, desi = PC.esat(jnp.asarray(tc, jnp.float32))
    # rtol 2e-4: float32 Horner cancellation near tc=-50 reaches ~5e-5;
    # a wrong coefficient moves values by >1e-3
    for i in range(N):
        ew, ei_, dw, di = O.esat(tc[i])
        np.testing.assert_allclose(float(esw[i]), ew, rtol=2e-4)
        np.testing.assert_allclose(float(esi[i]), ei_, rtol=2e-4)
        np.testing.assert_allclose(float(desw[i]), dw, rtol=2e-4)
        np.testing.assert_allclose(float(desi[i]), di, rtol=2e-4)


def test_calhum_vs_oracle():
    t = RNG.uniform(250.0, 315.0, N)
    prs = RNG.uniform(7.0e4, 1.03e5, N)
    q2sat, dq = calhum(jnp.asarray(t, jnp.float32), jnp.asarray(prs, jnp.float32))
    for i in range(N):
        eq, ed = O.calhum(t[i], prs[i])
        np.testing.assert_allclose(float(q2sat[i]), eq, rtol=3e-5)
        np.testing.assert_allclose(float(dq[i]), ed, rtol=3e-5)


class _PS(NamedTuple):
    c3psn: jnp.ndarray
    kc25: jnp.ndarray
    akc: jnp.ndarray
    ko25: jnp.ndarray
    ako: jnp.ndarray
    vcmx25: jnp.ndarray
    avcmx: jnp.ndarray
    bp: jnp.ndarray
    mp: jnp.ndarray
    qe25: jnp.ndarray
    folnmx: jnp.ndarray


def test_stomata_vs_oracle():
    n = N
    # parameter ranges spanning MPTABLE.TBL noah_mp_usgs_veg_categories
    c3psn = RNG.choice([0.0, 1.0], n, p=[0.15, 0.85])
    kc25 = np.full(n, 30.0)
    akc = np.full(n, 2.1)
    ko25 = np.full(n, 3.0e4)
    ako = np.full(n, 1.2)
    vcmx25 = RNG.uniform(0.0, 80.0, n)
    avcmx = np.full(n, 2.4)
    bp = np.where(RNG.uniform(size=n) < 0.1, 1.0e15, 2.0e3)
    mp = RNG.choice([6.0, 9.0], n)
    qe25 = np.full(n, 0.06)
    folnmx = np.full(n, 1.5)

    apar = np.where(RNG.uniform(size=n) < 0.2, 0.0, RNG.uniform(0.0, 250.0, n))
    foln = RNG.uniform(0.5, 2.5, n)
    tv = RNG.uniform(263.0, 315.0, n)
    tc = tv - 273.16
    # ei = esat at tv (the caller passes ESAT(TDC(TV)))
    ei = np.array([O.esat(min(50.0, max(-50.0, t)))[0 if t > 0 else 1]
                   for t in tc])
    ea = ei * RNG.uniform(0.2, 1.0, n)
    sfctmp = tv + RNG.uniform(-3.0, 3.0, n)
    sfcprs = RNG.uniform(7.0e4, 1.03e5, n)
    o2 = 0.209 * sfcprs
    co2 = 395.0e-6 * sfcprs
    igs = RNG.choice([0.0, 1.0], n, p=[0.2, 0.8])
    btran = RNG.uniform(0.01, 1.0, n)
    rb = RNG.uniform(5.0, 150.0, n)

    p = _PS(*(jnp.asarray(a, jnp.float32) for a in
              (c3psn, kc25, akc, ko25, ako, vcmx25, avcmx, bp, mp,
               qe25, folnmx)))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    rs, psn = jax.jit(jax.vmap(stomata))(
        p, f32(apar), f32(foln), f32(tv), f32(ei), f32(ea), f32(sfctmp),
        f32(sfcprs), f32(o2), f32(co2), f32(igs), f32(btran), f32(rb))

    for i in range(n):
        ers, epsn = O.stomata(
            apar[i], foln[i], tv[i], ei[i], ea[i], sfctmp[i], sfcprs[i],
            o2[i], co2[i], igs[i], btran[i], rb[i], PC.MPE, c3psn[i],
            kc25[i], akc[i], ko25[i], ako[i], vcmx25[i], avcmx[i],
            bp[i], mp[i], qe25[i], folnmx[i])
        np.testing.assert_allclose(
            float(rs[i]), ers, rtol=2e-3, atol=1e-3,
            err_msg=f"rs col={i} apar={apar[i]:.2f} c3={c3psn[i]}")
        np.testing.assert_allclose(
            float(psn[i]), epsn, rtol=2e-3, atol=1e-4,
            err_msg=f"psn col={i} apar={apar[i]:.2f} c3={c3psn[i]}")


class _PC(NamedTuple):
    rsmin: jnp.ndarray
    rsmax: jnp.ndarray
    topt: jnp.ndarray
    rgl: jnp.ndarray
    hs: jnp.ndarray


def test_canres_vs_oracle():
    n = N
    rsmin = RNG.uniform(40.0, 400.0, n)
    rsmax = np.full(n, 5000.0)
    topt = np.full(n, 298.0)
    rgl = RNG.uniform(30.0, 150.0, n)
    hs = RNG.uniform(36.0, 55.0, n)
    par = RNG.uniform(0.0, 200.0, n)
    sfctmp = RNG.uniform(263.0, 310.0, n)
    rcsoil = RNG.uniform(0.01, 1.0, n)
    # eah well below saturation to keep q2 physical
    eah = RNG.uniform(100.0, 3000.0, n)
    sfcprs = RNG.uniform(7.0e4, 1.03e5, n)

    p = _PC(*(jnp.asarray(a, jnp.float32) for a in
              (rsmin, rsmax, topt, rgl, hs)))
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    rc, _psn = jax.jit(jax.vmap(canres))(
        p, f32(par), f32(sfctmp), f32(rcsoil), f32(eah), f32(sfcprs))
    for i in range(n):
        erc = O.canres(par[i], sfctmp[i], rcsoil[i], eah[i], sfcprs[i],
                       rsmin[i], rsmax[i], topt[i], rgl[i], hs[i])
        np.testing.assert_allclose(float(rc[i]), erc, rtol=5e-4,
                                   err_msg=f"rc col={i}")
