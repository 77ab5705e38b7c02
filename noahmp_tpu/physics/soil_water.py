"""Soil moisture: Richards equation, runoff schemes, groundwater.

Reference: SOILWATER (module_sf_noahmplsm.F90:7680-7936), ZWTEQ
(:7938-7990), INFIL (:7992-8087), SRT (:8089-8217), SSTEP (:8220-8327),
WDFCND1/2 (:8329-8401), GROUNDWATER SIMGM (:8403-8585),
SHALLOWWATERTABLE MMF (:8588-8718).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from .common import (sanitize, take1, put1, add1, cumsum_small,
                     first_true_idx, last_true_idx, sel)
from .soil_temp import tridiag_thomas


def wdfcnd1(p, smc, fcr):
    """Diffusivity/conductivity from total moisture (WDFCND1 :8329-8360)."""
    factr = jnp.maximum(0.01, smc / p.smcmax)
    wdf = p.dwsat * factr ** (p.bexp + 2.0) * (1.0 - fcr)
    wcnd = p.dksat * factr ** (2.0 * p.bexp + 3.0) * (1.0 - fcr)
    return wdf, wcnd


def wdfcnd2(p, smc, sice):
    """Diffusivity/conductivity from liquid water (WDFCND2 :8363-8401)."""
    factr = jnp.maximum(0.01, smc / p.smcmax)
    expon = p.bexp + 2.0
    wdf = p.dwsat * factr ** expon
    vkwgt = 1.0 / (1.0 + (500.0 * sice) ** 3.0)
    wdf = sel(sice > 0.0,
                    vkwgt * wdf + (1.0 - vkwgt) * p.dwsat * (0.2 / p.smcmax) ** expon,
                    wdf)
    wcnd = p.dksat * factr ** (2.0 * p.bexp + 3.0)
    return wdf, wcnd


def zwteq(cfg, p, sh2o):
    """Equilibrium water-table depth by fine-grid hydrostatic scan
    (ZWTEQ :7938-7990)."""
    zsoil = jnp.asarray(cfg.zsoil, sh2o.dtype)
    dzs = jnp.asarray(cfg.dzs, sh2o.dtype)
    nfine = 100
    wd1 = jnp.sum((p.smcmax - sh2o) * dzs)
    dzfine = 3.0 * (-zsoil[-1]) / nfine
    kk = jnp.arange(1, nfine + 1, dtype=sh2o.dtype)
    zfine = kk * dzfine
    temp = 1.0 + (zfine - zfine)  # placeholder
    zwt0 = -3.0 * zsoil[-1] - 0.001

    # scan: first k where |wd2-wd1| <= 0.01 -> zwt = zfine(k)
    t = 1.0 + (zwt0 - zfine) / p.psisat
    incr = p.smcmax * (1.0 - jnp.maximum(t, 1e-6) ** (-1.0 / p.bexp)) * dzfine
    # prefix sum via log-step doubling (kernel-safe; no cumsum prim)
    wd2 = incr
    shift = 1
    while shift < nfine:
        pad = jnp.zeros((shift,), wd2.dtype)
        wd2 = wd2 + jnp.concatenate([pad, wd2[:-shift]])
        shift *= 2
    hit = jnp.abs(wd2 - wd1) <= 0.01
    found = jnp.any(hit)
    first = first_true_idx(hit, 0)
    return sel(found, take1(zfine, first), zwt0)


def infil(cfg, p, sh2o, sice, sicemax, qinsur):
    """Schaake96 max infiltration (INFIL :7992-8087).
    Returns (pddum, runsrf)."""
    zsoil = jnp.asarray(cfg.zsoil, sh2o.dtype)
    dzs = jnp.asarray(cfg.dzs, sh2o.dtype)
    cvfrz = 3
    dt1 = cfg.dt / 86400.0
    smcav = p.smcmax - p.smcwlt
    dmax = dzs * smcav * (1.0 - (sh2o + sice - p.smcwlt) / smcav)
    dice = jnp.sum(dzs * sice)
    dd = jnp.sum(dmax)
    val = 1.0 - jnp.exp(-p.kdt * dt1)
    ddt = dd * val
    px = jnp.maximum(0.0, qinsur * cfg.dt)
    infmax = (px * (ddt / jnp.maximum(px + ddt, 1e-12))) / cfg.dt

    # frozen soil correction (:8040-8056): sum_{j=1}^{cvfrz-1} acrt^(cvfrz-j)/k!
    acrt = cvfrz * p.frzx / jnp.maximum(dice, 1e-10)
    s = 1.0
    for jj in range(1, cvfrz):
        k = 1
        for m in range(jj + 1, cvfrz):
            k *= m
        s = s + (acrt ** (cvfrz - jj)) / float(k)
    fcr = sel(dice > 1.0e-2,
                    1.0 - jnp.exp(-acrt) * s, 1.0)
    infmax = infmax * fcr

    _, wcnd1 = wdfcnd2(p, sh2o[0], sicemax)
    infmax = jnp.clip(infmax, wcnd1, None)
    infmax = jnp.minimum(infmax, px)
    runsrf = jnp.maximum(0.0, qinsur - infmax)
    pddum = qinsur - runsrf
    nopcp = qinsur <= 0.0
    return (sel(nopcp, 0.0, pddum), sel(nopcp, 0.0, runsrf))


def srt(cfg, p, pddum, etrani, qseva, sh2o, smc, zwt, fcr, sicemax,
        fcrmax, smcwtd):
    """Richards tridiagonal assembly (SRT :8089-8217).

    Returns (rhstt, ai, bi, ci, qdrain, wcnd) over (nsoil,).
    """
    nsoil = cfg.nsoil
    zsoil = jnp.asarray(cfg.zsoil, sh2o.dtype)

    if cfg.opt_inf == 1:
        wdf, wcnd = wdfcnd1(p, smc, fcr)
        smx = smc
        smxwtd = smcwtd
    else:
        wdf, wcnd = wdfcnd2(p, sh2o, sicemax)
        smx = sh2o
        smxwtd = smcwtd * sh2o[-1] / jnp.maximum(smc[-1], 1e-10)

    z_prev = jnp.concatenate([jnp.zeros((1,), zsoil.dtype), zsoil[:-1]])
    z_next = jnp.concatenate([zsoil[1:], zsoil[-1:]])
    smx_next = jnp.concatenate([smx[1:], smx[-1:]])
    denom = z_prev - zsoil
    temp1 = z_prev - z_next
    temp1 = put1(temp1, -1, 2.0 * take1(denom, nsoil - 1))
    ddz = 2.0 / temp1
    dsmdz = 2.0 * (smx - smx_next) / temp1

    # bottom gradient & drainage per OPT_RUN (:8168-8194)
    if cfg.opt_run in (1, 2):
        qdrain = jnp.zeros((), sh2o.dtype)
    elif cfg.opt_run == 3:
        qdrain = p.slope * wcnd[-1]
    elif cfg.opt_run == 4:
        qdrain = (1.0 - fcrmax) * wcnd[-1]
    else:  # opt_run == 5, MMF aquifer-coupled gradient
        deep_wt = zwt < (zsoil[-1] - denom[-1])
        smxbot_interp = smx[-1] - (smx[-1] - smxwtd) * denom[-1] * 2.0 / (
            denom[-1] + zsoil[-1] - zwt)
        smxbot = sel(deep_wt, smxbot_interp, smxwtd)
        dsmdz_bot = 2.0 * (smx[-1] - smxbot) / (2.0 * denom[-1])
        dsmdz = put1(dsmdz, -1, dsmdz_bot)
        qdrain = wdf[-1] * dsmdz_bot + wcnd[-1]

    wdf_prev = jnp.concatenate([wdf[:1], wdf[:-1]])
    wcnd_prev = jnp.concatenate([wcnd[:1], wcnd[:-1]])
    dsmdz_prev = jnp.concatenate([dsmdz[:1], dsmdz[:-1]])
    ddz_prev = jnp.concatenate([ddz[:1], ddz[:-1]])

    j = jnp.arange(nsoil)
    is_top = j == 0
    is_bot = j == nsoil - 1
    wflux_top = wdf * dsmdz + wcnd - pddum + etrani + qseva
    wflux_mid = (wdf * dsmdz + wcnd - wdf_prev * dsmdz_prev
                 - wcnd_prev + etrani)
    wflux_bot = -(wdf_prev * dsmdz_prev) - wcnd_prev + etrani + qdrain
    wflux = sel(is_top, wflux_top,
                      sel(is_bot, wflux_bot, wflux_mid))

    ai = sel(is_top, 0.0, -wdf_prev * ddz_prev / denom)
    ci_top = -wdf * ddz / denom
    bi = sel(is_top, wdf * ddz / denom, 0.0)
    ci = sel(is_top, -bi, sel(is_bot, 0.0, ci_top))
    bi = sel(is_top, bi, -(ai + ci))
    rhstt = wflux / (-denom)
    return rhstt, ai, bi, ci, qdrain, wcnd


def sstep(cfg, p, sh2o, smc, sice, zwt, rhstt, ai, bi, ci, dtfine,
          smcwtd, qdrain, deeprech):
    """Advance soil moisture + saturation-excess push
    (SSTEP :8220-8327).

    Returns (sh2o, smc, smcwtd, qdrain, deeprech, wplus).
    """
    nsoil = cfg.nsoil
    zsoil = jnp.asarray(cfg.zsoil, sh2o.dtype)
    dzs = jnp.asarray(cfg.dzs, sh2o.dtype)

    a = ai * dtfine
    b = 1.0 + bi * dtfine
    c = ci * dtfine
    d = rhstt * dtfine
    delta = tridiag_thomas(a, b, c, d)
    sh2o = sh2o + delta

    wplus = jnp.zeros((), sh2o.dtype)
    if cfg.opt_run == 5:
        deep_wt = zwt < (zsoil[-1] - dzs[-1])
        deeprech_d = deeprech + dtfine * qdrain
        smcwtd_s = smcwtd + dtfine * qdrain / dzs[-1]
        wplus_s = jnp.maximum(smcwtd_s - p.smcmax, 0.0) * dzs[-1]
        wminus_s = jnp.maximum(1.0e-4 - smcwtd_s, 0.0) * dzs[-1]
        smcwtd_s2 = jnp.clip(smcwtd_s, 1.0e-4, p.smcmax)
        sh2o_s = add1(sh2o, -1, wplus_s / dzs[-1])
        qdrain_s = qdrain - wplus_s / dtfine
        deeprech_s = deeprech - wminus_s

        smcwtd = sel(deep_wt, smcwtd, smcwtd_s2)
        deeprech = sel(deep_wt, deeprech_d, deeprech_s)
        sh2o = sel(deep_wt, sh2o, sh2o_s)
        qdrain = sel(deep_wt, qdrain, qdrain_s)

    # bottom-up saturation-excess bucket push (:8315-8325)
    for k in range(nsoil - 1, 0, -1):
        epore = jnp.maximum(1.0e-4, p.smcmax - sice[k])
        wp = jnp.maximum(sh2o[k] - epore, 0.0) * dzs[k]
        sh2o = put1(sh2o, k, jnp.minimum(epore, sh2o[k]))
        sh2o = add1(sh2o, k - 1, wp / dzs[k - 1])
    epore0 = jnp.maximum(1.0e-4, p.smcmax - sice[0])
    wplus = wplus + jnp.maximum(sh2o[0] - epore0, 0.0) * dzs[0]
    sh2o = put1(sh2o, 0, jnp.minimum(epore0, sh2o[0]))
    smc = sh2o + sice
    return sh2o, smc, smcwtd, qdrain, deeprech, wplus


class SoilWaterOut(NamedTuple):
    sh2o: jnp.ndarray
    smc: jnp.ndarray
    zwt: jnp.ndarray
    smcwtd: jnp.ndarray
    deeprech: jnp.ndarray
    runsrf: jnp.ndarray
    qdrain: jnp.ndarray
    runsub: jnp.ndarray
    wcnd: jnp.ndarray
    fcrmax: jnp.ndarray


def soilwater(cfg, p, qinsur, qseva, etrani, sice, sh2o, smc, zwt,
              smcwtd, deeprech) -> SoilWaterOut:
    """Soil-moisture driver (SOILWATER :7680-7936)."""
    nsoil = cfg.nsoil
    dt = cfg.dt
    dzs = jnp.asarray(cfg.dzs, sh2o.dtype)
    runsub = jnp.zeros((), sh2o.dtype)

    # snowmelt overflow clamp (:7757-7763)
    epore = jnp.maximum(1.0e-4, p.smcmax - sice)
    rsat = jnp.sum(jnp.maximum(0.0, sh2o - epore) * dzs)
    sh2o = jnp.minimum(epore, sh2o)

    # frozen-soil impermeable fraction (:7767-7771)
    a4 = 4.0
    fice = jnp.minimum(1.0, sice / p.smcmax)
    fcr = jnp.maximum(0.0, jnp.exp(-a4 * (1.0 - fice)) - jnp.exp(-a4)) / (
        1.0 - jnp.exp(-a4))
    sicemax = jnp.max(sice)
    fcrmax = jnp.max(fcr)

    if cfg.opt_run == 2:
        fff, rsbmx = 2.0, 4.0
        zwt = zwteq(cfg, p, sh2o)
        runsub = (1.0 - fcrmax) * rsbmx * jnp.exp(-C.TIMEAN) * jnp.exp(-fff * zwt)

    # urban impermeable surface (:7796)
    fcr = put1(fcr, 0, sel(p.is_urban, 0.95, fcr[0]))

    # surface runoff / infiltration partition (:7798-7846)
    if cfg.opt_run == 1:
        fsat = C.FSATMX * jnp.exp(-0.5 * 6.0 * (zwt - 2.0))
    elif cfg.opt_run == 5:
        fsat = C.FSATMX * jnp.exp(-0.5 * 6.0 * jnp.maximum(-2.0 - zwt, 0.0))
    elif cfg.opt_run == 2:
        fsat = C.FSATMX * jnp.exp(-0.5 * 2.0 * zwt)
    elif cfg.opt_run == 4:
        dztot = cumsum_small(dzs)
        within = jnp.concatenate([jnp.ones((1,), bool),
                                  dztot[:-1] < 2.0])
        smctot = jnp.sum(sel(within, smc * dzs, 0.0))
        dztot_c = jnp.sum(sel(within, dzs, 0.0))
        fsat = jnp.maximum(0.01, (smctot / dztot_c) / p.smcmax) ** 4.0
    else:
        fsat = jnp.zeros_like(zwt)

    if cfg.opt_run == 3:
        pddum, runsrf = infil(cfg, p, sh2o, sice, sicemax, qinsur)
    else:
        has_in = qinsur > 0.0
        runsrf = sel(has_in,
                           qinsur * ((1.0 - fcr[0]) * fsat + fcr[0]), 0.0)
        pddum = sel(has_in, qinsur - runsrf, 0.0)

    # sub-stepping (:7850-7878): NITER=3 (or 6) fine steps; run the max
    # 6 iterations with the last 3 masked when NITER==3.
    if cfg.opt_inf == 1:
        double_it = (pddum * dt) > (dzs[0] * p.smcmax)
        niter = sel(double_it, 6, 3)
    else:
        niter = jnp.ones((), jnp.int32)
    dtfine = dt / niter.astype(sh2o.dtype)

    qdrain_save = jnp.zeros((), sh2o.dtype)
    max_iter = 6 if cfg.opt_inf == 1 else 1

    def body(it, carry):
        sh2o, smc, smcwtd, deeprech, rsat, qdrain_save, wcnd_c = carry
        active = it < niter
        rhstt, ai, bi, ci, qdrain, wcnd = srt(
            cfg, p, pddum, etrani, qseva, sh2o, smc, zwt, fcr, sicemax,
            fcrmax, smcwtd)
        (sh2o_n, smc_n, smcwtd_n, qdrain_n, deeprech_n,
         wplus) = sstep(cfg, p, sh2o, smc, sice, zwt, rhstt, ai, bi, ci,
                        dtfine, smcwtd, qdrain, deeprech)
        u = lambda n, o: sel(active, n, o)
        return (u(sh2o_n, sh2o), u(smc_n, smc), u(smcwtd_n, smcwtd),
                u(deeprech_n, deeprech), u(rsat + wplus, rsat),
                u(qdrain_save + qdrain_n, qdrain_save), u(wcnd, wcnd_c))

    (sh2o, smc, smcwtd, deeprech, rsat, qdrain_save,
     wcnd) = jax.lax.fori_loop(
        0, max_iter, body,
        (sh2o, smc, smcwtd, deeprech, rsat, qdrain_save,
         jnp.zeros_like(sh2o)))
    qdrain = qdrain_save / niter.astype(sh2o.dtype)
    runsrf = runsrf * 1000.0 + rsat * 1000.0 / dt
    qdrain = qdrain * 1000.0

    # OPT_RUN=2: remove baseflow conductivity-weighted (:7890-7900)
    if cfg.opt_run == 2:
        wtsub = jnp.sum(wcnd * dzs)
        mh2o = runsub * dt * (wcnd * dzs) / jnp.maximum(wtsub, 1e-12)
        sh2o = sh2o - mh2o / (dzs * 1000.0)

    # WATMIN bottom-up deficit fill (:7905-7934)
    if cfg.opt_run != 1:
        mliq = sh2o * dzs * 1000.0
        watmin = 0.01
        for iz in range(nsoil - 1):
            xs = sel(mliq[iz] < 0.0, watmin - mliq[iz], 0.0)
            mliq = add1(mliq, iz, xs)
            mliq = add1(mliq, iz + 1, -xs)
        mliq_bot = take1(mliq, mliq.shape[0] - 1)
        xs = sel(mliq_bot < watmin, watmin - mliq_bot, 0.0)
        mliq = add1(mliq, -1, xs)
        runsub = runsub - xs / dt
        if cfg.opt_run == 5:
            deeprech = deeprech - xs * 1.0e-3
        sh2o = mliq / (dzs * 1000.0)

    return SoilWaterOut(sh2o, smc, zwt, smcwtd, deeprech, runsrf,
                        qdrain, runsub, wcnd, fcrmax)


class GroundwaterOut(NamedTuple):
    sh2o: jnp.ndarray
    zwt: jnp.ndarray
    wa: jnp.ndarray
    wt: jnp.ndarray
    qin: jnp.ndarray
    qdis: jnp.ndarray


def groundwater(cfg, p, sice, stc, wcnd, fcrmax, sh2o, zwt, wa,
                wt) -> GroundwaterOut:
    """SIMGM unconfined aquifer, OPT_RUN=1 (GROUNDWATER :8403-8585)."""
    nsoil = cfg.nsoil
    dt = cfg.dt
    zsoil = jnp.asarray(cfg.zsoil, sh2o.dtype)
    dzs = jnp.asarray(cfg.dzs, sh2o.dtype)
    rous, cmic = 0.2, 0.20

    dzmm = dzs * 1.0e3
    # node (middle) depth, positive down (:8470-8474)
    z_prev = jnp.concatenate([jnp.zeros((1,), zsoil.dtype), zsoil[:-1]])
    znode = -z_prev + 0.5 * (z_prev - zsoil)

    smc = sh2o + sice
    mliq = sh2o * dzmm
    epore = jnp.maximum(0.01, p.smcmax - sice)
    hk = 1.0e3 * wcnd

    # first unsaturated layer above the water table (:8485-8491)
    deeper = zwt <= -zsoil  # (nsoil,) True where wt at/below layer bottom
    # IWT = first iz (from 2..nsoil) with zwt <= -zsoil(iz), minus 1;
    # default NSOIL.  0-based iwt index:
    cand = jnp.arange(nsoil) + 1  # 1-based layer ids
    hit = deeper & (cand >= 2)
    # IWT = (first hitting iz) - 1, or NSOIL when none (:8485-8491)
    iwt1 = sel(jnp.any(hit),
                     first_true_idx(hit, nsoil) + 1 - 1, nsoil)  # 1-based
    iwt = iwt1 - 1  # 0-based

    fff, rsbmx = 6.0, 5.0
    qdis = (1.0 - fcrmax) * rsbmx * jnp.exp(-C.TIMEAN) * jnp.exp(-fff * (zwt - 2.0))

    g = lambda a: take1(a, iwt)
    s_node = jnp.clip(g(smc) / p.smcmax, 0.01, 1.0)
    smpfz = -p.psisat * 1000.0 * s_node ** (-p.bexp)
    smpfz = jnp.maximum(-120000.0, cmic * smpfz)

    ka = g(hk)
    wh_zwt = -zwt * 1.0e3
    wh = smpfz - g(znode) * 1.0e3
    qin = -ka * (wh_zwt - wh) / ((zwt - g(znode)) * 1.0e3)
    qin = jnp.clip(qin, -10.0 / dt, 10.0 / dt)

    wt = wt + (qin - qdis) * dt

    at_bottom = iwt == (nsoil - 1)
    # water table within the aquifer (:8523-8532)
    wa_b = wa + (qin - qdis) * dt
    zwt_b = (-float(cfg.zsoil[-1]) + 25.0) - wa_b / 1000.0 / rous
    mliq_b = add1(mliq, -1, -qin * dt)
    mliq_b = add1(mliq_b, -1, jnp.maximum(0.0, wa_b - 5000.0))
    wa_b2 = jnp.minimum(wa_b, 5000.0)

    # water table within soil layers (:8534-8552)
    near_bottom = iwt == (nsoil - 2)
    zwt_n = -float(cfg.zsoil[-1]) - (wt - rous * 1000.0 * 25.0) \
        / take1(epore, nsoil - 1) / 1000.0
    fill = jnp.arange(nsoil) >= (iwt + 2)
    ws = jnp.sum(sel(fill, epore * dzmm, 0.0))
    zwt_f = -take1(zsoil, iwt + 1) - (
        wt - rous * 1000.0 * 25.0 - ws) / take1(epore, iwt + 1) / 1000.0
    zwt_s = sel(near_bottom, zwt_n, zwt_f)
    wtsub = jnp.sum(hk * dzmm)
    mliq_s = mliq - qdis * dt * hk * dzmm / jnp.maximum(wtsub, 1e-12)

    wa = sel(at_bottom, wa_b2, wa)
    wt = sel(at_bottom, wa_b, wt)
    zwt = sel(at_bottom, zwt_b, zwt_s)
    mliq = sel(at_bottom, mliq_b, mliq_s)

    zwt = jnp.maximum(1.5, zwt)

    # WATMIN redistribution (:8556-8583)
    watmin = 0.01
    for iz in range(nsoil - 1):
        xs = sel(mliq[iz] < 0.0, watmin - mliq[iz], 0.0)
        mliq = add1(mliq, iz, xs)
        mliq = add1(mliq, iz + 1, -xs)
    mliq_bot = take1(mliq, mliq.shape[0] - 1)
    xs = sel(mliq_bot < watmin, watmin - mliq_bot, 0.0)
    mliq = add1(mliq, -1, xs)
    wa = wa - xs
    wt = wt - xs

    sh2o = mliq / dzmm
    return GroundwaterOut(sh2o, zwt, wa, wt, qin, qdis)


class ShallowWTOut(NamedTuple):
    smc: jnp.ndarray
    wtd: jnp.ndarray
    smcwtd: jnp.ndarray
    rech: jnp.ndarray
    qdrain: jnp.ndarray


def shallowwatertable(cfg, p, smceq, smc, wtd, smcwtd,
                      qdrain) -> ShallowWTOut:
    """MMF water-table diagnosis, OPT_RUN=5
    (SHALLOWWATERTABLE :8588-8718)."""
    nsoil = cfg.nsoil
    zsoil = jnp.asarray(cfg.zsoil, smc.dtype)
    dzs = jnp.asarray(cfg.dzs, smc.dtype)
    zsoil0 = jnp.concatenate([jnp.zeros((1,), smc.dtype), zsoil])  # 0..nsoil

    # find layer containing the water table: iwtd = last iz (nsoil..0,
    # descending) with wtd+eps < zsoil0(iz); Fortran loop semantics give
    # iz where the condition first holds scanning from nsoil down; if
    # none holds, iz = 0.
    cond = (wtd + 1.0e-6) < zsoil0  # (nsoil+1,)
    # scan iz = nsoil..1: exit at first true; fortran leaves iz=0 if never
    idxs = jnp.arange(nsoil + 1)
    hits = cond & (idxs >= 1)
    iwtd = sel(jnp.any(hits), last_true_idx(hits, 0), 0)
    kwtd = iwtd + 1

    g = take1

    in_layers = kwtd <= nsoil
    kk = jnp.minimum(kwtd, nsoil)      # 1-based layer id of wt layer
    k0 = kk - 1                         # 0-based
    smck = g(smc, k0)
    smceqk = g(smceq, k0)
    dzk = g(dzs, k0)
    z_iwtd = g(zsoil0, iwtd)
    z_kwtd = g(zsoil0, kk)

    rech = jnp.zeros((), smc.dtype)
    wtdold = wtd

    wet = smck > smceqk
    saturated = smck >= p.smcmax  # Fortran tests equality; >= is safer

    # case A: fully saturated -> wtd moves into layer above (:8645-8661)
    wtd_a1 = z_iwtd
    rech_a1 = -(wtdold - wtd_a1) * (p.smcmax - smceqk)
    iwtd_a = iwtd - 1
    kwtd_a = kk - 1
    ka0 = jnp.maximum(kwtd_a - 1, 0)
    smck_a = g(smc, ka0)
    smceq_a = g(smceq, ka0)
    dz_a = g(dzs, ka0)
    zi_a = g(zsoil0, jnp.maximum(iwtd_a, 0))
    zk_a = g(zsoil0, jnp.maximum(kwtd_a, 0))
    go_a = (kwtd_a >= 1) & (smck_a > smceq_a)
    wtd_a2 = jnp.minimum(
        (smck_a * dz_a - smceq_a * zi_a + p.smcmax * zk_a) /
        jnp.maximum(p.smcmax - smceq_a, 1e-9), zi_a)
    rech_a = sel(go_a,
                       rech_a1 - (wtd_a1 - wtd_a2) * (p.smcmax - smceq_a),
                       rech_a1)
    wtd_a = sel(go_a, wtd_a2, wtd_a1)

    # case B: wtd stays in layer (:8663-8668)
    wtd_b = jnp.minimum(
        (smck * dzk - smceqk * z_iwtd + p.smcmax * z_kwtd) /
        jnp.maximum(p.smcmax - smceqk, 1e-9), z_iwtd)
    rech_b = -(wtdold - wtd_b) * (p.smcmax - smceqk)

    # case C: wtd dropped to the layer below (:8670-8706)
    wtd_c1 = z_kwtd
    rech_c1 = -(wtdold - wtd_c1) * (p.smcmax - smceqk)
    kwtd_c = kk + 1
    iwtd_c = iwtd + 1
    in2 = kwtd_c <= nsoil
    kc0 = jnp.minimum(kwtd_c - 1, nsoil - 1)
    smck_c = g(smc, kc0)
    smceq_c = g(smceq, kc0)
    dz_c = g(dzs, kc0)
    zi_c = g(zsoil0, jnp.minimum(iwtd_c, nsoil))
    zk_c = g(zsoil0, jnp.minimum(kwtd_c, nsoil))
    wtd_c2w = jnp.minimum(
        (smck_c * dz_c - smceq_c * zi_c + p.smcmax * zk_c) /
        jnp.maximum(p.smcmax - smceq_c, 1e-9), zi_c)
    wtd_c2 = sel(smck_c > smceq_c, wtd_c2w, zk_c)
    rech_c2 = rech_c1 - (wtd_c1 - wtd_c2) * (p.smcmax - smceq_c)
    # below resolved layers: fictitious deep layer (:8692-8703)
    smceqdeep = p.smcmax * (-p.psisat / (-p.psisat - dzs[-1])) ** (1.0 / p.bexp)
    wtd_c3 = jnp.minimum(
        (smcwtd * dzs[-1] - smceqdeep * zsoil0[-1]
         + p.smcmax * (zsoil0[-1] - dzs[-1])) /
        jnp.maximum(p.smcmax - smceqdeep, 1e-9), zsoil0[-1])
    rech_c3 = rech_c1 - (wtd_c1 - wtd_c3) * (p.smcmax - smceqdeep)
    wtd_c = sel(in2, wtd_c2, wtd_c3)
    rech_c = sel(in2, rech_c2, rech_c3)
    iwtd_from_c = iwtd_c

    wtd_in = sel(wet, sel(saturated, wtd_a, wtd_b), wtd_c)
    rech_in = sel(wet, sel(saturated, rech_a, rech_b), rech_c)
    iwtd_in = sel(wet, sel(saturated, iwtd_a, iwtd), iwtd_from_c)

    # deep case: wtd below resolved soil (:8708-8727)
    deep_zone = wtd >= (zsoil0[-1] - dzs[-1])
    smceqdeep_d = smceqdeep
    wtd_d1 = jnp.minimum(
        (smcwtd * dzs[-1] - smceqdeep_d * zsoil0[-1]
         + p.smcmax * (zsoil0[-1] - dzs[-1])) /
        jnp.maximum(p.smcmax - smceqdeep_d, 1e-9), zsoil0[-1])
    rech_d1 = -(wtdold - wtd_d1) * (p.smcmax - smceqdeep_d)
    rech_d2a = -(wtdold - (zsoil0[-1] - dzs[-1])) * (p.smcmax - smceqdeep_d)
    dzup = (smceqdeep_d - smcwtd) * dzs[-1] / jnp.maximum(
        p.smcmax - smceqdeep_d, 1e-9)
    wtd_d2 = (zsoil0[-1] - dzs[-1]) - dzup
    rech_d2 = rech_d2a - (p.smcmax - smceqdeep_d) * dzup
    swd = smcwtd > smceqdeep_d
    wtd_d = sel(swd, wtd_d1, wtd_d2)
    rech_d = sel(swd, rech_d1, rech_d2)
    smcwtd_d = sel(swd, smcwtd, smceqdeep_d)

    use_deep = (~in_layers) & deep_zone
    wtd_new = sel(in_layers, wtd_in, sel(deep_zone, wtd_d, wtd))
    rech_new = sel(in_layers, rech_in,
                         sel(deep_zone, rech_d, 0.0))
    smcwtd_new = sel(use_deep, smcwtd_d, smcwtd)
    iwtd_new = sel(in_layers, iwtd_in, iwtd)

    smcwtd_new = sel(iwtd_new < nsoil, p.smcmax, smcwtd_new)

    return ShallowWTOut(smc, wtd_new, smcwtd_new, rech_new, qdrain)
