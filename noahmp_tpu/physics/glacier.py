"""Land-ice (glacier) column physics.

Reference: module_sf_noahmp_glacier.F90 — NOAHMP_GLACIER (:150-338),
ENERGY_GLACIER (:393-573), THERMOPROP_GLACIER (:575-646),
RADIATION_GLACIER (:704-790), GLACIER_FLUX (:942-1148),
PHASECHANGE_GLACIER (:1635-1924), WATER_GLACIER (:1924-2111),
ERROR_GLACIER (:2898).

The reference duplicates the whole snow/soil tree for glaciers; here
the shared kernels (CSNOW, SFCDIF1, tridiagonal, snowpack mechanics)
are reused and only the genuinely different physics (ice "soil"
properties, snow-only albedo, glacier flux solve, residual-heat
redistribution) is implemented — the SURVEY §2.3 design note.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from ..state.state import ColumnState, Forcing
from .common import MPE, sanitize, snso_layer_mask, dzsnso_from_zsnso, take1, put1, add1, sel
from .thermal import csnow
from .radiation import snow_age, snowalb_bats, snowalb_class
from .sfc_exchange import sfcdif1, sfcdif1_init
from .flux import _estsat
from .soil_temp import tsnosoi
from .snow import snowwater
from .sflx import SflxDiag

ZBOT_GLACIER = -8.0  # (:263)


def thermoprop_glacier(cfg, isnow, dzsnso, snowh, snice, snliq):
    """THERMOPROP_GLACIER (:575-646): ice-sheet 'soil' properties."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    sn = csnow(isnow, snice, snliq, dzsnso[:nsnow], nsnow)
    import numpy as _np
    zmid = jnp.asarray(_np.cumsum(cfg.dzs) - 0.5 * _np.asarray(cfg.dzs),
                       snowh.dtype)
    hcpct_soil = 1.0e6 * (0.8194 + 0.1309 * zmid)
    df_soil = 0.32333 + 0.10073 * zmid
    df = jnp.concatenate([sn.tksno, df_soil])
    hcpct = jnp.concatenate([sn.cvsno, hcpct_soil])
    act = snso_layer_mask(isnow, nsnow, nsoil)
    dz_safe = sanitize(dzsnso, act, 1.0)
    fact = sel(act, cfg.dt / (hcpct * dz_safe), 0.0)
    dz1 = dzsnso[nsnow]
    df1_nosnow = (df[nsnow] * dz1 + 0.35 * snowh) / (snowh + dz1)
    dz0 = dzsnso[nsnow - 1]
    df1_snow = (df[nsnow] * dz1 + df[nsnow - 1] * dz0) / jnp.maximum(dz0 + dz1, 1e-12)
    df = put1(df, nsnow, sel(isnow == 0, df1_nosnow, df1_snow))
    return df, hcpct, fact, sn


def radiation_glacier(cfg, tg, sneqvo, sneqv, cosz, qsnow, solad, solai,
                      albold, tauss):
    """RADIATION_GLACIER (:704-790): snow/bare-ice albedo only."""
    albice = jnp.asarray([0.80, 0.55], tg.dtype)
    tauss_new, fage = snow_age(cfg.dt, tg, sneqvo, sneqv, tauss)
    if cfg.opt_alb == 1:
        albsnd, albsni = snowalb_bats(jnp.ones_like(tg), cosz, fage)
        albold_new = albold
    else:
        alb, albsnd, albsni = snowalb_class(qsnow, cfg.dt, albold)
        albold_new = alb
    # unlike land ALBEDO (COSZ-gated, :2296), RADIATION_GLACIER ages
    # the snow "even when sun is not present" (:757-764): TAUSS and
    # ALBOLD advance every step

    fsno = sel(sneqv > 0.0, 1.0, 0.0)
    albsnd = albice * (1.0 - fsno) + albsnd * fsno
    albsni = albice * (1.0 - fsno) + albsni * fsno
    sag = jnp.sum(solad * (1.0 - albsnd) + solai * (1.0 - albsni))
    fsr = jnp.sum(solad * albsnd + solai * albsni)
    return sag, sag, fsr, albold_new, tauss_new  # (sag, fsa, fsr, ...)


def glacier_flux(cfg, isnow, df, dzsnso, z0m, zlvl, zpd, qair, sfctmp,
                 rhoair, sfcprs, ur, gamma, rsurf, lwdn, rhsur, smc,
                 eair, stc, sag, snowh, lathea, sh2o, cm, ch, tg, qsfc):
    """GLACIER_FLUX (:942-1148): Newton on TG, SFCDIF1 stability."""
    nsnow = cfg.nsnow
    emg = 0.98
    cir = emg * C.SB
    top = isnow + nsnow
    df_top = take1(df, top)
    dz_top = take1(dzsnso, top)
    stc_top = take1(stc, top)
    cgh = 2.0 * df_top / sel(dz_top > 0, dz_top, 1.0)
    dtype = tg.dtype
    z = jnp.zeros((), dtype)

    def body(it, carry):
        tgb, cm_c, ch_c, qsfc_c, sf, h, irb, shb, evb, ghb, estg, csh, cev = carry
        z0h = z0m
        out = sfcdif1(it, sf, sfctmp, rhoair, h, qair, zlvl, zpd, z0m,
                      z0h, ur)
        sf_n, cm_n, ch_n = out.state, out.cm, out.ch
        rahb = jnp.maximum(1.0, 1.0 / (ch_n * ur))
        rawb = rahb
        estg_n, destg = _estsat(tgb)
        csh_n = rhoair * C.CPAIR / rahb
        cev_n = rhoair * C.CPAIR / gamma / (rsurf + rawb)
        irb_n = cir * tgb ** 4 - emg * lwdn
        shb_n = csh_n * (tgb - sfctmp)
        evb_n = cev_n * (estg_n * rhsur - eair)
        ghb_n = cgh * (tgb - stc_top)
        b = sag - irb_n - shb_n - evb_n - ghb_n
        a = 4.0 * cir * tgb ** 3 + csh_n + cev_n * destg + cgh
        dtg = b / a
        irb_n += 4.0 * cir * tgb ** 3 * dtg
        shb_n += csh_n * dtg
        evb_n += cev_n * destg * dtg
        ghb_n += cgh * dtg
        tgb_n = tgb + dtg
        h_n = csh_n * (tgb_n - sfctmp)
        estg2, _ = _estsat(tgb_n)
        qsfc_n = 0.622 * (estg2 * rhsur) / (sfcprs - 0.378 * (estg2 * rhsur))
        return (tgb_n, cm_n, ch_n, qsfc_n, sf_n, h_n, irb_n, shb_n,
                evb_n, ghb_n, estg2, csh_n, cev_n)

    init = (tg, cm, ch, qsfc, sfcdif1_init(dtype), z, z, z, z, z, z,
            jnp.ones((), dtype), jnp.ones((), dtype))
    (tgb, cm, ch, qsfc, sf, h, irb, shb, evb, ghb, estg, csh,
     cev) = jax.lax.fori_loop(0, 5, body, init)

    sice = smc - sh2o
    if cfg.opt_stc == 1:
        cap = ((jnp.max(sice) > 0.0) | (snowh > 0.0)) & (tgb > C.TFRZ)
        tgb_c = jnp.full_like(tgb, C.TFRZ)
        irb_c = cir * tgb_c ** 4 - emg * lwdn
        shb_c = csh * (tgb_c - sfctmp)
        evb_c = cev * (estg * rhsur - eair)
        ghb_c = sag - (irb_c + shb_c + evb_c)
        tgb = sel(cap, tgb_c, tgb)
        irb = sel(cap, irb_c, irb)
        shb = sel(cap, shb_c, shb)
        evb = sel(cap, evb_c, evb)
        ghb = sel(cap, ghb_c, ghb)

    z0h = z0m
    ehb2 = sf.fv * C.VKC / (jnp.log((2.0 + z0h) / z0h) - sf.fh2)
    low = ehb2 < 1.0e-5
    t2m = sel(low, tgb, tgb - shb / (rhoair * C.CPAIR)
                    / jnp.maximum(ehb2, 1e-10))
    q2e = sel(low, qsfc, qsfc - evb / (lathea * rhoair)
                    * (1.0 / jnp.maximum(ehb2, 1e-10) + rsurf))
    ch_out = 1.0 / jnp.maximum(1.0, 1.0 / (ch * ur))
    return tgb, cm, ch_out, qsfc, irb, shb, evb, ghb, t2m, q2e, ehb2


def phasechange_glacier(cfg, isnow, fact, dzsnso, stc, snice, snliq,
                        sneqv, snowh, smc, sh2o):
    """PHASECHANGE_GLACIER (:1635-1924) incl. residual heat/cold
    redistribution between ice layers."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    n = nsnow + nsoil
    dt = cfg.dt
    act = snso_layer_mask(isnow, nsnow, nsoil)
    j = jnp.arange(n)
    is_snow_layer = j < nsnow
    dz_soil = dzsnso[nsnow:]

    mice = jnp.concatenate([snice, (smc - sh2o) * dz_soil * 1000.0])
    mliq = jnp.concatenate([snliq, sh2o * dz_soil * 1000.0])
    wice0, wliq0 = mice, mliq
    wmass0 = mice + mliq

    imelt = jnp.zeros(n, jnp.int32)
    imelt = sel(act & (mice > 0.0) & (stc >= C.TFRZ), 1, imelt)
    imelt = sel(act & (mliq > 0.0) & (stc < C.TFRZ), 2, imelt)
    layerless = (isnow == 0) & (sneqv > 0.0)
    imelt = sel((j == nsnow) & layerless & (stc >= C.TFRZ), 1, imelt)

    fact_s = sanitize(fact, act & (fact != 0.0), 1.0)
    hm = sel(imelt > 0, (stc - C.TFRZ) / fact_s, 0.0)
    stc = sel(imelt > 0, C.TFRZ, stc)
    bad = ((imelt == 1) & (hm < 0.0)) | ((imelt == 2) & (hm > 0.0))
    hm = sel(bad, 0.0, hm)
    imelt = sel(bad, 0, imelt)
    xm = hm * dt / C.HFUS

    # layerless snow melt (:1745-1765)
    xm1, hm1 = xm[nsnow], hm[nsnow]
    do_ll = layerless & (xm1 > 0.0)
    temp1 = sneqv
    sneqv_ll = jnp.maximum(0.0, temp1 - xm1)
    propor = sneqv_ll / sel(temp1 > 0, temp1, 1.0)
    snowh_ll = jnp.maximum(0.0, propor * snowh)
    heatr_ll = hm1 - C.HFUS * (temp1 - sneqv_ll) / dt
    xm1_new = sel(heatr_ll > 0.0, heatr_ll * dt / C.HFUS, 0.0)
    hm1_new = sel(heatr_ll > 0.0, heatr_ll, 0.0)
    qmelt = sel(do_ll, jnp.maximum(0.0, temp1 - sneqv_ll) / dt, 0.0)
    ponding = sel(do_ll, temp1 - sneqv_ll, 0.0)
    sneqv = sel(do_ll, sneqv_ll, sneqv)
    snowh = sel(do_ll, snowh_ll, snowh)
    xm = sel(do_ll & (j == nsnow), xm1_new, xm)
    hm = sel(do_ll & (j == nsnow), hm1_new, hm)

    engaged = (imelt > 0) & (jnp.abs(hm) > 0.0)
    mice_melt = jnp.maximum(0.0, wice0 - xm)
    mice_frz = jnp.minimum(wmass0, wice0 - xm)
    mice_new = sel(xm > 0.0, mice_melt,
                         sel(xm < 0.0, mice_frz, mice))
    mice = sel(engaged, mice_new, mice)
    heatr = sel(engaged, hm - C.HFUS * (wice0 - mice) / dt, 0.0)
    mliq = sel(engaged, jnp.maximum(0.0, wmass0 - mice), mliq)
    adj = engaged & (jnp.abs(heatr) > 0.0)
    stc = sel(adj, stc + fact_s * heatr, stc)
    stc = sel(adj & is_snow_layer & (mliq * mice > 0.0), C.TFRZ, stc)
    qmelt = qmelt + jnp.sum(
        sel(engaged & is_snow_layer,
                  jnp.maximum(0.0, wice0 - mice) / dt, 0.0))

    # residual heat/cold redistribution between ice layers (:1805-1911):
    # pairwise J,K exchange; unrolled O(nsoil^2) masked ops.
    stc_s = stc[nsnow:]
    fact_soil = fact_s[nsnow:]
    mice_s = mice[nsnow:]
    mliq_s = mliq[nsnow:]
    wmass0_s = wmass0[nsnow:]

    def redistribute(stc_s, sign):
        # sign=+1: move excess heat into cold layers; -1: excess cold
        run = jnp.any(stc_s > C.TFRZ) & jnp.any(stc_s < C.TFRZ)
        for jj in range(nsoil):
            cond_j = (stc_s[jj] > C.TFRZ) if sign > 0 else (stc_s[jj] < C.TFRZ)
            heat_j = (stc_s[jj] - C.TFRZ) / fact_soil[jj]
            for k in range(nsoil):
                if k == jj:
                    continue
                if sign > 0:
                    cond_k = (stc_s[k] < C.TFRZ) & (heat_j > 0.1)
                else:
                    cond_k = (stc_s[k] > C.TFRZ) & (heat_j < -0.1)
                on = run & cond_j & cond_k
                heat_k = (stc_s[k] - C.TFRZ) / fact_soil[k]
                absorbs = (jnp.abs(heat_k) > jnp.abs(heat_j)) if sign > 0 \
                    else (heat_k > jnp.abs(heat_j))
                hk_new = sel(absorbs, heat_k + heat_j, 0.0)
                hj_new = sel(absorbs, 0.0, heat_j + heat_k)
                stc_k_new = sel(absorbs,
                                      C.TFRZ + hk_new * fact_soil[k],
                                      C.TFRZ)
                stc_s = put1(stc_s, k, sel(on, stc_k_new, stc_s[k]))
                heat_j = sel(on, hj_new, heat_j)
            stc_s = put1(stc_s, jj, 
                sel(run & cond_j, C.TFRZ + heat_j * fact_soil[jj],
                          stc_s[jj]))
        return stc_s

    stc_s = redistribute(stc_s, +1)
    stc_s = redistribute(stc_s, -1)

    # melt ice / freeze liquid against remaining residuals (:1855-1911)
    def melt_freeze(stc_s, mice_s, mliq_s, sign):
        if sign > 0:
            run = jnp.any(stc_s > C.TFRZ) & jnp.any(mice_s > 0.0)
        else:
            run = jnp.any(stc_s < C.TFRZ) & jnp.any(mliq_s > 0.0)
        for jj in range(nsoil):
            cond_j = (stc_s[jj] > C.TFRZ) if sign > 0 else (stc_s[jj] < C.TFRZ)
            heat_j = (stc_s[jj] - C.TFRZ) / fact_soil[jj]
            xm_j = heat_j * dt / C.HFUS
            for k in range(nsoil):
                if k == jj:
                    continue
                if sign > 0:
                    cond_k = (mice_s[k] > 0.0) & (xm_j > 0.1)
                    absorbs = mice_s[k] > xm_j
                    mice_k_new = sel(absorbs, mice_s[k] - xm_j, 0.0)
                    xm_new = sel(absorbs, 0.0, xm_j - mice_s[k])
                else:
                    cond_k = (mliq_s[k] > 0.0) & (xm_j < -0.1)
                    absorbs = mliq_s[k] > jnp.abs(xm_j)
                    mice_k_new = sel(absorbs, mice_s[k] - xm_j,
                                           wmass0_s[k])
                    xm_new = sel(absorbs, 0.0, xm_j + mliq_s[k])
                on = run & cond_j & cond_k
                mice_s = put1(mice_s, k, sel(on, mice_k_new, mice_s[k]))
                mliq_s = put1(mliq_s, k, sel(
                    on, jnp.maximum(0.0, wmass0_s[k] - mice_s[k]), mliq_s[k]))
                stc_s = put1(stc_s, k, sel(on, C.TFRZ, stc_s[k]))
                xm_j = sel(on, xm_new, xm_j)
            heat_j = xm_j * C.HFUS / dt
            stc_s = put1(stc_s, jj, 
                sel(run & cond_j, C.TFRZ + heat_j * fact_soil[jj],
                          stc_s[jj]))
        return stc_s, mice_s, mliq_s

    stc_s, mice_s, mliq_s = melt_freeze(stc_s, mice_s, mliq_s, +1)
    stc_s, mice_s, mliq_s = melt_freeze(stc_s, mice_s, mliq_s, -1)

    stc = jnp.concatenate([stc[:nsnow], stc_s])
    snice_new = mice[:nsnow]
    snliq_new = mliq[:nsnow]
    dz_s = sanitize(dz_soil, dz_soil > 0, 1.0)
    sh2o_new = jnp.clip(mliq_s / (1000.0 * dz_s), 0.0, 1.0)
    smc_new = jnp.ones_like(sh2o_new)  # glacier 'soil' is ice (:1919)
    imelt_out = imelt
    return (stc, snice_new, snliq_new, sneqv, snowh, smc_new, sh2o_new,
            qmelt, imelt_out, ponding)


def noahmp_glacier(cfg, p, s: ColumnState, f: Forcing):
    """One glacier-column timestep (NOAHMP_GLACIER :150-338).

    Same (state, forcing) -> (state, SflxDiag) signature as
    noahmp_sflx, so the grid driver selects per-cell by mask.
    """
    nsnow, nsoil = cfg.nsnow, cfg.nsoil

    # deep temperature capped at -10C for land ice
    # (module_sf_noahmpdrv.F90:556: TBOT = MIN(TBOT, 263.15))
    tbot = jnp.minimum(f.tbot, 263.15)

    # ATM_GLACIER (:340-391): no convective split, no night-SW kept
    pair = f.sfcprs
    thair = f.sfctmp * (f.sfcprs / pair) ** (C.RAIR / C.CPAIR)
    qair = f.q2
    eair = qair * f.sfcprs / (0.622 + 0.378 * qair)
    rhoair = (f.sfcprs - 0.378 * eair) / (C.RAIR * f.sfctmp)
    swdown = sel(f.cosz <= 0.0, 0.0, f.soldn)
    solad = jnp.stack([swdown * 0.7 * 0.5, swdown * 0.7 * 0.5])
    solai = jnp.stack([swdown * 0.3 * 0.5, swdown * 0.3 * 0.5])

    beg_wb = s.sneqv
    dzsnso = dzsnso_from_zsnso(s.zsnso, s.isnow, nsnow, nsoil)

    # ENERGY_GLACIER (:393-573)
    ur = jnp.maximum(jnp.sqrt(f.uu ** 2 + f.vv ** 2), 1.0)
    z0mg = jnp.asarray(C.Z0SNO, s.tg.dtype)
    zpd = s.snowh
    zlvl = zpd + cfg.zlvl

    df, hcpct, fact, sn = thermoprop_glacier(cfg, s.isnow, dzsnso,
                                             s.snowh, s.snice, s.snliq)
    sag, fsa, fsr, albold, tauss = radiation_glacier(
        cfg, s.tg, s.sneqvo, s.sneqv, f.cosz, s.qsnow, solad, solai,
        s.albold, s.tauss)

    emg = 0.98
    rhsur = jnp.ones_like(s.tg)
    rsurf = jnp.ones_like(s.tg)
    lathea = jnp.asarray(C.HSUB, s.tg.dtype)
    gamma = C.CPAIR * f.sfcprs / (0.622 * lathea)

    (tg, cm, ch, qsfc, irb, shb, evb, ghb, t2m, q2e,
     ehb2) = glacier_flux(cfg, s.isnow, df, dzsnso, z0mg, zlvl, zpd,
                          qair, f.sfctmp, rhoair, f.sfcprs, ur, gamma,
                          rsurf, f.lwdn, rhsur, s.smc, eair, s.stc, sag,
                          s.snowh, lathea, s.sh2o, s.cm, s.ch, s.tg,
                          s.qsfc)
    fira, fsh, fgev, ssoil = irb, shb, evb, ghb
    fire = f.lwdn + fira
    emissi = jnp.asarray(emg, s.tg.dtype)
    trad = ((fire - (1.0 - emissi) * f.lwdn) / (emissi * C.SB)) ** 0.25

    class _PZ:  # minimal param shim for tsnosoi (needs .zbot)
        zbot = ZBOT_GLACIER

    stc = tsnosoi(cfg, _PZ, s.isnow, s.zsnso, dzsnso, s.stc, tbot,
                  ssoil, df, hcpct, s.snowh)

    if cfg.opt_stc == 2:
        tg = sel((s.snowh > 0.05) & (tg > C.TFRZ), C.TFRZ, tg)

    (stc, snice, snliq, sneqv, snowh, smc, sh2o, qmelt, imelt,
     ponding) = phasechange_glacier(cfg, s.isnow, fact, dzsnso, stc,
                                    s.snice, s.snliq, s.sneqv, s.snowh,
                                    s.smc, s.sh2o)

    sice = jnp.maximum(0.0, smc - sh2o)
    sneqvo = sneqv
    qvap = jnp.maximum(fgev / lathea, 0.0)
    qdew = jnp.abs(jnp.minimum(fgev / lathea, 0.0))
    edir = qvap - qdew

    # WATER_GLACIER (:1924-2111)
    dt = cfg.dt
    if cfg.opt_snf == 1:
        fpice = sel(
            f.sfctmp > C.TFRZ + 2.5, 0.0,
            sel(f.sfctmp <= C.TFRZ + 0.5, 1.0,
                      sel(f.sfctmp <= C.TFRZ + 2.0,
                                1.0 - (-54.632 + 0.2 * f.sfctmp), 0.6)))
    elif cfg.opt_snf == 2:
        fpice = sel(f.sfctmp >= C.TFRZ + 2.2, 0.0, 1.0)
    else:
        fpice = sel(f.sfctmp >= C.TFRZ, 0.0, 1.0)
    bdfall = jnp.minimum(120.0, 67.92 + 51.25 * jnp.exp((f.sfctmp - C.TFRZ) / 2.59))
    qrain = f.prcp * (1.0 - fpice)
    qsnow = f.prcp * fpice
    snowhin = qsnow / bdfall
    qsnsub, qsnfro = qvap, qdew

    sice_save, sh2o_save = sice, sh2o
    sw = snowwater(cfg, s.isnow, snice, snliq, stc, s.zsnso, dzsnso,
                   sneqv, snowh, sice, sh2o, imelt, f.ficeold, qsnow,
                   qsnfro, qsnsub, qrain, snowhin, f.sfctmp,
                   glacier=True)

    runsrf = (ponding + sw.ponding1 + sw.ponding2) / dt
    runsrf = runsrf + sel(sw.isnow == 0, sw.qsnbot + qrain,
                                sw.qsnbot)
    dzs = jnp.asarray(cfg.dzs, s.tg.dtype)
    replace = jnp.sum(dzs * (sw.sice - sice_save + sw.sh2o - sh2o_save)) \
        * 1000.0 / dt
    sice_out = jnp.minimum(1.0, sice_save)
    sh2o_out = 1.0 - sice_out
    runsub = sw.snoflow + replace
    smc_out = sice_out + sh2o_out

    # ERROR_GLACIER (:2898): energy & SWE-only water closure
    errsw = swdown - (fsa + fsr)
    erreng = sag - (fira + fsh + fgev + ssoil)
    errwat = sw.sneqv - beg_wb - (f.prcp - edir - runsrf - runsub) * dt

    tiny = (sw.snowh <= 1.0e-6) | (sw.sneqv <= 1.0e-3)
    snowh_f = sel(tiny, 0.0, sw.snowh)
    sneqv_f = sel(tiny, 0.0, sw.sneqv)
    albedo = sel(swdown != 0.0,
                       fsr / sel(swdown != 0, swdown, 1.0), -999.9)

    s_new = ColumnState(
        isnow=sw.isnow, stc=sw.stc, zsnso=sw.zsnso, snice=sw.snice,
        snliq=sw.snliq, sneqv=sneqv_f, sneqvo=sneqvo, snowh=snowh_f,
        smc=smc_out, sh2o=sh2o_out, canliq=s.canliq * 0, canice=s.canice * 0,
        tv=tg, eah=s.eah, tah=s.tah, fwet=s.fwet * 0, tg=tg, qsfc=qsfc,
        qsnow=qsnow, albold=albold, tauss=tauss, cm=cm, ch=ch,
        zwt=s.zwt, wa=s.wa, wt=s.wt, wslake=s.wslake, smcwtd=s.smcwtd,
        deeprech=s.deeprech, rech=s.rech, lfmass=s.lfmass * 0,
        rtmass=s.rtmass * 0, stmass=s.stmass * 0, wood=s.wood * 0,
        stblcp=s.stblcp * 0, fastcp=s.fastcp * 0, lai=s.lai * 0,
        sai=s.sai * 0)

    z = jnp.zeros_like(tg)
    d = SflxDiag(
        fsa=fsa, fsr=fsr, fira=fira, fsh=fsh, ssoil=ssoil, fcev=z,
        fgev=fgev, fctr=z, ecan=z, etran=z, edir=edir, trad=trad,
        tgb=tg, tgv=tg, t2mv=t2m, t2mb=t2m, q2v=q2e, q2b=q2e,
        runsrf=runsrf, runsub=runsub, apar=z, psn=z, sav=z, sag=sag,
        fsno=sel(sneqv_f > 0, 1.0, 0.0), nee=z, gpp=z, npp=z,
        fveg=z, albedo=albedo, qsnbot=sw.qsnbot, ponding=ponding,
        ponding1=sw.ponding1, ponding2=sw.ponding2, rssun=z, rssha=z,
        bgap=z, wgap=z, chv=ch, chb=ch, emissi=emissi, shg=z, shc=z,
        shb=shb, evg=z, evb=evb, ghv=z, ghb=ghb, irg=z, irc=z, irb=irb,
        tr=z, evc=z, chleaf=z, chuc=z, chv2=ehb2, chb2=ehb2,
        fpice=fpice, qmelt=qmelt, t2m=t2m, ts=tg, elai=z, esai=z,
        cmc=z, qsnow=qsnow, errsw=errsw, erreng=erreng, errwat=errwat)
    return s_new, d
