"""Scalar oracle: the composed glacier column step — NOAHMP_GLACIER
(:150-338), ATM_GLACIER (:340-390), ENERGY_GLACIER (:393-573),
THERMOPROP/CSNOW_GLACIER (:575-702), RADIATION_GLACIER + SNOW_AGE +
SNOWALB_BATS/CLASS (:704-940), GLACIER_FLUX (:942-1148) with ESAT
(:1150-1199) and SFCDIF1_GLACIER (:1202-1358), TSNOSOI/HRT/HSTEP/
ROSR12_GLACIER (:1360-1632), PHASECHANGE_GLACIER (:1635-1922),
WATER_GLACIER (:1924-2110) with SNOWWATER_GLACIER and its snowpack
mechanics (:2113-2895), and ERROR_GLACIER (:2898-2972), all of
module_sf_noahmp_glacier.F90.

State is a dict of python floats / Fortran-indexed dicts advanced in
double precision.  Layered dicts run j = -NSNOW+1 .. NSOIL (snow
layers j<=0, soil layers j>=1).  Test fixture only.
"""

import math

from . import (GRAV, TFRZ, HSUB, CPAIR, SB, RAIR, VKC, DENICE, DENH2O,
               CICE, CWAT, HFUS, SWEMX, SSI, Z0SNO)

MPE = 1e-6
ZBOT = -8.0        # NOAHMP_GLACIER local (:260)
EMG = 0.98         # (:515)


# ------------------------------------------------------------------
def atm_glacier(sfcprs, sfctmp, q2, soldn, cosz):
    """ATM_GLACIER (:340-390)."""
    pair = sfcprs
    thair = sfctmp * (sfcprs / pair) ** (RAIR / CPAIR)
    qair = q2                           # driver already specific humidity
    eair = qair * sfcprs / (0.622 + 0.378 * qair)
    rhoair = (sfcprs - 0.378 * eair) / (RAIR * sfctmp)
    swdown = 0.0 if cosz <= 0.0 else soldn
    solad = {1: swdown * 0.7 * 0.5, 2: swdown * 0.7 * 0.5}
    solai = {1: swdown * 0.3 * 0.5, 2: swdown * 0.3 * 0.5}
    return thair, qair, eair, rhoair, solad, solai, swdown


def csnow_glacier(isnow, nsnow, snice, snliq, dzsnso):
    """CSNOW_GLACIER (:648-702)."""
    snicev, snliqv, epore, cvsno, tksno = {}, {}, {}, {}, {}
    for iz in range(isnow + 1, 1):
        snicev[iz] = min(1.0, snice[iz] / (dzsnso[iz] * DENICE))
        epore[iz] = 1.0 - snicev[iz]
        snliqv[iz] = min(epore[iz], snliq[iz] / (dzsnso[iz] * DENH2O))
        bd = (snice[iz] + snliq[iz]) / dzsnso[iz]
        cvsno[iz] = CICE * snicev[iz] + CWAT * snliqv[iz]
        tksno[iz] = 3.2217e-6 * bd ** 2.0
    return tksno, cvsno, snicev, snliqv, epore


def thermoprop_glacier(nsoil, nsnow, isnow, dzsnso, dt, snowh, snice,
                       snliq):
    """THERMOPROP_GLACIER (:575-645)."""
    tksno, cvsno, snicev, snliqv, epore = csnow_glacier(
        isnow, nsnow, snice, snliq, dzsnso)
    df, hcpct, fact = {}, {}, {}
    for iz in range(isnow + 1, 1):
        df[iz] = tksno[iz]
        hcpct[iz] = cvsno[iz]
    for iz in range(1, nsoil + 1):
        zmid = 0.5 * dzsnso[iz]
        for iz2 in range(1, iz):
            zmid += dzsnso[iz2]
        hcpct[iz] = 1.0e6 * (0.8194 + 0.1309 * zmid)
        df[iz] = 0.32333 + 0.10073 * zmid
    for iz in range(isnow + 1, nsoil + 1):
        fact[iz] = dt / (hcpct[iz] * dzsnso[iz])
    if isnow == 0:
        df[1] = (df[1] * dzsnso[1] + 0.35 * snowh) / (snowh + dzsnso[1])
    else:
        df[1] = (df[1] * dzsnso[1] + df[0] * dzsnso[0]) / \
            (dzsnso[0] + dzsnso[1])
    return df, hcpct, fact


def snow_age_glacier(dt, tg, sneqvo, sneqv, tauss):
    """SNOW_AGE_GLACIER (:794-845)."""
    if sneqv <= 0.0:
        tauss = 0.0
    elif sneqv > 800.0:
        tauss = 0.0
    else:
        dela0 = 1.0e-6 * dt
        arg = 5.0e3 * (1.0 / TFRZ - 1.0 / tg)
        age1 = math.exp(arg)
        age2 = math.exp(min(0.0, 10.0 * arg))
        age3 = 0.3
        tage = age1 + age2 + age3
        dela = dela0 * tage
        dels = max(0.0, sneqv - sneqvo) / SWEMX
        sge = (tauss + dela) * (1.0 - dels)
        tauss = max(0.0, sge)
    fage = tauss / (tauss + 1.0)
    return tauss, fage


def snowalb_bats_glacier(cosz, fage):
    """SNOWALB_BATS_GLACIER (:848-894)."""
    c1, c2 = 0.2, 0.5
    sl = 2.0
    sl1 = 1.0 / sl
    sl2 = 2.0 * sl
    cf1 = (1.0 + sl1) / (1.0 + sl2 * cosz) - sl1
    fzen = max(cf1, 0.0)
    albsni = {1: 0.95 * (1.0 - c1 * fage), 2: 0.65 * (1.0 - c2 * fage)}
    albsnd = {1: albsni[1] + 0.4 * fzen * (1.0 - albsni[1]),
              2: albsni[2] + 0.4 * fzen * (1.0 - albsni[2])}
    return albsnd, albsni


def snowalb_class_glacier(qsnow, dt, albold):
    """SNOWALB_CLASS_GLACIER (:897-940)."""
    alb = 0.55 + (albold - 0.55) * math.exp(-0.01 * dt / 3600.0)
    if qsnow > 0.0:
        alb = alb + min(qsnow * dt, SWEMX) * (0.84 - alb) / SWEMX
    return alb, {1: alb, 2: alb}, {1: alb, 2: alb}


def radiation_glacier(opts, dt, tg, sneqvo, sneqv, cosz, qsnow, solad,
                      solai, albold, tauss):
    """RADIATION_GLACIER (:704-792)."""
    albice = {1: 0.80, 2: 0.55}
    tauss, fage = snow_age_glacier(dt, tg, sneqvo, sneqv, tauss)
    albsnd = {1: 0.0, 2: 0.0}
    albsni = {1: 0.0, 2: 0.0}
    if opts["opt_alb"] == 1:
        albsnd, albsni = snowalb_bats_glacier(cosz, fage)
    if opts["opt_alb"] == 2:
        alb, albsnd, albsni = snowalb_class_glacier(qsnow, dt, albold)
        albold = alb
    sag = fsa = fsr = 0.0
    fsno = 1.0 if sneqv > 0.0 else 0.0
    for ib in (1, 2):
        d = albice[ib] * (1.0 - fsno) + albsnd[ib] * fsno
        i = albice[ib] * (1.0 - fsno) + albsni[ib] * fsno
        ab = solad[ib] * (1.0 - d) + solai[ib] * (1.0 - i)
        sag += ab
        fsa += ab
        fsr += solad[ib] * d + solai[ib] * i
    return sag, fsa, fsr, albold, tauss


def esat(t):
    """ESAT (:1150-1199)."""
    a = (6.107799961, 4.436518521e-01, 1.428945805e-02, 2.650648471e-04,
         3.031240396e-06, 2.034080948e-08, 6.136820929e-11)
    b = (6.109177956, 5.034698970e-01, 1.886013408e-02, 4.176223716e-04,
         5.824720280e-06, 4.838803174e-08, 1.838826904e-10)
    c = (4.438099984e-01, 2.857002636e-02, 7.938054040e-04,
         1.215215065e-05, 1.036561403e-07, 3.532421810e-10,
         -7.090244804e-13)
    d = (5.030305237e-01, 3.773255020e-02, 1.267995369e-03,
         2.477563108e-05, 3.005693132e-07, 2.158542548e-09,
         7.131097725e-12)
    poly = lambda cs: 100.0 * (cs[0] + t * (cs[1] + t * (cs[2] + t * (
        cs[3] + t * (cs[4] + t * (cs[5] + t * cs[6]))))))
    return poly(a), poly(b), poly(c), poly(d)


def sfcdif1_glacier(it, zlvl, zpd, z0h, z0m, qair, sfctmp, h, rhoair,
                    ur, st):
    """SFCDIF1_GLACIER (:1202-1358).  ``st`` carries the
    inter-iteration state (moz, mozsgn, fm, fh, fm2, fh2, fv)."""
    mozold = st["moz"]
    tmpcm = math.log((zlvl - zpd) / z0m)
    tmpch = math.log((zlvl - zpd) / z0h)
    tmpcm2 = math.log((2.0 + z0m) / z0m)
    tmpch2 = math.log((2.0 + z0h) / z0h)
    if it == 1:
        st["fv"] = 0.0
        st["moz"] = 0.0
        moz2 = 0.0
    else:
        tvir = (1.0 + 0.61 * qair) * sfctmp
        tmp1 = VKC * (GRAV / tvir) * h / (rhoair * CPAIR)
        if abs(tmp1) <= MPE:
            tmp1 = MPE
        mol = -1.0 * st["fv"] ** 3 / tmp1
        st["moz"] = min((zlvl - zpd) / mol, 1.0)
        moz2 = min((2.0 + z0h) / mol, 1.0)
    if mozold * st["moz"] < 0.0:
        st["mozsgn"] += 1
    if st["mozsgn"] >= 2:
        st["moz"] = 0.0
        st["fm"] = 0.0
        st["fh"] = 0.0
        moz2 = 0.0
        st["fm2"] = 0.0
        st["fh2"] = 0.0
    moz = st["moz"]
    if moz < 0.0:
        tmp1 = (1.0 - 16.0 * moz) ** 0.25
        tmp2 = math.log((1.0 + tmp1 * tmp1) / 2.0)
        tmp3 = math.log((1.0 + tmp1) / 2.0)
        fmnew = 2.0 * tmp3 + tmp2 - 2.0 * math.atan(tmp1) + 1.5707963
        fhnew = 2 * tmp2
        tmp12 = (1.0 - 16.0 * moz2) ** 0.25
        tmp22 = math.log((1.0 + tmp12 * tmp12) / 2.0)
        tmp32 = math.log((1.0 + tmp12) / 2.0)
        fm2new = 2.0 * tmp32 + tmp22 - 2.0 * math.atan(tmp12) + 1.5707963
        fh2new = 2 * tmp22
    else:
        fmnew = -5.0 * moz
        fhnew = fmnew
        fm2new = -5.0 * moz2
        fh2new = fm2new
    if it == 1:
        st["fm"], st["fh"] = fmnew, fhnew
        st["fm2"], st["fh2"] = fm2new, fh2new
    else:
        st["fm"] = 0.5 * (st["fm"] + fmnew)
        st["fh"] = 0.5 * (st["fh"] + fhnew)
        st["fm2"] = 0.5 * (st["fm2"] + fm2new)
        st["fh2"] = 0.5 * (st["fh2"] + fh2new)
    st["fh"] = min(st["fh"], 0.9 * tmpch)
    st["fm"] = min(st["fm"], 0.9 * tmpcm)
    st["fh2"] = min(st["fh2"], 0.9 * tmpch2)
    st["fm2"] = min(st["fm2"], 0.9 * tmpcm2)
    cmfm = tmpcm - st["fm"]
    chfh = tmpch - st["fh"]
    cm2fm2 = tmpcm2 - st["fm2"]
    ch2fh2 = tmpch2 - st["fh2"]
    if abs(cmfm) <= MPE:
        cmfm = MPE
    if abs(chfh) <= MPE:
        chfh = MPE
    if abs(cm2fm2) <= MPE:
        cm2fm2 = MPE
    if abs(ch2fh2) <= MPE:
        ch2fh2 = MPE
    cm = VKC * VKC / (cmfm * cmfm)
    ch = VKC * VKC / (cmfm * chfh)
    st["fv"] = ur * math.sqrt(cm)
    ch2 = VKC * st["fv"] / ch2fh2
    return cm, ch, ch2


def glacier_flux(opts, nsoil, isnow, df, dzsnso, z0m, zlvl, zpd, qair,
                 sfctmp, rhoair, sfcprs, ur, gamma, rsurf, lwdn, rhsur,
                 smc, eair, stc, sag, snowh, lathea, sh2o, cm, ch, tgb,
                 qsfc):
    """GLACIER_FLUX (:942-1148): Newton solve for glacier TG."""
    niterb = 5
    dtg = 0.0
    h = 0.0
    st = dict(moz=0.0, mozsgn=0, fm=0.0, fh=0.0, fm2=0.0, fh2=0.0,
              fv=0.1)
    cir = EMG * SB
    cgh = 2.0 * df[isnow + 1] / dzsnso[isnow + 1]
    tdc = lambda t: min(50.0, max(-50.0, t - TFRZ))
    estg = destg = csh = cev = 0.0
    irb = shb = evb = ghb = 0.0
    for it in range(1, niterb + 1):
        z0h = z0m
        cm, ch, ch2 = sfcdif1_glacier(it, zlvl, zpd, z0h, z0m, qair,
                                      sfctmp, h, rhoair, ur, st)
        rahb = max(1.0, 1.0 / (ch * ur))
        rawb = rahb
        t = tdc(tgb)
        esatw, esati, dsatw, dsati = esat(t)
        if t > 0.0:
            estg, destg = esatw, dsatw
        else:
            estg, destg = esati, dsati
        csh = rhoair * CPAIR / rahb
        cev = rhoair * CPAIR / gamma / (rsurf + rawb)
        irb = cir * tgb ** 4 - EMG * lwdn
        shb = csh * (tgb - sfctmp)
        evb = cev * (estg * rhsur - eair)
        ghb = cgh * (tgb - stc[isnow + 1])
        b = sag - irb - shb - evb - ghb
        a = 4.0 * cir * tgb ** 3 + csh + cev * destg + cgh
        dtg = b / a
        irb = irb + 4.0 * cir * tgb ** 3 * dtg
        shb = shb + csh * dtg
        evb = evb + cev * destg * dtg
        ghb = ghb + cgh * dtg
        tgb = tgb + dtg
        h = csh * (tgb - sfctmp)
        t = tdc(tgb)
        esatw, esati, dsatw, dsati = esat(t)
        estg = esatw if t > 0.0 else esati
        qsfc = 0.622 * (estg * rhsur) / (sfcprs - 0.378 * (estg * rhsur))
    sice_max = max(smc[k] - sh2o[k] for k in range(1, nsoil + 1))
    if opts["opt_stc"] == 1:
        if (sice_max > 0.0 or snowh > 0.0) and tgb > TFRZ:
            tgb = TFRZ
            irb = cir * tgb ** 4 - EMG * lwdn
            shb = csh * (tgb - sfctmp)
            evb = cev * (estg * rhsur - eair)
            ghb = sag - (irb + shb + evb)
    z0h = z0m
    ehb2 = st["fv"] * VKC / (math.log((2.0 + z0h) / z0h) - st["fh2"])
    cq2b = ehb2
    if ehb2 < 1.0e-5:
        t2mb = tgb
        q2b = qsfc
    else:
        t2mb = tgb - shb / (rhoair * CPAIR) * 1.0 / ehb2
        q2b = qsfc - evb / (lathea * rhoair) * (1.0 / cq2b + rsurf)
    ch = 1.0 / rahb
    return (tgb, cm, ch, qsfc, irb, shb, evb, ghb, t2mb, q2b, ehb2)


def hrt_glacier(opts, nsnow, nsoil, isnow, zsnso, stc, tbot, zbot, df,
                hcpct, ssoil, phi):
    """HRT_GLACIER (:1423-1518)."""
    ai, bi, ci, rhsts = {}, {}, {}, {}
    ddz, denom, dtsdz, eflux = {}, {}, {}, {}
    botflx = 0.0
    for k in range(isnow + 1, nsoil + 1):
        if k == isnow + 1:
            denom[k] = -zsnso[k] * hcpct[k]
            temp1 = -zsnso[k + 1]
            ddz[k] = 2.0 / temp1
            dtsdz[k] = 2.0 * (stc[k] - stc[k + 1]) / temp1
            eflux[k] = df[k] * dtsdz[k] - ssoil - phi[k]
        elif k < nsoil:
            denom[k] = (zsnso[k - 1] - zsnso[k]) * hcpct[k]
            temp1 = zsnso[k - 1] - zsnso[k + 1]
            ddz[k] = 2.0 / temp1
            dtsdz[k] = 2.0 * (stc[k] - stc[k + 1]) / temp1
            eflux[k] = (df[k] * dtsdz[k] - df[k - 1] * dtsdz[k - 1]) \
                - phi[k]
        else:
            denom[k] = (zsnso[k - 1] - zsnso[k]) * hcpct[k]
            if opts["opt_tbot"] == 1:
                botflx = 0.0
            if opts["opt_tbot"] == 2:
                dtsdz[k] = (stc[k] - tbot) / (
                    0.5 * (zsnso[k - 1] + zsnso[k]) - zbot)
                botflx = -df[k] * dtsdz[k]
            eflux[k] = (-botflx - df[k - 1] * dtsdz[k - 1]) - phi[k]
    for k in range(isnow + 1, nsoil + 1):
        if k == isnow + 1:
            ai[k] = 0.0
            ci[k] = -df[k] * ddz[k] / denom[k]
            if opts["opt_stc"] == 1:
                bi[k] = -ci[k]
            if opts["opt_stc"] == 2:
                bi[k] = -ci[k] + df[k] / (
                    0.5 * zsnso[k] * zsnso[k] * hcpct[k])
        elif k < nsoil:
            ai[k] = -df[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = -df[k] * ddz[k] / denom[k]
            bi[k] = -(ai[k] + ci[k])
        else:
            ai[k] = -df[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = 0.0
            bi[k] = -(ai[k] + ci[k])
        rhsts[k] = eflux[k] / (-denom[k])
    return ai, bi, ci, rhsts


def rosr12_glacier(a, b, c, d, ntop, nsoil):
    """ROSR12_GLACIER (:1575-1632)."""
    p, delta = {}, {}
    c = dict(c)
    c[nsoil] = 0.0
    p[ntop] = -c[ntop] / b[ntop]
    delta[ntop] = d[ntop] / b[ntop]
    for k in range(ntop + 1, nsoil + 1):
        p[k] = -c[k] * (1.0 / (b[k] + a[k] * p[k - 1]))
        delta[k] = (d[k] - a[k] * delta[k - 1]) * (
            1.0 / (b[k] + a[k] * p[k - 1]))
    p[nsoil] = delta[nsoil]
    for k in range(ntop + 1, nsoil + 1):
        kk = nsoil - k + (ntop - 1) + 1
        p[kk] = p[kk] * p[kk + 1] + delta[kk]
    return p


def hstep_glacier(nsnow, nsoil, isnow, dt, ai, bi, ci, rhsts, stc):
    """HSTEP_GLACIER (:1521-1573)."""
    a2, b2, c2, r2 = {}, {}, {}, {}
    for k in range(isnow + 1, nsoil + 1):
        r2[k] = rhsts[k] * dt
        a2[k] = ai[k] * dt
        b2[k] = 1.0 + bi[k] * dt
        c2[k] = ci[k] * dt
    p = rosr12_glacier(a2, b2, dict(c2), r2, isnow + 1, nsoil)
    for k in range(isnow + 1, nsoil + 1):
        stc[k] = stc[k] + p[k]
    return stc


def tsnosoi_glacier(opts, nsoil, nsnow, isnow, dt, tbot, ssoil, snowh,
                    zbot, zsnso, df, hcpct, stc):
    """TSNOSOI_GLACIER (:1360-1420)."""
    phi = {k: 0.0 for k in range(isnow + 1, nsoil + 1)}
    zbotsno = zbot - snowh
    ai, bi, ci, rhsts = hrt_glacier(opts, nsnow, nsoil, isnow, zsnso,
                                    stc, tbot, zbotsno, df, hcpct,
                                    ssoil, phi)
    return hstep_glacier(nsnow, nsoil, isnow, dt, ai, bi, ci, rhsts,
                         stc)


def phasechange_glacier(nsnow, nsoil, isnow, dt, fact, dzsnso, stc,
                        snice, snliq, sneqv, snowh, smc, sh2o):
    """PHASECHANGE_GLACIER (:1635-1922), including the residual-heat
    redistribution loops over soil layers."""
    qmelt = 0.0
    ponding = 0.0
    xmf = 0.0
    mice, mliq = {}, {}
    for j in range(isnow + 1, 1):
        mice[j] = snice[j]
        mliq[j] = snliq[j]
    for j in range(1, nsoil + 1):
        mliq[j] = sh2o[j] * dzsnso[j] * 1000.0
        mice[j] = (smc[j] - sh2o[j]) * dzsnso[j] * 1000.0
    imelt, hm, xm = {}, {}, {}
    wice0, wliq0, wmass0 = {}, {}, {}
    for j in range(isnow + 1, nsoil + 1):
        imelt[j] = 0
        hm[j] = 0.0
        xm[j] = 0.0
        wice0[j] = mice[j]
        wliq0[j] = mliq[j]
        wmass0[j] = mice[j] + mliq[j]
    for j in range(isnow + 1, nsoil + 1):
        if mice[j] > 0.0 and stc[j] >= TFRZ:
            imelt[j] = 1
        if mliq[j] > 0.0 and stc[j] < TFRZ:
            imelt[j] = 2
        if isnow == 0 and sneqv > 0.0 and j == 1:
            if stc[j] >= TFRZ:
                imelt[j] = 1
    for j in range(isnow + 1, nsoil + 1):
        if imelt[j] > 0:
            hm[j] = (stc[j] - TFRZ) / fact[j]
            stc[j] = TFRZ
        if imelt[j] == 1 and hm[j] < 0.0:
            hm[j] = 0.0
            imelt[j] = 0
        if imelt[j] == 2 and hm[j] > 0.0:
            hm[j] = 0.0
            imelt[j] = 0
        xm[j] = hm[j] * dt / HFUS
    heatr = {j: 0.0 for j in range(isnow + 1, nsoil + 1)}
    if isnow == 0 and sneqv > 0.0 and xm[1] > 0.0:
        temp1 = sneqv
        sneqv = max(0.0, temp1 - xm[1])
        propor = sneqv / temp1
        snowh = max(0.0, propor * snowh)
        heatr[1] = hm[1] - HFUS * (temp1 - sneqv) / dt
        if heatr[1] > 0.0:
            xm[1] = heatr[1] * dt / HFUS
            hm[1] = heatr[1]
            imelt[1] = 1
        else:
            xm[1] = 0.0
            hm[1] = 0.0
            imelt[1] = 0
        qmelt = max(0.0, temp1 - sneqv) / dt
        xmf = HFUS * qmelt
        ponding = temp1 - sneqv
    for j in range(isnow + 1, nsoil + 1):
        if imelt[j] > 0 and abs(hm[j]) > 0.0:
            heatr[j] = 0.0
            if xm[j] > 0.0:
                mice[j] = max(0.0, wice0[j] - xm[j])
                heatr[j] = hm[j] - HFUS * (wice0[j] - mice[j]) / dt
            elif xm[j] < 0.0:
                mice[j] = min(wmass0[j], wice0[j] - xm[j])
                heatr[j] = hm[j] - HFUS * (wice0[j] - mice[j]) / dt
            mliq[j] = max(0.0, wmass0[j] - mice[j])
            if abs(heatr[j]) > 0.0:
                stc[j] = stc[j] + fact[j] * heatr[j]
                if j <= 0:
                    if mliq[j] * mice[j] > 0.0:
                        stc[j] = TFRZ
            if j > 0:
                xmf = xmf + HFUS * (wice0[j] - mice[j]) / dt
            if j < 1:
                qmelt = qmelt + max(0.0, wice0[j] - mice[j]) / dt
    heatr = {j: 0.0 for j in range(isnow + 1, nsoil + 1)}
    xm = {j: 0.0 for j in range(isnow + 1, nsoil + 1)}

    # FIRST REMOVE EXCESS HEAT BY REDUCING TEMPERATURE OF LAYERS (:1804)
    soil = range(1, nsoil + 1)
    if any(stc[j] > TFRZ for j in soil) and \
            any(stc[j] < TFRZ for j in soil):
        for j in soil:
            if stc[j] > TFRZ:
                heatr[j] = (stc[j] - TFRZ) / fact[j]
                for k in soil:
                    if j != k and stc[k] < TFRZ and heatr[j] > 0.1:
                        heatr[k] = (stc[k] - TFRZ) / fact[k]
                        if abs(heatr[k]) > heatr[j]:
                            heatr[k] = heatr[k] + heatr[j]
                            stc[k] = TFRZ + heatr[k] * fact[k]
                            heatr[j] = 0.0
                        else:
                            heatr[j] = heatr[j] + heatr[k]
                            heatr[k] = 0.0
                            stc[k] = TFRZ
                stc[j] = TFRZ + heatr[j] * fact[j]

    # NOW REMOVE EXCESS COLD BY INCREASING TEMPERATURE (:1829)
    if any(stc[j] > TFRZ for j in soil) and \
            any(stc[j] < TFRZ for j in soil):
        for j in soil:
            if stc[j] < TFRZ:
                heatr[j] = (stc[j] - TFRZ) / fact[j]
                for k in soil:
                    if j != k and stc[k] > TFRZ and heatr[j] < -0.1:
                        heatr[k] = (stc[k] - TFRZ) / fact[k]
                        if heatr[k] > abs(heatr[j]):
                            heatr[k] = heatr[k] + heatr[j]
                            stc[k] = TFRZ + heatr[k] * fact[k]
                            heatr[j] = 0.0
                        else:
                            heatr[j] = heatr[j] + heatr[k]
                            heatr[k] = 0.0
                            stc[k] = TFRZ
                stc[j] = TFRZ + heatr[j] * fact[j]

    # NOW REMOVE EXCESS HEAT BY MELTING ICE (:1854)
    if any(stc[j] > TFRZ for j in soil) and \
            any(mice[j] > 0.0 for j in soil):
        for j in soil:
            if stc[j] > TFRZ:
                heatr[j] = (stc[j] - TFRZ) / fact[j]
                xm[j] = heatr[j] * dt / HFUS
                for k in soil:
                    if j != k and mice[k] > 0.0 and xm[j] > 0.1:
                        if mice[k] > xm[j]:
                            mice[k] = mice[k] - xm[j]
                            xmf = xmf + HFUS * xm[j] / dt
                            stc[k] = TFRZ
                            xm[j] = 0.0
                        else:
                            xm[j] = xm[j] - mice[k]
                            xmf = xmf + HFUS * mice[k] / dt
                            mice[k] = 0.0
                            stc[k] = TFRZ
                        mliq[k] = max(0.0, wmass0[k] - mice[k])
                heatr[j] = xm[j] * HFUS / dt
                stc[j] = TFRZ + heatr[j] * fact[j]

    # NOW REMOVE EXCESS COLD BY FREEZING LIQUID (:1883)
    if any(stc[j] < TFRZ for j in soil) and \
            any(mliq[j] > 0.0 for j in soil):
        for j in soil:
            if stc[j] < TFRZ:
                heatr[j] = (stc[j] - TFRZ) / fact[j]
                xm[j] = heatr[j] * dt / HFUS
                for k in soil:
                    if j != k and mliq[k] > 0.0 and xm[j] < -0.1:
                        if mliq[k] > abs(xm[j]):
                            mice[k] = mice[k] - xm[j]
                            xmf = xmf + HFUS * xm[j] / dt
                            stc[k] = TFRZ
                            xm[j] = 0.0
                        else:
                            xm[j] = xm[j] + mliq[k]
                            xmf = xmf - HFUS * mliq[k] / dt
                            mice[k] = wmass0[k]
                            stc[k] = TFRZ
                        mliq[k] = max(0.0, wmass0[k] - mice[k])
                heatr[j] = xm[j] * HFUS / dt
                stc[j] = TFRZ + heatr[j] * fact[j]

    for j in range(isnow + 1, 1):
        snliq[j] = mliq[j]
        snice[j] = mice[j]
    for j in range(1, nsoil + 1):
        sh2o[j] = mliq[j] / (1000.0 * dzsnso[j])
        sh2o[j] = max(0.0, min(1.0, sh2o[j]))
        smc[j] = 1.0                      # glacier 'soil' is ice (:1919)
    return (stc, snice, snliq, sneqv, snowh, smc, sh2o, qmelt, imelt,
            ponding)


# --------------------- snowpack mechanics (:2113-2895) ----------------
def snowfall_glacier(nsoil, nsnow, dt, qsnow, snowhin, sfctmp, st):
    """SNOWFALL_GLACIER (:2239-2301)."""
    newnode = 0
    if st["isnow"] == 0 and qsnow > 0.0:
        st["snowh"] += snowhin * dt
        st["sneqv"] += qsnow * dt
    if st["isnow"] == 0 and qsnow > 0.0 and st["snowh"] >= 0.05:
        st["isnow"] = -1
        newnode = 1
        st["dzsnso"][0] = st["snowh"]
        st["snowh"] = 0.0
        st["stc"][0] = min(273.16, sfctmp)
        st["snice"][0] = st["sneqv"]
        st["snliq"][0] = 0.0
    if st["isnow"] < 0 and newnode == 0 and qsnow > 0.0:
        st["snice"][st["isnow"] + 1] += qsnow * dt
        st["dzsnso"][st["isnow"] + 1] += snowhin * dt


def compact_glacier(nsnow, nsoil, dt, imelt, ficeold, st):
    """COMPACT_GLACIER (:2304-2401)."""
    c2, c3, c4, c5 = 21.0e-3, 2.5e-6, 0.04, 2.0
    dm, eta0 = 100.0, 0.8e6
    burden = 0.0
    for j in range(st["isnow"] + 1, 1):
        wx = st["snice"][j] + st["snliq"][j]
        fice = st["snice"][j] / wx
        void = 1.0 - (st["snice"][j] / DENICE
                      + st["snliq"][j] / DENH2O) / st["dzsnso"][j]
        if void > 0.001 and st["snice"][j] > 0.1:
            bi = st["snice"][j] / st["dzsnso"][j]
            td = max(0.0, TFRZ - st["stc"][j])
            dexpf = math.exp(-c4 * td)
            ddz1 = -c3 * dexpf
            if bi > dm:
                ddz1 = ddz1 * math.exp(-46.0e-3 * (bi - dm))
            if st["snliq"][j] > 0.01 * st["dzsnso"][j]:
                ddz1 = ddz1 * c5
            ddz2 = -(burden + 0.5 * wx) * math.exp(
                -0.08 * td - c2 * bi) / eta0
            # a layer created by SNOWFALL_GLACIER after PHASECHANGE has
            # no IMELT entry (the Fortran array slot is simply never
            # set this step); treat as 0 like oracles/snow.py
            if imelt.get(j, 0) == 1:
                ddz3 = max(0.0, (ficeold[j] - fice)
                           / max(1.0e-6, ficeold[j]))
                ddz3 = -ddz3 / dt
            else:
                ddz3 = 0.0
            pdzdtc = (ddz1 + ddz2 + ddz3) * dt
            pdzdtc = max(-0.5, pdzdtc)
            st["dzsnso"][j] = st["dzsnso"][j] * (1.0 + pdzdtc)
        burden += wx


def combo_glacier(dz, wliq, wice, t, dz2, wliq2, wice2, t2):
    """COMBO_GLACIER (:2575-2624)."""
    dzc = dz + dz2
    wicec = wice + wice2
    wliqc = wliq + wliq2
    h = (CICE * wice + CWAT * wliq) * (t - TFRZ) + HFUS * wliq
    h2 = (CICE * wice2 + CWAT * wliq2) * (t2 - TFRZ) + HFUS * wliq2
    hc = h + h2
    if hc < 0.0:
        tc = TFRZ + hc / (CICE * wicec + CWAT * wliqc)
    elif hc <= HFUS * wliqc:
        tc = TFRZ
    else:
        tc = TFRZ + (hc - HFUS * wliqc) / (CICE * wicec + CWAT * wliqc)
    return dzc, wliqc, wicec, tc


def combine_glacier(nsnow, nsoil, st):
    """COMBINE_GLACIER (:2403-2571)."""
    dzmin = [0.045, 0.05, 0.2]
    isnow_old = st["isnow"]
    for j in range(isnow_old + 1, 1):
        if st["snice"][j] <= 0.1:
            if j != 0:
                st["snliq"][j + 1] += st["snliq"][j]
                st["snice"][j + 1] += st["snice"][j]
            else:
                if isnow_old < -1:
                    st["snliq"][j - 1] += st["snliq"][j]
                    st["snice"][j - 1] += st["snice"][j]
                else:
                    st["ponding1"] += st["snliq"][j]
                    st["sneqv"] = st["snice"][j]
                    st["snowh"] = st["dzsnso"][j]
                    st["snliq"][j] = 0.0
                    st["snice"][j] = 0.0
                    st["dzsnso"][j] = 0.0
            if j > st["isnow"] + 1 and st["isnow"] < -1:
                for i in range(j, st["isnow"] + 1, -1):
                    st["stc"][i] = st["stc"][i - 1]
                    st["snliq"][i] = st["snliq"][i - 1]
                    st["snice"][i] = st["snice"][i - 1]
                    st["dzsnso"][i] = st["dzsnso"][i - 1]
            st["isnow"] += 1
    if st["sice"][1] < 0.0:
        st["sh2o"][1] += st["sice"][1]
        st["sice"][1] = 0.0
    if st["isnow"] == 0:
        return
    st["sneqv"] = 0.0
    st["snowh"] = 0.0
    zwice = zwliq = 0.0
    for j in range(st["isnow"] + 1, 1):
        st["sneqv"] += st["snice"][j] + st["snliq"][j]
        st["snowh"] += st["dzsnso"][j]
        zwice += st["snice"][j]
        zwliq += st["snliq"][j]
    if st["snowh"] < 0.05 and st["isnow"] < 0:
        st["isnow"] = 0
        st["sneqv"] = zwice
        st["ponding2"] += zwliq
        if st["sneqv"] <= 0.0:
            st["snowh"] = 0.0
    if st["isnow"] < -1:
        isnow_old = st["isnow"]
        mssi = 1
        for i in range(isnow_old + 1, 1):
            if st["dzsnso"][i] < dzmin[mssi - 1]:
                if i == st["isnow"] + 1:
                    neibor = i + 1
                elif i == 0:
                    neibor = i - 1
                else:
                    neibor = i + 1
                    if (st["dzsnso"][i - 1] + st["dzsnso"][i]) < \
                            (st["dzsnso"][i + 1] + st["dzsnso"][i]):
                        neibor = i - 1
                if neibor > i:
                    j, l = neibor, i
                else:
                    j, l = i, neibor
                (st["dzsnso"][j], st["snliq"][j], st["snice"][j],
                 st["stc"][j]) = combo_glacier(
                    st["dzsnso"][j], st["snliq"][j], st["snice"][j],
                    st["stc"][j], st["dzsnso"][l], st["snliq"][l],
                    st["snice"][l], st["stc"][l])
                if j - 1 > st["isnow"] + 1:
                    for k in range(j - 1, st["isnow"] + 1, -1):
                        st["stc"][k] = st["stc"][k - 1]
                        st["snice"][k] = st["snice"][k - 1]
                        st["snliq"][k] = st["snliq"][k - 1]
                        st["dzsnso"][k] = st["dzsnso"][k - 1]
                st["isnow"] += 1
                if st["isnow"] >= -1:
                    break
            else:
                mssi += 1


def divide_glacier(nsnow, nsoil, st):
    """DIVIDE_GLACIER (:2626-2749)."""
    isnow = st["isnow"]
    dz, swice, swliq, tsno = {}, {}, {}, {}
    for j in range(1, nsnow + 1):
        if j <= abs(isnow):
            dz[j] = st["dzsnso"][j + isnow]
            swice[j] = st["snice"][j + isnow]
            swliq[j] = st["snliq"][j + isnow]
            tsno[j] = st["stc"][j + isnow]
    msno = abs(isnow)
    if msno == 1:
        if dz[1] > 0.05:
            msno = 2
            dz[1] = dz[1] / 2.0
            swice[1] = swice[1] / 2.0
            swliq[1] = swliq[1] / 2.0
            dz[2] = dz[1]
            swice[2] = swice[1]
            swliq[2] = swliq[1]
            tsno[2] = tsno[1]
    if msno > 1:
        if dz[1] > 0.05:
            drr = dz[1] - 0.05
            propor = drr / dz[1]
            zwice = propor * swice[1]
            zwliq = propor * swliq[1]
            propor = 0.05 / dz[1]
            swice[1] = propor * swice[1]
            swliq[1] = propor * swliq[1]
            dz[1] = 0.05
            dz[2], swliq[2], swice[2], tsno[2] = combo_glacier(
                dz[2], swliq[2], swice[2], tsno[2], drr, zwliq, zwice,
                tsno[1])
            if msno <= 2 and dz[2] > 0.10:
                msno = 3
                dtdz = (tsno[1] - tsno[2]) / ((dz[1] + dz[2]) / 2.0)
                dz[2] = dz[2] / 2.0
                swice[2] = swice[2] / 2.0
                swliq[2] = swliq[2] / 2.0
                dz[3] = dz[2]
                swice[3] = swice[2]
                swliq[3] = swliq[2]
                tsno[3] = tsno[2] - dtdz * dz[2] / 2.0
                if tsno[3] >= TFRZ:
                    tsno[3] = tsno[2]
                else:
                    tsno[2] = tsno[2] + dtdz * dz[2] / 2.0
    if msno > 2:
        if dz[2] > 0.2:
            drr = dz[2] - 0.2
            propor = drr / dz[2]
            zwice = propor * swice[2]
            zwliq = propor * swliq[2]
            propor = 0.2 / dz[2]
            swice[2] = propor * swice[2]
            swliq[2] = propor * swliq[2]
            dz[2] = 0.2
            dz[3], swliq[3], swice[3], tsno[3] = combo_glacier(
                dz[3], swliq[3], swice[3], tsno[3], drr, zwliq, zwice,
                tsno[2])
    st["isnow"] = -msno
    for j in range(st["isnow"] + 1, 1):
        st["dzsnso"][j] = dz[j - st["isnow"]]
        st["snice"][j] = swice[j - st["isnow"]]
        st["snliq"][j] = swliq[j - st["isnow"]]
        st["stc"][j] = tsno[j - st["isnow"]]


def snowh2o_glacier(nsnow, nsoil, dt, qsnfro, qsnsub, qrain, st):
    """SNOWH2O_GLACIER (:2751-2895)."""
    if st["sneqv"] == 0.0:
        st["sice"][1] += (qsnfro - qsnsub) * dt / (st["dzsnso"][1]
                                                   * 1000.0)
    if st["isnow"] == 0 and st["sneqv"] > 0.0:
        temp = st["sneqv"]
        st["sneqv"] = st["sneqv"] - qsnsub * dt + qsnfro * dt
        propor = st["sneqv"] / temp
        st["snowh"] = max(0.0, propor * st["snowh"])
        if st["sneqv"] < 0.0:
            st["sice"][1] += st["sneqv"] / (st["dzsnso"][1] * 1000.0)
            st["sneqv"] = 0.0
            st["snowh"] = 0.0
        if st["sice"][1] < 0.0:
            st["sh2o"][1] += st["sice"][1]
            st["sice"][1] = 0.0
    if st["snowh"] <= 1.0e-8 or st["sneqv"] <= 1.0e-6:
        st["snowh"] = 0.0
        st["sneqv"] = 0.0
    if st["isnow"] < 0:
        wgdif = st["snice"][st["isnow"] + 1] - qsnsub * dt + qsnfro * dt
        st["snice"][st["isnow"] + 1] = wgdif
        if wgdif < 1.0e-6 and st["isnow"] < 0:
            combine_glacier(nsnow, nsoil, st)
        if st["isnow"] < 0:
            st["snliq"][st["isnow"] + 1] += qrain * dt
            st["snliq"][st["isnow"] + 1] = max(
                0.0, st["snliq"][st["isnow"] + 1])
    vol_liq, vol_ice, epore = {}, {}, {}
    for j in range(-nsnow + 1, 1):
        if j >= st["isnow"] + 1:
            vol_ice[j] = min(1.0, st["snice"][j]
                             / (st["dzsnso"][j] * DENICE))
            epore[j] = 1.0 - vol_ice[j]
            vol_liq[j] = min(epore[j], st["snliq"][j]
                             / (st["dzsnso"][j] * DENH2O))
    qin = qout = 0.0
    for j in range(-nsnow + 1, 1):
        if j >= st["isnow"] + 1:
            st["snliq"][j] += qin
            if j <= -1:
                if epore[j] < 0.05 or epore[j + 1] < 0.05:
                    qout = 0.0
                else:
                    qout = max(0.0, (vol_liq[j] - SSI * epore[j])
                               * st["dzsnso"][j])
                    qout = min(qout, (1.0 - vol_ice[j + 1]
                                      - vol_liq[j + 1])
                               * st["dzsnso"][j + 1])
            else:
                qout = max(0.0, (vol_liq[j] - SSI * epore[j])
                           * st["dzsnso"][j])
            qout = qout * 1000.0
            st["snliq"][j] -= qout
            qin = qout
    return qout / dt       # QSNBOT


def snowwater_glacier(nsnow, nsoil, imelt, dt, sfctmp, snowhin, qsnow,
                      qsnfro, qsnsub, qrain, ficeold, zsoil, st):
    """SNOWWATER_GLACIER (:2113-2237).  ``st`` carries
    isnow/snowh/sneqv/snice/snliq/sh2o/sice/stc/dzsnso/zsnso and the
    ponding accumulators."""
    snoflow = 0.0
    st["ponding1"] = 0.0
    st["ponding2"] = 0.0
    snowfall_glacier(nsoil, nsnow, dt, qsnow, snowhin, sfctmp, st)
    if st["isnow"] < 0:
        compact_glacier(nsnow, nsoil, dt, imelt, ficeold, st)
        combine_glacier(nsnow, nsoil, st)
        divide_glacier(nsnow, nsoil, st)
    for iz in range(-nsnow + 1, st["isnow"] + 1):
        st["snice"][iz] = 0.0
        st["snliq"][iz] = 0.0
        st["stc"][iz] = 0.0
        st["dzsnso"][iz] = 0.0
        st["zsnso"][iz] = 0.0
    qsnbot = snowh2o_glacier(nsnow, nsoil, dt, qsnfro, qsnsub, qrain,
                             st)
    if st["sneqv"] > 2000.0:          # glacier flow shave (:2200-2206)
        bdsnow = st["snice"][0] / st["dzsnso"][0]
        snoflow = st["sneqv"] - 2000.0
        st["snice"][0] -= snoflow
        st["dzsnso"][0] -= snoflow / bdsnow
        snoflow = snoflow / dt
    if st["isnow"] != 0:
        st["sneqv"] = 0.0
        for iz in range(st["isnow"] + 1, 1):
            st["sneqv"] += st["snice"][iz] + st["snliq"][iz]
    for iz in range(st["isnow"] + 1, 1):
        st["dzsnso"][iz] = -st["dzsnso"][iz]
    st["dzsnso"][1] = zsoil[1]
    for iz in range(2, nsoil + 1):
        st["dzsnso"][iz] = zsoil[iz] - zsoil[iz - 1]
    st["zsnso"][st["isnow"] + 1] = st["dzsnso"][st["isnow"] + 1]
    for iz in range(st["isnow"] + 2, nsoil + 1):
        st["zsnso"][iz] = st["zsnso"][iz - 1] + st["dzsnso"][iz]
    for iz in range(st["isnow"] + 1, nsoil + 1):
        st["dzsnso"][iz] = -st["dzsnso"][iz]
    return qsnbot, snoflow


def water_glacier(opts, nsnow, nsoil, imelt, dt, prcp, sfctmp, qvap,
                  qdew, ficeold, zsoil, ponding, st):
    """WATER_GLACIER (:1924-2110)."""
    runsub = 0.0
    sice_save = dict(st["sice"])
    sh2o_save = dict(st["sh2o"])
    if opts["opt_snf"] == 1:
        if sfctmp > TFRZ + 2.5:
            fpice = 0.0
        elif sfctmp <= TFRZ + 0.5:
            fpice = 1.0
        elif sfctmp <= TFRZ + 2.0:
            fpice = 1.0 - (-54.632 + 0.2 * sfctmp)
        else:
            fpice = 0.6
    elif opts["opt_snf"] == 2:
        fpice = 0.0 if sfctmp >= TFRZ + 2.2 else 1.0
    else:
        fpice = 0.0 if sfctmp >= TFRZ else 1.0
    bdfall = min(120.0, 67.92 + 51.25 * math.exp((sfctmp - TFRZ) / 2.59))
    qrain = prcp * (1.0 - fpice)
    qsnow = prcp * fpice
    snowhin = qsnow / bdfall
    qsnsub = qvap
    qsnfro = qdew
    qsnbot, snoflow = snowwater_glacier(
        nsnow, nsoil, imelt, dt, sfctmp, snowhin, qsnow, qsnfro,
        qsnsub, qrain, ficeold, zsoil, st)
    runsrf = (ponding + st["ponding1"] + st["ponding2"]) / dt
    if st["isnow"] == 0:
        runsrf = runsrf + qsnbot + qrain
    else:
        runsrf = runsrf + qsnbot
    replace = 0.0
    for ilev in range(1, nsoil + 1):
        replace += st["dzsnso"][ilev] * (
            st["sice"][ilev] - sice_save[ilev]
            + st["sh2o"][ilev] - sh2o_save[ilev])
    replace = replace * 1000.0 / dt
    for ilev in range(1, nsoil + 1):
        st["sice"][ilev] = min(1.0, sice_save[ilev])
        st["sh2o"][ilev] = 1.0 - st["sice"][ilev]
    runsub = snoflow + replace
    return runsrf, runsub, qsnow, qsnbot, fpice


# ------------------------------------------------------------------
def noahmp_glacier(opts, nsnow, nsoil, dt, cosz, sfctmp, sfcprs, uu,
                   vv, q2, soldn, prcp, lwdn, tbot, zref, ficeold,
                   zsoil, s):
    """NOAHMP_GLACIER (:150-338): one composed glacier-column step.

    ``s`` is the prognostic state dict (isnow, sneqv, sneqvo, smc,
    zsnso, snowh, snice, snliq, tg, stc, sh2o, tauss, qsfc, albold,
    cm, ch, qsnow).  TBOT is passed raw; the driver's land-ice cap
    (module_sf_noahmpdrv.F90:556, TBOT = MIN(TBOT, 263.15)) is applied
    here so both sides see the same boundary value.
    """
    tbot = min(tbot, 263.15)
    thair, qair, eair, rhoair, solad, solai, swdown = atm_glacier(
        sfcprs, sfctmp, q2, soldn, cosz)
    beg_wb = s["sneqv"]
    isnow = s["isnow"]
    dzsnso = {}
    for iz in range(isnow + 1, nsoil + 1):
        if iz == isnow + 1:
            dzsnso[iz] = -s["zsnso"][iz]
        else:
            dzsnso[iz] = s["zsnso"][iz - 1] - s["zsnso"][iz]

    # ---- ENERGY_GLACIER (:393-573)
    ur = max(math.sqrt(uu ** 2 + vv ** 2), 1.0)
    z0mg = Z0SNO
    zpd = s["snowh"]
    zlvl = zpd + zref
    df, hcpct, fact = thermoprop_glacier(
        nsoil, nsnow, isnow, dzsnso, dt, s["snowh"], s["snice"],
        s["snliq"])
    sag, fsa, fsr, s["albold"], s["tauss"] = radiation_glacier(
        opts, dt, s["tg"], s["sneqvo"], s["sneqv"], cosz, s["qsnow"],
        solad, solai, s["albold"], s["tauss"])
    rhsur = 1.0
    rsurf = 1.0
    lathea = HSUB
    gamma = CPAIR * sfcprs / (0.622 * lathea)
    (tg, cm, ch, qsfc, irb, shb, evb, ghb, t2m, q2e,
     ehb2) = glacier_flux(
        opts, nsoil, isnow, df, dzsnso, z0mg, zlvl, zpd, qair, sfctmp,
        rhoair, sfcprs, ur, gamma, rsurf, lwdn, rhsur, s["smc"], eair,
        s["stc"], sag, s["snowh"], lathea, s["sh2o"], s["cm"], s["ch"],
        s["tg"], s["qsfc"])
    s["cm"], s["ch"], s["qsfc"] = cm, ch, qsfc
    fira, fsh, fgev, ssoil = irb, shb, evb, ghb
    fire = lwdn + fira
    emissi = EMG
    trad = ((fire - (1.0 - emissi) * lwdn) / (emissi * SB)) ** 0.25
    s["stc"] = tsnosoi_glacier(
        opts, nsoil, nsnow, isnow, dt, tbot, ssoil, s["snowh"], ZBOT,
        s["zsnso"], df, hcpct, s["stc"])
    if opts["opt_stc"] == 2:
        if s["snowh"] > 0.05 and tg > TFRZ:
            tg = TFRZ
    (s["stc"], s["snice"], s["snliq"], s["sneqv"], s["snowh"], s["smc"],
     s["sh2o"], qmelt, imelt, ponding) = phasechange_glacier(
        nsnow, nsoil, isnow, dt, fact, dzsnso, s["stc"], s["snice"],
        s["snliq"], s["sneqv"], s["snowh"], s["smc"], s["sh2o"])
    s["tg"] = tg

    sice = {k: max(0.0, s["smc"][k] - s["sh2o"][k])
            for k in range(1, nsoil + 1)}
    s["sneqvo"] = s["sneqv"]
    qvap = max(fgev / lathea, 0.0)
    qdew = abs(min(fgev / lathea, 0.0))
    edir = qvap - qdew

    # ---- WATER_GLACIER (:1924-2110): operates on a mutable snow state
    st = dict(isnow=isnow, snowh=s["snowh"], sneqv=s["sneqv"],
              snice=dict(s["snice"]), snliq=dict(s["snliq"]),
              stc=dict(s["stc"]), dzsnso=dict(dzsnso),
              zsnso=dict(s["zsnso"]), sh2o=dict(s["sh2o"]), sice=sice,
              ponding1=0.0, ponding2=0.0)
    runsrf, runsub, qsnow_out, qsnbot, fpice = water_glacier(
        opts, nsnow, nsoil, imelt, dt, prcp, sfctmp, qvap, qdew,
        ficeold, zsoil, ponding, st)
    s["isnow"] = st["isnow"]
    s["snowh"] = st["snowh"]
    s["sneqv"] = st["sneqv"]
    s["snice"] = st["snice"]
    s["snliq"] = st["snliq"]
    s["stc"] = st["stc"]
    s["zsnso"] = st["zsnso"]
    s["sh2o"] = {k: st["sh2o"][k] for k in range(1, nsoil + 1)}
    s["smc"] = {k: st["sice"][k] + st["sh2o"][k]
                for k in range(1, nsoil + 1)}
    s["qsnow"] = qsnow_out

    # ---- ERROR_GLACIER (:2898-2972)
    errsw = swdown - (fsa + fsr)
    erreng = sag - (fira + fsh + fgev + ssoil)
    errwat = s["sneqv"] - beg_wb - (prcp - edir - runsrf - runsub) * dt

    if s["snowh"] <= 1.0e-6 or s["sneqv"] <= 1.0e-3:
        s["snowh"] = 0.0
        s["sneqv"] = 0.0
    albedo = fsr / swdown if swdown != 0.0 else -999.9
    diag = dict(fsa=fsa, fsr=fsr, fira=fira, fsh=fsh, fgev=fgev,
                ssoil=ssoil, trad=trad, edir=edir, runsrf=runsrf,
                runsub=runsub, sag=sag, albedo=albedo, qsnbot=qsnbot,
                ponding=ponding, t2m=t2m, q2e=q2e, emissi=emissi,
                fpice=fpice, qmelt=qmelt, errsw=errsw, erreng=erreng,
                errwat=errwat)
    return s, diag
