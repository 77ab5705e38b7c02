"""Scalar oracles: SOILWATER group, transliterated from the Fortran
text of module_sf_noahmplsm.F90 — SOILWATER (:7680-7936), ZWTEQ
(:7938-7990), INFIL (:7992-8087), SRT (:8089-8217), SSTEP (:8220-8327),
WDFCND1/2 (:8329-8401), GROUNDWATER (:8403-8585), SHALLOWWATERTABLE
(:8588-8718), ROSR12 (:5979-6036).

Arrays are 1-based python dicts/lists indexed [1..nsoil] to follow the
Fortran statement-for-statement.  Test fixture only."""

import math

from . import TIMEAN, FSATMX


def rosr12(a, b, c, d, ntop, nsoil):
    """ROSR12 Thomas solve; a/b/c/d dicts keyed ntop..nsoil.
    Returns p (the solution 'P' i.e. output CI) keyed ntop..nsoil."""
    c = dict(c)
    d = dict(d)
    p = {}
    delta = {}
    c[nsoil] = 0.0
    p[ntop] = -c[ntop] / b[ntop]
    delta[ntop] = d[ntop] / b[ntop]
    for k in range(ntop + 1, nsoil + 1):
        p[k] = -c[k] * (1.0 / (b[k] + a[k] * p[k - 1]))
        delta[k] = (d[k] - a[k] * delta[k - 1]) * (
            1.0 / (b[k] + a[k] * p[k - 1]))
    pout = {nsoil: delta[nsoil]}
    for k in range(nsoil - 1, ntop - 1, -1):
        pout[k] = p[k] * pout[k + 1] + delta[k]
    return pout


def wdfcnd1(smc, fcr, smcmax, bexp, dwsat, dksat):
    factr = max(0.01, smc / smcmax)
    wdf = dwsat * factr ** (bexp + 2.0)
    wdf = wdf * (1.0 - fcr)
    wcnd = dksat * factr ** (2.0 * bexp + 3.0)
    wcnd = wcnd * (1.0 - fcr)
    return wdf, wcnd


def wdfcnd2(smc, sice, smcmax, bexp, dwsat, dksat):
    factr = max(0.01, smc / smcmax)
    expon = bexp + 2.0
    wdf = dwsat * factr ** expon
    if sice > 0.0:
        vkwgt = 1.0 / (1.0 + (500.0 * sice) ** 3.0)
        wdf = vkwgt * wdf + (1.0 - vkwgt) * dwsat * (0.2 / smcmax) ** expon
    expon = 2.0 * bexp + 3.0
    wcnd = dksat * factr ** expon
    return wdf, wcnd


def zwteq(nsoil, zsoil, dzsnso, sh2o, smcmax, psisat, bexp):
    """ZWTEQ; zsoil/dzsnso/sh2o dicts 1..nsoil. Returns zwt."""
    NFINE = 100
    wd1 = 0.0
    for k in range(1, nsoil + 1):
        wd1 += (smcmax - sh2o[k]) * dzsnso[k]
    dzfine = 3.0 * (-zsoil[nsoil]) / NFINE
    zfine = {k: float(k) * dzfine for k in range(1, NFINE + 1)}
    zwt = -3.0 * zsoil[nsoil] - 0.001
    wd2 = 0.0
    for k in range(1, NFINE + 1):
        temp = 1.0 + (zwt - zfine[k]) / psisat
        wd2 += smcmax * (1.0 - temp ** (-1.0 / bexp)) * dzfine
        if abs(wd2 - wd1) <= 0.01:
            zwt = zfine[k]
            break
    return zwt


def infil(nsoil, dt, zsoil, sh2o, sice, sicemax, qinsur,
          smcmax, smcwlt, bexp, dwsat, dksat, kdt, frzx):
    """INFIL. Returns (pddum, runsrf)."""
    pddum = 0.0
    runsrf = 0.0
    if qinsur > 0.0:
        CVFRZ = 3
        dt1 = dt / 86400.0
        smcav = smcmax - smcwlt
        dmax = {}
        dmax[1] = -zsoil[1] * smcav
        dice = -zsoil[1] * sice[1]
        dmax[1] = dmax[1] * (1.0 - (sh2o[1] + sice[1] - smcwlt) / smcav)
        dd = dmax[1]
        for k in range(2, nsoil + 1):
            dice += (zsoil[k - 1] - zsoil[k]) * sice[k]
            dmax[k] = (zsoil[k - 1] - zsoil[k]) * smcav
            dmax[k] = dmax[k] * (1.0 - (sh2o[k] + sice[k] - smcwlt) / smcav)
            dd += dmax[k]
        val = 1.0 - math.exp(-kdt * dt1)
        ddt = dd * val
        px = max(0.0, qinsur * dt)
        infmax = (px * (ddt / (px + ddt))) / dt
        fcr = 1.0
        if dice > 1.0e-2:
            acrt = CVFRZ * frzx / dice
            s = 1.0
            ialp1 = CVFRZ - 1
            for j in range(1, ialp1 + 1):
                k = 1
                for jj in range(j + 1, ialp1 + 1):
                    k = k * jj
                s += (acrt ** (CVFRZ - j)) / float(k)
            fcr = 1.0 - math.exp(-acrt) * s
        infmax = infmax * fcr
        wdf, wcnd = wdfcnd2(sh2o[1], sicemax, smcmax, bexp, dwsat, dksat)
        infmax = max(infmax, wcnd)
        infmax = min(infmax, px)
        runsrf = max(0.0, qinsur - infmax)
        pddum = qinsur - runsrf
    return pddum, runsrf


def srt(nsoil, zsoil, dt, pddum, etrani, qseva, sh2o, smc, zwt, fcr,
        sicemax, fcrmax, smcwtd, opt_inf, opt_run,
        smcmax, bexp, dwsat, dksat, slope):
    """SRT. Returns (rhstt, ai, bi, ci, qdrain, wcnd) dicts 1..nsoil."""
    wdf, wcnd, smx = {}, {}, {}
    smxwtd = 0.0
    if opt_inf == 1:
        for k in range(1, nsoil + 1):
            wdf[k], wcnd[k] = wdfcnd1(smc[k], fcr[k], smcmax, bexp,
                                      dwsat, dksat)
            smx[k] = smc[k]
        if opt_run == 5:
            smxwtd = smcwtd
    if opt_inf == 2:
        for k in range(1, nsoil + 1):
            wdf[k], wcnd[k] = wdfcnd2(sh2o[k], sicemax, smcmax, bexp,
                                      dwsat, dksat)
            smx[k] = sh2o[k]
        if opt_run == 5:
            smxwtd = smcwtd * sh2o[nsoil] / smc[nsoil]

    denom, ddz, dsmdz, wflux = {}, {}, {}, {}
    qdrain = 0.0
    for k in range(1, nsoil + 1):
        if k == 1:
            denom[k] = -zsoil[k]
            temp1 = -zsoil[k + 1]
            ddz[k] = 2.0 / temp1
            dsmdz[k] = 2.0 * (smx[k] - smx[k + 1]) / temp1
            wflux[k] = (wdf[k] * dsmdz[k] + wcnd[k] - pddum
                        + etrani[k] + qseva)
        elif k < nsoil:
            denom[k] = zsoil[k - 1] - zsoil[k]
            temp1 = zsoil[k - 1] - zsoil[k + 1]
            ddz[k] = 2.0 / temp1
            dsmdz[k] = 2.0 * (smx[k] - smx[k + 1]) / temp1
            wflux[k] = (wdf[k] * dsmdz[k] + wcnd[k]
                        - wdf[k - 1] * dsmdz[k - 1] - wcnd[k - 1]
                        + etrani[k])
        else:
            denom[k] = zsoil[k - 1] - zsoil[k]
            if opt_run in (1, 2):
                qdrain = 0.0
            if opt_run == 3:
                qdrain = slope * wcnd[k]
            if opt_run == 4:
                qdrain = (1.0 - fcrmax) * wcnd[k]
            if opt_run == 5:
                temp1 = 2.0 * denom[k]
                if zwt < zsoil[nsoil] - denom[nsoil]:
                    smxbot = smx[k] - (smx[k] - smxwtd) * denom[k] * 2.0 \
                        / (denom[k] + zsoil[k] - zwt)
                else:
                    smxbot = smxwtd
                dsmdz[k] = 2.0 * (smx[k] - smxbot) / temp1
                qdrain = wdf[k] * dsmdz[k] + wcnd[k]
            wflux[k] = (-(wdf[k - 1] * dsmdz[k - 1]) - wcnd[k - 1]
                        + etrani[k] + qdrain)

    ai, bi, ci, rhstt = {}, {}, {}, {}
    for k in range(1, nsoil + 1):
        if k == 1:
            ai[k] = 0.0
            bi[k] = wdf[k] * ddz[k] / denom[k]
            ci[k] = -bi[k]
        elif k < nsoil:
            ai[k] = -wdf[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = -wdf[k] * ddz[k] / denom[k]
            bi[k] = -(ai[k] + ci[k])
        else:
            ai[k] = -wdf[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = 0.0
            bi[k] = -(ai[k] + ci[k])
        rhstt[k] = wflux[k] / (-denom[k])
    return rhstt, ai, bi, ci, qdrain, wcnd


def sstep(nsoil, dt, zsoil, dzsnso, sice, zwt, sh2o, smc, ai, bi, ci,
          rhstt, smcwtd, qdrain, deeprech, opt_run, smcmax):
    """SSTEP. Mutates copies; returns dict(sh2o, smc, smcwtd, qdrain,
    deeprech, wplus)."""
    sh2o = dict(sh2o)
    smc = dict(smc)
    ai = {k: ai[k] * dt for k in ai}
    bi = {k: 1.0 + bi[k] * dt for k in bi}
    ci = {k: ci[k] * dt for k in ci}
    rhstt = {k: rhstt[k] * dt for k in rhstt}
    delta = rosr12(ai, bi, ci, rhstt, 1, nsoil)
    for k in range(1, nsoil + 1):
        sh2o[k] = sh2o[k] + delta[k]

    wplus = 0.0
    if opt_run == 5:
        if zwt < zsoil[nsoil] - dzsnso[nsoil]:
            deeprech = deeprech + dt * qdrain
        else:
            smcwtd = smcwtd + dt * qdrain / dzsnso[nsoil]
            wplus = max(smcwtd - smcmax, 0.0) * dzsnso[nsoil]
            wminus = max(1.0e-4 - smcwtd, 0.0) * dzsnso[nsoil]
            smcwtd = max(min(smcwtd, smcmax), 1.0e-4)
            sh2o[nsoil] = sh2o[nsoil] + wplus / dzsnso[nsoil]
            qdrain = qdrain - wplus / dt
            deeprech = deeprech - wminus

    for k in range(nsoil, 1, -1):
        epore = max(1.0e-4, smcmax - sice[k])
        wplus = max(sh2o[k] - epore, 0.0) * dzsnso[k]
        sh2o[k] = min(epore, sh2o[k])
        sh2o[k - 1] = sh2o[k - 1] + wplus / dzsnso[k - 1]
    epore = max(1.0e-4, smcmax - sice[1])
    wplus = max(sh2o[1] - epore, 0.0) * dzsnso[1]
    sh2o[1] = min(epore, sh2o[1])
    for k in range(1, nsoil + 1):
        smc[k] = sh2o[k] + sice[k]
    return dict(sh2o=sh2o, smc=smc, smcwtd=smcwtd, qdrain=qdrain,
                deeprech=deeprech, wplus=wplus)


def soilwater(nsoil, dt, zsoil, dzsnso, qinsur, qseva, etrani, sice,
              sh2o, smc, zwt, is_urban, smcwtd, deeprech,
              opt_run, opt_inf,
              smcmax, smcwlt, bexp, dwsat, dksat, psisat, kdt, frzx,
              slope):
    """SOILWATER driver (:7680-7936). Returns dict of outputs."""
    sh2o = dict(sh2o)
    smc = dict(smc)

    runsrf = 0.0
    pddum = 0.0
    rsat = 0.0
    runsub = 0.0
    qdrain = 0.0

    for k in range(1, nsoil + 1):
        epore = max(1.0e-4, smcmax - sice[k])
        rsat += max(0.0, sh2o[k] - epore) * dzsnso[k]
        sh2o[k] = min(epore, sh2o[k])

    A = 4.0
    fcr = {}
    for k in range(1, nsoil + 1):
        fice = min(1.0, sice[k] / smcmax)
        fcr[k] = max(0.0, math.exp(-A * (1.0 - fice)) - math.exp(-A)) \
            / (1.0 - math.exp(-A))

    sicemax = 0.0
    fcrmax = 0.0
    for k in range(1, nsoil + 1):
        if sice[k] > sicemax:
            sicemax = sice[k]
        if fcr[k] > fcrmax:
            fcrmax = fcr[k]

    if opt_run == 2:
        fff, rsbmx = 2.0, 4.0
        zwt = zwteq(nsoil, zsoil, dzsnso, sh2o, smcmax, psisat, bexp)
        runsub = (1.0 - fcrmax) * rsbmx * math.exp(-TIMEAN) \
            * math.exp(-fff * zwt)

    if is_urban:
        fcr[1] = 0.95

    if opt_run == 1:
        fff = 6.0
        fsat = FSATMX * math.exp(-0.5 * fff * (zwt - 2.0))
        if qinsur > 0.0:
            runsrf = qinsur * ((1.0 - fcr[1]) * fsat + fcr[1])
            pddum = qinsur - runsrf
    if opt_run == 5:
        fff = 6.0
        fsat = FSATMX * math.exp(-0.5 * fff * max(-2.0 - zwt, 0.0))
        if qinsur > 0.0:
            runsrf = qinsur * ((1.0 - fcr[1]) * fsat + fcr[1])
            pddum = qinsur - runsrf
    if opt_run == 2:
        fff = 2.0
        fsat = FSATMX * math.exp(-0.5 * fff * zwt)
        if qinsur > 0.0:
            runsrf = qinsur * ((1.0 - fcr[1]) * fsat + fcr[1])
            pddum = qinsur - runsrf
    if opt_run == 3:
        pddum, runsrf = infil(nsoil, dt, zsoil, sh2o, sice, sicemax,
                              qinsur, smcmax, smcwlt, bexp, dwsat,
                              dksat, kdt, frzx)
    if opt_run == 4:
        smctot = 0.0
        dztot = 0.0
        for k in range(1, nsoil + 1):
            dztot += dzsnso[k]
            smctot += smc[k] * dzsnso[k]
            if dztot >= 2.0:
                break
        smctot = smctot / dztot
        fsat = max(0.01, smctot / smcmax) ** 4.0
        if qinsur > 0.0:
            runsrf = qinsur * ((1.0 - fcr[1]) * fsat + fcr[1])
            pddum = qinsur - runsrf

    niter = 1
    if opt_inf == 1:
        niter = 3
        if pddum * dt > dzsnso[1] * smcmax:
            niter = niter * 2
    dtfine = dt / niter

    qdrain_save = 0.0
    wcnd = None
    for _ in range(niter):
        rhstt, ai, bi, ci, qdrain, wcnd = srt(
            nsoil, zsoil, dtfine, pddum, etrani, qseva, sh2o, smc, zwt,
            fcr, sicemax, fcrmax, smcwtd, opt_inf, opt_run,
            smcmax, bexp, dwsat, dksat, slope)
        r = sstep(nsoil, dtfine, zsoil, dzsnso, sice, zwt, sh2o, smc,
                  ai, bi, ci, rhstt, smcwtd, qdrain, deeprech, opt_run,
                  smcmax)
        sh2o, smc = r["sh2o"], r["smc"]
        smcwtd, qdrain, deeprech = r["smcwtd"], r["qdrain"], r["deeprech"]
        rsat += r["wplus"]
        qdrain_save += qdrain
    qdrain = qdrain_save / niter

    runsrf = runsrf * 1000.0 + rsat * 1000.0 / dt
    qdrain = qdrain * 1000.0

    if opt_run == 2:
        wtsub = 0.0
        for k in range(1, nsoil + 1):
            wtsub += wcnd[k] * dzsnso[k]
        for k in range(1, nsoil + 1):
            mh2o = runsub * dt * (wcnd[k] * dzsnso[k]) / wtsub
            sh2o[k] = sh2o[k] - mh2o / (dzsnso[k] * 1000.0)

    if opt_run != 1:
        mliq = {k: sh2o[k] * dzsnso[k] * 1000.0
                for k in range(1, nsoil + 1)}
        watmin = 0.01
        for iz in range(1, nsoil):
            if mliq[iz] < 0.0:
                xs = watmin - mliq[iz]
            else:
                xs = 0.0
            mliq[iz] += xs
            mliq[iz + 1] -= xs
        iz = nsoil
        if mliq[iz] < watmin:
            xs = watmin - mliq[iz]
        else:
            xs = 0.0
        mliq[iz] += xs
        runsub = runsub - xs / dt
        if opt_run == 5:
            deeprech = deeprech - xs * 1.0e-3
        for iz in range(1, nsoil + 1):
            sh2o[iz] = mliq[iz] / (dzsnso[iz] * 1000.0)

    return dict(sh2o=sh2o, smc=smc, zwt=zwt, smcwtd=smcwtd,
                deeprech=deeprech, runsrf=runsrf, qdrain=qdrain,
                runsub=runsub, wcnd=wcnd, fcrmax=fcrmax)


def groundwater(nsoil, dt, sice, zsoil, wcnd, fcrmax, sh2o, zwt, wa, wt,
                smcmax, psisat, bexp):
    """GROUNDWATER SIMGM (:8403-8585). Returns dict."""
    sh2o = dict(sh2o)
    ROUS = 0.2
    CMIC = 0.20

    qdis = 0.0
    qin = 0.0
    dzmm = {1: -zsoil[1] * 1.0e3}
    for iz in range(2, nsoil + 1):
        dzmm[iz] = 1.0e3 * (zsoil[iz - 1] - zsoil[iz])
    znode = {1: -zsoil[1] / 2.0}
    for iz in range(2, nsoil + 1):
        znode[iz] = -zsoil[iz - 1] + 0.5 * (zsoil[iz - 1] - zsoil[iz])

    smc, mliq, epore, hk = {}, {}, {}, {}
    for iz in range(1, nsoil + 1):
        smc[iz] = sh2o[iz] + sice[iz]
        mliq[iz] = sh2o[iz] * dzmm[iz]
        epore[iz] = max(0.01, smcmax - sice[iz])
        hk[iz] = 1.0e3 * wcnd[iz]

    iwt = nsoil
    for iz in range(2, nsoil + 1):
        if zwt <= -zsoil[iz]:
            iwt = iz - 1
            break

    fff = 6.0
    rsbmx = 5.0
    qdis = (1.0 - fcrmax) * rsbmx * math.exp(-TIMEAN) \
        * math.exp(-fff * (zwt - 2.0))

    s_node = min(1.0, smc[iwt] / smcmax)
    s_node = max(s_node, 0.01)
    smpfz = -psisat * 1000.0 * s_node ** (-bexp)
    smpfz = max(-120000.0, CMIC * smpfz)

    ka = hk[iwt]
    wh_zwt = -zwt * 1.0e3
    wh = smpfz - znode[iwt] * 1.0e3
    qin = -ka * (wh_zwt - wh) / ((zwt - znode[iwt]) * 1.0e3)
    qin = max(-10.0 / dt, min(10.0 / dt, qin))

    wt = wt + (qin - qdis) * dt

    if iwt == nsoil:
        wa = wa + (qin - qdis) * dt
        wt = wa
        zwt = (-zsoil[nsoil] + 25.0) - wa / 1000.0 / ROUS
        mliq[nsoil] = mliq[nsoil] - qin * dt
        mliq[nsoil] = mliq[nsoil] + max(0.0, wa - 5000.0)
        wa = min(wa, 5000.0)
    else:
        if iwt == nsoil - 1:
            zwt = -zsoil[nsoil] \
                - (wt - ROUS * 1000 * 25.0) / epore[nsoil] / 1000.0
        else:
            ws = 0.0
            for iz in range(iwt + 2, nsoil + 1):
                ws += epore[iz] * dzmm[iz]
            zwt = -zsoil[iwt + 1] \
                - (wt - ROUS * 1000.0 * 25.0 - ws) / epore[iwt + 1] / 1000.0
        wtsub = 0.0
        for iz in range(1, nsoil + 1):
            wtsub += hk[iz] * dzmm[iz]
        for iz in range(1, nsoil + 1):
            mliq[iz] = mliq[iz] - qdis * dt * hk[iz] * dzmm[iz] / wtsub

    zwt = max(1.5, zwt)

    watmin = 0.01
    for iz in range(1, nsoil):
        if mliq[iz] < 0.0:
            xs = watmin - mliq[iz]
        else:
            xs = 0.0
        mliq[iz] += xs
        mliq[iz + 1] -= xs
    iz = nsoil
    if mliq[iz] < watmin:
        xs = watmin - mliq[iz]
    else:
        xs = 0.0
    mliq[iz] += xs
    wa = wa - xs
    wt = wt - xs

    for iz in range(1, nsoil + 1):
        sh2o[iz] = mliq[iz] / dzmm[iz]

    return dict(sh2o=sh2o, zwt=zwt, wa=wa, wt=wt, qin=qin, qdis=qdis)


def shallowwatertable(nsoil, zsoil, dzsnso, smceq, smc, wtd, smcwtd,
                      rech_unused, smcmax, psisat, bexp):
    """SHALLOWWATERTABLE (:8588-8718). Returns (wtd, smcwtd, rech)."""
    zsoil0 = {0: 0.0}
    for k in range(1, nsoil + 1):
        zsoil0[k] = zsoil[k]

    iz = 0
    for iz_ in range(nsoil, 0, -1):
        iz = iz_
        if wtd + 1.0e-6 < zsoil0[iz_]:
            break
    else:
        iz = 0
    # Fortran DO NSOIL,1,-1 with EXIT: if never exits, loop var = 0
    found = any(wtd + 1.0e-6 < zsoil0[j] for j in range(nsoil, 0, -1))
    if not found:
        iz = 0
    iwtd = iz
    kwtd = iwtd + 1
    rech = 0.0

    if kwtd <= nsoil:
        wtdold = wtd
        if smc[kwtd] > smceq[kwtd]:
            if smc[kwtd] == smcmax:  # wtd went to the layer above
                wtd = zsoil0[iwtd]
                rech = -(wtdold - wtd) * (smcmax - smceq[kwtd])
                iwtd = iwtd - 1
                kwtd = kwtd - 1
                if kwtd >= 1:
                    if smc[kwtd] > smceq[kwtd]:
                        wtdold = wtd
                        wtd = min((smc[kwtd] * dzsnso[kwtd]
                                   - smceq[kwtd] * zsoil0[iwtd]
                                   + smcmax * zsoil0[kwtd])
                                  / (smcmax - smceq[kwtd]), zsoil0[iwtd])
                        rech = rech - (wtdold - wtd) \
                            * (smcmax - smceq[kwtd])
            else:  # wtd stays in the layer
                wtd = min((smc[kwtd] * dzsnso[kwtd]
                           - smceq[kwtd] * zsoil0[iwtd]
                           + smcmax * zsoil0[kwtd])
                          / (smcmax - smceq[kwtd]), zsoil0[iwtd])
                rech = -(wtdold - wtd) * (smcmax - smceq[kwtd])
        else:  # wtd has gone down to the layer below
            wtd = zsoil0[kwtd]
            rech = -(wtdold - wtd) * (smcmax - smceq[kwtd])
            kwtd = kwtd + 1
            iwtd = iwtd + 1
            if kwtd <= nsoil:
                wtdold = wtd
                if smc[kwtd] > smceq[kwtd]:
                    wtd = min((smc[kwtd] * dzsnso[kwtd]
                               - smceq[kwtd] * zsoil0[iwtd]
                               + smcmax * zsoil0[kwtd])
                              / (smcmax - smceq[kwtd]), zsoil0[iwtd])
                else:
                    wtd = zsoil0[kwtd]
                rech = rech - (wtdold - wtd) * (smcmax - smceq[kwtd])
            else:
                wtdold = wtd
                smceqdeep = smcmax * (-psisat / (-psisat - dzsnso[nsoil])
                                      ) ** (1.0 / bexp)
                wtd = min((smcwtd * dzsnso[nsoil]
                           - smceqdeep * zsoil0[nsoil]
                           + smcmax * (zsoil0[nsoil] - dzsnso[nsoil]))
                          / (smcmax - smceqdeep), zsoil0[nsoil])
                rech = rech - (wtdold - wtd) * (smcmax - smceqdeep)
    elif wtd >= zsoil0[nsoil] - dzsnso[nsoil]:
        wtdold = wtd
        smceqdeep = smcmax * (-psisat / (-psisat - dzsnso[nsoil])
                              ) ** (1.0 / bexp)
        if smcwtd > smceqdeep:
            wtd = min((smcwtd * dzsnso[nsoil]
                       - smceqdeep * zsoil0[nsoil]
                       + smcmax * (zsoil0[nsoil] - dzsnso[nsoil]))
                      / (smcmax - smceqdeep), zsoil0[nsoil])
            rech = -(wtdold - wtd) * (smcmax - smceqdeep)
        else:
            rech = -(wtdold - (zsoil0[nsoil] - dzsnso[nsoil])) \
                * (smcmax - smceqdeep)
            wtdold = zsoil0[nsoil] - dzsnso[nsoil]
            dzup = (smceqdeep - smcwtd) * dzsnso[nsoil] \
                / (smcmax - smceqdeep)
            wtd = wtdold - dzup
            rech = rech - (smcmax - smceqdeep) * dzup
            smcwtd = smceqdeep

    if iwtd < nsoil:
        smcwtd = smcmax

    return wtd, smcwtd, rech
