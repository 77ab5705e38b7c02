"""Scalar oracle: PHASECHANGE (module_sf_noahmplsm.F90:6039-6245) and
FRH2O (:6247-6380), transliterated statement-by-statement from the
Fortran text.  Double precision, python loops, Fortran layer indexing
J = -NSNOW+1 .. NSOIL mapped onto a python dict keyed by J.

Independent of noahmp_tpu — test fixture only.
"""

import math

from . import GRAV, TFRZ, HFUS


def frh2o(tkelv, smc, sh2o, bexp, psisat, smcmax):
    """FRH2O (:6247-6380): Koren99 supercooled liquid water."""
    CK, BLIM, ERROR = 8.0, 5.5, 0.005
    bx = bexp
    if bexp > BLIM:
        bx = BLIM
    nlog = 0
    kcount = 0
    if tkelv > (TFRZ - 1.0e-3):
        return smc
    # option 1: iterated solution (CK /= 0)
    swl = smc - sh2o
    if swl > (smc - 0.02):
        swl = smc - 0.02
    if swl < 0.0:
        swl = 0.0
    while (nlog < 10) and (kcount == 0):
        nlog += 1
        df = (math.log((psisat * GRAV / HFUS) * ((1.0 + CK * swl) ** 2.0)
                       * (smcmax / (smc - swl)) ** bx)
              - math.log(-(tkelv - TFRZ) / tkelv))
        denom = 2.0 * CK / (1.0 + CK * swl) + bx / (smc - swl)
        swlk = swl - df / denom
        if swlk > (smc - 0.02):
            swlk = smc - 0.02
        if swlk < 0.0:
            swlk = 0.0
        dswl = abs(swlk - swl)
        swl = swlk
        if dswl <= ERROR:
            kcount += 1
    free = smc - swl
    if kcount == 0:
        # option 2: Flerchinger explicit (:6355-6366)
        fk = ((HFUS / (GRAV * (-psisat)))
              * ((tkelv - TFRZ) / tkelv)) ** (-1.0 / bx) * smcmax
        if fk < 0.02:
            fk = 0.02
        free = min(fk, smc)
    return free


def phasechange(nsnow, nsoil, isnow, dt, fact, dzsnso, ist,
                stc, snice, snliq, sneqv, snowh, smc, sh2o,
                opt_frz, bexp, psisat, smcmax):
    """PHASECHANGE (:6039-6245).

    fact/dzsnso/stc: dicts keyed J=-nsnow+1..nsoil.
    snice/snliq: dicts keyed J=-nsnow+1..0.  smc/sh2o: dicts 1..nsoil.
    Returns dict of outputs (mutated copies).
    """
    stc = dict(stc)
    snice = dict(snice)
    snliq = dict(snliq)
    smc = dict(smc)
    sh2o = dict(sh2o)

    qmelt = 0.0
    ponding = 0.0
    xmf = 0.0

    rng_all = range(-nsnow + 1, nsoil + 1)
    supercool = {j: 0.0 for j in rng_all}
    mice = {}
    mliq = {}
    for j in range(isnow + 1, 1):
        mice[j] = snice[j]
        mliq[j] = snliq[j]
    for j in range(1, nsoil + 1):
        mliq[j] = sh2o[j] * dzsnso[j] * 1000.0
        mice[j] = (smc[j] - sh2o[j]) * dzsnso[j] * 1000.0

    imelt = {}
    hm = {}
    xm = {}
    wice0 = {}
    wliq0 = {}
    wmass0 = {}
    for j in range(isnow + 1, nsoil + 1):
        imelt[j] = 0
        hm[j] = 0.0
        xm[j] = 0.0
        wice0[j] = mice[j]
        wliq0[j] = mliq[j]
        wmass0[j] = mice[j] + mliq[j]

    if ist == 1:
        for j in range(1, nsoil + 1):
            if opt_frz == 1:
                if stc[j] < TFRZ:
                    smp = HFUS * (TFRZ - stc[j]) / (GRAV * stc[j])
                    supercool[j] = smcmax * (smp / psisat) ** (-1.0 / bexp)
                    supercool[j] *= dzsnso[j] * 1000.0
            if opt_frz == 2:
                supercool[j] = frh2o(stc[j], smc[j], sh2o[j],
                                     bexp, psisat, smcmax)
                supercool[j] *= dzsnso[j] * 1000.0

    for j in range(isnow + 1, nsoil + 1):
        if mice[j] > 0.0 and stc[j] >= TFRZ:
            imelt[j] = 1
        if mliq[j] > supercool[j] and stc[j] < TFRZ:
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

    # layer-less snow (:6177-6193)
    if isnow == 0 and sneqv > 0.0 and xm[1] > 0.0:
        temp1 = sneqv
        sneqv = max(0.0, temp1 - xm[1])
        propor = sneqv / temp1
        snowh = max(0.0, propor * snowh)
        heatr = hm[1] - HFUS * (temp1 - sneqv) / dt
        if heatr > 0.0:
            xm[1] = heatr * dt / HFUS
            hm[1] = heatr
        else:
            xm[1] = 0.0
            hm[1] = 0.0
        qmelt = max(0.0, temp1 - sneqv) / dt
        xmf = HFUS * qmelt
        ponding = temp1 - sneqv

    # per-layer melt/freeze (:6197-6233)
    for j in range(isnow + 1, nsoil + 1):
        if imelt[j] > 0 and abs(hm[j]) > 0.0:
            heatr = 0.0
            if xm[j] > 0.0:
                mice[j] = max(0.0, wice0[j] - xm[j])
                heatr = hm[j] - HFUS * (wice0[j] - mice[j]) / dt
            elif xm[j] < 0.0:
                if j <= 0:
                    mice[j] = min(wmass0[j], wice0[j] - xm[j])
                else:
                    if wmass0[j] < supercool[j]:
                        mice[j] = 0.0
                    else:
                        mice[j] = min(wmass0[j] - supercool[j],
                                      wice0[j] - xm[j])
                        mice[j] = max(mice[j], 0.0)
                heatr = hm[j] - HFUS * (wice0[j] - mice[j]) / dt
            mliq[j] = max(0.0, wmass0[j] - mice[j])
            if abs(heatr) > 0.0:
                stc[j] = stc[j] + fact[j] * heatr
                if j <= 0:
                    if mliq[j] * mice[j] > 0.0:
                        stc[j] = TFRZ
            xmf = xmf + HFUS * (wice0[j] - mice[j]) / dt
            if j < 1:
                qmelt = qmelt + max(0.0, wice0[j] - mice[j]) / dt

    for j in range(isnow + 1, 1):
        snliq[j] = mliq[j]
        snice[j] = mice[j]
    for j in range(1, nsoil + 1):
        sh2o[j] = mliq[j] / (1000.0 * dzsnso[j])
        smc[j] = (mliq[j] + mice[j]) / (1000.0 * dzsnso[j])

    return dict(stc=stc, snice=snice, snliq=snliq, sneqv=sneqv,
                snowh=snowh, smc=smc, sh2o=sh2o, qmelt=qmelt,
                imelt=imelt, ponding=ponding, xmf=xmf)
