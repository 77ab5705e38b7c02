"""Scalar oracles: ATM (:949-1007), PHENOLOGY (:1010-1104), CANWATER
(:6615-6866), THERMOPROP/CSNOW/TDFCND (:1845-2118), and the ENERGY
prelude — FSNO/roughness (:1544-1563), BTRAN (:1617-1640),
RSURF/RHSUR (:1644-1664) — from module_sf_noahmplsm.F90.
Test fixture only."""

import math

from . import (GRAV, TFRZ, HSUB, HVAP, HFUS, CWAT, CICE, CPAIR, TKWAT,
               TKICE, RAIR, RW, DENH2O, DENICE, M_MELT, Z0SNO)

MPE = 1e-6


def atm(sfcprs, sfctmp, q2, prcp, soldn, cosz):
    pair = sfcprs
    thair = sfctmp * (sfcprs / pair) ** (RAIR / CPAIR)
    qair = q2
    eair = qair * sfcprs / (0.622 + 0.378 * qair)
    rhoair = (sfcprs - 0.378 * eair) / (RAIR * sfctmp)
    qprecc = 0.10 * prcp
    qprecl = 0.90 * prcp
    swdown = 0.0 if cosz <= 0.0 else soldn
    solad = [swdown * 0.7 * 0.5, swdown * 0.7 * 0.5]
    solai = [swdown * 0.3 * 0.5, swdown * 0.3 * 0.5]
    return dict(thair=thair, qair=qair, eair=eair, rhoair=rhoair,
                qprecc=qprecc, qprecl=qprecl, solad=solad, solai=solai,
                swdown=swdown)


def phenology(dveg, snowh, tv, lat, yearlen, julian, laim_row, saim_row,
              hvt, hvb, tmin, lai, sai, masked):
    """PHENOLOGY.  laim_row/saim_row: 12-entry monthly tables for the
    column's veg type; `masked` = vegtyp in (water,barren,snow,urban).
    Returns (lai, sai, elai, esai, igs, htop)."""
    if dveg in (1, 3, 4):
        if lat >= 0.0:
            day = julian
        else:
            day = math.fmod(julian + 0.5 * yearlen, float(yearlen))
        t = 12.0 * day / float(yearlen)
        it1 = int(t + 0.5)
        it2 = it1 + 1
        wt1 = (it1 + 0.5) - t
        wt2 = 1.0 - wt1
        if it1 < 1:
            it1 = 12
        if it2 > 12:
            it2 = 1
        lai = wt1 * laim_row[it1 - 1] + wt2 * laim_row[it2 - 1]
        sai = wt1 * saim_row[it1 - 1] + wt2 * saim_row[it2 - 1]
    if sai < 0.01:
        sai = 0.0
    if lai < 0.05 or sai == 0.0:
        lai = 0.0
    if masked:
        lai = 0.0
        sai = 0.0

    db = min(max(snowh - hvb, 0.0), hvt - hvb)
    fb = db / max(1.0e-6, hvt - hvb)
    if hvt > 0.0 and hvt <= 1.0:
        snowhc = hvt * math.exp(-snowh / 0.2)
        fb = min(snowh, snowhc) / snowhc
    elai = lai * (1.0 - fb)
    esai = sai * (1.0 - fb)
    if esai < 0.01:
        esai = 0.0
    if elai < 0.05 or esai == 0.0:
        elai = 0.0
    igs = 1.0 if tv > tmin else 0.0
    htop = hvt
    return lai, sai, elai, esai, igs, htop


def canwater(opt_snf, dt, sfctmp, uu, vv, fcev, fctr, qprecc, qprecl,
             elai, esai, ist, tg, fveg, frozen_canopy, canliq, canice,
             tv, ch2op):
    """CANWATER. Returns a result dict."""
    fp = 0.0
    if opt_snf == 1:
        if sfctmp > TFRZ + 2.5:
            fpice = 0.0
        else:
            if sfctmp <= TFRZ + 0.5:
                fpice = 1.0
            elif sfctmp <= TFRZ + 2.0:
                fpice = 1.0 - (-54.632 + 0.2 * sfctmp)
            else:
                fpice = 0.6
    elif opt_snf == 2:
        fpice = 0.0 if sfctmp >= TFRZ + 2.2 else 1.0
    else:
        fpice = 0.0 if sfctmp >= TFRZ else 1.0

    bdfall = min(120.0, 67.92 + 51.25 * math.exp((sfctmp - TFRZ) / 2.59))
    rain = (qprecc + qprecl) * (1.0 - fpice)
    snow = (qprecc + qprecl) * fpice
    if qprecc + qprecl > 0.0:
        fp = (qprecc + qprecl) / (10.0 * qprecc + qprecl)

    maxliq = ch2op * (elai + esai)
    if (elai + esai) > 0.0:
        qintr = fveg * rain * fp
        qintr = min(qintr, (maxliq - canliq) / dt
                    * (1.0 - math.exp(-rain * dt / maxliq)))
        qintr = max(qintr, 0.0)
        qdripr = fveg * rain - qintr
        qthror = (1.0 - fveg) * rain
    else:
        qintr = 0.0
        qdripr = 0.0
        qthror = rain

    if not frozen_canopy:
        etran = max(fctr / HVAP, 0.0)
        qevac = max(fcev / HVAP, 0.0)
        qdewc = abs(min(fcev / HVAP, 0.0))
        qsubc = 0.0
        qfroc = 0.0
    else:
        etran = max(fctr / HSUB, 0.0)
        qevac = 0.0
        qdewc = 0.0
        qsubc = max(fcev / HSUB, 0.0)
        qfroc = abs(min(fcev / HSUB, 0.0))

    qevac = min(canliq / dt, qevac)
    canliq = max(0.0, canliq + (qintr + qdewc - qevac) * dt)
    if canliq <= 1.0e-6:
        canliq = 0.0

    maxsno = 6.6 * (0.27 + 46.0 / bdfall) * (elai + esai)
    if (elai + esai) > 0.0:
        qints = fveg * snow * fp
        qints = min(qints, (maxsno - canice) / dt
                    * (1.0 - math.exp(-snow * dt / maxsno)))
        qints = max(qints, 0.0)
        ft = max(0.0, (tv - 270.15) / 1.87e5)
        fv = math.sqrt(uu * uu + vv * vv) / 1.56e5
        qdrips = max(0.0, canice) * (fv + ft)
        qthros = (1.0 - fveg) * snow + (fveg * snow - qints)
    else:
        qints = 0.0
        qdrips = 0.0
        qthros = snow

    qsubc = min(canice / dt, qsubc)
    canice = max(0.0, canice + (qints - qdrips) * dt
                 + (qfroc - qsubc) * dt)
    if canice <= 1.0e-6:
        canice = 0.0

    if canice > 0.0:
        fwet = max(0.0, canice) / max(maxsno, 1.0e-6)
    else:
        fwet = max(0.0, canliq) / max(maxliq, 1.0e-6)
    fwet = min(fwet, 1.0) ** 0.667

    if canice > 1.0e-6 and tv > TFRZ:
        qmeltc = min(canice / dt,
                     (tv - TFRZ) * CICE * canice / DENICE / (dt * HFUS))
        canice = max(0.0, canice - qmeltc * dt)
        canliq = max(0.0, canliq + qmeltc * dt)
        tv = fwet * TFRZ + (1.0 - fwet) * tv
    if canliq > 1.0e-6 and tv < TFRZ:
        qfrzc = min(canliq / dt,
                    (TFRZ - tv) * CWAT * canliq / DENH2O / (dt * HFUS))
        canliq = max(0.0, canliq - qfrzc * dt)
        canice = max(0.0, canice + qfrzc * dt)
        tv = fwet * TFRZ + (1.0 - fwet) * tv

    cmc = canliq + canice
    ecan = qevac + qsubc - qdewc - qfroc
    qrain = qdripr + qthror
    qsnow = qdrips + qthros
    snowhin = qsnow / bdfall
    if ist == 2 and tg > TFRZ:
        qsnow = 0.0
        snowhin = 0.0
    return dict(canliq=canliq, canice=canice, tv=tv, cmc=cmc, ecan=ecan,
                etran=etran, qrain=qrain, qsnow=qsnow, snowhin=snowhin,
                fwet=fwet, fpice=fpice)


def csnow(isnow, snice, snliq, dzsnso):
    """CSNOW; snice/snliq/dzsnso dicts -NSNOW+1..0 (active only read)."""
    snicev, epore, snliqv, cvsno, tksno = {}, {}, {}, {}, {}
    for iz in range(isnow + 1, 1):
        snicev[iz] = min(1.0, snice[iz] / (dzsnso[iz] * DENICE))
        epore[iz] = 1.0 - snicev[iz]
        snliqv[iz] = min(epore[iz], snliq[iz] / (dzsnso[iz] * DENH2O))
    for iz in range(isnow + 1, 1):
        bdsnoi = (snice[iz] + snliq[iz]) / dzsnso[iz]
        cvsno[iz] = CICE * snicev[iz] + CWAT * snliqv[iz]
        tksno[iz] = 3.2217e-6 * bdsnoi ** 2.0
    return tksno, cvsno, snicev, snliqv, epore


def tdfcnd(smc, sh2o, smcmax, quartz):
    satratio = smc / smcmax
    thkw = 0.57
    thko = 2.0
    thkqtz = 7.7
    thks = (thkqtz ** quartz) * (thko ** (1.0 - quartz))
    xunfroz = sh2o / smc
    xu = xunfroz * smcmax
    thksat = thks ** (1.0 - smcmax) * TKICE ** (smcmax - xu) \
        * thkw ** xu
    gammd = (1.0 - smcmax) * 2700.0
    thkdry = (0.135 * gammd + 64.7) / (2700.0 - 0.947 * gammd)
    if (sh2o + 0.0005) < smc:
        ake = satratio
    else:
        if satratio > 0.1:
            ake = math.log10(satratio) + 1.0
        else:
            ake = 0.0
    return ake * (thksat - thkdry) + thkdry


def thermoprop(nsoil, nsnow, isnow, ist, dzsnso, dt, snowh, snice,
               snliq, csoil, smc, sh2o, tg, stc, is_urban,
               smcmax, quartz):
    """THERMOPROP. dicts keyed Fortran-style. Returns (df, hcpct, fact)."""
    df, hcpct, fact = {}, {}, {}
    tksno, cvsno, _, _, _ = csnow(isnow, snice, snliq, dzsnso)
    for iz in range(isnow + 1, 1):
        df[iz] = tksno[iz]
        hcpct[iz] = cvsno[iz]
    for iz in range(1, nsoil + 1):
        sice = smc[iz] - sh2o[iz]
        hcpct[iz] = sh2o[iz] * CWAT + (1.0 - smcmax) * csoil \
            + (smcmax - smc[iz]) * CPAIR + sice * CICE
        df[iz] = tdfcnd(smc[iz], sh2o[iz], smcmax, quartz)
    if is_urban:
        for iz in range(1, nsoil + 1):
            df[iz] = 3.24
    if ist == 2:
        for iz in range(1, nsoil + 1):
            if stc[iz] > TFRZ:
                hcpct[iz] = CWAT
                df[iz] = TKWAT
            else:
                hcpct[iz] = CICE
                df[iz] = TKICE
    for iz in range(isnow + 1, nsoil + 1):
        fact[iz] = dt / (hcpct[iz] * dzsnso[iz])
    if isnow == 0:
        df[1] = (df[1] * dzsnso[1] + 0.35 * snowh) / (snowh + dzsnso[1])
    else:
        df[1] = (df[1] * dzsnso[1] + df[0] * dzsnso[0]) \
            / (dzsnso[0] + dzsnso[1])
    return df, hcpct, fact


def fsno_roughness(ist, tg, snowh, sneqv, z0, veg, htop, zref):
    """ENERGY prelude :1544-1563. Returns (fsno, z0mg, zpd, z0m, zlvl)."""
    fsno = 0.0
    if snowh > 0.0:
        bdsno = sneqv / snowh
        fmelt = (bdsno / 100.0) ** M_MELT
        fsno = math.tanh(snowh / (2.5 * z0 * fmelt))
    if ist == 2:
        if tg <= TFRZ:
            z0mg = 0.01 * (1.0 - fsno) + fsno * Z0SNO
        else:
            z0mg = 0.01
    else:
        z0mg = z0 * (1.0 - fsno) + fsno * Z0SNO
    zpdg = snowh
    if veg:
        z0m = None  # Z0MVT, resolved by caller
        zpd = 0.65 * htop
        if snowh > zpd:
            zpd = snowh
    else:
        z0m = z0mg
        zpd = zpdg
    zlvl = max(zpd, htop) + zref
    if zpdg >= zlvl:
        zlvl = zpdg + zref
    return fsno, z0mg, zpd, z0m, zlvl


def btran_fn(opt_btr, nroot, sh2o, dzsnso, zsoil, smcwlt, smcref,
             smcmax, psisat, bexp, psiwlt):
    """BTRAN (:1617-1640). sh2o/dzsnso/zsoil 1-based dicts.
    Returns (btran, btrani dict)."""
    btran = 0.0
    btrani = {}
    for iz in range(1, nroot + 1):
        if opt_btr == 1:
            gx = (sh2o[iz] - smcwlt) / (smcref - smcwlt)
        if opt_btr == 2:
            psi = max(psiwlt, -psisat
                      * (max(0.01, sh2o[iz]) / smcmax) ** (-bexp))
            gx = (1.0 - psi / psiwlt) / (1.0 + psisat / psiwlt)
        if opt_btr == 3:
            psi = max(psiwlt, -psisat
                      * (max(0.01, sh2o[iz]) / smcmax) ** (-bexp))
            gx = 1.0 - math.exp(-5.8 * math.log(psiwlt / psi))
        gx = min(1.0, max(0.0, gx))
        btrani[iz] = max(MPE, dzsnso[iz] / (-zsoil[nroot]) * gx)
        btran = btran + btrani[iz]
    btran = max(MPE, btran)
    for iz in range(1, nroot + 1):
        btrani[iz] = btrani[iz] / btran
    return btran, btrani


def rsurf_rhsur(ist, fsno, snowh, sh2o1, tg, zsoil1, smcmax, smcwlt,
                bexp, psisat, is_urban):
    """RSURF/RHSUR (:1644-1669). Returns (rsurf, rhsur)."""
    if ist == 2:
        rsurf = 1.0
        rhsur = 1.0
    else:
        l_rsurf = (-zsoil1) * (math.exp(
            (1.0 - min(1.0, sh2o1 / smcmax)) ** 5) - 1.0) / (2.71828 - 1.0)
        d_rsurf = 2.2e-5 * smcmax * smcmax \
            * (1.0 - smcwlt / smcmax) ** (2.0 + 3.0 / bexp)
        rsurf = l_rsurf / d_rsurf
        if sh2o1 < 0.01 and snowh == 0.0:
            rsurf = 1.0e6
        psi = -psisat * (max(0.01, sh2o1) / smcmax) ** (-bexp)
        rhsur = fsno + (1.0 - fsno) * math.exp(psi * GRAV / (RW * tg))
    if is_urban and snowh == 0.0:
        rsurf = 1.0e6
    return rsurf, rhsur
