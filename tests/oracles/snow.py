"""Scalar oracles: snowpack layer dynamics, transliterated from the
Fortran text of module_sf_noahmplsm.F90 — SNOWWATER (:6868-6996),
SNOWFALL (:6998-7063), COMBINE (:7065-7246), DIVIDE (:7248-7371),
COMBO (:7375-7425), COMPACT (:7427-7528), SNOWH2O (:7530-7678).

State is a dict of Fortran-indexed dicts: snow layers J=-NSNOW+1..0,
soil layers 1..NSOIL.  Test fixture only."""

import math

from . import TFRZ, CICE, CWAT, HFUS, DENICE, DENH2O, SSI


def combo(dz, wliq, wice, t, dz2, wliq2, wice2, t2):
    """COMBO: merge layer 2 into layer 1. Returns (dz, wliq, wice, t)."""
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


def snowfall(nsnow, dt, qsnow, snowhin, sfctmp, st):
    """SNOWFALL; st is the mutable state dict."""
    newnode = 0
    if st["isnow"] == 0 and qsnow > 0.0:
        st["snowh"] += snowhin * dt
        st["sneqv"] += qsnow * dt
    if st["isnow"] == 0 and qsnow > 0.0 and st["snowh"] >= 0.025:
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


def compact(nsnow, dt, imelt, ficeold, st):
    """COMPACT."""
    C2 = 21.0e-3
    C3 = 2.5e-6
    C4 = 0.04
    C5 = 2.0
    DM = 100.0
    ETA0 = 0.8e6
    burden = 0.0
    for j in range(st["isnow"] + 1, 1):
        wx = st["snice"][j] + st["snliq"][j]
        fice = st["snice"][j] / wx
        void = 1.0 - (st["snice"][j] / DENICE
                      + st["snliq"][j] / DENH2O) / st["dzsnso"][j]
        if void > 0.001 and st["snice"][j] > 0.1:
            bi = st["snice"][j] / st["dzsnso"][j]
            td = max(0.0, TFRZ - st["stc"][j])
            dexpf = math.exp(-C4 * td)
            ddz1 = -C3 * dexpf
            if bi > DM:
                ddz1 = ddz1 * math.exp(-46.0e-3 * (bi - DM))
            if st["snliq"][j] > 0.01 * st["dzsnso"][j]:
                ddz1 = ddz1 * C5
            ddz2 = -(burden + 0.5 * wx) * math.exp(
                -0.08 * td - C2 * bi) / ETA0
            # IMELT is INTENT(OUT) of PHASECHANGE and only set for the
            # layers active *before* SNOWFALL; a layer created this
            # step reads an undefined (zero-initialized) entry.
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


def combine(nsnow, nsoil, st):
    """COMBINE (:7065-7246), including ponding outputs into st."""
    DZMIN = [0.025, 0.025, 0.1]  # 1-based MSSI 1..3

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
                    if st["snice"][j] >= 0.0:
                        st["ponding1"] = st["snliq"][j]
                        st["sneqv"] = st["snice"][j]
                        st["snowh"] = st["dzsnso"][j]
                    else:
                        st["ponding1"] = st["snliq"][j] + st["snice"][j]
                        if st["ponding1"] < 0.0:
                            st["sice"][1] = max(
                                0.0, st["sice"][1]
                                + st["ponding1"] / (st["dzsoil"][1] * 1000.0))
                            st["ponding1"] = 0.0
                        st["sneqv"] = 0.0
                        st["snowh"] = 0.0
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

    sneqv = 0.0
    snowh = 0.0
    zwice = 0.0
    zwliq = 0.0
    for j in range(st["isnow"] + 1, 1):
        sneqv += st["snice"][j] + st["snliq"][j]
        snowh += st["dzsnso"][j]
        zwice += st["snice"][j]
        zwliq += st["snliq"][j]
    st["sneqv"] = sneqv
    st["snowh"] = snowh

    if st["snowh"] < 0.025 and st["isnow"] < 0:
        st["isnow"] = 0
        st["sneqv"] = zwice
        st["ponding2"] = zwliq
        if st["sneqv"] <= 0.0:
            st["snowh"] = 0.0

    if st["isnow"] < -1:
        isnow_old = st["isnow"]
        mssi = 1
        for i in range(isnow_old + 1, 1):
            if st["dzsnso"][i] < DZMIN[mssi - 1]:
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
                dz, wliq, wice, t = combo(
                    st["dzsnso"][j], st["snliq"][j], st["snice"][j],
                    st["stc"][j], st["dzsnso"][l], st["snliq"][l],
                    st["snice"][l], st["stc"][l])
                st["dzsnso"][j] = dz
                st["snliq"][j] = wliq
                st["snice"][j] = wice
                st["stc"][j] = t
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


def divide(nsnow, st):
    """DIVIDE (:7248-7371)."""
    dz = {}
    swice = {}
    swliq = {}
    tsno = {}
    isnow = st["isnow"]
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
            d2, l2, i2, t2 = combo(dz[2], swliq[2], swice[2], tsno[2],
                                   drr, zwliq, zwice, tsno[1])
            dz[2], swliq[2], swice[2], tsno[2] = d2, l2, i2, t2
            if msno <= 2 and dz[2] > 0.20:
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
            d3, l3, i3, t3 = combo(dz[3], swliq[3], swice[3], tsno[3],
                                   drr, zwliq, zwice, tsno[2])
            dz[3], swliq[3], swice[3], tsno[3] = d3, l3, i3, t3
    st["isnow"] = -msno
    for j in range(st["isnow"] + 1, 1):
        st["dzsnso"][j] = dz[j - st["isnow"]]
        st["snice"][j] = swice[j - st["isnow"]]
        st["snliq"][j] = swliq[j - st["isnow"]]
        st["stc"][j] = tsno[j - st["isnow"]]


def snowh2o(nsnow, nsoil, dt, qsnfro, qsnsub, qrain, st):
    """SNOWH2O (:7530-7678); sets st['qsnbot']."""
    if st["sneqv"] == 0.0:
        st["sice"][1] += (qsnfro - qsnsub) * dt / (st["dzsoil"][1] * 1000.0)
        if st["sice"][1] < 0.0:
            st["sh2o"][1] += st["sice"][1]
            st["sice"][1] = 0.0

    if st["isnow"] == 0 and st["sneqv"] > 0.0:
        temp = st["sneqv"]
        st["sneqv"] = st["sneqv"] - qsnsub * dt + qsnfro * dt
        propor = st["sneqv"] / temp
        st["snowh"] = max(0.0, propor * st["snowh"])
        if st["sneqv"] < 0.0:
            st["sice"][1] += st["sneqv"] / (st["dzsoil"][1] * 1000.0)
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
            combine(nsnow, nsoil, st)
        if st["isnow"] < 0:
            st["snliq"][st["isnow"] + 1] += qrain * dt
            st["snliq"][st["isnow"] + 1] = max(
                0.0, st["snliq"][st["isnow"] + 1])

    vol_ice = {}
    epore = {}
    vol_liq = {}
    for j in range(-nsnow + 1, 1):
        if j >= st["isnow"] + 1:
            vol_ice[j] = min(1.0, st["snice"][j]
                             / (st["dzsnso"][j] * DENICE))
            epore[j] = 1.0 - vol_ice[j]
            vol_liq[j] = min(epore[j], st["snliq"][j]
                             / (st["dzsnso"][j] * DENH2O))
    qin = 0.0
    qout = 0.0
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
    st["qsnbot"] = qout / dt


def snowwater(nsnow, nsoil, dt, zsoil, imelt, ficeold, sfctmp, snowhin,
              qsnow, qsnfro, qsnsub, qrain, st):
    """SNOWWATER driver (:6868-6996); st holds the full column state."""
    st["snoflow"] = 0.0
    st["ponding1"] = 0.0
    st["ponding2"] = 0.0

    snowfall(nsnow, dt, qsnow, snowhin, sfctmp, st)
    if st["isnow"] < 0:
        compact(nsnow, dt, imelt, ficeold, st)
    if st["isnow"] < 0:
        combine(nsnow, nsoil, st)
    if st["isnow"] < 0:
        divide(nsnow, st)
    snowh2o(nsnow, nsoil, dt, qsnfro, qsnsub, qrain, st)

    for iz in range(-nsnow + 1, st["isnow"] + 1):
        st["snice"][iz] = 0.0
        st["snliq"][iz] = 0.0
        st["stc"][iz] = 0.0
        st["dzsnso"][iz] = 0.0

    if st["sneqv"] > 2000.0:
        bdsnow = st["snice"][0] / st["dzsnso"][0]
        snoflow = st["sneqv"] - 2000.0
        st["snice"][0] -= snoflow
        st["dzsnso"][0] -= snoflow / bdsnow
        st["snoflow"] = snoflow / dt

    if st["isnow"] < 0:
        sneqv = 0.0
        for iz in range(st["isnow"] + 1, 1):
            sneqv += st["snice"][iz] + st["snliq"][iz]
        st["sneqv"] = sneqv

    # rebuild zsnso (:6976-6994); dzsnso negated in place, soil reset
    dzsnso = st["dzsnso"]
    zsnso = {}
    for iz in range(st["isnow"] + 1, 1):
        dzsnso[iz] = -dzsnso[iz]
    dzsnso[1] = zsoil[1]
    for iz in range(2, nsoil + 1):
        dzsnso[iz] = zsoil[iz] - zsoil[iz - 1]
    zsnso[st["isnow"] + 1] = dzsnso[st["isnow"] + 1]
    for iz in range(st["isnow"] + 2, nsoil + 1):
        zsnso[iz] = zsnso[iz - 1] + dzsnso[iz]
    for iz in range(st["isnow"] + 1, nsoil + 1):
        dzsnso[iz] = -dzsnso[iz]
    st["zsnso"] = zsnso
