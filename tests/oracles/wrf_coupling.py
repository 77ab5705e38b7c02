"""Scalar float64 oracle transliterations of the FULL WRF-coupling
surface-layer entry points, statement-level from the reference:

- MYJSFC grid wrapper      phys/module_sf_myjsfc.F90:66-356
- MYJ SFCDIF (land + sea)  phys/module_sf_myjsfc.F90:359-1053
- SFCLAY1D                 phys/module_sf_sfclay.F90:244-889

Test-only code (not packaged): these keep the reference's lookup-table
psi path (tables from oracles/sfcdif34.py) so the shipped analytic-psi
TPU implementation in noahmp_tpu/physics/wrf_coupling.py is pinned
against the table-interpolated values, exactly as the sfcdif3/4 slice
oracles do.
"""

import numpy as np

from .sfcdif34 import (_PSIM2, _PSIH2, _ZTMAX2,
                       psi_myj_lookup, psi_sfclay_lookup)

# MODULE_SF_MYJSFC constants (module_sf_myjsfc.F90:23-57)
G = 9.81
R_D = 287.0
CP = 7.0 * R_D / 2.0
XLV = 2.5e6
P1000MB = 1.0e5
P608 = 461.6 / R_D - 1.0
CAPA = R_D / CP
ELOCP = 2.72e6 / CP
RCAP = 1.0 / CAPA
GOCP02 = G / CP * 2.0
GOCP10 = G / CP * 10.0
EPSU2 = 1.0e-6
EPSUST = 1.0e-9
EPSZT = 1.0e-28
A2S, A3S, A4S = 17.2693882, 273.16, 35.86
PQ0 = 379.90516
PQ0SEA = PQ0 * 0.98
EXCML = EXCMS = 1.0e-4
QVISC, TVISC, VISC = 2.1e-5, 2.1e-5, 1.5e-5
RIC = 0.505
SQVISC = 258.2
USTC, USTR = 0.7, 0.225
FH = 1.01
WWST = 1.2
WWST2 = WWST * WWST
CZIV = 0.35 * 30.0
GRRS = 10.0 / 30.0
RTVISC, RVISC, RQVISC = 1.0 / TVISC, 1.0 / VISC, 1.0 / QVISC
ZQRZT = 1.0
FZQ1 = FZQ2 = RTVISC * QVISC * ZQRZT
FZT1 = RVISC * TVISC * 0.84
FZT2 = CZIV * GRRS * TVISC * 0.84
FZU1 = CZIV * VISC
USTFC = 0.018 / G
EPSQ2 = 0.2
CZETMAX = 10.0
VKARMAN = 0.4
ITRMX = 5
ZTMIN2 = -5.0


def myj_sfcdif_oracle(first_step, seamask, ths, qs, psfc, tz0, tsk,
                      thz0, qz0, uz0, vz0, ustar, z0, z0base, akms,
                      akhs, pblh, wetm, ulow, vlow, tlow, thlow,
                      thelow, qlow, cwmlow, zsl, plow):
    """Scalar MYJ SFCDIF (:359-1053), table psi.  Returns a dict of
    the INOUT state and every OUT diagnostic."""
    ntsd1 = bool(first_step)
    rdz = 1.0 / zsl
    cxchl = EXCML * rdz
    cxchs = EXCMS * rdz
    btgx = G / thlow
    elfc = VKARMAN * btgx
    btgh = btgx * (pblh if pblh > 1000.0 else 1000.0)

    if seamask > 0.5:
        # ---------------- sea points (:659-636) ----------------
        for _ in range(ITRMX):
            z0 = max(USTFC * ustar * ustar, 1.59e-5)
            if ustar < USTC:
                if ustar < USTR:
                    if ntsd1:
                        akms = cxchs
                        akhs = cxchs
                        qs = qlow
                    zu = FZU1 * np.sqrt(np.sqrt(z0 * ustar * RVISC)) / ustar
                    wght = akms * zu * RVISC
                    rwgh = wght / (wght + 1.0)
                    uz0 = (ulow * rwgh + uz0) * 0.5
                    vz0 = (vlow * rwgh + vz0) * 0.5
                    zt = FZT1 * zu
                    zq = FZQ1 * zt
                    wghtt = akhs * zt * RTVISC
                    wghtq = akhs * zq * RQVISC
                    if not ntsd1:
                        thz0 = ((wghtt * thlow + ths) / (wghtt + 1.0) + thz0) * 0.5
                        qz0 = ((wghtq * qlow + qs) / (wghtq + 1.0) + qz0) * 0.5
                    else:
                        thz0 = (wghtt * thlow + ths) / (wghtt + 1.0)
                        qz0 = (wghtq * qlow + qs) / (wghtq + 1.0)
                else:
                    zu = z0
                    uz0 = 0.0
                    vz0 = 0.0
                    zt = FZT2 * np.sqrt(np.sqrt(z0 * ustar * RVISC)) / ustar
                    zq = FZQ2 * zt
                    wghtt = akhs * zt * RTVISC
                    wghtq = akhs * zq * RQVISC
                    if not ntsd1:
                        thz0 = ((wghtt * thlow + ths) / (wghtt + 1.0) + thz0) * 0.5
                        qz0 = ((wghtq * qlow + qs) / (wghtq + 1.0) + qz0) * 0.5
                    else:
                        thz0 = (wghtt * thlow + ths) / (wghtt + 1.0)
                        qz0 = (wghtq * qlow + qs) / (wghtq + 1.0)
            else:
                zu = z0
                uz0 = 0.0
                vz0 = 0.0
                zt = z0
                thz0 = ths
                zq = z0
                qz0 = qs
            tem = (tlow + tz0) * 0.5
            thm = (thelow + thz0) * 0.5
            a = thm * P608
            b = (ELOCP / tem - 1.0 - P608) * thm
            dthv = ((thelow - thz0) * ((qlow + qz0 + cwmlow) * (0.5 * P608) + 1.0)
                    + (qlow - qz0 + cwmlow) * a + cwmlow * b)
            du2 = max((ulow - uz0) ** 2 + (vlow - vz0) ** 2, EPSU2)
            rib = btgx * dthv * zsl / du2
            zslu = zsl + zu
            zslt = zsl + zt
            rzsu = zslu / zu
            rzst = zslt / zt
            rlogu = np.log(rzsu)
            rlogt = np.log(rzst)
            rlmo = elfc * akhs * dthv / ustar ** 3
            ztmax = _ZTMAX2        # ZTMAX1 == ZTMAX2 (same [-5,1] range)
            zetalu = min(max(zslu * rlmo, ZTMIN2), ztmax)
            zetalt = min(max(zslt * rlmo, ZTMIN2), ztmax)
            zetau = min(max(zu * rlmo, ZTMIN2 / rzsu), ztmax / rzsu)
            zetat = min(max(zt * rlmo, ZTMIN2 / rzst), ztmax / rzst)
            psmz = psi_myj_lookup(zetau, _PSIM2)
            psmzl = psi_myj_lookup(zetalu, _PSIM2)
            pshz = psi_myj_lookup(zetat, _PSIH2)
            pshzl = psi_myj_lookup(zetalt, _PSIH2)
            simm = psmzl - psmz + rlogu
            simh = pshzl - pshz + rlogt
            ustark = ustar * VKARMAN
            akms = max(ustark / simm, cxchs)
            akhs = max(ustark / simh, cxchs)
            if dthv <= 0.0:
                wstar2 = WWST2 * abs(btgh * akhs * dthv) ** (2.0 / 3.0)
            else:
                wstar2 = 0.0
            ustar = max(np.sqrt(akms * np.sqrt(du2 + wstar2)), EPSUST)
    else:
        # ---------------- land points (:641-805) ----------------
        if ntsd1:
            qs = qlow
        zu = z0
        uz0 = 0.0
        vz0 = 0.0
        zt = zu * 1.0                     # ZTFC=1
        thz0 = ths
        zq = zt
        qz0 = qs
        tem = (tlow + tz0) * 0.5
        thm = (thelow + thz0) * 0.5
        a = thm * P608
        b = (ELOCP / tem - 1.0 - P608) * thm
        dthv = ((thelow - thz0) * ((qlow + qz0 + cwmlow) * (0.5 * P608) + 1.0)
                + (qlow - qz0 + cwmlow) * a + cwmlow * b)
        du2 = max(ulow ** 2 + vlow ** 2, EPSU2)
        rib = btgx * dthv * zsl / du2
        zslu = zsl + zu
        rzsu = zslu / zu
        rlogu = np.log(rzsu)
        zslt = zsl + zu
        czil = 0.1
        zilfc = -czil * VKARMAN * SQVISC
        if dthv > 0.0:
            if rib < RIC:
                zzil = zilfc * (1.0 + (rib / RIC) * (rib / RIC) * CZETMAX)
            else:
                zzil = zilfc * (1.0 + CZETMAX)
        else:
            zzil = zilfc
        ztmax = _ZTMAX2
        for _ in range(ITRMX):
            zt = max(np.exp(zzil * np.sqrt(ustar * z0base)) * z0base, EPSZT)
            rzst = zslt / zt
            rlogt = np.log(rzst)
            rlmo = elfc * akhs * dthv / ustar ** 3
            zetalu = min(max(zslu * rlmo, ZTMIN2), ztmax)
            zetalt = min(max(zslt * rlmo, ZTMIN2), ztmax)
            zetau = min(max(zu * rlmo, ZTMIN2 / rzsu), ztmax / rzsu)
            zetat = min(max(zt * rlmo, ZTMIN2 / rzst), ztmax / rzst)
            psmz = psi_myj_lookup(zetau, _PSIM2)
            psmzl = psi_myj_lookup(zetalu, _PSIM2)
            pshz = psi_myj_lookup(zetat, _PSIH2)
            pshzl = psi_myj_lookup(zetalt, _PSIH2)
            simm = psmzl - psmz + rlogu
            simh = pshzl - pshz + rlogt
            ustark = ustar * VKARMAN
            akms = max(ustark / simm, cxchl)
            akhs = max(ustark / simh, cxchl)
            if dthv <= 0.0:
                wstar2 = WWST2 * abs(btgh * akhs * dthv) ** (2.0 / 3.0)
            else:
                wstar2 = 0.0
            ustar = max(np.sqrt(akms * np.sqrt(du2 + wstar2)), EPSUST)

    ct = 0.0

    # ---------------- diagnostics (:820-1005) ----------------
    umflx = akms * (ulow - uz0)
    vmflx = akms * (vlow - vz0)
    hsflx = akhs * (thlow - thz0)
    hlflx = akhs * (qlow - qz0)
    zu10 = zu + 10.0
    zt02 = zt + 2.0
    zt10 = zt + 10.0
    rlnu10 = np.log(zu10 / zu)
    rlnt02 = np.log(zt02 / zt)
    rlnt10 = np.log(zt10 / zt)
    ztmax = _ZTMAX2
    ztau10 = min(max(zu10 * rlmo, ZTMIN2), ztmax)
    ztat02 = min(max(zt02 * rlmo, ZTMIN2), ztmax)
    ztat10 = min(max(zt10 * rlmo, ZTMIN2), ztmax)
    psm10 = psi_myj_lookup(ztau10, _PSIM2)
    psh02 = psi_myj_lookup(ztat02, _PSIH2)
    psh10 = psi_myj_lookup(ztat10, _PSIH2)
    simm10 = psm10 - psmz + rlnu10
    simh02 = psh02 - pshz + rlnt02
    simh10 = psh10 - pshz + rlnt10
    cxch = cxchs if seamask > 0.5 else cxchl
    akms10 = max(ustark / simm10, cxch)
    akhs02 = max(ustark / simh02, cxch)
    akhs10 = max(ustark / simh10, cxch)
    u10 = umflx / akms10 + uz0
    v10 = vmflx / akms10 + vz0
    th02 = hsflx / akhs02 + thz0
    if ((thlow > thz0 and (th02 < thz0 or th02 > thlow)) or
            (thlow < thz0 and (th02 > thz0 or th02 < thlow))):
        th02 = thz0 + 2.0 * rdz * (thlow - thz0)
    th10 = hsflx / akhs10 + thz0
    if ((thlow > thz0 and (th10 < thz0 or th10 > thlow)) or
            (thlow < thz0 and (th10 > thz0 or th10 < thlow))):
        th10 = thz0 + 10.0 * rdz * (thlow - thz0)
    q02 = hlflx / akhs02 + qz0
    q10 = hlflx / akhs10 + qz0
    pshltr = psfc * np.exp(-0.068283 / tlow)

    if seamask < 0.5:
        zuuz = min(zu * 0.50, 0.18)
        zu_e = max(zu * 0.35, zuuz)
        zu10_e = zu_e + 10.0
        rlnu10_e = np.log(zu10_e / zu_e)
        ztau10_e = min(max(zu10_e * rlmo, ZTMIN2), ztmax)
        psm10_e = psi_myj_lookup(ztau10_e, _PSIM2)
        simm10_e = psm10_e - psmz + rlnu10_e
        ekms10 = max(ustark / simm10_e, cxchl)
        u10 = umflx / ekms10 + uz0
        v10 = vmflx / ekms10 + vz0

    rlow = plow / (R_D * tlow)
    hfx = -rlow * CP * hsflx
    qfx = -rlow * hlflx * wetm
    qgh = (((1.0 - seamask) * PQ0 + seamask * PQ0SEA) / plow
           * np.exp(A2S * (tlow - A3S) / (tlow - A4S)))
    qgh = qgh / (1.0 - qgh)
    if seamask > 0.5:
        qs = PQ0SEA / psfc * np.exp(A2S * (tsk - A3S) / (tsk - A4S))
        qs = qs / (1.0 - qs)

    return dict(ustar=ustar, znt=z0, thz0=thz0, qz0=qz0, uz0=uz0,
                vz0=vz0, akhs=akhs, akms=akms, qsfc=qs, rmol=rlmo,
                rib=rib, ct=ct, chs=akhs, chs2=akhs02, cqs2=akhs02,
                hfx=hfx, qfx=qfx, flx_lh=XLV * qfx,
                flhc=rlow * CP * akhs, flqc=rlow * akhs * wetm,
                qgh=qgh, cpm=CP * (1.0 + 0.8 * qlow),
                u10=u10, v10=v10, th02=th02, th10=th10, q02=q02,
                q10=q10, pshltr=pshltr)


def myjsfc_column_oracle(first_step, dz, pmid, pint, th, t, qv, qc, u,
                         v, q2, tsk, xland, mavail, z0base, state):
    """Scalar MYJSFC wrapper (:66-356) for ONE column (bottom-up
    profile arrays); ``state`` is a dict of the INOUT 2-D fields."""
    nz = len(dz)
    psfc = pint[0]
    seamask = xland - 1.0
    thsk = tsk / (psfc / P1000MB) ** CAPA
    apesfc = (psfc / P1000MB) ** CAPA

    ratiomx = qv[0]
    qlow = ratiomx / (1.0 + ratiomx)
    cwmlow = qc[0]
    tlow = t[0]
    thlow = th[0]
    thelow = (cwmlow * (-ELOCP / tlow) + 1.0) * thlow
    ulow, vlow = u[0], v[0]
    plow = pmid[0]
    zsl = dz[0] * 0.5

    zint_top = np.cumsum(dz)
    lpbl = nz - 1
    for m in range(1, nz):
        if 2.0 * q2[m] <= EPSQ2 * FH:
            lpbl = m
            break
    pblh = zint_top[lpbl]

    ustar = 0.1 if first_step else state["ustar"]
    tz0 = tsk if first_step else state["thz0"] * apesfc

    r = myj_sfcdif_oracle(
        first_step, seamask, thsk, state["qsfc"], psfc, tz0, tsk,
        state["thz0"], state["qz0"], state["uz0"], state["vz0"],
        ustar, state["znt"], z0base, state["akms"], state["akhs"],
        pblh, mavail, ulow, vlow, tlow, thlow, thelow, qlow, cwmlow,
        zsl, plow)

    # supersaturation removal (:321-348)
    tshltr = r["th02"]
    th10 = r["th10"]
    rapa02 = apesfc - GOCP02 / tshltr
    rapa10 = apesfc - GOCP10 / th10
    t02p = tshltr * rapa02
    t10p = th10 * rapa10
    p02p = rapa02 ** RCAP * P1000MB
    p10p = rapa10 ** RCAP * P1000MB
    qs02 = PQ0 / p02p * np.exp(A2S * (t02p - A3S) / (t02p - A4S))
    qs10 = PQ0 / p10p * np.exp(A2S * (t10p - A3S) / (t10p - A4S))
    qshltr = min(r["q02"], qs02)
    q10 = min(r["q10"], qs10)
    r.update(pblh=pblh, tshltr=tshltr, th02=tshltr,
             t02=tshltr * apesfc, qshltr=qshltr, q10=q10,
             q02=qshltr / (1.0 - qshltr))
    return r


# ---------------------------------------------------------------------------
# SFCLAY1D scalar oracle (module_sf_sfclay.F90:244-889)
# ---------------------------------------------------------------------------
XKA = 2.4e-5
PRT = 1.0
VCONVC = 1.0
CZO = 0.0185
OZO = 1.59e-5
SVP1, SVP2, SVP3, SVPT0 = 0.6112, 17.67, 29.65, 273.15
EP_1 = 461.6 / R_D - 1.0
EP_2 = R_D / 461.6
KARMAN = 0.4
ROVCP = R_D / CP


def sfclay1d_oracle(ux, vx, t1d, qv1d, p1d, dz8w1d, psfcpa, tsk,
                    xland, mavail, pblh, dx, znt, ust, mol, rmol, zol,
                    qsfc, hfx, qfx, ustm, isfflx=1, isftcflx=0,
                    iz0tlnd=0, scm_force_flux=False):
    """Scalar SFCLAY1D with PSIMTB/PSIHTB table psi.  Returns a dict
    mirroring noahmp_tpu.physics.wrf_coupling.sfclay."""
    psfc = psfcpa / 1000.0
    tgdsa = tsk
    thgb = tsk * (P1000MB / psfcpa) ** ROVCP
    pl = p1d / 1000.0
    scr3 = t1d
    thcon = (P1000MB * 0.001 / pl) ** ROVCP
    thx = scr3 * thcon
    qx = qv1d
    tvcon = 1.0 + EP_1 * qx
    thvx = thx * tvcon
    scr4 = scr3 * tvcon
    cpm = CP * (1.0 + 0.8 * qx)

    e1 = SVP1 * np.exp(SVP2 * (tgdsa - SVPT0) / (tgdsa - SVP3))
    if xland > 1.5 or qsfc <= 0.0:
        qsfc = EP_2 * e1 / (psfc - e1)
    e1 = SVP1 * np.exp(SVP2 * (t1d - SVPT0) / (t1d - SVP3))
    qgh = EP_2 * e1 / (pl - e1)

    rhox = psfc * 1000.0 / (R_D * scr4)
    za = 0.5 * dz8w1d
    govrth = G / thx
    gz1oz0 = np.log(za / znt)
    gz2oz0 = np.log(2.0 / znt)
    gz10oz0 = np.log(10.0 / znt)
    water = (xland - 1.5) >= 0.0
    wspd = np.sqrt(ux * ux + vx * vx)
    tskv = thgb * (1.0 + EP_1 * qsfc)
    dthvdz = thvx - tskv
    if not water:
        fluxc = max(hfx / rhox / CP + EP_1 * tskv * qfx / rhox, 0.0)
        vconv = VCONVC * (G / tgdsa * pblh * fluxc) ** 0.33
    else:
        dthvm = -dthvdz if -dthvdz >= 0.0 else 0.0
        vconv = 2.0 * np.sqrt(dthvm)
    vsgd = 0.32 * max(dx / 5000.0 - 1.0, 0.0) ** 0.33
    wspd = np.sqrt(wspd * wspd + vconv * vconv + vsgd * vsgd)
    wspd = max(wspd, 0.1)
    br = govrth * za * dthvdz / (wspd * wspd)
    if mol < 0.0:
        br = min(br, 0.0)

    psim10 = psih10 = psim2 = psih2 = 0.0
    if br >= 0.0:
        if br >= 0.2:
            regime = 1.0
            psim = max(-10.0 * gz1oz0, -10.0)
            psih = psim
            psim10 = max(10.0 / za * psim, -10.0)
            psih10 = psim10
            psim2 = max(2.0 / za * psim, -10.0)
            psih2 = psim2
            if ust < 0.01:
                rmol = br * gz1oz0
            else:
                rmol = KARMAN * govrth * za * mol / (ust * ust)
            rmol = min(rmol, 9.999) / za
        elif br > 0.0:
            regime = 2.0
            psim = max(-5.0 * br * gz1oz0 / (1.1 - 5.0 * br), -10.0)
            psih = psim
            psim10 = max(10.0 / za * psim, -10.0)
            psih10 = psim10
            psim2 = max(2.0 / za * psim, -10.0)
            psih2 = psim2
            zol = br * gz1oz0 / (1.00001 - 5.0 * br)
            if zol > 0.5:
                zol = min((1.89 * gz1oz0 + 44.2) * br * br
                          + (1.18 * gz1oz0 - 1.37) * br, 9.999)
            rmol = zol / za
        else:
            regime = 3.0
            psim = 0.0
            psih = 0.0
            if ust < 0.01:
                zol = br * gz1oz0
            else:
                zol = KARMAN * govrth * za * mol / (ust * ust)
            rmol = zol / za
    else:
        regime = 4.0
        if ust < 0.01:
            zol = br * gz1oz0
        else:
            zol = KARMAN * govrth * za * mol / (ust * ust)
        zol10 = 10.0 / za * zol
        zol2 = 2.0 / za * zol
        zol = max(min(zol, 0.0), -9.9999)
        zol10 = max(min(zol10, 0.0), -9.9999)
        zol2 = max(min(zol2, 0.0), -9.9999)
        psim, psih = psi_sfclay_lookup(zol)
        psim10, psih10 = psi_sfclay_lookup(zol10)
        psim2, psih2 = psi_sfclay_lookup(zol2)
        psih = min(psih, 0.9 * gz1oz0)
        psim = min(psim, 0.9 * gz1oz0)
        psih2 = min(psih2, 0.9 * gz2oz0)
        psim10 = min(psim10, 0.9 * gz10oz0)
        psih10 = min(psih10, 0.9 * gz10oz0)
        rmol = zol / za

    dtg = thx - thgb
    psix = gz1oz0 - psim
    psix10 = gz10oz0 - psim10
    psit = max(gz1oz0 - psih, 2.0)
    zl = znt if water else 0.01
    psiq = np.log(KARMAN * ust * za / XKA + za / zl) - psih
    psit2 = gz2oz0 - psih2
    psiq2 = np.log(KARMAN * ust * 2.0 / XKA + 2.0 / zl) - psih2
    psiq10 = np.log(KARMAN * ust * 10.0 / XKA + 10.0 / zl) - psih10
    if isftcflx == 1 and water:
        z0q = 1.0e-4
        psiq = np.log(za / z0q) - psih
        psit = psiq
        psiq2 = np.log(2.0 / z0q) - psih2
        psiq10 = np.log(10.0 / z0q) - psih10
        psit2 = psiq2
    if isftcflx == 2 and water:
        visc = (1.32 + 0.009 * (scr3 - 273.15)) * 1.0e-5
        restar = ust * znt / visc
        gz0ozt = 0.40 * (7.3 * np.sqrt(np.sqrt(restar)) * np.sqrt(0.71) - 5.0)
        gz0ozq = 0.40 * (7.3 * np.sqrt(np.sqrt(restar)) * np.sqrt(0.60) - 5.0)
        psit = gz1oz0 - psih + gz0ozt
        psiq = gz1oz0 - psih + gz0ozq
        psit2 = gz2oz0 - psih2 + gz0ozt
        psiq2 = gz2oz0 - psih2 + gz0ozq
        psiq10 = gz10oz0 - psih + gz0ozq
    ck = (KARMAN / psix10) * (KARMAN / psiq10)
    cd = (KARMAN / psix10) * (KARMAN / psix10)
    cka = (KARMAN / psix) * (KARMAN / psiq)
    cda = (KARMAN / psix) * (KARMAN / psix)
    if iz0tlnd == 1 and not water:
        zl = znt
        visc = (1.32 + 0.009 * (scr3 - 273.15)) * 1.0e-5
        restar = ust * zl / visc
        czil = 10.0 ** (-0.40 * (zl / 0.07))
        psit = gz1oz0 - psih + czil * KARMAN * np.sqrt(restar)
        psiq = gz1oz0 - psih + czil * KARMAN * np.sqrt(restar)
        psit2 = gz2oz0 - psih2 + czil * KARMAN * np.sqrt(restar)
        psiq2 = gz2oz0 - psih2 + czil * KARMAN * np.sqrt(restar)

    ust = 0.5 * ust + 0.5 * KARMAN * wspd / psix
    wspdi = np.sqrt(ux * ux + vx * vx)
    ustm = 0.5 * ustm + 0.5 * KARMAN * wspdi / psix
    u10 = ux * psix10 / psix
    v10 = vx * psix10 / psix
    th2 = thgb + dtg * psit2 / psit
    q2m = qsfc + (qx - qsfc) * psiq2 / psiq
    t2 = th2 * (psfcpa / P1000MB) ** ROVCP
    if not water:
        ust = max(ust, 0.1)
    mol = KARMAN * dtg / psit / PRT
    denomq, denomq2, denomt2 = psiq, psiq2, psit2
    fm, fh = psix, psit

    out = dict(regime=regime, br=br, wspd=wspd, gz1oz0=gz1oz0,
               psim=psim, psih=psih, fm=fm, fh=fh, zol=zol, rmol=rmol,
               mol=mol, ust=ust, ustm=ustm, u10=u10, v10=v10, th2=th2,
               t2=t2, q2=q2m, qgh=qgh, cpm=cpm, qsfc=qsfc, ck=ck,
               cka=cka, cd=cd, cda=cda, znt=znt)
    if not scm_force_flux:
        qfx = 0.0
        hfx = 0.0
    if isfflx == 0:
        out.update(hfx=hfx, qfx=qfx, lh=XLV * qfx, flhc=0.0, flqc=0.0,
                   chs=0.0, chs2=0.0, cqs2=0.0)
        return out

    if water:
        znt = CZO * ust * ust / G + OZO
        if isftcflx != 0:
            zw = min((ust / 1.06) ** 0.3, 1.0)
            zn1 = 0.011 * ust * ust / G + OZO
            zn2 = (10.0 * np.exp(-9.5 * ust ** (-1.0 / 3.0))
                   + 0.11 * 1.5e-5 / max(ust, 0.01))
            znt = (1.0 - zw) * zn1 + zw * zn2
            znt = max(min(znt, 2.85e-3), 1.27e-7)
        zl = znt
    else:
        zl = 0.01
    flqc = rhox * mavail * ust * KARMAN / denomq
    dtthx = abs(thx - thgb)
    if dtthx > 1.0e-5:
        flhc = cpm * rhox * ust * mol / (thx - thgb)
    else:
        flhc = 0.0
    if not scm_force_flux:
        qfx = max(flqc * (qsfc - qx), 0.0)
        if water:
            hfx = flhc * (thgb - thx)
            if isftcflx != 0:
                hfx = hfx + rhox * ustm * ustm * wspdi
        else:
            hfx = max(flhc * (thgb - thx), -250.0)
    lh = XLV * qfx
    chs = ust * KARMAN / denomq
    cqs2 = ust * KARMAN / denomq2
    chs2 = ust * KARMAN / denomt2
    out.update(hfx=hfx, qfx=qfx, lh=lh, flhc=flhc, flqc=flqc, chs=chs,
               chs2=chs2, cqs2=cqs2, znt=znt)
    return out
