"""Scalar numpy oracles for SFCDIF3 (MYJ) and the SFCLAY psi tables.

Independent transliteration of:
  * MYJSFCINIT's 10001-entry psi-table construction
    (module_sf_myjsfc.F90:1164-1283): Paulson 1970 unstable branch,
    Holtslag & de Bruin 1988 stable branch, KZTM=10001 over
    [ZTMIN2, ZTMAX2] = [-5, 1], and the end-point EPS shave;
  * SFCDIF3's full scalar math including the exact table-lookup
    interpolation with INT truncation and K clamping
    (module_sf_noahmplsm.F90:4425-4880);
  * sfclayinit's PSIMTB/PSIHTB 1001-entry tables over zeta in
    [-10, 0] at 0.01 steps (module_sf_sfclay.F90:892-907) and the
    SFCLAY lookup (:630-651).

These pin the repo's analytic-psi TPU redesign
(noahmp_tpu.physics.sfcdif34) to the reference's table-interpolated
forms with quantified error bounds.
"""

import numpy as np

KZTM = 10001
KZTM2 = KZTM - 2
ZTMIN2 = -5.0
ZTMAX2_RAW = 1.0
EPS_MYJ = 1.0e-6   # module_sf_myjsfc.F90:57 (EPS shave of ZTMAX)

EPSU2 = 1.0e-6
EPSUST = 1.0e-9
EPSZT = 1.0e-28
EXCML = 1.0e-4
RIC = 0.505
SQVISC = 258.2
ZTFC = 1.0
WWST = 1.2
WWST2 = WWST * WWST
FH02 = 1.0
VKRM = 0.40
CZETMAX = 10.0
GRAV = 9.81
EP_1 = 0.608
P1000MB = 1.0e5
R_D = 287.0
CP = 7.0 * R_D / 2.0
RCP = R_D / CP


def build_myj_tables():
    """MYJSFCINIT function-definition loop (:1176-1283) for the
    "2" (surface-layer) tables.  Returns (psim2, psih2, dzeta2,
    ztmax2_shaved)."""
    zrng2 = ZTMAX2_RAW - ZTMIN2
    dzeta2 = zrng2 / (KZTM - 1)
    psim2 = np.zeros(KZTM)
    psih2 = np.zeros(KZTM)
    zeta2 = ZTMIN2
    for k in range(KZTM):
        if zeta2 < 0.0:
            x = np.sqrt(np.sqrt(1.0 - 16.0 * zeta2))
            psim2[k] = (-2.0 * np.log((x + 1.0) / 2.0)
                        - np.log((x * x + 1.0) / 2.0)
                        + 2.0 * np.arctan(x) - np.pi / 2.0)
            psih2[k] = -2.0 * np.log((x * x + 1.0) / 2.0)
        else:
            hdb = (0.7 * zeta2 + 0.75 * zeta2 * (6.0 - 0.35 * zeta2)
                   * np.exp(-0.35 * zeta2))
            psim2[k] = hdb
            psih2[k] = hdb
        zeta2 += dzeta2
    ztmax2 = (ZTMIN2 + (KZTM - 1) * dzeta2) - EPS_MYJ
    return psim2, psih2, dzeta2, ztmax2


_PSIM2, _PSIH2, _DZETA2, _ZTMAX2 = build_myj_tables()


def psi_myj_lookup(zeta, table):
    """The exact SFCDIF3 table interpolation (:4676-4705): RZ index,
    INT truncation, K clamped to [0, KZTM2], linear blend of entries
    K+1/K+2 (1-based Fortran)."""
    rz = (zeta - ZTMIN2) / _DZETA2
    k = int(rz)
    rdzt = rz - float(k)
    k = max(min(k, KZTM2), 0)
    return (table[k + 1] - table[k]) * rdzt + table[k]


def sfcdif3_oracle(tsk, qs, psfc, pblh, z0, z0base, vegtyp_is_urban,
                   iz0tlnd, sfcspd, thlow, qlow, zsl, ustar, akms,
                   akhs):
    """Scalar SFCDIF3 (:4425-4880) with table-psi.  Returns
    (akms, akhs, chs2, cqs2, rlmo, ustar)."""
    thvlow = thlow * (1.0 + EP_1 * qlow)
    thz0 = tsk * (P1000MB / psfc) ** RCP

    zu = z0
    qz0 = qs
    rdz = 1.0 / zsl
    cxchl = EXCML * rdz
    dthv = thvlow - thz0 * (0.608 * qz0 + 1.0)

    btgx = GRAV / thlow
    elfc = VKRM * btgx
    btgh = btgx * (pblh if pblh > 1000.0 else 1000.0)
    du2 = max(sfcspd * sfcspd, EPSU2)
    rib = btgx * dthv * zsl / du2

    zslu = zsl + zu
    rzsu = zslu / zu
    rlogu = np.log(rzsu)
    zslt = zsl + zu

    if iz0tlnd == 0 or vegtyp_is_urban:
        czil = 0.1
    else:
        czil = 10.0 ** (-0.40 * (z0 / 0.07))
    zilfc = -czil * VKRM * SQVISC

    if dthv > 0.0:
        if rib < RIC:
            zzil = zilfc * (1.0 + (rib / RIC) * (rib / RIC) * CZETMAX)
        else:
            zzil = zilfc * (1.0 + CZETMAX)
    else:
        zzil = zilfc

    zt = max(np.exp(zzil * np.sqrt(ustar * z0base)) * z0base, EPSZT)
    rzst = zslt / zt
    rlogt = np.log(rzst)

    rlmo = elfc * akhs * dthv / ustar ** 3

    zetalu = min(max(zslu * rlmo, ZTMIN2), _ZTMAX2)
    zetalt = min(max(zslt * rlmo, ZTMIN2), _ZTMAX2)
    zetau = min(max(zu * rlmo, ZTMIN2 / rzsu), _ZTMAX2 / rzsu)
    zetat = min(max(zt * rlmo, ZTMIN2 / rzst), _ZTMAX2 / rzst)

    psmz = psi_myj_lookup(zetau, _PSIM2)
    psmzl = psi_myj_lookup(zetalu, _PSIM2)
    simm = psmzl - psmz + rlogu
    pshz = psi_myj_lookup(zetat, _PSIH2)
    pshzl = psi_myj_lookup(zetalt, _PSIH2)
    simh = (pshzl - pshz + rlogt) * FH02

    ustark = ustar * VKRM
    akms = max(ustark / simm, cxchl)
    akhs = max(ustark / simh, cxchl)

    if dthv <= 0.0:
        wstar2 = WWST2 * abs(btgh * akhs * dthv) ** (2.0 / 3.0)
    else:
        wstar2 = 0.0
    ustar = max(np.sqrt(akms * np.sqrt(du2 + wstar2)), EPSUST)

    # 2m diagnostics (:4737-4775)
    zt02 = zt + 2.0
    rlnt02 = np.log(zt02 / zt)
    ztat02 = min(max(zt02 * rlmo, ZTMIN2), _ZTMAX2)
    psh02 = psi_myj_lookup(ztat02, _PSIH2)
    simh02 = (psh02 - pshz + rlnt02) * FH02
    akhs02 = max(ustark / simh02, cxchl)
    chs2 = akhs02
    cqs2 = akhs02
    return akms, akhs, chs2, cqs2, rlmo, ustar


# ---------------------------------------------------------------------------
# SFCLAY (YSU) psi tables
# ---------------------------------------------------------------------------

def build_sfclay_tables():
    """sfclayinit (module_sf_sfclay.F90:892-907): 1001 entries over
    zeta = 0 .. -10 at 0.01 steps."""
    n = np.arange(1001)
    zoln = -n * 0.01
    x = (1.0 - 16.0 * zoln) ** 0.25
    psimtb = (2.0 * np.log(0.5 * (1.0 + x))
              + np.log(0.5 * (1.0 + x * x))
              - 2.0 * np.arctan(x) + 2.0 * np.arctan(1.0))
    y = (1.0 - 16.0 * zoln) ** 0.5
    psihtb = 2.0 * np.log(0.5 * (1.0 + y))
    return psimtb, psihtb


_PSIMTB, _PSIHTB = build_sfclay_tables()


def psi_sfclay_lookup(zol):
    """SFCLAY free-convection table interpolation (:640-651); zol
    must already be clipped to [-9.9999, 0]."""
    nzol = int(-zol * 100.0)
    rzol = -zol * 100.0 - nzol
    psim = _PSIMTB[nzol] + rzol * (_PSIMTB[nzol + 1] - _PSIMTB[nzol])
    psih = _PSIHTB[nzol] + rzol * (_PSIHTB[nzol + 1] - _PSIHTB[nzol])
    return psim, psih


# ---------------------------------------------------------------------------
# SFCDIF4 (YSU-consistent, revised MM5 scheme) scalar oracle
# ---------------------------------------------------------------------------

XKA = 2.4e-5
PRT = 1.0
VCONVC = 1.0
SVP1, SVP2, SVP3, SVPT0 = 0.6112, 17.67, 29.65, 273.15
EP_2 = R_D / 461.6
KARMAN = 0.40


def sfcdif4_oracle(ux, vx, t1d, p1d, psfcpa, pblh, dx, znt, tsk, qx,
                   zlvl, qsfc, hfx, qfx, rmol, ust, iz0tlnd=0):
    """Scalar SFCDIF4 (module_sf_noahmplsm.F90:4882-5270) with the
    SFCLAY PSIMTB/PSIHTB table lookups.  Returns
    (cm, chs, chs2, cqs2, rmol, ust, u10, v10)."""
    # MOL = 1./RMOL (:4989).  The Fortran produces +/-Inf at RMOL=0
    # (first iteration); every consumer immediately clamps, so a large
    # finite sentinel is equivalent (and what the f32 kernel uses).
    mol = (np.sign(rmol + 1e-30) * 1.0e10 if abs(rmol) < 1.0e-10
           else 1.0 / rmol)
    zl = 0.01
    psfc = psfcpa / 1000.0

    tgdsa = tsk
    thgb = tsk * (P1000MB / psfcpa) ** RCP

    pl = p1d / 1000.0
    thx = t1d * (P1000MB * 0.001 / pl) ** RCP
    thvx = thx * (1.0 + EP_1 * qx)
    tvir = t1d * (1.0 + EP_1 * qx)

    if qsfc <= 0.0:     # (:5009-5014)
        e1 = SVP1 * np.exp(SVP2 * (tgdsa - SVPT0) / (tgdsa - SVP3))
        qsfc = EP_2 * e1 / (psfc - e1)

    za = zlvl
    rhox = psfc * 1000.0 / (R_D * tvir)
    govrth = GRAV / thx

    gz1oz0 = np.log(za / znt)
    gz2oz0 = np.log(2.0 / znt)
    gz10oz0 = np.log(10.0 / znt)
    wspd = np.sqrt(ux * ux + vx * vx)

    tskv = thgb * (1.0 + EP_1 * qsfc)
    dthvdz = thvx - tskv

    fluxc = max(hfx / rhox / CP + EP_1 * tskv * qfx / rhox, 0.0)
    vconv = VCONVC * (GRAV / tgdsa * pblh * fluxc) ** 0.33
    vsgd = 0.32 * (max(dx / 5000.0 - 1.0, 0.0)) ** 0.33
    wspd = np.sqrt(wspd * wspd + vconv * vconv + vsgd * vsgd)
    wspd = max(wspd, 0.1)
    br = govrth * za * dthvdz / (wspd * wspd)
    if mol < 0.0:
        br = min(br, 0.0)
    rmol = -govrth * dthvdz * za * KARMAN

    if br >= 0.2:
        regime = 1
    elif 0.0 < br < 0.2:
        regime = 2
    elif br == 0.0:
        regime = 3
    else:
        regime = 4

    if regime == 1:
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
        rmol = min(rmol, 9.999)
        rmol = rmol / za
    elif regime == 2:
        psim = max(-5.0 * br * gz1oz0 / (1.1 - 5.0 * br), -10.0)
        psih = psim
        psim10 = max(10.0 / za * psim, -10.0)
        psih10 = psim10
        psim2 = max(2.0 / za * psim, -10.0)
        psih2 = psim2
        zol = br * gz1oz0 / (1.00001 - 5.0 * br)
        if zol > 0.5:
            zol = ((1.89 * gz1oz0 + 44.2) * br * br
                   + (1.18 * gz1oz0 - 1.37) * br)
            zol = min(zol, 9.999)
        rmol = zol / za
    elif regime == 3:
        psim = psih = 0.0
        psim10 = psih10 = 0.0
        psim2 = psih2 = 0.0
        if ust < 0.01:
            zol = br * gz1oz0
        else:
            zol = KARMAN * govrth * za * mol / (ust * ust)
        rmol = zol / za
    else:
        if ust < 0.01:
            zol = br * gz1oz0
        else:
            zol = KARMAN * govrth * za * mol / (ust * ust)
        zol10 = 10.0 / za * zol
        zol2 = 2.0 / za * zol
        zol = min(max(zol, -9.9999), 0.0)
        zol10 = min(max(zol10, -9.9999), 0.0)
        zol2 = min(max(zol2, -9.9999), 0.0)
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
    psiq = np.log(KARMAN * ust * za / XKA + za / zl) - psih
    psit2 = gz2oz0 - psih2
    psiq2 = np.log(KARMAN * ust * 2.0 / XKA + 2.0 / zl) - psih2

    if iz0tlnd == 1:     # (:5218-5233)
        zl_ = znt
        visc = (1.32 + 0.009 * (t1d - 273.15)) * 1.0e-5
        restar = ust * zl_ / visc
        czil = 10.0 ** (-0.40 * (zl_ / 0.07))
        psit = gz1oz0 - psih + czil * KARMAN * np.sqrt(restar)
        psiq = gz1oz0 - psih + czil * KARMAN * np.sqrt(restar)
        psit2 = gz2oz0 - psih2 + czil * KARMAN * np.sqrt(restar)
        psiq2 = gz2oz0 - psih2 + czil * KARMAN * np.sqrt(restar)

    ust = 0.5 * ust + 0.5 * KARMAN * wspd / psix
    ust = max(ust, 0.1)
    mol = KARMAN * dtg / psit / PRT   # noqa: F841 (kept for parity)

    cm = KARMAN * KARMAN / (psix * psix)
    chs = ust * KARMAN / psiq
    cqs2 = ust * KARMAN / psiq2
    chs2 = ust * KARMAN / psit2
    u10 = ux * psix10 / psix
    v10 = vx * psix10 / psix
    return cm, chs, chs2, cqs2, rmol, ust, u10, v10
