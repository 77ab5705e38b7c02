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
