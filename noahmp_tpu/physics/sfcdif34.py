"""MYJ (OPT_SFC=3) and YSU (OPT_SFC=4) surface exchange schemes.

Reference: SFCDIF3 (module_sf_noahmplsm.F90:4425-4880) built on
MODULE_SF_MYJSFC constants/psi-tables (phys/module_sf_myjsfc.F90), and
SFCDIF4 (:4882-5270) built on MODULE_SF_SFCLAY's PSIMTB/PSIHTB tables
(phys/module_sf_sfclay.F90).

TPU-first choice: the reference samples its analytic psi-functions into
10001-entry lookup tables (MYJSFCINIT :1164-1283, sfclayinit) purely as
a CPU optimization; here the same analytic forms are evaluated directly
on the VPU — no gather traffic, max error bounded by the reference's
own table-interpolation error (~(dzeta)^2).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as C
from .common import atan_tpu, sel

# MODULE_SF_MYJSFC constants (module_sf_myjsfc.F90:28-57)
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
ZTMIN2 = -5.0
ZTMAX2 = 1.0
CZETMAX = 10.0   # (module_sf_noahmplsm.F90:4558)
VKRM = 0.40
# MODULE_MODEL_CONSTANTS (util/module_model_constants.F)
G_MYJ = 9.81
EP_1 = 0.608
P1000MB = 1.0e5
R_D = 287.0
CP_WRF = 7.0 * R_D / 2.0
RCP = R_D / CP_WRF
KARMAN = 0.4
XKA = 2.4e-5
PRT = 1.0
SVP1, SVP2, SVP3, SVPT0 = 0.6112, 17.67, 29.65, 273.15
EP_2 = 287.0 / 461.6
VCONVC = 1.0


def _psi_myj(zeta):
    """MYJ psi function (MYJSFCINIT table formula :1176-1194),
    evaluated analytically.  Returns (psim, psih)."""
    zu = jnp.minimum(zeta, 0.0)
    x = jnp.sqrt(jnp.sqrt(1.0 - 16.0 * zu))
    psim_u = (-2.0 * jnp.log((x + 1.0) / 2.0)
              - jnp.log((x * x + 1.0) / 2.0)
              + 2.0 * atan_tpu(x) - jnp.pi / 2.0)
    psih_u = -2.0 * jnp.log((x * x + 1.0) / 2.0)
    zs = jnp.maximum(zeta, 0.0)
    psi_s = 0.7 * zs + 0.75 * zs * (6.0 - 0.35 * zs) * jnp.exp(-0.35 * zs)
    neg = zeta < 0.0
    return (sel(neg, psim_u, psi_s),
            sel(neg, psih_u, psi_s))


def sfcdif3(tsk, qs, psfc, pblh, z0, z0base, is_urban, sfcspd, thlow,
            qlow, zsl, ustar, akms, akhs, iz0tlnd=0):
    """One MYJ iteration (SFCDIF3 :4425-4880).

    akms/akhs carry the CM*UR / CH*UR convention; ustar carried.
    Returns (akms, akhs, chs2, cqs2, rlmo, ustar).
    """
    thvlow = thlow * (1.0 + EP_1 * qlow)
    thz0 = tsk * (P1000MB / psfc) ** RCP
    zu = z0
    qz0 = qs
    rdz = 1.0 / zsl
    cxchl = EXCML * rdz
    dthv = thvlow - thz0 * (0.608 * qz0 + 1.0)

    btgx = G_MYJ / thlow
    elfc = VKRM * btgx
    btgh = btgx * jnp.maximum(pblh, 1000.0)
    du2 = jnp.maximum(sfcspd * sfcspd, EPSU2)
    rib = btgx * dthv * zsl / du2

    zslu = zsl + zu
    rzsu = zslu / zu
    rlogu = jnp.log(rzsu)
    zslt = zsl + zu

    czil = sel((iz0tlnd == 0) | is_urban, 0.1,
                     10.0 ** (-0.40 * (z0 / 0.07)))
    zilfc = -czil * VKRM * SQVISC
    zzil = sel(dthv > 0.0,
                     sel(rib < RIC,
                               zilfc * (1.0 + (rib / RIC) ** 2 * CZETMAX),
                               zilfc * (1.0 + CZETMAX)),
                     zilfc)

    zt = jnp.maximum(jnp.exp(zzil * jnp.sqrt(ustar * z0base)) * z0base,
                     EPSZT)
    rzst = zslt / zt
    rlogt = jnp.log(rzst)

    rlmo = elfc * akhs * dthv / jnp.maximum(ustar, EPSUST) ** 3
    zetalu = jnp.clip(zslu * rlmo, ZTMIN2, ZTMAX2)
    zetalt = jnp.clip(zslt * rlmo, ZTMIN2, ZTMAX2)
    zetau = jnp.clip(zu * rlmo, ZTMIN2 / rzsu, ZTMAX2 / rzsu)
    zetat = jnp.clip(zt * rlmo, ZTMIN2 / rzst, ZTMAX2 / rzst)

    psmz, _ = _psi_myj(zetau)
    psmzl, _ = _psi_myj(zetalu)
    simm = psmzl - psmz + rlogu
    _, pshz = _psi_myj(zetat)
    _, pshzl = _psi_myj(zetalt)
    simh = (pshzl - pshz + rlogt) * FH02

    ustark = ustar * VKRM
    akms = jnp.maximum(ustark / simm, cxchl)
    akhs = jnp.maximum(ustark / simh, cxchl)

    wstar2 = sel(dthv <= 0.0,
                       WWST2 * jnp.abs(btgh * akhs * dthv) ** (2.0 / 3.0),
                       0.0)
    ustar = jnp.maximum(jnp.sqrt(akms * jnp.sqrt(du2 + wstar2)), EPSUST)

    # 2m/10m diagnostics (:4702-4800)
    zu10 = zu + 10.0
    zt02 = zt + 2.0
    rlnt02 = jnp.log(zt02 / zt)
    ztat02 = jnp.clip(zt02 * rlmo, ZTMIN2, ZTMAX2)
    _, psh02 = _psi_myj(ztat02)
    simh02 = (psh02 - pshz + rlnt02) * FH02
    akhs02 = jnp.maximum(ustark / simh02, cxchl)
    chs2 = akhs02
    cqs2 = akhs02
    return akms, akhs, chs2, cqs2, rlmo, ustar


def sfcdif4(ux, vx, t1d, p1d, psfcpa, pblh, dx, znt, tsk, qx, zlvl,
            qsfc, hfx, qfx, rmol, ust, iz0tlnd=0):
    """One YSU-consistent iteration (SFCDIF4 :4882-5270).

    rmol (1/L) and ust carried.  Returns (cm, chs, chs2, cqs2, rmol,
    ust, u10, v10).
    """
    mol = sel(jnp.abs(rmol) < 1.0e-10,
                    jnp.sign(rmol + 1e-30) * 1.0e10, 1.0 / rmol)
    zl = 0.01
    psfc = psfcpa / 1000.0
    tgdsa = tsk
    thgb = tsk * (P1000MB / psfcpa) ** RCP
    pl = p1d / 1000.0
    thx = t1d * (P1000MB * 0.001 / pl) ** RCP
    thvx = thx * (1.0 + EP_1 * qx)
    tvir = t1d * (1.0 + EP_1 * qx)

    e1 = SVP1 * jnp.exp(SVP2 * (tgdsa - SVPT0) / (tgdsa - SVP3))
    qsfc = sel(qsfc <= 0.0, EP_2 * e1 / (psfc - e1), qsfc)

    za = zlvl
    rhox = psfc * 1000.0 / (R_D * tvir)
    govrth = G_MYJ / thx
    gz1oz0 = jnp.log(za / znt)
    gz2oz0 = jnp.log(2.0 / znt)
    gz10oz0 = jnp.log(10.0 / znt)
    wspd0 = jnp.sqrt(ux * ux + vx * vx)
    tskv = thgb * (1.0 + EP_1 * qsfc)
    dthvdz = thvx - tskv

    fluxc = jnp.maximum(hfx / rhox / CP_WRF
                        + EP_1 * tskv * qfx / rhox, 0.0)
    vconv = VCONVC * (G_MYJ / tgdsa * pblh * fluxc) ** (1.0 / 3.0)
    vsgd = 0.32 * jnp.maximum(dx / 5000.0 - 1.0, 0.0) ** (1.0 / 3.0)
    wspd = jnp.maximum(jnp.sqrt(wspd0 ** 2 + vconv ** 2 + vsgd ** 2), 0.1)
    br = govrth * za * dthvdz / (wspd * wspd)
    br = sel(mol < 0.0, jnp.minimum(br, 0.0), br)

    # stability regimes (:4988-5070)
    low_ust = ust < 0.01
    zol_mol = KARMAN * govrth * za * mol / jnp.maximum(ust, 1e-4) ** 2
    zol_br = br * gz1oz0

    # regime 1: stable
    psim1 = jnp.maximum(-10.0 * gz1oz0, -10.0)
    psim10_1 = jnp.maximum(10.0 / za * psim1, -10.0)
    psim2_1 = jnp.maximum(2.0 / za * psim1, -10.0)
    rmol1 = jnp.minimum(sel(low_ust, zol_br, zol_mol), 9.999) / za

    # regime 2: damped mechanical turbulence
    psim_2r = jnp.maximum(-5.0 * br * gz1oz0 / (1.1 - 5.0 * br), -10.0)
    psim10_2 = jnp.maximum(10.0 / za * psim_2r, -10.0)
    psim2_2 = jnp.maximum(2.0 / za * psim_2r, -10.0)
    zol2r = br * gz1oz0 / (1.00001 - 5.0 * br)
    zol2r = sel(zol2r > 0.5,
                      jnp.minimum((1.89 * gz1oz0 + 44.2) * br * br
                                  + (1.18 * gz1oz0 - 1.37) * br, 9.999),
                      zol2r)
    rmol2 = zol2r / za

    # regime 3: forced convection
    rmol3 = sel(low_ust, zol_br, zol_mol) / za

    # regime 4: free convection (Dyer psi, analytic for the reference's
    # PSIMTB/PSIHTB tables, sfclayinit)
    zol4 = jnp.clip(sel(low_ust, zol_br, zol_mol), -9.9999, 0.0)
    zol10 = jnp.clip(10.0 / za * sel(low_ust, zol_br, zol_mol),
                     -9.9999, 0.0)
    zol2_ = jnp.clip(2.0 / za * sel(low_ust, zol_br, zol_mol),
                     -9.9999, 0.0)

    def dyer(zol):
        x = (1.0 - 16.0 * zol) ** 0.25
        psim = (2.0 * jnp.log(0.5 * (1.0 + x))
                + jnp.log(0.5 * (1.0 + x * x))
                - 2.0 * atan_tpu(x) + 2.0 * 0.78539816)
        y = jnp.sqrt(1.0 - 16.0 * zol)
        psih = 2.0 * jnp.log(0.5 * (1.0 + y))
        return psim, psih

    psim4, psih4 = dyer(zol4)
    psim10_4, psih10_4 = dyer(zol10)
    psim2_4, psih2_4 = dyer(zol2_)
    psih4 = jnp.minimum(psih4, 0.9 * gz1oz0)
    psim4 = jnp.minimum(psim4, 0.9 * gz1oz0)
    psih2_4 = jnp.minimum(psih2_4, 0.9 * gz2oz0)
    psim10_4 = jnp.minimum(psim10_4, 0.9 * gz10oz0)
    psih10_4 = jnp.minimum(psih10_4, 0.9 * gz10oz0)
    rmol4 = zol4 / za

    r1 = br >= 0.2
    r2 = (br < 0.2) & (br > 0.0)
    r3 = br == 0.0

    def pick(v1, v2, v3, v4):
        return sel(r1, v1, sel(r2, v2, sel(r3, v3, v4)))

    psim = pick(psim1, psim_2r, 0.0, psim4)
    psih = pick(psim1, psim_2r, 0.0, psih4)
    psim10 = pick(psim10_1, psim10_2, 0.0, psim10_4)
    psih2 = pick(psim2_1, psim2_2, 0.0, psih2_4)
    rmol_n = pick(rmol1, rmol2, rmol3, rmol4)

    dtg = thx - thgb
    psix = gz1oz0 - psim
    psix10 = gz10oz0 - psim10
    psit = jnp.maximum(gz1oz0 - psih, 2.0)
    psiq = jnp.log(KARMAN * ust * za / XKA + za / zl) - psih
    psit2 = gz2oz0 - psih2
    psiq2 = jnp.log(KARMAN * ust * 2.0 / XKA + 2.0 / zl) - psih2

    if iz0tlnd == 1:
        visc = (1.32 + 0.009 * (t1d - 273.15)) * 1.0e-5
        restar = ust * znt / visc
        czil = 10.0 ** (-0.40 * (znt / 0.07))
        corr = czil * KARMAN * jnp.sqrt(restar)
        psit = gz1oz0 - psih + corr
        psiq = psit
        psit2 = gz2oz0 - psih2 + corr
        psiq2 = psit2

    ust = jnp.maximum(0.5 * ust + 0.5 * KARMAN * wspd / psix, 0.1)
    mol_out = KARMAN * dtg / psit / PRT

    cm = KARMAN * KARMAN / (psix * psix)
    chs = ust * KARMAN / psiq
    cqs2 = ust * KARMAN / psiq2
    chs2 = ust * KARMAN / psit2
    u10 = ux * psix10 / psix
    v10 = vx * psix10 / psix
    return cm, chs, chs2, cqs2, rmol_n, ust, u10, v10
