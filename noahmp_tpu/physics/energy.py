"""Energy budget orchestrator.

Reference: ENERGY (module_sf_noahmplsm.F90:1231-1843).  Computes snow
cover, roughness, thermal properties, radiation, soil-water stress
(BTRAN), surface resistances, then runs the vegetated and bare-ground
flux solvers, blends by FVEG (:1747-1785), advances snow/soil
temperatures and applies phase change.

The reference calls VEGE_FLUX only when VEG && FVEG>0 (:1704); under
vmap both solvers always run and the blend mask selects — inputs are
sanitized so the unused branch stays finite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..params.tables import EG
from .common import MPE, sanitize, sel
from .thermal import thermoprop
from .radiation import radiation
from .flux import vege_flux, bare_flux
from .soil_temp import tsnosoi
from .phase import phasechange

PSIWLT = -150.0  # wilting-point matric potential (m) (:1516)
Z0_BARE = 0.01   # bare-soil roughness (m) (:1518)


class EnergyOut(NamedTuple):
    # updated prognostics
    tv: jnp.ndarray
    tg: jnp.ndarray
    stc: jnp.ndarray
    eah: jnp.ndarray
    tah: jnp.ndarray
    cm: jnp.ndarray
    ch: jnp.ndarray
    qsfc: jnp.ndarray
    albold: jnp.ndarray
    tauss: jnp.ndarray
    snice: jnp.ndarray
    snliq: jnp.ndarray
    sneqv: jnp.ndarray
    snowh: jnp.ndarray
    smc: jnp.ndarray
    sh2o: jnp.ndarray
    # fluxes & diagnostics
    imelt: jnp.ndarray
    snicev: jnp.ndarray
    snliqv: jnp.ndarray
    epore: jnp.ndarray
    fsno: jnp.ndarray
    qmelt: jnp.ndarray
    ponding: jnp.ndarray
    sav: jnp.ndarray
    sag: jnp.ndarray
    fsa: jnp.ndarray
    fsr: jnp.ndarray
    taux: jnp.ndarray
    tauy: jnp.ndarray
    fira: jnp.ndarray
    fsh: jnp.ndarray
    fcev: jnp.ndarray
    fgev: jnp.ndarray
    fctr: jnp.ndarray
    trad: jnp.ndarray
    t2m: jnp.ndarray
    psn: jnp.ndarray
    apar: jnp.ndarray
    ssoil: jnp.ndarray
    btrani: jnp.ndarray
    btran: jnp.ndarray
    ts: jnp.ndarray
    latheav: jnp.ndarray
    latheag: jnp.ndarray
    frozen_canopy: jnp.ndarray
    frozen_ground: jnp.ndarray
    tgv: jnp.ndarray
    tgb: jnp.ndarray
    t2mv: jnp.ndarray
    t2mb: jnp.ndarray
    q2v: jnp.ndarray
    q2b: jnp.ndarray
    fsrv: jnp.ndarray
    fsrg: jnp.ndarray
    rssun: jnp.ndarray
    rssha: jnp.ndarray
    bgap: jnp.ndarray
    wgap: jnp.ndarray
    chv: jnp.ndarray
    chb: jnp.ndarray
    emissi: jnp.ndarray
    shg: jnp.ndarray
    shc: jnp.ndarray
    shb: jnp.ndarray
    evg: jnp.ndarray
    evb: jnp.ndarray
    ghv: jnp.ndarray
    ghb: jnp.ndarray
    irg: jnp.ndarray
    irc: jnp.ndarray
    irb: jnp.ndarray
    tr: jnp.ndarray
    evc: jnp.ndarray
    chleaf: jnp.ndarray
    chuc: jnp.ndarray
    chv2: jnp.ndarray
    chb2: jnp.ndarray
    fire_ok: jnp.ndarray  # FIRE>0 sanity flag (:1788-1794)


def energy(cfg, p, ice, ist, isnow, rhoair, sfcprs, qair, sfctmp, thair,
           lwdn, uu, vv, zref, co2air, o2air, solad, solai, cosz, igs,
           eair, htop, tbot, zsnso, dzsnso, elai, esai, fwet, foln,
           fveg, qsnow, canliq, canice, tv, tg, stc, snowh, eah, tah,
           sneqvo, sneqv, sh2o, smc, snice, snliq, albold, cm, ch, q2,
           tauss, qsfc, psfc, pblh=None, assume_bare=False) -> EnergyOut:
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    zsoil = jnp.asarray(cfg.zsoil, dtype=tg.dtype)

    ur = jnp.maximum(jnp.sqrt(uu ** 2 + vv ** 2), 1.0)
    vai = elai + esai
    veg = vai > 0.0

    # snow cover fraction, Niu & Yang 2007 (:1545-1550)
    bdsno = sneqv / sel(snowh > 0, snowh, 1.0)
    fmelt = (bdsno / 100.0) ** C.MFSNO
    fsno = sel(snowh > 0.0,
                     jnp.tanh(snowh / (2.5 * Z0_BARE * sel(fmelt > 0, fmelt, 1.0))),
                     0.0)

    # ground roughness (:1553-1563)
    if ist == 2:
        z0mg = sel(tg <= C.TFRZ,
                         0.01 * (1.0 - fsno) + fsno * C.Z0SNO, 0.01)
    else:
        z0mg = Z0_BARE * (1.0 - fsno) + fsno * C.Z0SNO

    # displacement height / roughness (:1565-1578)
    zpdg = snowh
    z0m = sel(veg, p.z0mvt, z0mg)
    zpd_veg = sel(snowh > 0.65 * htop, snowh, 0.65 * htop)
    zpd = sel(veg, zpd_veg, zpdg)
    zlvl = jnp.maximum(zpd, htop) + zref
    zlvl = sel(zpdg >= zlvl, zpdg + zref, zlvl)

    # thermal properties
    tp = thermoprop(cfg, p, isnow, dzsnso, snowh, snice, snliq, smc,
                    sh2o, stc, ist=ist)

    # radiation
    rad = radiation(cfg, p, ist, ice, cosz, elai, esai, tg, tv, fsno,
                    fwet, smc[0], sneqvo, sneqv, qsnow, fveg, albold,
                    tauss, solad, solai)

    # emissivities (:1608-1613)
    emv = 1.0 - jnp.exp(-(elai + esai) / 1.0)
    if ice == 1:
        emg = 0.98 * (1.0 - fsno) + 1.0 * fsno
    else:
        emg = EG[ist - 1] * (1.0 - fsno) + 1.0 * fsno

    # soil-water transpiration stress BTRAN (:1617-1640)
    root_mask = jnp.arange(nsoil) < p.nroot
    if cfg.opt_btr == 1:
        gx = (sh2o - p.smcwlt) / (p.smcref - p.smcwlt)
    else:
        psi = jnp.maximum(PSIWLT, -p.psisat * (jnp.maximum(0.01, sh2o) / p.smcmax) ** (-p.bexp))
        if cfg.opt_btr == 2:
            gx = (1.0 - psi / PSIWLT) / (1.0 + p.psisat / PSIWLT)
        else:
            gx = 1.0 - jnp.exp(-5.8 * jnp.log(PSIWLT / psi))
    gx = jnp.clip(gx, 0.0, 1.0)
    # -ZSOIL(NROOT) = total root-zone depth (positive)
    znroot = jnp.sum(sel(root_mask, jnp.asarray(cfg.dzs, gx.dtype), 0.0))
    btrani = sel(root_mask,
                       jnp.maximum(MPE, dzsnso[nsnow:] / jnp.maximum(znroot, MPE) * gx),
                       0.0)
    btran = jnp.maximum(MPE, jnp.sum(btrani))
    btrani = sel(root_mask, btrani / btran, 0.0)
    if ist != 1:
        btran = jnp.zeros_like(btran)

    # surface resistance (:1644-1669)
    if ist == 2:
        rsurf = jnp.ones_like(tg)
        rhsur = jnp.ones_like(tg)
    else:
        sh2o0 = sh2o[0]
        l_rsurf = (-zsoil[0]) * (jnp.exp((1.0 - jnp.minimum(1.0, sh2o0 / p.smcmax)) ** 5) - 1.0) / (2.71828 - 1.0)
        d_rsurf = 2.2e-5 * p.smcmax * p.smcmax * (1.0 - p.smcwlt / p.smcmax) ** (2.0 + 3.0 / p.bexp)
        rsurf = l_rsurf / d_rsurf
        rsurf = sel((sh2o0 < 0.01) & (snowh == 0.0), 1.0e6, rsurf)
        psi1 = -p.psisat * (jnp.maximum(0.01, sh2o0) / p.smcmax) ** (-p.bexp)
        rhsur = fsno + (1.0 - fsno) * jnp.exp(psi1 * C.GRAV / (C.RW * tg))
    rsurf = sel(p.is_urban & (snowh == 0.0), 1.0e6, rsurf)

    # psychrometric constants (:1673-1689)
    frozen_canopy = tv <= C.TFRZ
    latheav = sel(frozen_canopy, C.HSUB, C.HVAP)
    gammav = C.CPAIR * sfcprs / (0.622 * latheav)
    frozen_ground = tg <= C.TFRZ
    latheag = sel(frozen_ground, C.HSUB, C.HVAP)
    gammag = C.CPAIR * sfcprs / (0.622 * latheag)

    # vegetated-fraction solver.  The reference calls VEGE_FLUX only
    # when VEG && FVEG>0 (:1704); under vmap both solvers normally run
    # and the blend mask selects.  With assume_bare=True (a STATIC
    # claim by the caller that this column's ELAI+ESAI is always 0 —
    # barren/snow/water/urban vegtyp classes), the canopy solver is
    # skipped entirely and its diag-only outputs are zeros; every
    # state-feeding output is identical because use_veg would be False.
    if assume_bare:
        use_veg = jnp.zeros_like(veg)
        z = jnp.zeros_like(tg)
        from .flux import VegeFluxOut
        vf = VegeFluxOut(eah=eah, tah=tah, tv=tv, tgv=z, cmv=z, chv=z,
                         tauxv=z, tauyv=z, irg=z, irc=z, shg=z, shc=z,
                         evg=z, evc=z, tr=z, ghv=z, t2mv=z, psnsun=z,
                         psnsha=z, rssun=z, rssha=z, q2v=z, chleaf=z,
                         chuc=z, chv2=z, qsfc=z)
    else:
        use_veg = veg & (fveg > 0.0)
        vf = vege_flux(cfg, p, isnow, rad.sav, rad.sag, lwdn, ur, uu, vv,
                       sfctmp, thair, qair, eair, rhoair, snowh, vai,
                       gammav, gammag, fwet, rad.laisun, rad.laisha,
                       dzsnso, htop, zlvl, zpd, z0m,
                       jnp.maximum(fveg, 0.01),
                       z0mg, emv, emg, canliq, canice, stc, tp.df, rsurf,
                       latheav, latheag, rad.parsun, rad.parsha, igs,
                       foln, co2air, o2air, btran, sfcprs, rhsur, eah,
                       tah, tv, tg, cm, ch, psfc,
                       pblh if pblh is not None else jnp.zeros_like(tg))

    # QSFC is one inout variable threaded through BOTH calls (:1721,
    # :1739): BARE_FLUX receives VEGE_FLUX's updated value on veg
    # columns (it seeds SFCDIF3/4's first iteration)
    qsfc_in = sel(use_veg, vf.qsfc, qsfc)
    bf = bare_flux(cfg, p, isnow, rad.sag, lwdn, ur, uu, vv, sfctmp,
                   thair, qair, eair, rhoair, snowh, dzsnso, zlvl,
                   zpdg, z0mg, emg, stc, tp.df, rsurf, latheag, gammag,
                   rhsur, tg, cm, ch, qsfc_in, psfc, sfcprs,
                   pblh if pblh is not None else jnp.zeros_like(tg))

    # blend (:1747-1785)
    def blend(v, b_):
        return sel(use_veg, fveg * v + (1.0 - fveg) * b_, b_)

    taux = blend(vf.tauxv, bf.tauxb)
    tauy = blend(vf.tauyv, bf.tauyb)
    fira = sel(use_veg,
                     fveg * vf.irg + (1.0 - fveg) * bf.irb + vf.irc,
                     bf.irb)
    fsh = sel(use_veg,
                    fveg * vf.shg + (1.0 - fveg) * bf.shb + vf.shc,
                    bf.shb)
    fgev = blend(vf.evg, bf.evb)
    ssoil = blend(vf.ghv, bf.ghb)
    fcev = sel(use_veg, vf.evc, 0.0)
    fctr = sel(use_veg, vf.tr, 0.0)
    tg_new = blend(vf.tgv, bf.tgb)
    t2m = blend(vf.t2mv, bf.t2mb)
    ts = sel(use_veg, fveg * vf.tv + (1.0 - fveg) * bf.tgb, tg_new)
    cm_new = blend(vf.cmv, bf.cmb)
    ch_new = blend(vf.chv, bf.chb)
    # the QSFC in the Q1 blend (:1761) is the post-BARE_FLUX value
    q1 = sel(use_veg,
                   fveg * (vf.eah * 0.622 / (sfcprs - 0.378 * vf.eah))
                   + (1.0 - fveg) * bf.qsfc,
                   bf.qsfc)
    q2e = blend(vf.q2v, bf.q2b)
    rssun = sel(use_veg, vf.rssun, 0.0)
    rssha = sel(use_veg, vf.rssha, 0.0)
    tgv = sel(use_veg, vf.tgv, bf.tgb)
    chv = sel(use_veg, vf.chv, bf.chb)
    tv_new = sel(use_veg, vf.tv, tv)
    eah_new = sel(use_veg, vf.eah, eah)
    tah_new = sel(use_veg, vf.tah, tah)
    qsfc_new = bf.qsfc   # QSFC leaves ENERGY as BARE_FLUX's value

    fire = lwdn + fira
    fire_ok = fire > 0.0

    emissi = (fveg * (emg * (1.0 - emv) + emv + emv * (1.0 - emv) * (1.0 - emg))
              + (1.0 - fveg) * emg)
    trad = ((fire - (1.0 - emissi) * lwdn) / (emissi * C.SB)) ** 0.25

    apar = rad.parsun * rad.laisun + rad.parsha * rad.laisha
    psn = sel(use_veg,
                    vf.psnsun * rad.laisun + vf.psnsha * rad.laisha, 0.0)

    # snow/soil temperature (:1813)
    stc_new = tsnosoi(cfg, p, isnow, zsnso, dzsnso, stc, tbot, ssoil,
                      tp.df, tp.hcpct, snowh)

    # full-implicit snow-surface adjustment (:1820-1831)
    tgb = bf.tgb
    if cfg.opt_stc == 2:
        cap = (snowh > 0.05) & (tg_new > C.TFRZ)
        tgv = sel(cap, C.TFRZ, tgv)
        tgb_c = sel(cap, C.TFRZ, tgb)
        tg_new = sel(cap,
                           sel(use_veg,
                                     fveg * C.TFRZ + (1.0 - fveg) * tgb_c,
                                     tgb_c),
                           tg_new)
        ts = sel(cap,
                       sel(use_veg,
                                 fveg * tv_new + (1.0 - fveg) * tgb_c,
                                 tgb_c),
                       ts)
        tgb = tgb_c

    # phase change (:1836)
    pc = phasechange(cfg, p, isnow, tp.fact, dzsnso, stc_new, snice,
                     snliq, sneqv, snowh, smc, sh2o, ist=ist)

    return EnergyOut(
        tv=tv_new, tg=tg_new, stc=pc.stc, eah=eah_new, tah=tah_new,
        cm=cm_new, ch=ch_new, qsfc=qsfc_new, albold=rad.albold,
        tauss=rad.tauss, snice=pc.snice, snliq=pc.snliq, sneqv=pc.sneqv,
        snowh=pc.snowh, smc=pc.smc, sh2o=pc.sh2o,
        imelt=pc.imelt, snicev=tp.snicev, snliqv=tp.snliqv,
        epore=tp.epore, fsno=fsno, qmelt=pc.qmelt, ponding=pc.ponding,
        sav=rad.sav, sag=rad.sag, fsa=rad.fsa, fsr=rad.fsr, taux=taux,
        tauy=tauy, fira=fira, fsh=fsh, fcev=fcev, fgev=fgev, fctr=fctr,
        trad=trad, t2m=t2m, psn=psn, apar=apar, ssoil=ssoil,
        btrani=btrani, btran=btran, ts=ts, latheav=latheav,
        latheag=latheag, frozen_canopy=frozen_canopy,
        frozen_ground=frozen_ground, tgv=tgv, tgb=tgb, t2mv=vf.t2mv,
        t2mb=bf.t2mb, q2v=vf.q2v, q2b=bf.q2b, fsrv=rad.fsrv,
        fsrg=rad.fsrg, rssun=rssun, rssha=rssha, bgap=rad.bgap,
        wgap=rad.wgap, chv=chv, chb=bf.chb, emissi=emissi, shg=vf.shg,
        shc=vf.shc, shb=bf.shb, evg=vf.evg, evb=bf.evb, ghv=vf.ghv,
        ghb=bf.ghb, irg=vf.irg, irc=vf.irc, irb=bf.irb, tr=vf.tr,
        evc=vf.evc, chleaf=vf.chleaf, chuc=vf.chuc, chv2=vf.chv2,
        chb2=bf.ehb2, fire_ok=fire_ok)
