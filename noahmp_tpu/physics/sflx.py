"""Single-column Noah-MP step.

Reference: NOAHMP_SFLX (module_sf_noahmplsm.F90:518-947) — the column
driver: ATM -> PHENOLOGY -> ENERGY -> WATER -> CARBON -> balance checks.

This is a pure function (ColumnState, Forcing) -> (ColumnState,
Diagnostics); the grid driver vmaps it over columns.  The reference's
fatal conservation aborts (ERROR :1106-1228) become returned
diagnostics (errsw/erreng/errwat) that the driver checks periodically —
same tolerances, off the hot path (SURVEY §5.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..state.state import ColumnState, Forcing
from ..utils.pytree import replace
from .atm import atm, phenology, compute_fveg
from .common import dzsnso_from_zsnso, sel
from .energy import energy
from .water import water
from .carbon import carbon


class SflxDiag(NamedTuple):
    """Per-step fluxes & diagnostics (NOAHMP_SFLX OUT list :638-665)."""
    fsa: jnp.ndarray
    fsr: jnp.ndarray
    fira: jnp.ndarray
    fsh: jnp.ndarray
    ssoil: jnp.ndarray
    fcev: jnp.ndarray
    fgev: jnp.ndarray
    fctr: jnp.ndarray
    ecan: jnp.ndarray
    etran: jnp.ndarray
    edir: jnp.ndarray
    trad: jnp.ndarray
    tgb: jnp.ndarray
    tgv: jnp.ndarray
    t2mv: jnp.ndarray
    t2mb: jnp.ndarray
    q2v: jnp.ndarray
    q2b: jnp.ndarray
    runsrf: jnp.ndarray
    runsub: jnp.ndarray
    apar: jnp.ndarray
    psn: jnp.ndarray
    sav: jnp.ndarray
    sag: jnp.ndarray
    fsno: jnp.ndarray
    nee: jnp.ndarray
    gpp: jnp.ndarray
    npp: jnp.ndarray
    fveg: jnp.ndarray
    albedo: jnp.ndarray
    qsnbot: jnp.ndarray
    ponding: jnp.ndarray
    ponding1: jnp.ndarray
    ponding2: jnp.ndarray
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
    fpice: jnp.ndarray
    qmelt: jnp.ndarray
    t2m: jnp.ndarray
    ts: jnp.ndarray
    elai: jnp.ndarray
    esai: jnp.ndarray
    cmc: jnp.ndarray
    qsnow: jnp.ndarray
    # conservation diagnostics (ERROR :1106-1228), reference tolerances:
    # |errsw| < 0.01 W/m2, |erreng| < 0.01 W/m2, |errwat| < 0.1 mm/step
    errsw: jnp.ndarray
    erreng: jnp.ndarray
    errwat: jnp.ndarray


def noahmp_sflx(cfg, p, s: ColumnState, f: Forcing, ist=1, ice=0,
                assume_bare=False):
    """One Noah-MP timestep on one column.

    Returns (new ColumnState, SflxDiag).  assume_bare statically skips
    the canopy flux solver — valid only for columns whose vegtyp class
    forces ELAI+ESAI=0 every step (see grid.driver.static_bare_mask).
    """
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    zsoil = jnp.asarray(cfg.zsoil, s.tg.dtype)

    a = atm(f.sfcprs, f.sfctmp, f.q2, f.prcp, f.soldn, f.cosz)

    dzsnso = dzsnso_from_zsnso(s.zsnso, s.isnow, nsnow, nsoil)

    # water balance opening storage (:805-810)
    beg_wb = (s.canliq + s.canice + s.sneqv + s.wa
              + jnp.sum(s.smc * dzsnso[nsnow:]) * 1000.0)

    veg_flags = dict(
        is_water=p.vegtyp == 16 if cfg.llanduse == "USGS" else p.vegtyp == 17,
        is_barren=p.vegtyp == (19 if cfg.llanduse == "USGS" else 16),
        is_snow=p.vegtyp == (24 if cfg.llanduse == "USGS" else 15),
        is_urban=p.is_urban,
    )
    # USGS playa/lava/white-sand forced bare: FVEG=0, LAI=0
    # (module_sf_noahmpdrv.F90:540-545)
    if cfg.llanduse == "USGS":
        bare3 = ((p.vegtyp == 25) | (p.vegtyp == 26) | (p.vegtyp == 27))
        shdfac = sel(bare3, 0.0, f.shdfac)
        shdmax = sel(bare3, 0.0, f.shdmax)
        lai_in = sel(bare3, 0.0, s.lai)
    else:
        shdfac, shdmax, lai_in = f.shdfac, f.shdmax, s.lai

    ph = phenology(cfg, p, s.snowh, s.tv, f.lat, f.yearlen, f.julian,
                   lai_in, s.sai, veg_flags)
    fveg = compute_fveg(cfg, shdfac, shdmax, ph.lai, ph.sai,
                        ph.elai, ph.esai, veg_flags["is_urban"],
                        veg_flags["is_barren"])

    en = energy(cfg, p, ice, ist, s.isnow, a.rhoair, f.sfcprs, a.qair,
                f.sfctmp, a.thair, f.lwdn, f.uu, f.vv, cfg.zlvl,
                f.co2air, f.o2air, a.solad, a.solai, f.cosz, ph.igs,
                a.eair, ph.htop, f.tbot, s.zsnso, dzsnso, ph.elai,
                ph.esai, s.fwet, f.foln, fveg, s.qsnow, s.canliq,
                s.canice, s.tv, s.tg, s.stc, s.snowh, s.eah, s.tah,
                s.sneqvo, s.sneqv, s.sh2o, s.smc, s.snice, s.snliq,
                s.albold, s.cm, s.ch, f.q2, s.tauss, s.qsfc, f.psfc,
                pblh=f.pblh, assume_bare=assume_bare)

    sice = jnp.maximum(0.0, en.smc - en.sh2o)
    sneqvo = en.sneqv

    latheag_s = en.latheag
    qvap = jnp.maximum(en.fgev / latheag_s, 0.0)
    qdew = jnp.abs(jnp.minimum(en.fgev / latheag_s, 0.0))
    edir = qvap - qdew

    w = water(cfg, p, s.isnow, en.imelt, f.uu, f.vv, en.fcev, en.fctr,
              a.qprecc, a.qprecl, ph.elai, ph.esai, f.sfctmp, qvap,
              qdew, en.btrani, f.ficeold, en.ponding, en.tg, fveg,
              f.smceq, en.frozen_canopy, en.frozen_ground, s.canliq,
              s.canice, en.tv, en.snowh, en.sneqv, en.snice, en.snliq,
              en.stc, s.zsnso, dzsnso, en.sh2o, sice, en.smc, s.zwt,
              s.wa, s.wt, s.wslake, s.smcwtd, s.deeprech, s.rech,
              ist=ist)

    # carbon (:909-917)
    lai, sai = ph.lai, ph.sai
    lfmass, rtmass, stmass = s.lfmass, s.rtmass, s.stmass
    wood, stblcp, fastcp = s.wood, s.stblcp, s.fastcp
    nee = jnp.zeros_like(s.tg)
    gpp = jnp.zeros_like(s.tg)
    npp = jnp.zeros_like(s.tg)
    if cfg.run_carbon:
        # TROOT is computed at the top of SFLX from the INCOMING soil
        # temperature (:798-801), before ENERGY updates STC
        troot = jnp.sum(
            sel(jnp.arange(nsoil) < p.nroot,
                      s.stc[nsnow:] * dzsnso[nsnow:], 0.0)
        ) / jnp.maximum(
            jnp.sum(sel(jnp.arange(nsoil) < p.nroot,
                              dzsnso[nsnow:], 0.0)), 1e-6)
        cb = carbon(cfg, p, w.stc[nsnow:], w.smc, w.tv, en.tg, en.psn,
                    f.foln, en.btran, en.apar, fveg, ph.igs, troot,
                    f.lat, ph.lai, lfmass, rtmass, stmass, wood, stblcp,
                    fastcp)
        lfmass, rtmass, stmass = cb.lfmass, cb.rtmass, cb.stmass
        wood, stblcp, fastcp = cb.wood, cb.stblcp, cb.fastcp
        lai, sai = cb.lai, cb.sai
        nee, gpp, npp = cb.nee, cb.gpp, cb.npp

    # balance checks (ERROR :1106-1228)
    errsw = a.swdown - (en.fsa + en.fsr)
    erreng = en.sav + en.sag - (en.fira + en.fsh + en.fcev + en.fgev
                                + en.fctr + en.ssoil)
    dzsnso_new = w.dzsnso
    end_wb = (w.canliq + w.canice + w.sneqv + w.wa
              + jnp.sum(w.smc * dzsnso_new[nsnow:]) * 1000.0)
    errwat = end_wb - beg_wb - (f.prcp - w.ecan - w.etran - edir
                                - w.runsrf - w.runsub) * cfg.dt
    if ist != 1:
        errwat = jnp.zeros_like(errwat)

    # urban qsfc fix (:929-933)
    qfx = w.etran + w.ecan + edir
    qsfc = sel(p.is_urban, qfx / a.rhoair * en.ch + a.qair,
                     en.qsfc)

    # tiny-snow zeroing (:935-938)
    tiny = (w.snowh <= 1.0e-6) | (w.sneqv <= 1.0e-3)
    snowh = sel(tiny, 0.0, w.snowh)
    sneqv = sel(tiny, 0.0, w.sneqv)

    albedo = sel(a.swdown != 0.0, en.fsr / sel(a.swdown != 0, a.swdown, 1.0),
                       -999.9)

    s_new = ColumnState(
        isnow=w.isnow, stc=w.stc, zsnso=w.zsnso, snice=w.snice,
        snliq=w.snliq, sneqv=sneqv, sneqvo=sneqvo, snowh=snowh,
        smc=w.smc, sh2o=w.sh2o, canliq=w.canliq, canice=w.canice,
        tv=w.tv, eah=en.eah, tah=en.tah, fwet=w.fwet, tg=en.tg,
        qsfc=qsfc, qsnow=w.qsnow, albold=en.albold, tauss=en.tauss,
        cm=en.cm, ch=en.ch, zwt=w.zwt, wa=w.wa, wt=w.wt,
        wslake=w.wslake, smcwtd=w.smcwtd, deeprech=w.deeprech,
        rech=w.rech, lfmass=lfmass, rtmass=rtmass, stmass=stmass,
        wood=wood, stblcp=stblcp, fastcp=fastcp, lai=lai, sai=sai)

    d = SflxDiag(
        fsa=en.fsa, fsr=en.fsr, fira=en.fira, fsh=en.fsh,
        ssoil=en.ssoil, fcev=en.fcev, fgev=en.fgev, fctr=en.fctr,
        ecan=w.ecan, etran=w.etran, edir=edir, trad=en.trad,
        tgb=en.tgb, tgv=en.tgv, t2mv=en.t2mv, t2mb=en.t2mb,
        q2v=en.q2v, q2b=en.q2b, runsrf=w.runsrf, runsub=w.runsub,
        apar=en.apar, psn=en.psn, sav=en.sav, sag=en.sag, fsno=en.fsno,
        nee=nee, gpp=gpp, npp=npp, fveg=fveg, albedo=albedo,
        qsnbot=w.qsnbot, ponding=en.ponding, ponding1=w.ponding1,
        ponding2=w.ponding2, rssun=en.rssun, rssha=en.rssha,
        bgap=en.bgap, wgap=en.wgap, chv=en.chv, chb=en.chb,
        emissi=en.emissi, shg=en.shg, shc=en.shc, shb=en.shb,
        evg=en.evg, evb=en.evb, ghv=en.ghv, ghb=en.ghb, irg=en.irg,
        irc=en.irc, irb=en.irb, tr=en.tr, evc=en.evc,
        chleaf=en.chleaf, chuc=en.chuc, chv2=en.chv2, chb2=en.chb2,
        fpice=w.fpice, qmelt=en.qmelt, t2m=en.t2m, ts=en.ts,
        elai=ph.elai, esai=ph.esai, cmc=w.cmc, qsnow=w.qsnow,
        errsw=errsw, erreng=erreng, errwat=errwat)

    return s_new, d
