"""Canopy and bare-ground energy-balance flux solvers.

Reference: VEGE_FLUX (module_sf_noahmplsm.F90:3018-3589) and BARE_FLUX
(:3591-3958).  Newton/fixed-point iterations with Monin-Obukhov
stability carry become `lax.fori_loop`s with per-column convergence
latches (the Fortran LITER mechanism :3484-3489), so the vectorized
solve bit-tracks the reference's early-exit semantics.

All four OPT_SFC schemes are wired: 1 (M-O, SFCDIF1), 2 (Chen97,
SFCDIF2), 3 (MYJ, sfcdif3) and 4 (YSU-consistent, sfcdif4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from .common import MPE, tdc, esat, take1, sel
from .sfc_exchange import sfcdif1, sfcdif1_init, Sfcdif1State, ragrb
from .sfcdif2 import sfcdif2
from .sfcdif34 import sfcdif3, sfcdif4
from .stomata import stomata, canres

NITERC = 20   # canopy iterations (:3234)
NITERG = 5    # under-canopy ground iterations (:3236)
NITERB = 5    # bare-ground iterations (:3749)


def _estsat(t):
    """ES and d(ES)/dT at temperature t (K), ice/water switched."""
    tc = tdc(t)
    esw, esi, dsw, dsi = esat(tc)
    est = sel(tc > 0.0, esw, esi)
    dest = sel(tc > 0.0, dsw, dsi)
    return est, dest


class VegeFluxOut(NamedTuple):
    eah: jnp.ndarray
    tah: jnp.ndarray
    tv: jnp.ndarray
    tgv: jnp.ndarray
    cmv: jnp.ndarray
    chv: jnp.ndarray
    tauxv: jnp.ndarray
    tauyv: jnp.ndarray
    irg: jnp.ndarray
    irc: jnp.ndarray
    shg: jnp.ndarray
    shc: jnp.ndarray
    evg: jnp.ndarray
    evc: jnp.ndarray
    tr: jnp.ndarray
    ghv: jnp.ndarray
    t2mv: jnp.ndarray
    psnsun: jnp.ndarray
    psnsha: jnp.ndarray
    rssun: jnp.ndarray
    rssha: jnp.ndarray
    q2v: jnp.ndarray
    chleaf: jnp.ndarray
    chuc: jnp.ndarray
    chv2: jnp.ndarray
    qsfc: jnp.ndarray


def vege_flux(cfg, p, isnow, sav, sag, lwdn, ur, uu, vv, sfctmp, thair,
              qair, eair, rhoair, snowh, vai, gammav, gammag, fwet,
              laisun, laisha, dzsnso, htop, zlvl, zpd, z0m, fveg, z0mg,
              emv, emg, canliq, canice, stc, df, rsurf, latheav,
              latheag, parsun, parsha, igs, foln, co2air, o2air, btran,
              sfcprs, rhsur, eah, tah, tv, tg, cm, ch, psfc,
              pblh) -> VegeFluxOut:
    """Canopy+under-canopy energy balance (VEGE_FLUX :3018-3589)."""
    nsnow = cfg.nsnow
    dtype = tv.dtype
    fveg_s = jnp.maximum(fveg, 0.01)

    vaie = jnp.minimum(6.0, vai / fveg_s)
    laisune = jnp.minimum(6.0, laisun / fveg_s)
    laishae = jnp.minimum(6.0, laisha / fveg_s)

    estg, _ = _estsat(tg)

    qsfc = 0.622 * eair / (psfc - 0.378 * eair)

    hcan = jnp.maximum(htop, 1.001 * jnp.maximum(z0m, z0mg))
    uc = ur * jnp.log(hcan / z0m) / jnp.log(zlvl / z0m)

    # longwave coefficients (:3305-3306)
    air = -emv * (1.0 + (1.0 - emv) * (1.0 - emg)) * lwdn - emv * emg * C.SB * tg ** 4
    cir = (2.0 - emv * (1.0 - emg)) * emv * C.SB

    # top active layer values for ground heat flux coupling
    top = isnow + nsnow
    df_top = take1(df, top)
    dz_top = take1(dzsnso, top)
    stc_top = take1(stc, top)

    z = jnp.zeros((), dtype)

    def loop1_body(it, carry, with_stomata=False):
        (tv_c, tah_c, eah_c, cm_c, ch_c, qsfc_c, sf, mozg, fhg, h, hg,
         qfx, rssun, rssha, psnsun, psnsha, irc, shc, evc, tr, dtv,
         rahc, rahg, rawg, rb, done, liter) = carry
        active = done == 0  # int32 carry: Mosaic chokes on i1 loop state

        z0h = z0m
        z0hg = z0mg

        if cfg.opt_sfc == 1:
            out = sfcdif1(it, sf, sfctmp, rhoair, h, qair, zlvl, zpd,
                          z0m, z0h, ur)
            sf_n, cm_n, ch_n, fv_n, _ch2 = (out.state, out.cm, out.ch,
                                            out.fv, out.ch2)
        elif cfg.opt_sfc == 2:
            # sf.moz carries RLMO, sf.fm carries WSTAR2, sf.fv USTAR.
            # NOTE: the reference feeds the UR-divided drag coefficients
            # straight back into SFCDIF2's AKMS/AKHS inout args each
            # iteration (CM=CM/UR after the call, :3334-3335) — a quirk,
            # but it is the spec; the golden oracle pins it.
            akms, akhs, rlmo_n, wstar2_n, fv_n = sfcdif2(
                it, z0m, tah_c, thair, ur, p.czil, zlvl, cm_c,
                ch_c, sf.moz, sf.fm, sf.fv)
            cm_n = akms / ur
            ch_n = akhs / ur
            sf_n = Sfcdif1State(rlmo_n, sf.mozsgn, wstar2_n, sf.fh,
                                sf.fm2, sf.fh2, fv_n)
        elif cfg.opt_sfc == 3:
            # sf.fv carries USTAR.  NOTE: like SFCDIF2, the reference
            # feeds the UR-divided CM/CH straight back into SFCDIF3's
            # AKMS/AKHS inout args each iteration (CH=CH/UR after the
            # call, :3348-3350) — faithful to the text
            akms, akhs, chs2, cqs2, rlmo_n, fv_n = sfcdif3(
                tah_c, qsfc_c, psfc, pblh, z0m, z0mg, p.is_urban, uc,
                thair, qair, zlvl, sf.fv, cm_c, ch_c)
            cm_n = akms / ur
            ch_n = akhs / ur
            ch2v = chs2 / ur
            sf_n = Sfcdif1State(rlmo_n, sf.mozsgn, sf.fm, ch2v,
                                sf.fm2, sf.fh2, fv_n)
        elif cfg.opt_sfc == 4:
            # sf.moz carries RMOL (1/L); sf.fv USTAR
            cm4, chs, chs2, cqs2, rmol_n, fv_n, _u10, _v10 = sfcdif4(
                uu, vv, sfctmp, sfcprs, psfc, pblh, 1000.0, z0m, tah_c,
                qair, zlvl, qsfc_c, h, qfx, sf.moz, sf.fv)
            cm_n = cm4 / ur
            ch_n = chs / ur
            ch2v = chs2 / ur
            sf_n = Sfcdif1State(rmol_n, sf.mozsgn, sf.fm, ch2v,
                                sf.fm2, sf.fh2, fv_n)
        else:
            raise NotImplementedError(f"opt_sfc={cfg.opt_sfc}")

        rahc_n = jnp.maximum(1.0, 1.0 / (ch_n * ur))
        rawc_n = rahc_n

        rg = ragrb(it, vaie, rhoair, hg, tah_c, zpd, z0mg, z0hg, hcan,
                   uc, z0h, sf_n.fv, p.cwpvt, p.dleaf, mozg, fhg)

        estv, destv = _estsat(tv_c)

        # stomatal resistance on the first iteration only (:3400-3420);
        # iteration 0 is peeled out of the fori_loop below so the CI
        # bisection compiles exactly once (a lax.cond here measured 2.6x
        # slower on TPU — conds in hot loops break fusion).
        if with_stomata:
            if cfg.opt_crs == 1:
                rssun_n, psnsun_n = stomata(p, parsun, foln, tv_c, estv,
                                            eah_c, sfctmp, sfcprs, o2air,
                                            co2air, igs, btran, rg.rb)
                rssha_n, psnsha_n = stomata(p, parsha, foln, tv_c, estv,
                                            eah_c, sfctmp, sfcprs, o2air,
                                            co2air, igs, btran, rg.rb)
            else:
                rssun_n, psnsun_n = canres(p, parsun, tv_c, btran, eah_c,
                                           sfcprs)
                rssha_n, psnsha_n = canres(p, parsha, tv_c, btran, eah_c,
                                           sfcprs)
        else:
            rssun_n, rssha_n = rssun, rssha
            psnsun_n, psnsha_n = psnsun, psnsha

        # linearized canopy air T / e elimination (:3424-3447)
        cah = 1.0 / rahc_n
        cvh = 2.0 * vaie / rg.rb
        cgh = 1.0 / rg.rahg
        cond = cah + cvh + cgh
        ata = (sfctmp * cah + tg * cgh) / cond
        bta = cvh / cond
        csh = (1.0 - bta) * rhoair * C.CPAIR * cvh

        caw = 1.0 / rawc_n
        cew = fwet * vaie / rg.rb
        ctw = (1.0 - fwet) * (laisune / (rg.rb + rssun_n)
                              + laishae / (rg.rb + rssha_n))
        cgw = 1.0 / (rg.rawg + rsurf)
        cond_w = caw + cew + ctw + cgw
        aea = (eair * caw + estg * cgw) / cond_w
        bea = (cew + ctw) / cond_w
        cev = (1.0 - bea) * cew * rhoair * C.CPAIR / gammav
        ctr = (1.0 - bea) * ctw * rhoair * C.CPAIR / gammav

        tah_n = ata + bta * tv_c
        eah_n = aea + bea * estv

        irc_n = fveg * (air + cir * tv_c ** 4)
        shc_n = fveg * rhoair * C.CPAIR * cvh * (tv_c - tah_n)
        evc_n = fveg * rhoair * C.CPAIR * cew * (estv - eah_n) / gammav
        tr_n = fveg * rhoair * C.CPAIR * ctw * (estv - eah_n) / gammav
        evc_n = sel(tv_c > C.TFRZ,
                          jnp.minimum(canliq * latheav / cfg.dt, evc_n),
                          jnp.minimum(canice * latheav / cfg.dt, evc_n))

        b = sav - irc_n - shc_n - evc_n - tr_n
        a = fveg * (4.0 * cir * tv_c ** 3 + csh + (cev + ctr) * destv)
        dtv_n = b / jnp.maximum(a, MPE)

        irc_n = irc_n + fveg * 4.0 * cir * tv_c ** 3 * dtv_n
        shc_n = shc_n + fveg * csh * dtv_n
        evc_n = evc_n + fveg * cev * destv * dtv_n
        tr_n = tr_n + fveg * ctr * destv * dtv_n
        tv_n = tv_c + dtv_n

        h_n = rhoair * C.CPAIR * (tah_n - sfctmp) / rahc_n
        hg_n = rhoair * C.CPAIR * (tg - tah_n) / rg.rahg
        qsfc_n = (0.622 * eah_n) / (sfcprs - 0.378 * eah_n)
        qfx_n = sel(cfg.opt_sfc == 4,
                          (qsfc_n - qair) * rhoair * caw, qfx)

        # LITER latch (:3484-3489)
        done_n = jnp.maximum(done,
                             (active & (liter == 1)).astype(jnp.int32))
        liter_n = jnp.maximum(
            liter, (active & (it >= 4) & (jnp.abs(dtv_n) <= 0.01)
                    & (liter == 0)).astype(jnp.int32))

        def u(new, old):
            return sel(active, new, old)

        sf_u = Sfcdif1State(*[u(n, o) for n, o in zip(sf_n, sf)])
        return (u(tv_n, tv_c), u(tah_n, tah_c), u(eah_n, eah_c),
                u(cm_n, cm_c), u(ch_n, ch_c), u(qsfc_n, qsfc_c), sf_u,
                u(rg.mozg, mozg), u(rg.fhg, fhg), u(h_n, h), u(hg_n, hg),
                u(qfx_n, qfx), u(rssun_n, rssun), u(rssha_n, rssha),
                u(psnsun_n, psnsun), u(psnsha_n, psnsha),
                u(irc_n, irc), u(shc_n, shc), u(evc_n, evc), u(tr_n, tr),
                u(dtv_n, dtv), u(rahc_n, rahc), u(rg.rahg, rahg),
                u(rg.rawg, rawg), u(rg.rb, rb), done_n,
                sel(active, liter_n, liter))

    sf0 = sfcdif1_init(dtype)
    # carry CM/CH from the previous timestep as SFCDIF2 priors
    init = (tv, tah, eah, cm, ch, qsfc, sf0, z, z, z, z, z,
            z, z, z, z, z, z, z, z, z,
            jnp.ones((), dtype), jnp.ones((), dtype), jnp.ones((), dtype),
            jnp.ones((), dtype),
            (tv * 0.0).astype(jnp.int32), (tv * 0.0).astype(jnp.int32))
    carry1 = loop1_body(0, init, with_stomata=True)
    # Early exit once every column has latched its LITER freeze
    # (:3484-3489 sets LITER then stops updating).  Under vmap the
    # while_loop runs until ALL lanes in the batch are done; with the
    # [veg | bare | glacier] bucketing the canopy batch contains only
    # vegetated columns, which do converge — a round-1 experiment
    # without bucketing measured this as a wash because bare lanes
    # never latch (PERF.md).
    def l1_cond(state):
        it, c = state
        return (it < NITERC) & jnp.any(c[25] == 0)   # c[25] = done

    def l1_body(state):
        it, c = state
        return it + 1, loop1_body(it, c)

    _, carry1 = jax.lax.while_loop(
        l1_cond, l1_body, (jnp.asarray(1, jnp.int32), carry1))
    (tv, tah, eah, cm, ch, qsfc, sf, mozg, fhg, h, hg, qfx, rssun,
     rssha, psnsun, psnsha, irc, shc, evc, tr, dtv, rahc, rahg, rawg,
     rb, done, liter) = carry1

    # under-canopy ground Newton (:3493-3528)
    air_g = -emg * (1.0 - emv) * lwdn - emg * emv * C.SB * tv ** 4
    cir_g = emg * C.SB
    csh_g = rhoair * C.CPAIR / rahg
    cev_g = rhoair * C.CPAIR / (gammag * (rawg + rsurf))
    cgh_g = 2.0 * df_top / sel(dz_top > 0, dz_top, 1.0)

    def loop2_body(it, carry):
        tg_c, irg, shg, evg, gh, estg_c = carry
        estg_n, destg = _estsat(tg_c)
        irg_n = cir_g * tg_c ** 4 + air_g
        shg_n = csh_g * (tg_c - tah)
        evg_n = cev_g * (estg_n * rhsur - eah)
        gh_n = cgh_g * (tg_c - stc_top)
        b = sag - irg_n - shg_n - evg_n - gh_n
        a = 4.0 * cir_g * tg_c ** 3 + csh_g + cev_g * destg + cgh_g
        dtg = b / a
        irg_n = irg_n + 4.0 * cir_g * tg_c ** 3 * dtg
        shg_n = shg_n + csh_g * dtg
        evg_n = evg_n + cev_g * destg * dtg
        gh_n = gh_n + cgh_g * dtg
        return tg_c + dtg, irg_n, shg_n, evg_n, gh_n, estg_n

    tgv, irg, shg, evg, ghv, estg_l = jax.lax.fori_loop(
        0, NITERG, loop2_body, (tg, z, z, z, z, estg))

    # snow-capped ground (:3534-3542)
    if cfg.opt_stc == 1:
        cap = (snowh > 0.05) & (tgv > C.TFRZ)
        tgv_cap = jnp.full_like(tgv, C.TFRZ)
        irg_cap = cir_g * tgv_cap ** 4 - emg * (1.0 - emv) * lwdn - emg * emv * C.SB * tv ** 4
        shg_cap = csh_g * (tgv_cap - tah)
        evg_cap = cev_g * (estg_l * rhsur - eah)
        ghv_cap = sag - (irg_cap + shg_cap + evg_cap)
        tgv = sel(cap, tgv_cap, tgv)
        irg = sel(cap, irg_cap, irg)
        shg = sel(cap, shg_cap, shg)
        evg = sel(cap, evg_cap, evg)
        ghv = sel(cap, ghv_cap, ghv)

    tauxv = -rhoair * cm * ur * uu
    tauyv = -rhoair * cm * ur * vv

    # 2m diagnostics (:3557-3582)
    z0h = z0m
    if cfg.opt_sfc in (1, 2):
        cah2 = sf.fv * C.VKC / (jnp.log((2.0 + z0h) / z0h) - sf.fh2)
        cq2v = cah2
        low = cah2 < 1.0e-5
        t2mv = sel(low, tah,
                         tah - (shg + shc / fveg_s) / (rhoair * C.CPAIR)
                         / jnp.maximum(cah2, 1e-10))
        q2v = sel(low, qsfc,
                        qsfc - ((evc + tr) / fveg_s + evg)
                        / (latheav * rhoair) / jnp.maximum(cq2v, 1e-10))
    else:
        # MYJ/YSU path (:3567-3580): CAH2 from the carried 2m exchange
        ch2v = sf.fh
        cah2 = 1.0 / jnp.maximum(1.0, 1.0 / jnp.maximum(ch2v * ur, 1e-10))
        low = cah2 < 1.0e-5
        t2mv = sel(low, tah,
                         tah - (shg + shc) / (rhoair * C.CPAIR)
                         / jnp.maximum(cah2, 1e-10))
        q2v = sel(low,
                        eah * 0.622 / (sfcprs - 0.378 * eah),
                        eah * 0.622 / (sfcprs - 0.378 * eah)
                        - qfx / (rhoair * jnp.maximum(cah2, 1e-10)))

    chv = 1.0 / rahc   # CH = CAH (:3585)
    chleaf = 2.0 * vaie / rb
    chuc = 1.0 / rahg

    return VegeFluxOut(eah, tah, tv, tgv, cm, chv, tauxv, tauyv, irg,
                       irc, shg, shc, evg, evc, tr, ghv, t2mv, psnsun,
                       psnsha, rssun, rssha, q2v, chleaf, chuc, cah2,
                       qsfc)


class BareFluxOut(NamedTuple):
    tgb: jnp.ndarray
    cmb: jnp.ndarray
    chb: jnp.ndarray
    tauxb: jnp.ndarray
    tauyb: jnp.ndarray
    irb: jnp.ndarray
    shb: jnp.ndarray
    evb: jnp.ndarray
    ghb: jnp.ndarray
    t2mb: jnp.ndarray
    q2b: jnp.ndarray
    ehb2: jnp.ndarray
    qsfc: jnp.ndarray


def bare_flux(cfg, p, isnow, sag, lwdn, ur, uu, vv, sfctmp, thair, qair,
              eair, rhoair, snowh, dzsnso, zlvl, zpd, z0m, emg, stc, df,
              rsurf, lathea, gamma, rhsur, tgb, cm, ch, qsfc, psfc,
              sfcprs, pblh) -> BareFluxOut:
    """Bare-ground energy balance (BARE_FLUX :3591-3958)."""
    nsnow = cfg.nsnow
    dtype = tgb.dtype
    z = jnp.zeros((), dtype)

    cir = emg * C.SB
    top = isnow + nsnow
    df_top = take1(df, top)
    dz_top = take1(dzsnso, top)
    stc_top = take1(stc, top)
    cgh = 2.0 * df_top / sel(dz_top > 0, dz_top, 1.0)

    def loop3_body(it, carry):
        (tgb_c, cm_c, ch_c, qsfc_c, sf, h, qfx, irb, shb, evb, ghb,
         estg, csh, cev) = carry
        z0h = z0m

        if cfg.opt_sfc == 1:
            out = sfcdif1(it, sf, sfctmp, rhoair, h, qair, zlvl, zpd,
                          z0m, z0h, ur)
            sf_n, cm_n, ch_n = out.state, out.cm, out.ch
        elif cfg.opt_sfc == 2:
            # same UR-divided inout carry quirk as VEGE_FLUX (:3636-3637)
            akms, akhs, rlmo_n, wstar2_n, fv_n = sfcdif2(
                it, z0m, tgb_c, thair, ur, p.czil, zlvl, cm_c,
                ch_c, sf.moz, sf.fm, sf.fv)
            cm_n = akms / ur
            ch_n = akhs / ur
            snow_cap = snowh > 0.0
            cm_n = sel(snow_cap, jnp.minimum(0.01, cm_n), cm_n)
            ch_n = sel(snow_cap, jnp.minimum(0.01, ch_n), ch_n)
            sf_n = Sfcdif1State(rlmo_n, sf.mozsgn, wstar2_n, sf.fh,
                                sf.fm2, sf.fh2, fv_n)
        elif cfg.opt_sfc == 3:
            # VEGTYP is forced to ISBARREN before the bare call
            # (:3802), so the urban CZIL shortcut never applies here;
            # CM/CH priors are the UR-divided values (:3812-3814)
            akms, akhs, chs2, cqs2, rlmo_n, fv_n = sfcdif3(
                tgb_c, qsfc_c, psfc, pblh, z0m, z0m, False, ur,
                thair, qair, zlvl, sf.fv, cm_c, ch_c)
            cm_n = akms / ur
            ch_n = akhs / ur
            ch2b = chs2 / ur
            snow_cap = snowh > 0.0
            cm_n = sel(snow_cap, jnp.minimum(0.01, cm_n), cm_n)
            ch_n = sel(snow_cap, jnp.minimum(0.01, ch_n), ch_n)
            ch2b = sel(snow_cap, jnp.minimum(0.01, ch2b), ch2b)
            sf_n = Sfcdif1State(rlmo_n, sf.mozsgn, sf.fm,
                                ch2b, sf.fm2, sf.fh2, fv_n)
        elif cfg.opt_sfc == 4:
            cm4, chs, chs2, cqs2, rmol_n, fv_n, _u10, _v10 = sfcdif4(
                uu, vv, sfctmp, sfcprs, psfc, pblh, 1000.0, z0m, tgb_c,
                qair, zlvl, qsfc_c, h, qfx, sf.moz, sf.fv)
            cm_n = cm4 / ur
            ch_n = chs / ur
            ch2b = chs2 / ur
            snow_cap = snowh > 0.0
            cm_n = sel(snow_cap, jnp.minimum(0.01, cm_n), cm_n)
            ch_n = sel(snow_cap, jnp.minimum(0.01, ch_n), ch_n)
            # the snow cap also clamps the 2-m coefficient (:3835-3840)
            ch2b = sel(snow_cap, jnp.minimum(0.01, ch2b), ch2b)
            sf_n = Sfcdif1State(rmol_n, sf.mozsgn, sf.fm,
                                ch2b, sf.fm2, sf.fh2, fv_n)
        else:
            raise NotImplementedError(f"opt_sfc={cfg.opt_sfc}")

        rahb = jnp.maximum(1.0, 1.0 / (ch_n * ur))
        rawb = rahb

        estg_n, destg = _estsat(tgb_c)
        csh_n = rhoair * C.CPAIR / rahb
        cev_n = rhoair * C.CPAIR / gamma / (rsurf + rawb)

        irb_n = cir * tgb_c ** 4 - emg * lwdn
        shb_n = csh_n * (tgb_c - sfctmp)
        evb_n = cev_n * (estg_n * rhsur - eair)
        ghb_n = cgh * (tgb_c - stc_top)

        b = sag - irb_n - shb_n - evb_n - ghb_n
        a = 4.0 * cir * tgb_c ** 3 + csh_n + cev_n * destg + cgh
        dtg = b / a

        irb_n = irb_n + 4.0 * cir * tgb_c ** 3 * dtg
        shb_n = shb_n + csh_n * dtg
        evb_n = evb_n + cev_n * destg * dtg
        ghb_n = ghb_n + cgh * dtg
        tgb_n = tgb_c + dtg

        h_n = csh_n * (tgb_n - sfctmp)
        estg2, _ = _estsat(tgb_n)
        qsfc_n = 0.622 * (estg2 * rhsur) / (psfc - 0.378 * (estg2 * rhsur))
        qfx_n = (qsfc_n - qair) * cev_n * gamma / C.CPAIR

        return (tgb_n, cm_n, ch_n, qsfc_n, sf_n, h_n, qfx_n, irb_n,
                shb_n, evb_n, ghb_n, estg2, csh_n, cev_n)

    sf0 = sfcdif1_init(dtype)
    init = (tgb, cm, ch, qsfc, sf0, z, z, z, z, z, z, z,
            jnp.ones((), dtype), jnp.ones((), dtype))
    (tgb, cm, ch, qsfc, sf, h, qfx, irb, shb, evb, ghb, estg, csh,
     cev) = jax.lax.fori_loop(0, NITERB, loop3_body, init)

    if cfg.opt_stc == 1:
        cap = (snowh > 0.05) & (tgb > C.TFRZ)
        tgb_cap = jnp.full_like(tgb, C.TFRZ)
        irb_cap = cir * tgb_cap ** 4 - emg * lwdn
        shb_cap = csh * (tgb_cap - sfctmp)
        evb_cap = cev * (estg * rhsur - eair)
        ghb_cap = sag - (irb_cap + shb_cap + evb_cap)
        tgb = sel(cap, tgb_cap, tgb)
        irb = sel(cap, irb_cap, irb)
        shb = sel(cap, shb_cap, shb)
        evb = sel(cap, evb_cap, evb)
        ghb = sel(cap, ghb_cap, ghb)

    tauxb = -rhoair * cm * ur * uu
    tauyb = -rhoair * cm * ur * vv

    # 2m diagnostics (:3934-3960)
    z0h = z0m
    if cfg.opt_sfc in (1, 2):
        ehb2 = sf.fv * C.VKC / (jnp.log((2.0 + z0h) / z0h) - sf.fh2)
        cq2b = ehb2
        low = ehb2 < 1.0e-5
        t2mb = sel(low, tgb,
                         tgb - shb / (rhoair * C.CPAIR)
                         / jnp.maximum(ehb2, 1e-10))
        q2b = sel(low, qsfc,
                        qsfc - evb / (lathea * rhoair)
                        * (1.0 / jnp.maximum(cq2b, 1e-10) + rsurf))
        q2b = sel(p.is_urban, qsfc, q2b)
    else:
        ch2b = sf.fh
        ehb2 = 1.0 / jnp.maximum(1.0, 1.0 / jnp.maximum(ch2b * ur, 1e-10))
        low = ehb2 < 1.0e-5
        t2mb = sel(low, tgb,
                         tgb - shb / (rhoair * C.CPAIR * jnp.maximum(ehb2, 1e-10)))
        q2b = sel(low, qsfc,
                        qsfc - qfx / (rhoair * jnp.maximum(ehb2, 1e-10)))

    chb = 1.0 / jnp.maximum(1.0, 1.0 / (ch * ur))  # CH = EHB = 1/RAHB

    return BareFluxOut(tgb, cm, chb, tauxb, tauyb, irb, shb, evb, ghb,
                       t2mb, q2b, ehb2, qsfc)
