"""Scalar oracles: VEGE_FLUX (module_sf_noahmplsm.F90:3018-3589) and
BARE_FLUX (:3591-3958) for all four OPT_SFC schemes (1=M-O, 2=Chen97,
3=MYJ via sfcdif3_oracle, 4=YSU via sfcdif4_oracle), OPT_CRS=1/2,
composed from the sfcdif/sfcdif34/stomata scalar oracles.
Transliterated statement-by-statement, including the reference's
quirks (e.g. the CM=CM/UR inout carry into SFCDIF2/3 at iterations
>= 2).  Test fixture only."""

import math

from . import SB, CPAIR, VKC, TFRZ
from .sfcdif import sfcdif1, sfcdif2, ragrb
from .sfcdif34 import sfcdif3_oracle, sfcdif4_oracle
from .stomata import esat, stomata as o_stomata, canres as o_canres

MPE = 1e-6


def _tdc(t):
    return min(50.0, max(-50.0, t - TFRZ))


def _estsat(t):
    tc = _tdc(t)
    esw, esi, dsw, dsi = esat(tc)
    if tc > 0.0:
        return esw, dsw
    return esi, dsi


def vege_flux(par, opt_sfc, opt_crs, opt_stc, dt, sav, sag, lwdn, ur,
              uu, vv, sfctmp, thair, qair, eair, rhoair, snowh, vai,
              gammav, gammag, fwet, laisun, laisha, htop, zlvl, zpd,
              z0m, fveg, z0mg, emv, emg, canliq, canice, df_top, dz_top,
              stc_top, rsurf, latheav, parsun, parsha, igs, foln,
              co2air, o2air, btran, sfcprs, rhsur, eah, tah, tv, tg, cm,
              ch, psfc, pblh=500.0):
    """VEGE_FLUX.  `par` is a dict of veg params (czil, cwp, dleaf,
    + the stomata/canres parameter sets).  Returns a result dict."""
    niterc = 20
    niterg = 5
    liter = 0
    fv = 0.1
    dtv = 0.0
    mozsgn = 0
    moz = 0.0
    mozg = 0.0
    fhg = 0.0
    fm = fh = fm2 = fh2 = 0.0
    wstar = 0.0
    hg = 0.0
    h = 0.0
    qfx = 0.0
    rssun = rssha = 0.0
    psnsun = psnsha = 0.0
    irc = shc = evc = tr = 0.0
    rahc = rahg = rawg = rb = 1.0
    cah2 = 0.0

    vaie = min(6.0, vai / fveg)
    laisune = min(6.0, laisun / fveg)
    laishae = min(6.0, laisha / fveg)

    estg, _ = _estsat(tg)
    qsfc = 0.622 * eair / (psfc - 0.378 * eair)

    hcan = htop
    uc = ur * math.log(hcan / z0m) / math.log(zlvl / z0m)

    air = -emv * (1.0 + (1.0 - emv) * (1.0 - emg)) * lwdn \
        - emv * emg * SB * tg ** 4
    cir = (2.0 - emv * (1.0 - emg)) * emv * SB

    for it in range(1, niterc + 1):
        z0h = z0m
        z0hg = z0mg

        if opt_sfc == 1:
            r = sfcdif1(it, sfctmp, rhoair, h, qair, zlvl, zpd, z0m,
                        z0h, ur, MPE, moz, mozsgn, fm, fh, fm2, fh2, fv)
            moz, mozsgn = r["moz"], r["mozsgn"]
            fm, fh, fm2, fh2 = r["fm"], r["fh"], r["fm2"], r["fh2"]
            fv, cm, ch = r["fv"], r["cm"], r["ch"]
        elif opt_sfc == 2:
            cm, ch, moz, wstar, fv = sfcdif2(
                it, z0m, tah, thair, ur, par["czil"], zlvl, cm, ch,
                moz, wstar, fv)
            ch = ch / ur
            cm = cm / ur
        elif opt_sfc == 3:
            # (:3340-3350): AKMS/AKHS receive the UR-divided CM/CH of
            # the previous iteration (the same inout quirk as SFCDIF2)
            cm, ch, ch2v, cq2v, moz, fv = sfcdif3_oracle(
                tah, qsfc, psfc, pblh, z0m, z0mg,
                par.get("is_urban", False), 0, uc, thair, qair, zlvl,
                fv, cm, ch)
            ch = ch / ur
            cm = cm / ur
            ch2v = ch2v / ur
        elif opt_sfc == 4:
            cm, ch, ch2v, cq2v, moz, fv, _u10, _v10 = sfcdif4_oracle(
                uu, vv, sfctmp, sfcprs, psfc, pblh, 1000.0, z0m, tah,
                qair, zlvl, qsfc, h, qfx, moz, fv)
            ch = ch / ur
            cm = cm / ur
            ch2v = ch2v / ur

        ramc = max(1.0, 1.0 / (cm * ur))
        rahc = max(1.0, 1.0 / (ch * ur))
        rawc = rahc
        if opt_sfc in (3, 4):
            rahc2 = max(1.0, 1.0 / (ch2v * ur))
            cah2 = 1.0 / rahc2
            cq2v = cah2

        rg = ragrb(it, vaie, rhoair, hg, tah, zpd, z0mg, z0hg, hcan, uc,
                   z0h, fv, par["cwp"], par["dleaf"], MPE, mozg, fhg)
        mozg, fhg = rg["mozg"], rg["fhg"]
        rahg, rawg, rb = rg["rahg"], rg["rawg"], rg["rb"]

        estv, destv = _estsat(tv)

        if it == 1:
            if opt_crs == 1:
                rssun, psnsun = o_stomata(
                    parsun, foln, tv, estv, eah, sfctmp, sfcprs, o2air,
                    co2air, igs, btran, rb, MPE, par["c3psn"],
                    par["kc25"], par["akc"], par["ko25"], par["ako"],
                    par["vcmx25"], par["avcmx"], par["bp"], par["mp"],
                    par["qe25"], par["folnmx"])
                rssha, psnsha = o_stomata(
                    parsha, foln, tv, estv, eah, sfctmp, sfcprs, o2air,
                    co2air, igs, btran, rb, MPE, par["c3psn"],
                    par["kc25"], par["akc"], par["ko25"], par["ako"],
                    par["vcmx25"], par["avcmx"], par["bp"], par["mp"],
                    par["qe25"], par["folnmx"])
            else:
                rssun = o_canres(parsun, tv, btran, eah, sfcprs,
                                 par["rsmin"], par["rsmax"], par["topt"],
                                 par["rgl"], par["hs"])
                rssha = o_canres(parsha, tv, btran, eah, sfcprs,
                                 par["rsmin"], par["rsmax"], par["topt"],
                                 par["rgl"], par["hs"])
                psnsun = psnsha = -999.99

        cah = 1.0 / rahc
        cvh = 2.0 * vaie / rb
        cgh = 1.0 / rahg
        cond = cah + cvh + cgh
        ata = (sfctmp * cah + tg * cgh) / cond
        bta = cvh / cond
        csh = (1.0 - bta) * rhoair * CPAIR * cvh

        caw = 1.0 / rawc
        cew = fwet * vaie / rb
        ctw = (1.0 - fwet) * (laisune / (rb + rssun)
                              + laishae / (rb + rssha))
        cgw = 1.0 / (rawg + rsurf)
        cond_w = caw + cew + ctw + cgw
        aea = (eair * caw + estg * cgw) / cond_w
        bea = (cew + ctw) / cond_w
        cev = (1.0 - bea) * cew * rhoair * CPAIR / gammav
        ctr = (1.0 - bea) * ctw * rhoair * CPAIR / gammav

        tah = ata + bta * tv
        eah = aea + bea * estv

        irc = fveg * (air + cir * tv ** 4)
        shc = fveg * rhoair * CPAIR * cvh * (tv - tah)
        evc = fveg * rhoair * CPAIR * cew * (estv - eah) / gammav
        tr = fveg * rhoair * CPAIR * ctw * (estv - eah) / gammav
        if tv > TFRZ:
            evc = min(canliq * latheav / dt, evc)
        else:
            evc = min(canice * latheav / dt, evc)

        b = sav - irc - shc - evc - tr
        a = fveg * (4.0 * cir * tv ** 3 + csh + (cev + ctr) * destv)
        dtv = b / a

        irc = irc + fveg * 4.0 * cir * tv ** 3 * dtv
        shc = shc + fveg * csh * dtv
        evc = evc + fveg * cev * destv * dtv
        tr = tr + fveg * ctr * destv * dtv
        tv = tv + dtv

        h = rhoair * CPAIR * (tah - sfctmp) / rahc
        hg = rhoair * CPAIR * (tg - tah) / rahg
        qsfc = (0.622 * eah) / (sfcprs - 0.378 * eah)
        if opt_sfc == 4:
            qfx = (qsfc - qair) * rhoair * caw   # (:3479-3481)

        if liter == 1:
            break
        if it >= 5 and abs(dtv) <= 0.01 and liter == 0:
            liter = 1

    # under-canopy ground Newton (loop2)
    air_g = -emg * (1.0 - emv) * lwdn - emg * emv * SB * tv ** 4
    cir_g = emg * SB
    csh_g = rhoair * CPAIR / rahg
    cev_g = rhoair * CPAIR / (gammag * (rawg + rsurf))
    cgh_g = 2.0 * df_top / dz_top

    irg = shg = evg = gh = 0.0
    estg_l = estg
    for it in range(1, niterg + 1):
        estg_l, destg = _estsat(tg)
        irg = cir_g * tg ** 4 + air_g
        shg = csh_g * (tg - tah)
        evg = cev_g * (estg_l * rhsur - eah)
        gh = cgh_g * (tg - stc_top)
        b = sag - irg - shg - evg - gh
        a = 4.0 * cir_g * tg ** 3 + csh_g + cev_g * destg + cgh_g
        dtg = b / a
        irg = irg + 4.0 * cir_g * tg ** 3 * dtg
        shg = shg + csh_g * dtg
        evg = evg + cev_g * destg * dtg
        gh = gh + cgh_g * dtg
        tg = tg + dtg

    if opt_stc == 1:
        if snowh > 0.05 and tg > TFRZ:
            tg = TFRZ
            irg = cir_g * tg ** 4 - emg * (1.0 - emv) * lwdn \
                - emg * emv * SB * tv ** 4
            shg = csh_g * (tg - tah)
            evg = cev_g * (estg_l * rhsur - eah)
            gh = sag - (irg + shg + evg)

    tauxv = -rhoair * cm * ur * uu
    tauyv = -rhoair * cm * ur * vv

    if opt_sfc in (1, 2):
        cah2 = fv * VKC / (math.log((2.0 + z0h) / z0h) - fh2)
        cq2v = cah2
        if cah2 < 1.0e-5:
            t2mv = tah
            q2v = qsfc
        else:
            t2mv = tah - (shg + shc / fveg) / (rhoair * CPAIR) / cah2
            q2v = qsfc - ((evc + tr) / fveg + evg) \
                / (latheav * rhoair) / cq2v
    else:
        # MYJ/YSU-consistent 2m diagnostics (:3574-3582)
        if cah2 < 1.0e-5:
            t2mv = tah
            q2v = eah * 0.622 / (sfcprs - 0.378 * eah)
        else:
            t2mv = tah - (shg + shc) / (rhoair * CPAIR * cah2)
            q2v = (eah * 0.622 / (sfcprs - 0.378 * eah)
                   - qfx / (rhoair * cq2v))

    ch_out = cah
    chleaf = cvh
    chuc = 1.0 / rahg

    return dict(tv=tv, tg=tg, tah=tah, eah=eah, cm=cm, ch=ch_out,
                irc=irc, shc=shc, evc=evc, tr=tr, irg=irg, shg=shg,
                evg=evg, gh=gh, t2mv=t2mv, q2v=q2v, qsfc=qsfc,
                tauxv=tauxv, tauyv=tauyv, rssun=rssun, rssha=rssha,
                psnsun=psnsun, psnsha=psnsha, chleaf=chleaf, chuc=chuc,
                cah2=cah2)


def bare_flux(par, opt_sfc, opt_stc, dt, sag, lwdn, ur, uu, vv, sfctmp,
              thair, qair, eair, rhoair, snowh, zlvl, zpd, z0m, emg,
              df_top, dz_top, stc_top, rsurf, lathea, gamma, rhsur,
              tgb, cm, ch, qsfc, psfc, sfcprs, pblh=500.0):
    """BARE_FLUX for OPT_SFC=1..4.  Returns a result dict."""
    niterb = 5
    mozsgn = 0
    moz = 0.0
    fm = fh = fm2 = fh2 = 0.0
    wstar = 0.0
    h = 0.0
    qfx = 0.0
    fv = 0.1
    irb = shb = evb = ghb = 0.0
    csh = cev = 1.0
    estg = 0.0

    cir = emg * SB
    cgh = 2.0 * df_top / dz_top

    for it in range(1, niterb + 1):
        z0h = z0m
        if opt_sfc == 1:
            r = sfcdif1(it, sfctmp, rhoair, h, qair, zlvl, zpd, z0m,
                        z0h, ur, MPE, moz, mozsgn, fm, fh, fm2, fh2, fv)
            moz, mozsgn = r["moz"], r["mozsgn"]
            fm, fh, fm2, fh2 = r["fm"], r["fh"], r["fm2"], r["fh2"]
            fv, cm, ch = r["fv"], r["cm"], r["ch"]
        elif opt_sfc == 2:
            cm, ch, moz, wstar, fv = sfcdif2(
                it, z0m, tgb, thair, ur, par["czil"], zlvl, cm, ch,
                moz, wstar, fv)
            ch = ch / ur
            cm = cm / ur
            if snowh > 0.0:
                cm = min(0.01, cm)
                ch = min(0.01, ch)
        elif opt_sfc == 3:
            # VEGTYP is forced to ISBARREN before the call (:3802), so
            # the urban CZIL shortcut never applies; z0base = Z0M
            cm, ch, ch2b, cq2b, moz, fv = sfcdif3_oracle(
                tgb, qsfc, psfc, pblh, z0m, z0m, False, 0, ur,
                thair, qair, zlvl, fv, cm, ch)
            ch = ch / ur
            cm = cm / ur
            ch2b = ch2b / ur
            if snowh > 0.0:
                cm = min(0.01, cm)
                ch = min(0.01, ch)
                ch2b = min(0.01, ch2b)
                cq2b = min(0.01, cq2b)
        elif opt_sfc == 4:
            cm, ch, ch2b, cq2b, moz, fv, _u10, _v10 = sfcdif4_oracle(
                uu, vv, sfctmp, sfcprs, psfc, pblh, 1000.0, z0m, tgb,
                qair, zlvl, qsfc, h, qfx, moz, fv)
            ch = ch / ur
            cm = cm / ur
            ch2b = ch2b / ur
            if snowh > 0.0:
                cm = min(0.01, cm)
                ch = min(0.01, ch)
                ch2b = min(0.01, ch2b)
                cq2b = min(0.01, cq2b)

        ramb = max(1.0, 1.0 / (cm * ur))
        rahb = max(1.0, 1.0 / (ch * ur))
        rawb = rahb
        ehb = 1.0 / rahb
        if opt_sfc in (3, 4):
            rahb2 = max(1.0, 1.0 / (ch2b * ur))
            ehb2 = 1.0 / rahb2
            cq2b = ehb2

        estg, destg = _estsat(tgb)
        csh = rhoair * CPAIR / rahb
        cev = rhoair * CPAIR / gamma / (rsurf + rawb)

        irb = cir * tgb ** 4 - emg * lwdn
        shb = csh * (tgb - sfctmp)
        evb = cev * (estg * rhsur - eair)
        ghb = cgh * (tgb - stc_top)
        b = sag - irb - shb - evb - ghb
        a = 4.0 * cir * tgb ** 3 + csh + cev * destg + cgh
        dtg = b / a
        irb = irb + 4.0 * cir * tgb ** 3 * dtg
        shb = shb + csh * dtg
        evb = evb + cev * destg * dtg
        ghb = ghb + cgh * dtg
        tgb = tgb + dtg

        h = csh * (tgb - sfctmp)
        estg, _ = _estsat(tgb)
        qsfc = 0.622 * (estg * rhsur) / (psfc - 0.378 * (estg * rhsur))
        qfx = (qsfc - qair) * cev * gamma / CPAIR

    if opt_stc == 1:
        if snowh > 0.05 and tgb > TFRZ:
            tgb = TFRZ
            irb = cir * tgb ** 4 - emg * lwdn
            shb = csh * (tgb - sfctmp)
            evb = cev * (estg * rhsur - eair)
            ghb = sag - (irb + shb + evb)

    tauxb = -rhoair * cm * ur * uu
    tauyb = -rhoair * cm * ur * vv

    if opt_sfc in (1, 2):
        ehb2 = fv * VKC / (math.log((2.0 + z0h) / z0h) - fh2)
        cq2b = ehb2
        if ehb2 < 1.0e-5:
            t2mb = tgb
            q2b = qsfc
        else:
            t2mb = tgb - shb / (rhoair * CPAIR) / ehb2
            q2b = qsfc - evb / (lathea * rhoair) * (1.0 / cq2b + rsurf)
    else:
        # MYJ/YSU-consistent 2m diagnostics (:3942-3951)
        if ehb2 < 1.0e-5:
            t2mb = tgb
            q2b = qsfc
        else:
            t2mb = tgb - shb / (rhoair * CPAIR * ehb2)
            q2b = qsfc - qfx / (rhoair * cq2b)

    ch_out = ehb
    return dict(tgb=tgb, cm=cm, ch=ch_out, irb=irb, shb=shb, evb=evb,
                ghb=ghb, t2mb=t2mb, q2b=q2b, qsfc=qsfc, tauxb=tauxb,
                tauyb=tauyb, ehb2=ehb2)
