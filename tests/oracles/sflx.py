"""Scalar oracle: the full column step — ENERGY (:1231-1843), WATER
(:6382-6613), ERROR (:1106-1228) and NOAHMP_SFLX (:518-947) of
module_sf_noahmplsm.F90, composed from the per-subroutine oracles.

State is a dict of python floats / Fortran-indexed dicts, advanced in
double precision.  `par` is a flat dict of per-column parameters and
`opts` a dict of the 12 physics options.  All four OPT_SFC schemes
dispatch (1/2 analytic scalar oracles, 3/4 the table-psi MYJ/YSU
oracles in oracles/sfcdif34.py).  Test fixture only."""

import math

from . import GRAV, TFRZ, HSUB, HVAP, CPAIR, SB, RW, Z0SNO, M_MELT
from .energy_aux import (atm, phenology, canwater, thermoprop,
                         btran_fn, rsurf_rhsur)
from .radiation import radiation_full
from .flux import vege_flux as o_vege_flux, bare_flux as o_bare_flux
from .soiltemp import tsnosoi as o_tsnosoi
from .phase import phasechange as o_phasechange
from .snow import snowwater as o_snowwater
from .soilwater import soilwater as o_soilwater, groundwater as o_gw, \
    shallowwatertable as o_swt
from .carbon import carbon as o_carbon

MPE = 1e-6
EG = [0.97, 0.98]
PSIWLT = -150.0
Z0_BARE = 0.01
ZBOT = -8.0
CSOIL = 2.0e6


def energy(par, opts, nsnow, nsoil, dt, ice, ist, isc, isnow, rhoair,
           sfcprs, qair, sfctmp, thair, lwdn, uu, vv, zref, co2air,
           o2air, solad, solai, cosz, igs, eair, htop, tbot, zsnso,
           zsoil, elai, esai, fwet, foln, fveg, qsnow, dzsnso, canliq,
           canice, tv, tg, stc, snowh, eah, tah, sneqvo, sneqv, sh2o,
           smc, snice, snliq, albold, cm, ch, tauss, qsfc, psfc,
           pblh=500.0):
    """ENERGY. Mutates nothing; returns a dict with updated state and
    fluxes.  Layered dicts use Fortran indexing."""
    st = {}
    ur = max(math.sqrt(uu ** 2 + vv ** 2), 1.0)
    vai = elai + esai
    veg = vai > 0.0

    fsno = 0.0
    if snowh > 0.0:
        bdsno = sneqv / snowh
        fmelt = (bdsno / 100.0) ** M_MELT
        fsno = math.tanh(snowh / (2.5 * Z0_BARE * fmelt))
    if ist == 2:
        if tg <= TFRZ:
            z0mg = 0.01 * (1.0 - fsno) + fsno * Z0SNO
        else:
            z0mg = 0.01
    else:
        z0mg = Z0_BARE * (1.0 - fsno) + fsno * Z0SNO
    zpdg = snowh
    if veg:
        z0m = par["z0mvt"]
        zpd = 0.65 * htop
        if snowh > zpd:
            zpd = snowh
    else:
        z0m = z0mg
        zpd = zpdg
    zlvl = max(zpd, htop) + zref
    if zpdg >= zlvl:
        zlvl = zpdg + zref

    df, hcpct, fact = thermoprop(
        nsoil, nsnow, isnow, ist, dzsnso, dt, snowh, snice, snliq,
        CSOIL, smc, sh2o, tg, stc, par.get("is_urban", False),
        par["smcmax"], par["quartz"])

    rad = radiation_full(
        par, opts["opt_alb"], opts["opt_rad"], ist, isc, ice, dt, cosz,
        elai, esai, tg, tv, snowh, fsno, fwet, smc[1], sneqvo, sneqv,
        qsnow, fveg, solad, solai, albold, tauss)

    emv = 1.0 - math.exp(-(elai + esai) / 1.0)
    if ice == 1:
        emg = 0.98 * (1.0 - fsno) + 1.0 * fsno
    else:
        emg = EG[ist - 1] * (1.0 - fsno) + 1.0 * fsno

    btran = 0.0
    btrani = {iz: 0.0 for iz in range(1, nsoil + 1)}
    if ist == 1:
        btran, btrani_r = btran_fn(
            opts["opt_btr"], par["nroot"], sh2o, dzsnso, zsoil,
            par["smcwlt"], par["smcref"], par["smcmax"], par["psisat"],
            par["bexp"], PSIWLT)
        btrani.update(btrani_r)

    rsurf, rhsur = rsurf_rhsur(
        ist, fsno, snowh, sh2o[1], tg, zsoil[1], par["smcmax"],
        par["smcwlt"], par["bexp"], par["psisat"],
        par.get("is_urban", False))

    if tv > TFRZ:
        latheav = HVAP
        frozen_canopy = False
    else:
        latheav = HSUB
        frozen_canopy = True
    gammav = CPAIR * sfcprs / (0.622 * latheav)
    if tg > TFRZ:
        latheag = HVAP
        frozen_ground = False
    else:
        latheag = HSUB
        frozen_ground = True
    gammag = CPAIR * sfcprs / (0.622 * latheag)

    df_top = df[isnow + 1]
    dz_top = dzsnso[isnow + 1]
    stc_top = stc[isnow + 1]

    use_veg = veg and fveg > 0
    vf = None
    rssun = rssha = 0.0
    if use_veg:
        vf = o_vege_flux(
            par, opts["opt_sfc"], opts["opt_crs"], opts["opt_stc"], dt,
            rad["sav"], rad["sag"], lwdn, ur, uu, vv, sfctmp, thair,
            qair, eair, rhoair, snowh, vai, gammav, gammag, fwet,
            rad["laisun"], rad["laisha"], htop, zlvl, zpd, z0m, fveg,
            z0mg, emv, emg, canliq, canice, df_top, dz_top, stc_top,
            rsurf, latheav, rad["parsun"], rad["parsha"], igs, foln,
            co2air, o2air, btran, sfcprs, rhsur, eah, tah, tv, tg, cm,
            ch, psfc, pblh=pblh)
        rssun, rssha = vf["rssun"], vf["rssha"]

    # QSFC is one inout variable threaded through BOTH calls
    # (:1721, :1739): BARE_FLUX receives VEGE_FLUX's updated value
    qsfc_in = vf["qsfc"] if use_veg else qsfc
    bf = o_bare_flux(
        par, opts["opt_sfc"], opts["opt_stc"], dt, rad["sag"], lwdn,
        ur, uu, vv, sfctmp, thair, qair, eair, rhoair, snowh, zlvl,
        zpdg, z0mg, emg, df_top, dz_top, stc_top, rsurf, latheag,
        gammag, rhsur, tg, cm, ch, qsfc_in, psfc, sfcprs, pblh=pblh)

    tgb = bf["tgb"]
    if use_veg:
        tgv = vf["tg"]
        tv_n = vf["tv"]
        eah_n, tah_n = vf["eah"], vf["tah"]
        taux = fveg * vf["tauxv"] + (1.0 - fveg) * bf["tauxb"]
        tauy = fveg * vf["tauyv"] + (1.0 - fveg) * bf["tauyb"]
        fira = fveg * vf["irg"] + (1.0 - fveg) * bf["irb"] + vf["irc"]
        fsh = fveg * vf["shg"] + (1.0 - fveg) * bf["shb"] + vf["shc"]
        fgev = fveg * vf["evg"] + (1.0 - fveg) * bf["evb"]
        ssoil = fveg * vf["gh"] + (1.0 - fveg) * bf["ghb"]
        fcev = vf["evc"]
        fctr = vf["tr"]
        tg_n = fveg * tgv + (1.0 - fveg) * tgb
        t2m = fveg * vf["t2mv"] + (1.0 - fveg) * bf["t2mb"]
        ts = fveg * tv_n + (1.0 - fveg) * tgb
        cm_n = fveg * vf["cm"] + (1.0 - fveg) * bf["cm"]
        ch_n = fveg * vf["ch"] + (1.0 - fveg) * bf["ch"]
        # QSFC at the Q1 blend (:1761) is the post-BARE_FLUX value
        q1 = fveg * (eah_n * 0.622 / (sfcprs - 0.378 * eah_n)) \
            + (1.0 - fveg) * bf["qsfc"]
        q2e = fveg * vf["q2v"] + (1.0 - fveg) * bf["q2b"]
        qsfc_n = bf["qsfc"]
        psnsun, psnsha = vf["psnsun"], vf["psnsha"]
    else:
        tv_n = tv
        eah_n, tah_n = eah, tah
        taux, tauy = bf["tauxb"], bf["tauyb"]
        fira, fsh = bf["irb"], bf["shb"]
        fgev, ssoil = bf["evb"], bf["ghb"]
        fcev = fctr = 0.0
        tg_n = tgb
        t2m = bf["t2mb"]
        ts = tg_n
        cm_n, ch_n = bf["cm"], bf["ch"]
        q1 = bf["qsfc"]
        q2e = bf["q2b"]
        qsfc_n = bf["qsfc"]
        rssun = rssha = 0.0
        tgv = tgb
        psnsun = psnsha = 0.0

    fire = lwdn + fira
    emissi = fveg * (emg * (1 - emv) + emv + emv * (1 - emv) * (1 - emg)) \
        + (1 - fveg) * emg
    trad = ((fire - (1 - emissi) * lwdn) / (emissi * SB)) ** 0.25
    apar = rad["parsun"] * rad["laisun"] + rad["parsha"] * rad["laisha"]
    psn = psnsun * rad["laisun"] + psnsha * rad["laisha"]

    stc_n = o_tsnosoi(nsnow, nsoil, isnow, ist, tbot, zsnso, ssoil, df,
                      hcpct, ZBOT, rad["sag"], dt, snowh, dzsnso, tg_n,
                      stc, opts["opt_stc"], opts["opt_tbot"])

    if opts["opt_stc"] == 2:
        if snowh > 0.05 and tg_n > TFRZ:
            tgv = TFRZ
            tgb = TFRZ
            if use_veg:
                tg_n = fveg * tgv + (1.0 - fveg) * tgb
                ts = fveg * tv_n + (1.0 - fveg) * tgb
            else:
                tg_n = tgb
                ts = tgb

    pc = o_phasechange(nsnow, nsoil, isnow, dt, fact, dzsnso, ist,
                       stc_n, snice, snliq, sneqv, snowh, smc, sh2o,
                       opts["opt_frz"], par["bexp"], par["psisat"],
                       par["smcmax"])

    return dict(
        tv=tv_n, tg=tg_n, stc=pc["stc"], eah=eah_n, tah=tah_n, cm=cm_n,
        ch=ch_n, qsfc=qsfc_n, albold=rad["albold"], tauss=rad["tauss"],
        snice=pc["snice"], snliq=pc["snliq"], sneqv=pc["sneqv"],
        snowh=pc["snowh"], smc=pc["smc"], sh2o=pc["sh2o"],
        imelt=pc["imelt"], qmelt=pc["qmelt"], ponding=pc["ponding"],
        fsno=fsno, sav=rad["sav"], sag=rad["sag"], fsa=rad["fsa"],
        fsr=rad["fsr"], fsrv=rad["fsrv"], fsrg=rad["fsrg"], taux=taux,
        tauy=tauy, fira=fira, fsh=fsh, fcev=fcev, fgev=fgev, fctr=fctr,
        trad=trad, t2m=t2m, psn=psn, apar=apar, ssoil=ssoil,
        btrani=btrani, btran=btran, ts=ts, latheav=latheav,
        latheag=latheag, frozen_canopy=frozen_canopy,
        frozen_ground=frozen_ground, q1=q1, q2e=q2e, emissi=emissi,
        rssun=rssun, rssha=rssha)


def water(par, opts, nsnow, nsoil, dt, imelt, uu, vv, fcev, fctr,
          qprecc, qprecl, elai, esai, sfctmp, qvap, qdew, zsoil, btrani,
          ficeold, ponding, tg, ist, fveg, smceq, latheav, latheag,
          frozen_canopy, frozen_ground, isnow, canliq, canice, tv,
          snowh, sneqv, snice, snliq, stc, zsnso, sh2o, smc, sice, zwt,
          wa, wt, dzsnso, wslake, smcwtd, deeprech, rech):
    """WATER (:6382-6613). Returns a dict of updated state + fluxes."""
    etrani = {iz: 0.0 for iz in range(1, nsoil + 1)}
    snoflow = 0.0
    runsub = 0.0
    qinsur = 0.0
    qdis = qin = 0.0

    cw = canwater(opts["opt_snf"], dt, sfctmp, uu, vv, fcev, fctr,
                  qprecc, qprecl, elai, esai, ist, tg, fveg,
                  frozen_canopy, canliq, canice, tv,
                  par["ch2op"])
    canliq, canice, tv = cw["canliq"], cw["canice"], cw["tv"]
    cmc, ecan, etran = cw["cmc"], cw["ecan"], cw["etran"]
    qrain, qsnow = cw["qrain"], cw["qsnow"]
    snowhin, fwet, fpice = cw["snowhin"], cw["fwet"], cw["fpice"]

    qsnsub = 0.0
    if sneqv > 0.0:
        qsnsub = min(qvap, sneqv / dt)
    qseva = qvap - qsnsub
    qsnfro = 0.0
    if sneqv > 0.0:
        qsnfro = qdew
    qsdew = qdew - qsnfro

    st = dict(isnow=isnow, snice=dict(snice), snliq=dict(snliq),
              stc=dict(stc), dzsnso=dict(dzsnso), sneqv=sneqv,
              snowh=snowh, sice=dict(sice), sh2o=dict(sh2o),
              dzsoil={k: dzsnso[k] for k in range(1, nsoil + 1)},
              qsnbot=0.0)
    # SNOWWATER driver resets soil dzsnso from zsoil at the end; the
    # incoming soil dz entries equal the layer thicknesses already.
    o_snowwater(nsnow, nsoil, dt, zsoil, imelt, ficeold, sfctmp,
                snowhin, qsnow, qsnfro, qsnsub, qrain, st)
    isnow = st["isnow"]
    snice, snliq = st["snice"], st["snliq"]
    stc, dzsnso = st["stc"], st["dzsnso"]
    sneqv, snowh = st["sneqv"], st["snowh"]
    sice, sh2o = st["sice"], st["sh2o"]
    zsnso_new = st["zsnso"]
    qsnbot = st["qsnbot"]
    snoflow = st["snoflow"]
    ponding1 = st["ponding1"]
    ponding2 = st["ponding2"]

    if frozen_ground:
        sice[1] = sice[1] + (qsdew - qseva) * dt / (dzsnso[1] * 1000.0)
        qsdew = 0.0
        qseva = 0.0
        if sice[1] < 0.0:
            sh2o[1] = sh2o[1] + sice[1]
            sice[1] = 0.0

    qinsur = (ponding + ponding1 + ponding2) / dt * 0.001
    if isnow == 0:
        qinsur = qinsur + (qsnbot + qsdew + qrain) * 0.001
    else:
        qinsur = qinsur + (qsnbot + qsdew) * 0.001
    qseva = qseva * 0.001
    for iz in range(1, par["nroot"] + 1):
        etrani[iz] = etran * btrani[iz] * 0.001

    runsrf = 0.0
    qdrain = 0.0
    if ist == 2:
        runsrf = 0.0
        WSLMAX = 5000.0
        if wslake >= WSLMAX:
            runsrf = qinsur * 1000.0
        wslake = wslake + (qinsur - qseva) * 1000.0 * dt - runsrf * dt
    else:
        zs = {k: zsoil[k] for k in range(1, nsoil + 1)}
        dz = {k: dzsnso[k] for k in range(1, nsoil + 1)}
        r = o_soilwater(
            nsoil, dt, zs, dz, qinsur, qseva, etrani, sice, sh2o, smc,
            zwt, par.get("is_urban", False), smcwtd, deeprech,
            opts["opt_run"], opts["opt_inf"], par["smcmax"],
            par["smcwlt"], par["bexp"], par["dwsat"], par["dksat"],
            par["psisat"], par["kdt"], par["frzx"], par["slope"])
        sh2o, smc = r["sh2o"], r["smc"]
        zwt, smcwtd, deeprech = r["zwt"], r["smcwtd"], r["deeprech"]
        runsrf, qdrain, runsub = r["runsrf"], r["qdrain"], r["runsub"]
        wcnd, fcrmax = r["wcnd"], r["fcrmax"]

        if opts["opt_run"] == 1:
            g = o_gw(nsoil, dt, sice, zs, wcnd, fcrmax, sh2o, zwt, wa,
                     wt, par["smcmax"], par["psisat"], par["bexp"])
            sh2o, zwt, wa, wt = g["sh2o"], g["zwt"], g["wa"], g["wt"]
            qin, qdis = g["qin"], g["qdis"]
            runsub = qdis
        if opts["opt_run"] in (3, 4):
            runsub = runsub + qdrain
        for iz in range(1, nsoil + 1):
            smc[iz] = sh2o[iz] + sice[iz]
        if opts["opt_run"] == 5:
            wtd, smcwtd, rech_d = o_swt(
                nsoil, zs, dz, smceq, smc, zwt, smcwtd, rech,
                par["smcmax"], par["psisat"], par["bexp"])
            zwt = wtd
            rech = rech + rech_d
            sh2o[nsoil] = smc[nsoil] - sice[nsoil]
            runsub = runsub + qdrain
            wa = 0.0

    runsub = runsub + snoflow
    return dict(isnow=isnow, canliq=canliq, canice=canice, tv=tv,
                snowh=snowh, sneqv=sneqv, snice=snice, snliq=snliq,
                stc=stc, zsnso=zsnso_new, sh2o=sh2o, smc=smc, sice=sice,
                zwt=zwt, wa=wa, wt=wt, dzsnso=dzsnso, wslake=wslake,
                smcwtd=smcwtd, deeprech=deeprech, rech=rech, cmc=cmc,
                ecan=ecan, etran=etran, fwet=fwet, runsrf=runsrf,
                runsub=runsub, qin=qin, qdis=qdis, qsnow=qsnow,
                ponding1=ponding1, ponding2=ponding2, qsnbot=qsnbot,
                fpice=fpice)


def error(swdown, fsa, fsr, fira, fsh, fcev, fgev, fctr, ssoil, beg_wb,
          canliq, canice, sneqv, wa, smc, dzsnso, prcp, ecan, etran,
          edir, runsrf, runsub, dt, nsoil, ist):
    """ERROR (:1106-1228): returns (errsw, erreng, errwat)."""
    errsw = swdown - (fsa + fsr)
    erreng = fsa - (fira + fsh + fcev + fgev + fctr + ssoil)
    # the reference writes SAV+SAG-(...) with SAV+SAG == FSA
    errwat = 0.0
    if ist == 1:
        end_wb = canliq + canice + sneqv + wa
        for iz in range(1, nsoil + 1):
            end_wb = end_wb + smc[iz] * dzsnso[iz] * 1000.0
        errwat = end_wb - beg_wb \
            - (prcp - ecan - etran - edir - runsrf - runsub) * dt
    return errsw, erreng, errwat


def sflx(par, opts, nsnow, nsoil, dt, lat, yearlen, julian, cosz, zref,
         shdfac, shdmax, ice, ist, isc, smceq, sfctmp, sfcprs, psfc,
         uu, vv, q2, soldn, lwdn, prcp, tbot, co2air, o2air, foln,
         ficeold, zsoil, state, pblh=500.0):
    """One NOAHMP_SFLX step (:518-947), all DVEG options (CARBON pools
    advanced for DVEG=2|5 via oracles/carbon.py).

    `state` dict holds the prognostics (Fortran-indexed dicts for
    layered fields); a NEW updated state dict is returned along with
    the flux/diagnostic dict."""
    s = {k: (dict(v) if isinstance(v, dict) else v)
         for k, v in state.items()}

    a = atm(sfcprs, sfctmp, q2, prcp, soldn, cosz)
    thair, qair, eair, rhoair = (a["thair"], a["qair"], a["eair"],
                                 a["rhoair"])
    qprecc, qprecl = a["qprecc"], a["qprecl"]
    solad, solai, swdown = a["solad"], a["solai"], a["swdown"]

    isnow = s["isnow"]
    zsnso = s["zsnso"]
    dzsnso = {}
    for iz in range(isnow + 1, nsoil + 1):
        if iz == isnow + 1:
            dzsnso[iz] = -zsnso[iz]
        else:
            dzsnso[iz] = zsnso[iz - 1] - zsnso[iz]
    for iz in range(-nsnow + 1, isnow + 1):
        dzsnso[iz] = 0.0

    troot = 0.0
    for iz in range(1, par["nroot"] + 1):
        troot = troot + s["stc"][iz] * dzsnso[iz] / (-zsoil[par["nroot"]])

    beg_wb = 0.0
    if ist == 1:
        beg_wb = s["canliq"] + s["canice"] + s["sneqv"] + s["wa"]
        for iz in range(1, nsoil + 1):
            beg_wb = beg_wb + s["smc"][iz] * dzsnso[iz] * 1000.0

    lai, sai, elai, esai, igs, htop = phenology(
        opts["dveg"], s["snowh"], s["tv"], lat, yearlen, julian,
        par["laim"], par["saim"], par["hvt"], par["hvb"], par["tmin"],
        s["lai"], s["sai"], par.get("pheno_masked", False))
    s["lai"], s["sai"] = lai, sai

    dveg = opts["dveg"]
    if dveg == 1:
        fveg = max(shdfac, 0.01)
    elif dveg in (2, 3):
        fveg = max(1.0 - math.exp(-0.52 * (lai + sai)), 0.01)
    else:
        fveg = max(shdmax, 0.01)
    if par.get("force_bare", False):
        fveg = 0.0
    if elai + esai == 0.0:
        fveg = 0.0

    e = energy(par, opts, nsnow, nsoil, dt, ice, ist, isc, isnow,
               rhoair, sfcprs, qair, sfctmp, thair, lwdn, uu, vv, zref,
               co2air, o2air, solad, solai, cosz, igs, eair, htop,
               tbot, zsnso, zsoil, elai, esai, s["fwet"], foln, fveg,
               s["qsnow"], dzsnso, s["canliq"], s["canice"], s["tv"],
               s["tg"], s["stc"], s["snowh"], s["eah"], s["tah"],
               s["sneqvo"], s["sneqv"], s["sh2o"], s["smc"], s["snice"],
               s["snliq"], s["albold"], s["cm"], s["ch"], s["tauss"],
               s["qsfc"], psfc, pblh=pblh)
    for k in ("tv", "tg", "stc", "eah", "tah", "cm", "ch", "qsfc",
              "albold", "tauss", "snice", "snliq", "sneqv", "snowh",
              "smc", "sh2o"):
        s[k] = e[k]

    sice = {iz: max(0.0, s["smc"][iz] - s["sh2o"][iz])
            for iz in range(1, nsoil + 1)}
    s["sneqvo"] = s["sneqv"]
    qvap = max(e["fgev"] / e["latheag"], 0.0)
    qdew = abs(min(e["fgev"] / e["latheag"], 0.0))
    edir = qvap - qdew

    w = water(par, opts, nsnow, nsoil, dt, e["imelt"], uu, vv,
              e["fcev"], e["fctr"], qprecc, qprecl, elai, esai, sfctmp,
              qvap, qdew, zsoil, e["btrani"], ficeold, e["ponding"],
              s["tg"], ist, fveg, smceq, e["latheav"],
              e["latheag"], e["frozen_canopy"], e["frozen_ground"],
              isnow, s["canliq"], s["canice"], s["tv"], s["snowh"],
              s["sneqv"], s["snice"], s["snliq"], s["stc"], zsnso,
              s["sh2o"], s["smc"], sice, s["zwt"], s["wa"], s["wt"],
              dzsnso, s["wslake"], s["smcwtd"], s["deeprech"],
              s["rech"])
    for k in ("isnow", "canliq", "canice", "tv", "snowh", "sneqv",
              "snice", "snliq", "stc", "zsnso", "sh2o", "smc", "zwt",
              "wa", "wt", "wslake", "smcwtd", "deeprech", "rech",
              "fwet", "qsnow"):
        s[k] = w[k]

    # carbon budgets for dynamic vegetation (:909-917)
    cb = dict(gpp=0.0, npp=0.0, nee=0.0, autors=0.0, heters=0.0,
              totsc=0.0, totlb=0.0)
    if opts["dveg"] in (2, 5):
        cb = o_carbon(par, nsnow, nsoil, dt, zsoil, w["dzsnso"],
                      s["stc"], s["smc"], s["tv"], s["tg"], e["psn"],
                      foln, par["smcmax"], e["btran"], e["apar"], fveg,
                      igs, troot, lat,
                      s["lfmass"], s["rtmass"], s["stmass"], s["wood"],
                      s["stblcp"], s["fastcp"], s["lai"], s["sai"],
                      masked=par.get("pheno_masked", False))
        for k in ("lfmass", "rtmass", "stmass", "wood", "stblcp",
                  "fastcp", "lai", "sai"):
            s[k] = cb[k]

    errsw, erreng, errwat = error(
        swdown, e["fsa"], e["fsr"], e["fira"], e["fsh"], e["fcev"],
        e["fgev"], e["fctr"], e["ssoil"], beg_wb, s["canliq"],
        s["canice"], s["sneqv"], s["wa"], s["smc"], w["dzsnso"], prcp,
        w["ecan"], w["etran"], edir, w["runsrf"], w["runsub"], dt,
        nsoil, ist)

    if s["snowh"] <= 1.0e-6 or s["sneqv"] <= 1.0e-3:
        s["snowh"] = 0.0
        s["sneqv"] = 0.0

    albedo_out = fsr_alb = -999.9
    if swdown != 0.0:
        fsr_alb = e["fsr"] / swdown

    diag = dict(fsa=e["fsa"], fsr=e["fsr"], fira=e["fira"],
                fsh=e["fsh"], ssoil=e["ssoil"], fcev=e["fcev"],
                fgev=e["fgev"], fctr=e["fctr"], ecan=w["ecan"],
                etran=w["etran"], edir=edir, trad=e["trad"],
                t2m=e["t2m"], runsrf=w["runsrf"], runsub=w["runsub"],
                apar=e["apar"], psn=e["psn"], sav=e["sav"],
                sag=e["sag"], fsno=e["fsno"], fveg=fveg,
                albedo=fsr_alb, qsnbot=w["qsnbot"], fpice=w["fpice"],
                qmelt=e["qmelt"], errsw=errsw, erreng=erreng,
                errwat=errwat, elai=elai, esai=esai,
                gpp=cb["gpp"], npp=cb["npp"], nee=cb["nee"],
                autors=cb["autors"], heters=cb["heters"],
                totsc=cb["totsc"], totlb=cb["totlb"])
    return s, diag
