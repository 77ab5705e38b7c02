"""Scalar oracles for the radiation group.

Transliterated statement-by-statement from module_sf_noahmplsm.F90:
TWOSTREAM (:2768-3016), SNOW_AGE (:2547-2597), SNOWALB_BATS
(:2599-2650), SNOWALB_CLASS (:2652-2701), GROUNDALB (:2703-2766).
Everything runs in python floats (double precision).
"""

import math

from . import TFRZ, OMEGAS, BETADS, BETAIS, ALBLAK, SWEMX

PAI = 3.14159265


def twostream(ib, ic, cosz, vai, fwet, t, albgrd, albgri, rho, tau,
              fveg, opt_rad, xl, rc, hvt, hvb, bgap_in=0.0, wgap_in=0.0):
    """TWOSTREAM (:2768-3016) for one band ib (0=vis,1=nir) and one
    stream ic (0=direct, 1=diffuse).  albgrd/albgri/rho/tau are
    2-element sequences.  Returns dict(fab, fre, ftd, fti, gdir, frev,
    freg, bgap, wgap)."""
    bgap, wgap = bgap_in, wgap_in
    # compute within and between gaps (:2861-2897)
    if vai == 0.0:
        gap = 1.0
        kopen = 1.0
    else:
        if opt_rad == 1:
            denfveg = -math.log(max(1.0 - fveg, 0.01)) / (PAI * rc ** 2)
            hd = hvt - hvb
            bb = 0.5 * hd
            thetap = math.atan(bb / rc * math.tan(math.acos(max(0.01, cosz))))
            bgap = math.exp(-denfveg * PAI * rc ** 2 / math.cos(thetap))
            fa = vai / (1.33 * PAI * rc ** 3.0 * (bb / rc) * denfveg)
            newvai = hd * fa
            wgap = (1.0 - bgap) * math.exp(-0.5 * newvai / cosz)
            gap = min(1.0 - fveg, bgap + wgap)
            kopen = 0.05
        elif opt_rad == 2:
            gap = 0.0
            kopen = 0.0
        else:  # opt_rad == 3
            gap = 1.0 - fveg
            kopen = 1.0 - fveg

    # two-stream parameters (:2907-2925)
    coszi = max(0.001, cosz)
    chil = min(max(xl, -0.4), 0.6)
    if abs(chil) <= 0.01:
        chil = 0.01
    phi1 = 0.5 - 0.633 * chil - 0.330 * chil * chil
    phi2 = 0.877 * (1.0 - 2.0 * phi1)
    gdir = phi1 + phi2 * coszi
    ext = gdir / coszi
    avmu = (1.0 - phi1 / phi2 * math.log((phi1 + phi2) / phi1)) / phi2
    omegal = rho[ib] + tau[ib]
    tmp0 = gdir + phi2 * coszi
    tmp1 = phi1 * coszi
    asu = (0.5 * omegal * gdir / tmp0
           * (1.0 - tmp1 / tmp0 * math.log((tmp1 + tmp0) / tmp1)))
    betadl = (1.0 + avmu * ext) / (omegal * avmu * ext) * asu
    betail = 0.5 * (rho[ib] + tau[ib] + (rho[ib] - tau[ib])
                    * ((1.0 + chil) / 2.0) ** 2) / omegal

    # adjust omega, betad, betai for intercepted snow (:2929-2939)
    if t > TFRZ:
        tmp0, tmp1, tmp2 = omegal, betadl, betail
    else:
        tmp0 = (1.0 - fwet) * omegal + fwet * OMEGAS[ib]
        tmp1 = ((1.0 - fwet) * omegal * betadl
                + fwet * OMEGAS[ib] * BETADS) / tmp0
        tmp2 = ((1.0 - fwet) * omegal * betail
                + fwet * OMEGAS[ib] * BETAIS) / tmp0
    omega, betad, betai = tmp0, tmp1, tmp2

    # absorbed, reflected, transmitted fluxes (:2943-2977)
    b = 1.0 - omega + omega * betai
    c = omega * betai
    tmp0 = avmu * ext
    d = tmp0 * omega * betad
    f = tmp0 * omega * (1.0 - betad)
    tmp1 = b * b - c * c
    h = math.sqrt(tmp1) / avmu
    sigma = tmp0 * tmp0 - tmp1
    if abs(sigma) < 1.0e-6:
        sigma = math.copysign(1.0e-6, sigma)
    p1 = b + avmu * h
    p2 = b - avmu * h
    p3 = b + tmp0
    p4 = b - tmp0
    s1 = math.exp(-h * vai)
    s2 = math.exp(-ext * vai)
    if ic == 0:
        u1 = b - c / albgrd[ib]
        u2 = b - c * albgrd[ib]
        u3 = f + c * albgrd[ib]
    else:
        u1 = b - c / albgri[ib]
        u2 = b - c * albgri[ib]
        u3 = f + c * albgri[ib]
    tmp2 = u1 - avmu * h
    tmp3 = u1 + avmu * h
    d1 = p1 * tmp2 / s1 - p2 * tmp3 * s1
    tmp4 = u2 + avmu * h
    tmp5 = u2 - avmu * h
    d2 = tmp4 / s1 - tmp5 * s1
    h1 = -d * p4 - c * f
    tmp6 = d - h1 * p3 / sigma
    tmp7 = (d - c - h1 / sigma * (u1 + tmp0)) * s2
    h2 = (tmp6 * tmp2 / s1 - p2 * tmp7) / d1
    h3 = -(tmp6 * tmp3 * s1 - p1 * tmp7) / d1
    h4 = -f * p3 - c * d
    tmp8 = h4 / sigma
    tmp9 = (u3 - tmp8 * (u2 - tmp0)) * s2
    h5 = -(tmp8 * tmp4 / s1 + tmp9) / d2
    h6 = (tmp8 * tmp5 * s1 + tmp9) / d2
    h7 = (c * tmp2) / (d1 * s1)
    h8 = (-c * tmp3 * s1) / d1
    h9 = tmp4 / (d2 * s1)
    h10 = (-tmp5 * s1) / d2

    # downward direct and diffuse fluxes below vegetation (:2981-2993)
    if ic == 0:
        ftd = s2 * (1.0 - gap) + gap
        fti = (h4 * s2 / sigma + h5 * s1 + h6 / s1) * (1.0 - gap)
    else:
        ftd = 0.0
        fti = (h9 * s1 + h10 / s1) * (1.0 - kopen) + kopen

    # flux reflected by the surface (:2997-3008)
    if ic == 0:
        fre = (h1 / sigma + h2 + h3) * (1.0 - gap) + albgrd[ib] * gap
        frev = (h1 / sigma + h2 + h3) * (1.0 - gap)
        freg = albgrd[ib] * gap
    else:
        fre = (h7 + h8) * (1.0 - kopen) + albgri[ib] * kopen
        frev = (h7 + h8) * (1.0 - kopen) + albgri[ib] * kopen
        freg = 0.0

    # flux absorbed by vegetation (:3012-3013)
    fab = 1.0 - fre - (1.0 - albgrd[ib]) * ftd - (1.0 - albgri[ib]) * fti

    return dict(fab=fab, fre=fre, ftd=ftd, fti=fti, gdir=gdir,
                frev=frev, freg=freg, bgap=bgap, wgap=wgap)


def snow_age(dt, tg, sneqvo, sneqv, tauss):
    """SNOW_AGE (:2547-2597) -> (tauss, fage)."""
    if sneqv <= 0.0:
        tauss_n = 0.0
    elif sneqv > 800.0:
        tauss_n = 0.0
    else:
        dela0 = 1.0e-6 * dt
        arg = 5.0e3 * (1.0 / TFRZ - 1.0 / tg)
        age1 = math.exp(arg)
        age2 = math.exp(min(0.0, 10.0 * arg))
        age3 = 0.3
        tage = age1 + age2 + age3
        dela = dela0 * tage
        dels = max(0.0, sneqv - sneqvo) / SWEMX
        sge = (tauss + dela) * (1.0 - dels)
        tauss_n = max(0.0, sge)
    fage = tauss_n / (tauss_n + 1.0)
    return tauss_n, fage


def snowalb_bats(cosz, fage):
    """SNOWALB_BATS (:2599-2650) -> (albsnd[2], albsni[2])."""
    c1, c2 = 0.2, 0.5
    sl = 2.0
    sl1 = 1.0 / sl
    sl2 = 2.0 * sl
    cf1 = (1.0 + sl1) / (1.0 + sl2 * cosz) - sl1
    fzen = max(cf1, 0.0)
    albsni = [0.95 * (1.0 - c1 * fage), 0.65 * (1.0 - c2 * fage)]
    albsnd = [albsni[0] + 0.4 * fzen * (1.0 - albsni[0]),
              albsni[1] + 0.4 * fzen * (1.0 - albsni[1])]
    return albsnd, albsni


def snowalb_class(qsnow, dt, albold):
    """SNOWALB_CLASS (:2652-2701) -> (alb, albsnd[2], albsni[2])."""
    alb = 0.55 + (albold - 0.55) * math.exp(-0.01 * dt / 3600.0)
    if qsnow > 0.0:
        alb = alb + min(qsnow * dt, SWEMX) * (0.84 - alb) / SWEMX
    return alb, [alb, alb], [alb, alb]


def groundalb(ist, isc, fsno, smc0, albsnd, albsni, cosz, tg):
    """GROUNDALB (:2703-2766) -> (albgrd[2], albgri[2]).  isc is the
    1-based soil color class (reference uses 4)."""
    from . import ALBSAT_VIS, ALBSAT_NIR, ALBDRY_VIS, ALBDRY_NIR
    albsat = [ALBSAT_VIS[isc - 1], ALBSAT_NIR[isc - 1]]
    albdry = [ALBDRY_VIS[isc - 1], ALBDRY_NIR[isc - 1]]
    albgrd, albgri = [0.0, 0.0], [0.0, 0.0]
    for ib in range(2):
        inc = max(0.11 - 0.40 * smc0, 0.0)
        if ist == 1:
            albsod = min(albsat[ib] + inc, albdry[ib])
            albsoi = albsod
        elif tg > TFRZ:
            albsod = 0.06 / (max(0.01, cosz) ** 1.7 + 0.15)
            albsoi = 0.06
        else:
            albsod = ALBLAK[ib]
            albsoi = albsod
        albgrd[ib] = albsod * (1.0 - fsno) + albsnd[ib] * fsno
        albgri[ib] = albsoi * (1.0 - fsno) + albsni[ib] * fsno
    return albgrd, albgri


def albedo(par, opt_alb, opt_rad, ist, isc, ice, dt, cosz, elai, esai,
           tg, tv, snowh, fsno, fwet, smc1, sneqvo, sneqv, qsnow, fveg,
           albold, tauss):
    """ALBEDO (:2243-2424): snow age + snow/ground albedo + two-stream
    x4.  `par` needs rhol/rhos/taul/taus (2-vectors), xl, rc, hvt, hvb.
    Returns a dict (albold/tauss updated)."""
    MPE = 1.0e-6
    nband = 2
    bgap = 0.0
    wgap = 0.0
    albd = [0.0, 0.0]
    albi = [0.0, 0.0]
    albgrd = [0.0, 0.0]
    albgri = [0.0, 0.0]
    fabd = [0.0, 0.0]
    fabi = [0.0, 0.0]
    ftdd = [0.0, 0.0]
    ftid = [0.0, 0.0]
    ftii = [0.0, 0.0]
    ftdi = [0.0, 0.0]
    frevd = [0.0, 0.0]
    frevi = [0.0, 0.0]
    fregd = [0.0, 0.0]
    fregi = [0.0, 0.0]
    fsun = 0.0

    if cosz <= 0:
        return dict(albold=albold, tauss=tauss, albgrd=albgrd,
                    albgri=albgri, albd=albd, albi=albi, fabd=fabd,
                    fabi=fabi, ftdd=ftdd, ftid=ftid, ftii=ftii,
                    fsun=fsun, frevd=frevd, frevi=frevi, fregd=fregd,
                    fregi=fregi, bgap=bgap, wgap=wgap)

    vai = elai + esai
    wl = elai / max(vai, MPE)
    ws = esai / max(vai, MPE)
    rho = [max(par["rhol"][b] * wl + par["rhos"][b] * ws, MPE)
           for b in range(2)]
    tau = [max(par["taul"][b] * wl + par["taus"][b] * ws, MPE)
           for b in range(2)]

    tauss, fage = snow_age(dt, tg, sneqvo, sneqv, tauss)
    if opt_alb == 1:
        albsnd, albsni = snowalb_bats(cosz, fage)
    else:
        alb, albsnd, albsni = snowalb_class(qsnow, dt, albold)
        albold = alb
    albgrd, albgri = groundalb(ist, isc, fsno, smc1, albsnd, albsni,
                               cosz, tg)

    gdir = 0.0
    for ib in range(2):
        rd = twostream(ib, 0, cosz, vai, fwet, tv, albgrd, albgri, rho,
                       tau, fveg, opt_rad, par["xl"], par["rc"],
                       par["hvt"], par["hvb"])
        fabd[ib] = rd["fab"]
        albd[ib] = rd["fre"]
        ftdd[ib] = rd["ftd"]
        ftid[ib] = rd["fti"]
        gdir = rd["gdir"]
        frevd[ib] = rd["frev"]
        fregd[ib] = rd["freg"]
        bgap = rd["bgap"]
        wgap = rd["wgap"]
        ri = twostream(ib, 1, cosz, vai, fwet, tv, albgrd, albgri, rho,
                       tau, fveg, opt_rad, par["xl"], par["rc"],
                       par["hvt"], par["hvb"])
        fabi[ib] = ri["fab"]
        albi[ib] = ri["fre"]
        ftdi[ib] = ri["ftd"]
        ftii[ib] = ri["fti"]
        frevi[ib] = ri["frev"]
        fregi[ib] = ri["freg"]
        bgap = ri["bgap"]
        wgap = ri["wgap"]

    import math as _m
    ext = gdir / cosz * _m.sqrt(1.0 - rho[0] - tau[0])
    fsun = (1.0 - _m.exp(-ext * vai)) / max(ext * vai, MPE)
    ext = fsun
    if ext < 0.01:
        wl = 0.0
    else:
        wl = ext
    fsun = wl

    return dict(albold=albold, tauss=tauss, albgrd=albgrd,
                albgri=albgri, albd=albd, albi=albi, fabd=fabd,
                fabi=fabi, ftdd=ftdd, ftid=ftid, ftii=ftii, fsun=fsun,
                frevd=frevd, frevi=frevi, fregd=fregd, fregi=fregi,
                bgap=bgap, wgap=wgap)


def surrad(fsun, fsha, elai, vai, laisun, laisha, solad, solai, fabd,
           fabi, ftdd, ftid, ftii, albgrd, albgri, albd, albi, frevi,
           frevd, fregd, fregi):
    """SURRAD (:2426-2545). Returns dict."""
    MPE = 1.0e-6
    sag = 0.0
    sav = 0.0
    fsa = 0.0
    cad = [0.0, 0.0]
    cai = [0.0, 0.0]
    for ib in range(2):
        cad[ib] = solad[ib] * fabd[ib]
        cai[ib] = solai[ib] * fabi[ib]
        sav = sav + cad[ib] + cai[ib]
        fsa = fsa + cad[ib] + cai[ib]
        trd = solad[ib] * ftdd[ib]
        tri = solad[ib] * ftid[ib] + solai[ib] * ftii[ib]
        absg = trd * (1.0 - albgrd[ib]) + tri * (1.0 - albgri[ib])
        sag = sag + absg
        fsa = fsa + absg
    laifra = elai / max(vai, MPE)
    if fsun > 0.0:
        parsun = (cad[0] + fsun * cai[0]) * laifra / max(laisun, MPE)
        parsha = (fsha * cai[0]) * laifra / max(laisha, MPE)
    else:
        parsun = 0.0
        parsha = (cad[0] + cai[0]) * laifra / max(laisha, MPE)
    rvis = albd[0] * solad[0] + albi[0] * solai[0]
    rnir = albd[1] * solad[1] + albi[1] * solai[1]
    fsr = rvis + rnir
    fsrv = (frevd[0] * solad[0] + frevi[0] * solai[0]
            + frevd[1] * solad[1] + frevi[1] * solai[1])
    fsrg = (fregd[0] * solad[0] + fregi[0] * solai[0]
            + fregd[1] * solad[1] + fregi[1] * solai[1])
    return dict(parsun=parsun, parsha=parsha, sav=sav, sag=sag, fsa=fsa,
                fsr=fsr, fsrv=fsrv, fsrg=fsrg)


def radiation_full(par, opt_alb, opt_rad, ist, isc, ice, dt, cosz,
                   elai, esai, tg, tv, snowh, fsno, fwet, smc1, sneqvo,
                   sneqv, qsnow, fveg, solad, solai, albold, tauss):
    """RADIATION (:2120-2241) = ALBEDO + SURRAD. Returns dict."""
    a = albedo(par, opt_alb, opt_rad, ist, isc, ice, dt, cosz, elai,
               esai, tg, tv, snowh, fsno, fwet, smc1, sneqvo, sneqv,
               qsnow, fveg, albold, tauss)
    fsun = a["fsun"]
    fsha = 1.0 - fsun
    laisun = elai * fsun
    laisha = elai * fsha
    vai = elai + esai
    s = surrad(fsun, fsha, elai, vai, laisun, laisha, solad, solai,
               a["fabd"], a["fabi"], a["ftdd"], a["ftid"], a["ftii"],
               a["albgrd"], a["albgri"], a["albd"], a["albi"],
               a["frevi"], a["frevd"], a["fregd"], a["fregi"])
    return dict(albold=a["albold"], tauss=a["tauss"], fsun=fsun,
                laisun=laisun, laisha=laisha, parsun=s["parsun"],
                parsha=s["parsha"], sav=s["sav"], sag=s["sag"],
                fsr=s["fsr"], fsa=s["fsa"], fsrv=s["fsrv"],
                fsrg=s["fsrg"], bgap=a["bgap"], wgap=a["wgap"])
