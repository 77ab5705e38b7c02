"""Surface radiation: albedos, two-stream canopy transfer, absorbed flux.

Reference: RADIATION (module_sf_noahmplsm.F90:2120-2241), ALBEDO
(:2243-2424), SURRAD (:2426-2545), SNOW_AGE (:2547-2597), SNOWALB_BATS
(:2599-2650), SNOWALB_CLASS (:2652-2701), GROUNDALB (:2703-2766),
TWOSTREAM (:2768-3016).

All band-dimensioned quantities are (2,) vectors (vis, nir); the
direct/diffuse split is two static calls to ``two_stream``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from ..params.tables import OMEGAS, BETADS, BETAIS, ALBLAK
from .common import MPE, sanitize, atan_tpu, sel


def snow_age(dt, tg, sneqvo, sneqv, tauss):
    """BATS snow age update (SNOW_AGE :2547-2597) -> (tauss, fage)."""
    dela0 = 1.0e-6 * dt
    arg = 5.0e3 * (1.0 / C.TFRZ - 1.0 / tg)
    age1 = jnp.exp(arg)
    age2 = jnp.exp(jnp.minimum(0.0, 10.0 * arg))
    age3 = 0.3
    tage = age1 + age2 + age3
    dela = dela0 * tage
    dels = jnp.maximum(0.0, sneqv - sneqvo) / C.SWEMX
    sge = (tauss + dela) * (1.0 - dels)
    tauss_new = sel((sneqv <= 0.0) | (sneqv > 800.0), 0.0,
                          jnp.maximum(0.0, sge))
    fage = tauss_new / (tauss_new + 1.0)
    return tauss_new, fage


def snowalb_bats(fsno, cosz, fage):
    """BATS snow albedo (SNOWALB_BATS :2599-2650) -> (albsnd, albsni) (2,)."""
    c1, c2 = 0.2, 0.5
    sl = 2.0
    sl1, sl2 = 1.0 / sl, 2.0 * sl
    cf1 = (1.0 + sl1) / (1.0 + sl2 * cosz) - sl1
    fzen = jnp.maximum(cf1, 0.0)
    albsni = jnp.stack([0.95 * (1.0 - c1 * fage), 0.65 * (1.0 - c2 * fage)])
    albsnd = albsni + 0.4 * fzen * (1.0 - albsni)
    return albsnd, albsni


def snowalb_class(qsnow, dt, albold):
    """CLASS snow albedo (SNOWALB_CLASS :2652-2701) ->
    (alb, albsnd, albsni)."""
    alb = 0.55 + (albold - 0.55) * jnp.exp(-0.01 * dt / 3600.0)
    alb = sel(qsnow > 0.0,
                    alb + jnp.minimum(qsnow * dt, C.SWEMX) * (0.84 - alb) / C.SWEMX,
                    alb)
    ones = jnp.ones(2, dtype=alb.dtype)
    return alb, alb * ones, alb * ones


def groundalb(p, ist, fsno, smc0, albsnd, albsni, cosz, tg, isc9=False):
    """Ground albedo (GROUNDALB :2703-2766) -> (albgrd, albgri) (2,).

    ``p.albsat``/``p.albdry`` are per-column (2,) gathers by soil color.
    ``ist`` static: 1 soil, 2 lake.
    """
    inc = jnp.maximum(0.11 - 0.40 * smc0, 0.0)
    if ist == 1:
        albsod = jnp.minimum(p.albsat + inc, p.albdry)
        albsoi = albsod
    else:
        unfrozen = tg > C.TFRZ
        albsod_u = 0.06 / (jnp.maximum(0.01, cosz) ** 1.7 + 0.15) * jnp.ones(2)
        albsod = sel(unfrozen, albsod_u, jnp.asarray(ALBLAK))
        albsoi = sel(unfrozen, 0.06 * jnp.ones(2), albsod)
    if isc9 and ist == 1:
        albsod = albsod + 0.10
        albsoi = albsoi + 0.10
    albgrd = albsod * (1.0 - fsno) + albsnd * fsno
    albgri = albsoi * (1.0 - fsno) + albsni * fsno
    return albgrd, albgri


class TwoStreamOut(NamedTuple):
    fab: jnp.ndarray   # (2,) absorbed by veg per unit incoming
    fre: jnp.ndarray   # (2,) reflected above veg
    ftd: jnp.ndarray   # (2,) down direct below veg
    fti: jnp.ndarray   # (2,) down diffuse below veg
    gdir: jnp.ndarray  # projected leaf+stem area in solar direction
    frev: jnp.ndarray  # (2,) reflected by veg
    freg: jnp.ndarray  # (2,) reflected by ground
    bgap: jnp.ndarray
    wgap: jnp.ndarray


def two_stream(cfg, p, ic: int, cosz, vai, fwet, tveg, albgr_d, albgr_i,
               rho, tau, fveg) -> TwoStreamOut:
    """Dickinson/Sellers two-stream with Niu&Yang 2004 crown gaps
    (TWOSTREAM :2768-3016).  ``ic`` static: 0 direct beam, 1 diffuse.
    Band axis vectorized: rho/tau/albgr are (2,).
    """
    pai = 3.14159265
    has_vai = vai > 0.0

    # gap fractions (:2866-2897)
    if cfg.opt_rad == 1:
        rc = jnp.maximum(p.rc, 1.0e-6)
        denfveg = -jnp.log(jnp.maximum(1.0 - fveg, 0.01)) / (pai * rc ** 2)
        hd = p.hvt - p.hvb
        bb = 0.5 * hd
        coszc = jnp.maximum(0.01, cosz)
        tan_acos = jnp.sqrt(jnp.maximum(1.0 - coszc * coszc, 0.0)) / coszc
        thetap = atan_tpu(bb / rc * tan_acos)
        bgap = jnp.exp(-denfveg * pai * rc ** 2 / jnp.cos(thetap))
        fa = vai / jnp.maximum(1.33 * pai * rc ** 3 * (bb / rc) * denfveg, 1e-12)
        newvai = hd * fa
        wgap = (1.0 - bgap) * jnp.exp(-0.5 * newvai / jnp.maximum(cosz, 0.01))
        gap = jnp.minimum(1.0 - fveg, bgap + wgap)
        kopen = jnp.asarray(0.05, cosz.dtype)
    elif cfg.opt_rad == 2:
        gap = jnp.zeros_like(cosz)
        kopen = jnp.zeros_like(cosz)
        bgap = jnp.zeros_like(cosz)
        wgap = jnp.zeros_like(cosz)
    else:  # opt_rad == 3
        gap = 1.0 - fveg
        kopen = 1.0 - fveg
        bgap = jnp.zeros_like(cosz)
        wgap = jnp.zeros_like(cosz)
    gap = sel(has_vai, gap, 1.0)
    kopen = sel(has_vai, kopen, 1.0)

    # two-stream parameters (:2907-2925)
    coszi = jnp.maximum(0.001, cosz)
    chil = jnp.clip(p.xl, -0.4, 0.6)
    chil = sel(jnp.abs(chil) <= 0.01, 0.01, chil)
    phi1 = 0.5 - 0.633 * chil - 0.330 * chil * chil
    phi2 = 0.877 * (1.0 - 2.0 * phi1)
    gdir = phi1 + phi2 * coszi
    ext = gdir / coszi
    avmu = (1.0 - phi1 / phi2 * jnp.log((phi1 + phi2) / phi1)) / phi2
    omegal = rho + tau                     # (2,)
    tmp0 = gdir + phi2 * coszi
    tmp1 = phi1 * coszi
    asu = 0.5 * omegal * gdir / tmp0 * (1.0 - tmp1 / tmp0 * jnp.log((tmp1 + tmp0) / tmp1))
    betadl = (1.0 + avmu * ext) / (omegal * avmu * ext) * asu
    betail = 0.5 * (rho + tau + (rho - tau) * ((1.0 + chil) / 2.0) ** 2) / omegal

    # snow adjustment (:2929-2939)
    omegas = jnp.asarray(OMEGAS, rho.dtype)
    no_snow = tveg > C.TFRZ
    om_sn = (1.0 - fwet) * omegal + fwet * omegas
    bd_sn = ((1.0 - fwet) * omegal * betadl + fwet * omegas * BETADS) / om_sn
    bi_sn = ((1.0 - fwet) * omegal * betail + fwet * omegas * BETAIS) / om_sn
    omega = sel(no_snow, omegal, om_sn)
    betad = sel(no_snow, betadl, bd_sn)
    betai = sel(no_snow, betail, bi_sn)

    # flux solution (:2943-2993)
    b = 1.0 - omega + omega * betai
    c = omega * betai
    tmp0 = avmu * ext
    d = tmp0 * omega * betad
    f = tmp0 * omega * (1.0 - betad)
    tmp1 = jnp.maximum(b * b - c * c, 0.0)
    h = jnp.sqrt(tmp1) / avmu
    sigma = tmp0 * tmp0 - tmp1
    sigma = sel(jnp.abs(sigma) < 1.0e-6,
                      sel(sigma >= 0, 1.0e-6, -1.0e-6), sigma)
    p1 = b + avmu * h
    p2 = b - avmu * h
    p3 = b + tmp0
    p4 = b - tmp0
    s1 = jnp.exp(-jnp.minimum(h * vai, 50.0))
    s2 = jnp.exp(-jnp.minimum(ext * vai, 50.0))
    albgr = albgr_d if ic == 0 else albgr_i
    albgr_safe = jnp.maximum(albgr, 1.0e-6)
    u1 = b - c / albgr_safe
    u2 = b - c * albgr
    u3 = f + c * albgr
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

    if ic == 0:
        ftd = s2 * (1.0 - gap) + gap
        fti = (h4 * s2 / sigma + h5 * s1 + h6 / s1) * (1.0 - gap)
        fre = (h1 / sigma + h2 + h3) * (1.0 - gap) + albgr_d * gap
        frev = (h1 / sigma + h2 + h3) * (1.0 - gap)
        freg = albgr_d * gap
    else:
        ftd = jnp.zeros_like(h9)
        fti = (h9 * s1 + h10 / s1) * (1.0 - kopen) + kopen
        fre = (h7 + h8) * (1.0 - kopen) + albgr_i * kopen
        frev = (h7 + h8) * (1.0 - kopen) + albgr_i * kopen
        freg = jnp.zeros_like(fre)

    fab = 1.0 - fre - (1.0 - albgr_d) * ftd - (1.0 - albgr_i) * fti
    return TwoStreamOut(fab, fre, ftd, fti, gdir, frev, freg, bgap, wgap)


class AlbedoOut(NamedTuple):
    albgrd: jnp.ndarray   # (2,) ground albedo direct
    albgri: jnp.ndarray   # (2,) ground albedo diffuse
    albd: jnp.ndarray     # (2,) surface albedo direct
    albi: jnp.ndarray     # (2,) surface albedo diffuse
    fabd: jnp.ndarray     # (2,)
    fabi: jnp.ndarray     # (2,)
    ftdd: jnp.ndarray     # (2,)
    ftid: jnp.ndarray     # (2,)
    ftii: jnp.ndarray     # (2,)
    fsun: jnp.ndarray
    frevd: jnp.ndarray    # (2,)
    frevi: jnp.ndarray    # (2,)
    fregd: jnp.ndarray    # (2,)
    fregi: jnp.ndarray    # (2,)
    bgap: jnp.ndarray
    wgap: jnp.ndarray
    albold: jnp.ndarray   # updated CLASS albedo memory
    tauss: jnp.ndarray    # updated snow age


def albedo(cfg, p, ist, ice, cosz, elai, esai, tg, tv, fsno, fwet,
           smc0, sneqvo, sneqv, qsnow, fveg, albold, tauss) -> AlbedoOut:
    """Surface albedo orchestrator (ALBEDO :2243-2424).

    Matches the reference's COSZ<=0 early exit: all radiative outputs
    zero and ALBOLD/TAUSS *not* advanced at night (:2356 GOTO 100).
    """
    day = cosz > 0.0
    vai = elai + esai
    wl = elai / jnp.maximum(vai, MPE)
    ws = esai / jnp.maximum(vai, MPE)
    rho = jnp.maximum(p.rhol * wl + p.rhos * ws, MPE)  # (2,)
    tau = jnp.maximum(p.taul * wl + p.taus * ws, MPE)

    tauss_new, fage = snow_age(cfg.dt, tg, sneqvo, sneqv, tauss)
    if cfg.opt_alb == 1:
        albsnd, albsni = snowalb_bats(fsno, cosz, fage)
        albold_new = albold
    else:
        alb, albsnd, albsni = snowalb_class(qsnow, cfg.dt, albold)
        albold_new = alb

    albgrd, albgri = groundalb(p, ist, fsno, smc0, albsnd, albsni, cosz, tg)

    tsd = two_stream(cfg, p, 0, cosz, vai, fwet, tv, albgrd, albgri,
                     rho, tau, fveg)
    tsi = two_stream(cfg, p, 1, cosz, vai, fwet, tv, albgrd, albgri,
                     rho, tau, fveg)

    # sunlit fraction (:2407-2419)
    ext = tsd.gdir / jnp.maximum(cosz, 0.001) * jnp.sqrt(
        jnp.maximum(1.0 - rho[0] - tau[0], 0.0))
    fsun = (1.0 - jnp.exp(-jnp.minimum(ext * vai, 50.0))) / jnp.maximum(ext * vai, MPE)
    fsun = sel(fsun < 0.01, 0.0, fsun)

    def m(x):  # night masking
        return sel(day, x, jnp.zeros_like(x))

    return AlbedoOut(
        albgrd=m(albgrd), albgri=m(albgri),
        albd=m(tsd.fre), albi=m(tsi.fre),
        fabd=m(tsd.fab), fabi=m(tsi.fab),
        ftdd=m(tsd.ftd), ftid=m(tsd.fti), ftii=m(tsi.fti),
        fsun=m(fsun),
        frevd=m(tsd.frev), frevi=m(tsi.frev),
        fregd=m(tsd.freg), fregi=m(tsi.freg),
        bgap=m(tsd.bgap), wgap=m(tsd.wgap),
        albold=sel(day, albold_new, albold),
        tauss=sel(day, tauss_new, tauss),
    )


class RadiationOut(NamedTuple):
    fsun: jnp.ndarray
    laisun: jnp.ndarray
    laisha: jnp.ndarray
    parsun: jnp.ndarray
    parsha: jnp.ndarray
    sav: jnp.ndarray
    sag: jnp.ndarray
    fsa: jnp.ndarray
    fsr: jnp.ndarray
    fsrv: jnp.ndarray
    fsrg: jnp.ndarray
    bgap: jnp.ndarray
    wgap: jnp.ndarray
    albold: jnp.ndarray
    tauss: jnp.ndarray
    albd: jnp.ndarray
    albi: jnp.ndarray


def radiation(cfg, p, ist, ice, cosz, elai, esai, tg, tv, fsno, fwet,
              smc0, sneqvo, sneqv, qsnow, fveg, albold, tauss,
              solad, solai) -> RadiationOut:
    """RADIATION (:2120-2241) = ALBEDO + SURRAD."""
    a = albedo(cfg, p, ist, ice, cosz, elai, esai, tg, tv, fsno, fwet,
               smc0, sneqvo, sneqv, qsnow, fveg, albold, tauss)

    fsha = 1.0 - a.fsun
    laisun = elai * a.fsun
    laisha = elai * fsha
    vai = elai + esai

    # SURRAD (:2426-2545)
    cad = solad * a.fabd            # (2,)
    cai = solai * a.fabi
    sav = jnp.sum(cad + cai)
    trd = solad * a.ftdd
    tri = solad * a.ftid + solai * a.ftii
    absg = trd * (1.0 - a.albgrd) + tri * (1.0 - a.albgri)
    sag = jnp.sum(absg)
    fsa = sav + sag

    laifra = elai / jnp.maximum(vai, MPE)
    parsun_day = (cad[0] + a.fsun * cai[0]) * laifra / jnp.maximum(laisun, MPE)
    parsha_day = (fsha * cai[0]) * laifra / jnp.maximum(laisha, MPE)
    parsha_night = (cad[0] + cai[0]) * laifra / jnp.maximum(laisha, MPE)
    sunlit = a.fsun > 0.0
    parsun = sel(sunlit, parsun_day, 0.0)
    parsha = sel(sunlit, parsha_day, parsha_night)

    fsr = jnp.sum(a.albd * solad + a.albi * solai)
    fsrv = jnp.sum(a.frevd * solad + a.frevi * solai)
    fsrg = jnp.sum(a.fregd * solad + a.fregi * solai)

    return RadiationOut(a.fsun, laisun, laisha, parsun, parsha, sav, sag,
                        fsa, fsr, fsrv, fsrg, a.bgap, a.wgap, a.albold,
                        a.tauss, a.albd, a.albi)
