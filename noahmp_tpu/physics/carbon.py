"""Dynamic vegetation carbon cycle (DVEG=2|5).

Reference: CARBON (module_sf_noahmplsm.F90:8723-8835) and CO2FLUX
(:8837-9105) — Dickinson et al. 1998 carbon pools: photosynthesis
assimilation, allocation to leaf/stem/root/wood, maintenance+growth
respiration (Q10), turnover/death, and soil microbial respiration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .common import sel


class CarbonOut(NamedTuple):
    lfmass: jnp.ndarray
    rtmass: jnp.ndarray
    stmass: jnp.ndarray
    wood: jnp.ndarray
    stblcp: jnp.ndarray
    fastcp: jnp.ndarray
    lai: jnp.ndarray
    sai: jnp.ndarray
    gpp: jnp.ndarray
    npp: jnp.ndarray
    nee: jnp.ndarray
    autors: jnp.ndarray
    heters: jnp.ndarray
    totsc: jnp.ndarray
    totlb: jnp.ndarray


def carbon(cfg, p, stc_soil, smc, tv, tg, psn, foln, btran, apar, fveg,
           igs, troot, lat, lai, lfmass, rtmass, stmass, wood, stblcp,
           fastcp) -> CarbonOut:
    """CARBON + CO2FLUX.

    ``stc_soil`` is the (nsoil,) soil temperature vector.  ``lai`` is
    the state LAI as filtered by PHENOLOGY (XLAI is INOUT at :8742;
    CO2FLUX's respiration and allocation consume the incoming value,
    :8996-9023).  Non-vegetated categories (water/barren/snow/urban)
    are zeroed by the ``nonveg`` mask, matching CARBON's early return
    (:8792-8810).
    """
    dt = cfg.dt
    nsoil = cfg.nsoil
    dzs = jnp.asarray(cfg.dzs, tv.dtype)
    zsoil = jnp.asarray(cfg.zsoil, tv.dtype)

    if cfg.llanduse == "USGS":
        nonveg = ((p.vegtyp == 16) | (p.vegtyp == 19) | (p.vegtyp == 24)
                  | p.is_urban)
        is_eblforest = p.vegtyp == 13
    else:
        nonveg = ((p.vegtyp == 17) | (p.vegtyp == 16) | (p.vegtyp == 15)
                  | p.is_urban)
        is_eblforest = p.vegtyp == 2

    lapm = p.sla / 1000.0
    wstres = 1.0 - btran
    root_mask = jnp.arange(nsoil) < p.nroot
    znroot = jnp.sum(sel(root_mask, dzs, 0.0))
    wroot = jnp.sum(sel(root_mask,
                              smc / p.smcmax * dzs / jnp.maximum(znroot, 1e-6),
                              0.0))

    # --- CO2FLUX (:8837-9105) ---
    rtovrc, rsdryc, rswoodc = 2.0e-8, 40.0, 3.0e-10
    bf, wstrc = 0.90, 100.0
    laimin, xsamin = 0.05, 0.01
    sapm = 3.0 * 0.001
    lfmsmn = laimin / jnp.maximum(lapm, 1e-8)
    stmsmn = xsamin / sapm

    # XLAI enters CO2FLUX as the state LAI (inout :8742), i.e. the
    # previous step's MAX(LFMASS*LAPM, LAIMIN) after PHENOLOGY's
    # threshold zeroing (:1073-1079)
    xlai = lai
    # respiration (:8988-9000)
    rf = sel(igs == 0.0, 0.5, 1.0)
    fnf = jnp.minimum(foln / jnp.maximum(1.0e-6, p.folnmx), 1.0)
    tf = p.arm ** ((tv - 298.16) / 10.0)
    resp = p.rmf25 * tf * fnf * xlai * rf * (1.0 - wstres)
    rsleaf = jnp.minimum(lfmass / dt, resp * 12.0e-6)
    rsroot = p.rmr25 * (rtmass * 1.0e-3) * tf * rf * 12.0e-6
    rsstem = p.rms25 * (stmass * 1.0e-3) * tf * rf * 12.0e-6
    rswood = rswoodc * jnp.exp(0.08 * (tv - 298.16)) * wood * p.wdpool

    carbfx = psn * 12.0e-6

    # allocation fractions (:9009-9030)
    leafpt = jnp.exp(0.01 * (1.0 - jnp.exp(0.75 * xlai)) * xlai)
    leafpt = sel(is_eblforest,
                       jnp.exp(0.01 * (1.0 - jnp.exp(0.50 * xlai)) * xlai),
                       leafpt)
    nonlef = 1.0 - leafpt
    stempt = xlai / 10.0
    leafpt = leafpt - stempt
    woodf = sel(wood > 0.0,
                      (1.0 - jnp.exp(-bf * (p.wrrat * rtmass
                                            / jnp.maximum(wood, 1e-6))) / bf)
                      * p.wdpool,
                      0.0)
    rootpt = nonlef * (1.0 - woodf)
    woodpt = nonlef * woodf

    # turnover & death (:9034-9046)
    lftovr = p.ltovrc * 1.0e-6 * lfmass
    sttovr = p.ltovrc * 1.0e-6 * stmass
    rttovr = rtovrc * rtmass
    wdtovr = 9.5e-10 * wood
    sc = jnp.exp(-0.3 * jnp.maximum(0.0, tv - p.tdlef)) * (lfmass / 120.0)
    sd = jnp.exp((wstres - 1.0) * wstrc)
    dielf = lfmass * 1.0e-6 * (p.dilefw * sd + p.dilefc * sc)
    diest = stmass * 1.0e-6 * (p.dilefw * sd + p.dilefc * sc)

    # growth respiration (:9050-9053)
    grleaf = jnp.maximum(0.0, p.fragr * (leafpt * carbfx - rsleaf))
    grstem = jnp.maximum(0.0, p.fragr * (stempt * carbfx - rsstem))
    grroot = jnp.maximum(0.0, p.fragr * (rootpt * carbfx - rsroot))
    grwood = jnp.maximum(0.0, p.fragr * (woodpt * carbfx - rswood))

    addnpplf = jnp.maximum(0.0, leafpt * carbfx - grleaf - rsleaf)
    addnppst = jnp.maximum(0.0, stempt * carbfx - grstem - rsstem)
    cold = tv < p.tmin
    addnpplf = sel(cold, 0.0, addnpplf)
    addnppst = sel(cold, 0.0, addnppst)

    lfdel = (lfmass - lfmsmn) / dt
    stdel = (stmass - stmsmn) / dt
    dielf = jnp.minimum(dielf, lfdel + addnpplf - lftovr)
    diest = jnp.minimum(diest, stdel + addnppst - sttovr)

    nppl = jnp.maximum(addnpplf, -lfdel)
    npps = jnp.maximum(addnppst, -stdel)
    nppr = rootpt * carbfx - rsroot - grroot
    nppw = woodpt * carbfx - rswood - grwood

    lfmass = lfmass + (nppl - lftovr - dielf) * dt
    stmass = stmass + (npps - sttovr - diest) * dt
    rtmass_n = rtmass + (nppr - rttovr) * dt
    rttovr = sel(rtmass_n < 0.0, nppr, rttovr)
    rtmass = jnp.maximum(rtmass_n, 0.0)
    wood = (wood + (nppw - wdtovr) * dt) * p.wdpool

    fastcp = fastcp + (rttovr + lftovr + sttovr + wdtovr + dielf) * dt
    fst = 2.0 ** ((stc_soil[0] - 283.16) / 10.0)
    fsw = wroot / (0.20 + wroot) * 0.23 / (0.23 + wroot)
    rssoil = fsw * fst * p.mrp * jnp.maximum(0.0, fastcp * 1.0e-3) * 12.0e-6
    stablc = 0.1 * rssoil
    fastcp = fastcp - (rssoil + stablc) * dt
    stblcp = stblcp + stablc * dt

    gpp = carbfx
    npp = nppl + nppw + nppr
    autors = rsroot + rswood + rsleaf + grleaf + grroot + grwood
    heters = rssoil
    nee = (autors + heters - gpp) * 44.0 / 12.0
    totsc = fastcp + stblcp
    totlb = lfmass + rtmass + wood

    xlai = jnp.maximum(lfmass * lapm, laimin)
    xsai = jnp.maximum(stmass * sapm, xsamin)

    z = jnp.zeros_like(tv)

    def mask(x):
        return sel(nonveg, z, x)

    return CarbonOut(
        lfmass=mask(lfmass), rtmass=mask(rtmass), stmass=mask(stmass),
        wood=mask(wood), stblcp=mask(stblcp), fastcp=mask(fastcp),
        lai=mask(xlai), sai=mask(xsai), gpp=mask(gpp), npp=mask(npp),
        nee=mask(nee), autors=mask(autors), heters=mask(heters),
        totsc=mask(totsc), totlb=mask(totlb))


def bvocflux(p, vegfrac, apar, tv):
    """Biogenic VOC emission (BVOCFLUX, module_sf_noahmplsm.F90:
    9107-9200; Guenther 1999): E = epsilon * gamma * density for 5
    compound classes -> [ug C m-2 h-1].

    The reference declares this routine but comments it out of the
    SFLX call tree (:9509); here it is an optional diagnostic.
    p.eps is the (n, 5) per-column emission-capacity table and
    p.slarea the specific leaf area, both hydrated from MPTABLE.
    """
    R = 8.314
    alpha, cl1 = 0.0027, 1.066
    ct1, ct2, ct3 = 95000.0, 230000.0, 0.961
    tm, tstd, bet = 314.0, 303.0, 0.09

    reciprod = 1.0 / (R * tv * tstd)
    ct = (jnp.exp(ct1 * (tv - tstd) * reciprod)
          / (ct3 + jnp.exp(ct2 * (tv - tm) * reciprod)))
    par = apar * 4.6  # W m-2 -> umol m-2 s-1
    cl = alpha * cl1 * par * jax_rsqrt1p(alpha * alpha * par * par)

    gamma_iso = cl * ct
    gamma_rest = jnp.exp(bet * (tv - tstd))
    gamma = jnp.stack(
        [gamma_iso] + [gamma_rest] * 4, axis=-1)

    # vegfrac -> ELAI (reference's inverse Beer's-law transform)
    elai = jnp.maximum(
        0.0, -6.5 / 2.5 * jnp.log(jnp.maximum(1.0 - vegfrac, 1e-6)))
    density = elai / (p.slarea * 0.5)

    return p.eps * gamma * density[..., None]


def jax_rsqrt1p(x):
    """(1 + x)**-0.5 guarded for the vmapped vector path."""
    return jnp.reciprocal(jnp.sqrt(1.0 + x))
