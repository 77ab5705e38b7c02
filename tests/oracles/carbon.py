"""Scalar transliteration of CARBON + CO2FLUX
(module_sf_noahmplsm.F90:8723-9105) — the dynamic-vegetation carbon
pools active for DVEG=2|5: Dickinson et al. 1998 assimilation,
allocation to leaf/stem/root/wood, maintenance+growth respiration
(Q10), turnover/death, and soil microbial respiration (FASTCP/STBLCP).

Statement-by-statement from the Fortran text, double precision, for
use as the value-parity oracle of noahmp_tpu.physics.carbon
(VERDICT r2 item 5).
"""

import math


def carbon(par, nsnow, nsoil, dt, zsoil, dzsnso, stc, smc, tv, tg, psn,
           foln, smcmax, btran, apar, fveg, igs, troot, lat,
           lfmass, rtmass, stmass, wood, stblcp, fastcp, xlai, xsai,
           masked=False):
    """CARBON (:8723-8835).

    zsoil/smc: Fortran-indexed dicts {1..nsoil}; dzsnso/stc:
    {-nsnow+1..nsoil}.  xlai/xsai are the INOUT state LAI/SAI (already
    filtered by PHENOLOGY).  ``masked`` = vegtyp in (water, barren,
    snow, urban).  Returns a dict with the updated pools and the flux
    diagnostics.
    """
    if masked:
        # water/barren/snow/urban early return (:8792-8810)
        return dict(lfmass=0.0, rtmass=0.0, stmass=0.0, wood=0.0,
                    stblcp=0.0, fastcp=0.0, lai=0.0, sai=0.0,
                    gpp=0.0, npp=0.0, nee=0.0, autors=0.0, heters=0.0,
                    totsc=0.0, totlb=0.0)

    lapm = par["sla"] / 1000.0                    # m2/kg -> m2/g

    wstres = 1.0 - btran                          # (:8819)
    nroot = par["nroot"]
    wroot = 0.0
    for j in range(1, nroot + 1):
        wroot = wroot + smc[j] / smcmax * dzsnso[j] / (-zsoil[nroot])

    return co2flux(par, nsnow, nsoil, dt, igs, dzsnso, stc, psn, troot,
                   tv, wroot, wstres, foln, lapm, lat, fveg,
                   xlai, xsai, lfmass, rtmass, stmass, fastcp, stblcp,
                   wood)


def co2flux(par, nsnow, nsoil, dt, igs, dzsnso, stc, psn, troot, tv,
            wroot, wstres, foln, lapm, lat, fveg,
            xlai, xsai, lfmass, rtmass, stmass, fastcp, stblcp, wood):
    """CO2FLUX (:8837-9105)."""
    # constants (:8962-8977)
    rtovrc = 2.0e-8
    rsdryc = 40.0                                 # noqa: F841 (declared)
    rswoodc = 3.0e-10
    bf = 0.90
    wstrc = 100.0
    laimin = 0.05
    xsamin = 0.01
    sapm = 3.0 * 0.001                            # m2/kg -> m2/g
    lfmsmn = laimin / lapm
    stmsmn = xsamin / sapm

    def r(x):
        return math.exp(0.08 * (x - 298.16))

    # respiration (:8981-8999)
    rf = 0.5 if igs == 0.0 else 1.0
    fnf = min(foln / max(1.0e-6, par["folnmx"]), 1.0)
    tf = par["arm"] ** ((tv - 298.16) / 10.0)
    resp = par["rmf25"] * tf * fnf * xlai * rf * (1.0 - wstres)
    rsleaf = min(lfmass / dt, resp * 12.0e-6)
    rsroot = par["rmr25"] * (rtmass * 1.0e-3) * tf * rf * 12.0e-6
    rsstem = par["rms25"] * (stmass * 1.0e-3) * tf * rf * 12.0e-6
    rswood = rswoodc * r(tv) * wood * par["wdpool"]

    # carbon assimilation (:9004)
    carbfx = psn * 12.0e-6

    # allocation fractions (:9008-9030)
    leafpt = math.exp(0.01 * (1.0 - math.exp(0.75 * xlai)) * xlai)
    if par.get("is_eblforest", False):
        leafpt = math.exp(0.01 * (1.0 - math.exp(0.50 * xlai)) * xlai)
    nonlef = 1.0 - leafpt
    stempt = xlai / 10.0
    leafpt = leafpt - stempt
    if wood > 0.0:
        woodf = (1.0 - math.exp(-bf * (par["wrrat"] * rtmass / wood))
                 / bf) * par["wdpool"]
    else:
        woodf = 0.0
    rootpt = nonlef * (1.0 - woodf)
    woodpt = nonlef * woodf

    # turnover (:9034-9037)
    lftovr = par["ltovrc"] * 1.0e-6 * lfmass
    sttovr = par["ltovrc"] * 1.0e-6 * stmass
    rttovr = rtovrc * rtmass
    wdtovr = 9.5e-10 * wood

    # seasonal die rate (:9042-9046)
    sc = math.exp(-0.3 * max(0.0, tv - par["tdlef"])) * (lfmass / 120.0)
    sd = math.exp((wstres - 1.0) * wstrc)
    dielf = lfmass * 1.0e-6 * (par["dilefw"] * sd + par["dilefc"] * sc)
    diest = stmass * 1.0e-6 * (par["dilefw"] * sd + par["dilefc"] * sc)

    # growth respiration (:9050-9053)
    grleaf = max(0.0, par["fragr"] * (leafpt * carbfx - rsleaf))
    grstem = max(0.0, par["fragr"] * (stempt * carbfx - rsstem))
    grroot = max(0.0, par["fragr"] * (rootpt * carbfx - rsroot))
    grwood = max(0.0, par["fragr"] * (woodpt * carbfx - rswood))

    # lower T limit for photosynthesis (:9057-9060)
    addnpplf = max(0.0, leafpt * carbfx - grleaf - rsleaf)
    addnppst = max(0.0, stempt * carbfx - grstem - rsstem)
    if tv < par["tmin"]:
        addnpplf = 0.0
        addnppst = 0.0

    # conserve mass against the leaf/stem minima (:9065-9068)
    lfdel = (lfmass - lfmsmn) / dt
    stdel = (stmass - stmsmn) / dt
    dielf = min(dielf, lfdel + addnpplf - lftovr)
    diest = min(diest, stdel + addnppst - sttovr)

    # net primary productivities (:9072-9075)
    nppl = max(addnpplf, -lfdel)
    npps = max(addnppst, -stdel)
    nppr = rootpt * carbfx - rsroot - grroot
    nppw = woodpt * carbfx - rswood - grwood

    # plant component masses (:9079-9087)
    lfmass = lfmass + (nppl - lftovr - dielf) * dt
    stmass = stmass + (npps - sttovr - diest) * dt
    rtmass = rtmass + (nppr - rttovr) * dt
    if rtmass < 0.0:
        rttovr = nppr
        rtmass = 0.0
    wood = (wood + (nppw - wdtovr) * dt) * par["wdpool"]

    # soil carbon (:9091-9099)
    fastcp = fastcp + (rttovr + lftovr + sttovr + wdtovr + dielf) * dt
    fst = 2.0 ** ((stc[1] - 283.16) / 10.0)
    fsw = wroot / (0.20 + wroot) * 0.23 / (0.23 + wroot)
    rssoil = fsw * fst * par["mrp"] * max(0.0, fastcp * 1.0e-3) * 12.0e-6
    stablc = 0.1 * rssoil
    fastcp = fastcp - (rssoil + stablc) * dt
    stblcp = stblcp + stablc * dt

    # outputs (:9108-9120 region: GPP..TOTLB, XLAI/XSAI)
    gpp = carbfx
    npp = nppl + nppw + nppr
    autors = rsroot + rswood + rsleaf + grleaf + grroot + grwood
    heters = rssoil
    nee = (autors + heters - gpp) * 44.0 / 12.0
    totsc = fastcp + stblcp
    totlb = lfmass + rtmass + wood

    xlai = max(lfmass * lapm, laimin)
    xsai = max(stmass * sapm, xsamin)

    return dict(lfmass=lfmass, rtmass=rtmass, stmass=stmass, wood=wood,
                stblcp=stblcp, fastcp=fastcp, lai=xlai, sai=xsai,
                gpp=gpp, npp=npp, nee=nee, autors=autors, heters=heters,
                totsc=totsc, totlb=totlb)
