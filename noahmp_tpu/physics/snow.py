"""Canopy interception and snowpack hydrology.

Reference: CANWATER (module_sf_noahmplsm.F90:6615-6866), SNOWWATER
(:6868-6996), SNOWFALL (:6998-7063), COMBINE (:7065-7246), DIVIDE
(:7248-7371), COMBO (:7375-7425), COMPACT (:7427-7528), SNOWH2O
(:7530-7678).

Snow layers live in fixed (nsnow,) arrays with the bottom layer at
index nsnow-1 (Fortran J=0) and the active range [isnow+nsnow, nsnow).
The reference's data-dependent layer insertion/merging/shifting is
re-expressed as masked fixed-shape updates; with nsnow=3 every dynamic
loop unrolls to <=3 masked steps, which XLA fuses into straight-line
vector code.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from .common import (sanitize, take1, put1, add1, roll_to_front,
                     cumsum_small, sel, band)

DZMIN = (0.025, 0.025, 0.1)  # COMBINE minimum thicknesses (:7104)
# the glacier module keeps the pre-"MB: change limit" thresholds
# (module_sf_noahmp_glacier.F90:2283,2438,2503 and DIVIDE_GLACIER's
# second-layer split at 0.10): thicker minimum layers, a 0.05 m
# first-layer/collapse threshold
DZMIN_GLACIER = (0.045, 0.05, 0.2)


# ---------------------------------------------------------------------------
# canopy interception
# ---------------------------------------------------------------------------

class CanWaterOut(NamedTuple):
    canliq: jnp.ndarray
    canice: jnp.ndarray
    tv: jnp.ndarray
    cmc: jnp.ndarray
    ecan: jnp.ndarray
    etran: jnp.ndarray
    qrain: jnp.ndarray
    qsnow: jnp.ndarray
    snowhin: jnp.ndarray
    fwet: jnp.ndarray
    fpice: jnp.ndarray


def canwater(cfg, p, sfctmp, uu, vv, fcev, fctr, qprecc, qprecl, elai,
             esai, tg, fveg, frozen_canopy, canliq, canice, tv,
             ist=1) -> CanWaterOut:
    """Canopy hydrology (CANWATER :6615-6866)."""
    dt = cfg.dt

    # precipitation phase partition (:6709-6737)
    if cfg.opt_snf == 1:  # Jordan (1991)
        fpice = sel(
            sfctmp > C.TFRZ + 2.5, 0.0,
            sel(sfctmp <= C.TFRZ + 0.5, 1.0,
                      sel(sfctmp <= C.TFRZ + 2.0,
                                1.0 - (-54.632 + 0.2 * sfctmp), 0.6)))
    elif cfg.opt_snf == 2:
        fpice = sel(sfctmp >= C.TFRZ + 2.2, 0.0, 1.0)
    else:
        fpice = sel(sfctmp >= C.TFRZ, 0.0, 1.0)

    # fresh snow density, Hedstrom & Pomeroy 1998 (:6742)
    bdfall = jnp.minimum(120.0, 67.92 + 51.25 * jnp.exp((sfctmp - C.TFRZ) / 2.59))

    ptot = qprecc + qprecl
    rain = ptot * (1.0 - fpice)
    snow = ptot * fpice
    fp = sel(ptot > 0.0, ptot / (10.0 * qprecc + qprecl), 0.0)

    has_canopy = (elai + esai) > 0.0

    # liquid interception (:6755-6768)
    maxliq = p.ch2op * (elai + esai)
    maxliq_s = sanitize(maxliq, has_canopy, 1.0)
    qintr = fveg * rain * fp
    qintr = jnp.minimum(qintr, (maxliq - canliq) / dt *
                        (1.0 - jnp.exp(-rain * dt / maxliq_s)))
    qintr = jnp.maximum(qintr, 0.0)
    qintr = sel(has_canopy, qintr, 0.0)
    qdripr = sel(has_canopy, fveg * rain - qintr, 0.0)
    qthror = sel(has_canopy, (1.0 - fveg) * rain, rain)

    # ET partition by canopy phase (:6772-6784)
    etran = sel(frozen_canopy, jnp.maximum(fctr / C.HSUB, 0.0),
                      jnp.maximum(fctr / C.HVAP, 0.0))
    qevac = sel(frozen_canopy, 0.0, jnp.maximum(fcev / C.HVAP, 0.0))
    qdewc = sel(frozen_canopy, 0.0,
                      jnp.abs(jnp.minimum(fcev / C.HVAP, 0.0)))
    qsubc = sel(frozen_canopy, jnp.maximum(fcev / C.HSUB, 0.0), 0.0)
    qfroc = sel(frozen_canopy,
                      jnp.abs(jnp.minimum(fcev / C.HSUB, 0.0)), 0.0)

    qevac = jnp.minimum(canliq / dt, qevac)
    canliq = jnp.maximum(0.0, canliq + (qintr + qdewc - qevac) * dt)
    canliq = sel(canliq <= 1.0e-6, 0.0, canliq)

    # snow interception (:6793-6810)
    maxsno = 6.6 * (0.27 + 46.0 / bdfall) * (elai + esai)
    maxsno_s = sanitize(maxsno, has_canopy, 1.0)
    qints = fveg * snow * fp
    qints = jnp.minimum(qints, (maxsno - canice) / dt *
                        (1.0 - jnp.exp(-snow * dt / maxsno_s)))
    qints = jnp.maximum(qints, 0.0)
    qints = sel(has_canopy, qints, 0.0)
    ft = jnp.maximum(0.0, (tv - 270.15) / 1.87e5)
    fv_unl = jnp.sqrt(uu * uu + vv * vv) / 1.56e5
    qdrips = sel(has_canopy, jnp.maximum(0.0, canice) * (fv_unl + ft), 0.0)
    qthros = sel(has_canopy,
                       (1.0 - fveg) * snow + (fveg * snow - qints), snow)

    qsubc = jnp.minimum(canice / dt, qsubc)
    canice = jnp.maximum(0.0, canice + (qints - qdrips) * dt
                         + (qfroc - qsubc) * dt)
    canice = sel(canice <= 1.0e-6, 0.0, canice)

    # wetted fraction (:6816-6821)
    fwet = sel(canice > 0.0,
                     jnp.maximum(0.0, canice) / jnp.maximum(maxsno, 1.0e-6),
                     jnp.maximum(0.0, canliq) / jnp.maximum(maxliq, 1.0e-6))
    fwet = jnp.minimum(fwet, 1.0) ** 0.667

    # canopy phase change (:6825-6843)
    melt = (canice > 1.0e-6) & (tv > C.TFRZ)
    qmeltc = sel(melt,
                       jnp.minimum(canice / dt,
                                   (tv - C.TFRZ) * C.CICE * canice / C.DENICE / (dt * C.HFUS)),
                       0.0)
    canice = jnp.maximum(0.0, canice - qmeltc * dt)
    canliq = jnp.maximum(0.0, canliq + qmeltc * dt)
    tv = sel(melt, fwet * C.TFRZ + (1.0 - fwet) * tv, tv)

    frz = (canliq > 1.0e-6) & (tv < C.TFRZ)
    qfrzc = sel(frz,
                      jnp.minimum(canliq / dt,
                                  (C.TFRZ - tv) * C.CWAT * canliq / C.DENH2O / (dt * C.HFUS)),
                      0.0)
    canliq = jnp.maximum(0.0, canliq - qfrzc * dt)
    canice = jnp.maximum(0.0, canice + qfrzc * dt)
    tv = sel(frz, fwet * C.TFRZ + (1.0 - fwet) * tv, tv)

    cmc = canliq + canice
    ecan = qevac + qsubc - qdewc - qfroc
    qrain = qdripr + qthror
    qsnow = qdrips + qthros
    snowhin = qsnow / bdfall
    if ist == 2:
        lake_warm = tg > C.TFRZ
        qsnow = sel(lake_warm, 0.0, qsnow)
        snowhin = sel(lake_warm, 0.0, snowhin)

    return CanWaterOut(canliq, canice, tv, cmc, ecan, etran, qrain,
                       qsnow, snowhin, fwet, fpice)


# ---------------------------------------------------------------------------
# snowpack layer mechanics
# ---------------------------------------------------------------------------

def _combo(dz1, wliq1, wice1, t1, dz2, wliq2, wice2, t2):
    """Enthalpy-conserving two-layer merge (COMBO :7375-7425).
    Returns merged (dz, wliq, wice, t)."""
    dzc = dz1 + dz2
    wicec = wice1 + wice2
    wliqc = wliq1 + wliq2
    h = (C.CICE * wice1 + C.CWAT * wliq1) * (t1 - C.TFRZ) + C.HFUS * wliq1
    h2 = (C.CICE * wice2 + C.CWAT * wliq2) * (t2 - C.TFRZ) + C.HFUS * wliq2
    hc = h + h2
    cden = sanitize(C.CICE * wicec + C.CWAT * wliqc,
                    (wicec + wliqc) > 0, 1.0)
    tc = sel(hc < 0.0, C.TFRZ + hc / cden,
                   sel(hc <= C.HFUS * wliqc, C.TFRZ,
                             C.TFRZ + (hc - C.HFUS * wliqc) / cden))
    return dzc, wliqc, wicec, tc


def _shift_down(x, lo, hi):
    """x[i] <- x[i-1] for lo <= i <= hi (traced lo, static hi)."""
    shifted = jnp.concatenate([x[:1], x[:-1]])
    idx = jnp.arange(x.shape[0])
    return sel(band(idx >= lo, idx <= hi), shifted, x)


class SnowPack(NamedTuple):
    isnow: jnp.ndarray     # int32, <= 0
    snice: jnp.ndarray     # (nsnow,)
    snliq: jnp.ndarray     # (nsnow,)
    stc_sn: jnp.ndarray    # (nsnow,) snow-layer temperatures
    dz_sn: jnp.ndarray     # (nsnow,) snow-layer thickness
    sneqv: jnp.ndarray
    snowh: jnp.ndarray
    sice: jnp.ndarray      # (nsoil,)
    sh2o: jnp.ndarray      # (nsoil,)
    ponding1: jnp.ndarray
    ponding2: jnp.ndarray


def combine(cfg, pk: SnowPack, glacier=False) -> SnowPack:
    """Merge thin snow layers (COMBINE :7065-7246;
    COMBINE_GLACIER :2400-2520 with its own thresholds)."""
    nsnow = cfg.nsnow
    dz_soil1 = cfg.dzs[0]
    isnow, snice, snliq, stc_sn, dz_sn = (pk.isnow, pk.snice, pk.snliq,
                                          pk.stc_sn, pk.dz_sn)
    sneqv, snowh, sice, sh2o = pk.sneqv, pk.snowh, pk.sice, pk.sh2o
    ponding1, ponding2 = pk.ponding1, pk.ponding2
    isnow_old = isnow

    # --- pass 1: absorb layers with snice <= 0.1 mm (:7109-7151) ---
    for j in range(nsnow):
        top = isnow + nsnow
        thin = (isnow < 0) & (j >= top) & (snice[j] <= 0.1)
        if j < nsnow - 1:
            snliq = add1(snliq, j + 1, sel(thin, snliq[j], 0.0))
            snice = add1(snice, j + 1, sel(thin, snice[j], 0.0))
        else:
            up = thin & (isnow_old < -1)
            snliq = add1(snliq, j - 1, sel(up, snliq[j], 0.0))
            snice = add1(snice, j - 1, sel(up, snice[j], 0.0))
            # single thin layer -> layerless snow (:7118-7139);
            # COMBINE_GLACIER (:2455-2460) has no negative-snice
            # branch: it always keeps SNEQV=SNICE/SNOWH=DZ
            single = thin & ~(isnow_old < -1)
            pos = single if glacier else single & (snice[j] >= 0.0)
            neg = (single & False) if glacier \
                else single & (snice[j] < 0.0)
            ponding1 = sel(pos, ponding1 + snliq[j], ponding1)
            sneqv = sel(pos, snice[j], sel(neg, 0.0, sneqv))
            snowh = sel(pos, dz_sn[j], sel(neg, 0.0, snowh))
            pond_neg = snliq[j] + snice[j]
            sice = put1(sice, 0, sel(
                neg & (pond_neg < 0.0),
                jnp.maximum(0.0, sice[0] + pond_neg / (dz_soil1 * 1000.0)),
                sice[0]))
            ponding1 = sel(neg & (pond_neg >= 0.0),
                                 ponding1 + pond_neg, ponding1)
            snliq = put1(snliq, j, sel(single, 0.0, snliq[j]))
            snice = put1(snice, j, sel(single, 0.0, snice[j]))
            dz_sn = put1(dz_sn, j, sel(single, 0.0, dz_sn[j]))
        # shift layers above down by one (:7142-7149)
        do_shift = thin & (j > top) & (isnow < -1)
        stc_sn = sel(do_shift, _shift_down(stc_sn, top + 1, j), stc_sn)
        snliq = sel(do_shift, _shift_down(snliq, top + 1, j), snliq)
        snice = sel(do_shift, _shift_down(snice, top + 1, j), snice)
        dz_sn = sel(do_shift, _shift_down(dz_sn, top + 1, j), dz_sn)
        isnow = isnow + thin.astype(jnp.int32)

    # over-sublimation guard (:7155-7158)
    sh2o = add1(sh2o, 0, jnp.minimum(sice[0], 0.0))
    sice = put1(sice, 0, jnp.maximum(sice[0], 0.0))

    multi = isnow < 0
    act = jnp.arange(nsnow) >= (isnow + nsnow)
    zwice = jnp.sum(sel(act, snice, 0.0))
    zwliq = jnp.sum(sel(act, snliq, 0.0))
    sneqv = sel(multi, zwice + zwliq, sneqv)
    snowh = sel(multi, jnp.sum(sel(act, dz_sn, 0.0)), snowh)

    # total depth below threshold -> layerless (:7177-7183;
    # glacier :2503 keeps 0.05)
    collapse = multi & (snowh < (0.05 if glacier else 0.025))
    isnow = sel(collapse, 0, isnow)
    sneqv = sel(collapse, zwice, sneqv)
    ponding2 = sel(collapse, ponding2 + zwliq, ponding2)
    snowh = sel(collapse & (sneqv <= 0.0), 0.0, snowh)

    # --- pass 2: enforce minimum thicknesses (:7187-7244) ---
    isnow_entry = isnow
    mssi = jnp.ones((), jnp.int32)
    exited = isnow >= -1
    dzmin = jnp.asarray(DZMIN_GLACIER if glacier else DZMIN,
                        dz_sn.dtype)
    for j in range(nsnow):
        top = isnow + nsnow
        examine = (~exited) & (j >= isnow_entry + nsnow)
        dzmin_j = take1(dzmin, mssi - 1)
        small = examine & (dz_sn[j] < dzmin_j)
        # neighbor choice (:7203-7210); ll = jj-1 always
        if j == 0:
            neib_gt = jnp.ones((), bool)
        elif j == nsnow - 1:
            neib_gt = jnp.zeros((), bool)
        else:
            is_top = j == top
            prefer_up = (dz_sn[j - 1] + dz_sn[j]) < (dz_sn[j + 1] + dz_sn[j])
            neib_gt = sel(is_top, True, ~prefer_up)
        jj = sel(neib_gt, j + 1, j)
        jj = jnp.minimum(jj, nsnow - 1)
        g = take1
        dzc, wliqc, wicec, tc = _combo(
            g(dz_sn, jj), g(snliq, jj), g(snice, jj), g(stc_sn, jj),
            g(dz_sn, jj - 1), g(snliq, jj - 1), g(snice, jj - 1),
            g(stc_sn, jj - 1))
        dz_sn = sel(small, put1(dz_sn, jj, dzc), dz_sn)
        snliq = sel(small, put1(snliq, jj, wliqc), snliq)
        snice = sel(small, put1(snice, jj, wicec), snice)
        stc_sn = sel(small, put1(stc_sn, jj, tc), stc_sn)
        # shift above jj-1 down one (:7225-7232); hi bound jj-1 is traced
        sh = small & ((jj - 1) > top)
        idx = jnp.arange(nsnow)

        def shift_tr(x):
            shifted = jnp.concatenate([x[:1], x[:-1]])
            return sel(band(sh, idx >= top + 1, idx <= jj - 1),
                       shifted, x)

        stc_sn = shift_tr(stc_sn)
        snice = shift_tr(snice)
        snliq = shift_tr(snliq)
        dz_sn = shift_tr(dz_sn)
        isnow = isnow + small.astype(jnp.int32)
        exited = exited | (isnow >= -1)
        mssi = sel(examine & ~small, mssi + 1, mssi)

    return SnowPack(isnow, snice, snliq, stc_sn, dz_sn, sneqv, snowh,
                    sice, sh2o, ponding1, ponding2)


def divide(cfg, pk: SnowPack, glacier=False) -> SnowPack:
    """Split over-thick layers (DIVIDE :7248-7371; DIVIDE_GLACIER
    :2522-2640 splits the second layer at 0.10 m, not 0.20)."""
    nsnow = cfg.nsnow
    isnow = pk.isnow
    top = isnow + nsnow
    multi = isnow < 0

    # local top-aligned views: local[k] = arr[top+k]
    def to_local(x):
        return roll_to_front(x, top)

    dz = to_local(pk.dz_sn)
    swice = to_local(pk.snice)
    swliq = to_local(pk.snliq)
    tsno = to_local(pk.stc_sn)
    msno = -isnow

    # MSNO==1 split (:7300-7311)
    a = multi & (msno == 1) & (dz[0] > 0.05)
    dz = sel(a, put1(put1(dz, 0, dz[0] / 2), 1, dz[0] / 2), dz)
    swice = sel(a, put1(put1(swice, 0, swice[0] / 2), 1, swice[0] / 2), swice)
    swliq = sel(a, put1(put1(swliq, 0, swliq[0] / 2), 1, swliq[0] / 2), swliq)
    tsno = sel(a, put1(tsno, 1, tsno[0]), tsno)
    msno = sel(a, 2, msno)

    # MSNO>1, top layer capped at 0.05 (:7313-7343)
    b = multi & (msno > 1) & (dz[0] > 0.05)
    drr = dz[0] - 0.05
    prop = drr / sanitize(dz[0], dz[0] > 0, 1.0)
    zwice = prop * swice[0]
    zwliq = prop * swliq[0]
    prop2 = 0.05 / sanitize(dz[0], dz[0] > 0, 1.0)
    dzc, wliqc, wicec, tc = _combo(dz[1], swliq[1], swice[1], tsno[1],
                                   drr, zwliq, zwice, tsno[0])
    dz = sel(b, put1(put1(dz, 0, 0.05), 1, dzc), dz)
    swice = sel(b, put1(put1(swice, 0, prop2 * swice[0]), 1, wicec), swice)
    swliq = sel(b, put1(put1(swliq, 0, prop2 * swliq[0]), 1, wliqc), swliq)
    tsno = sel(b, put1(tsno, 1, tc), tsno)

    # subdivide second layer (:7329-7342; glacier keeps the 0.10 limit)
    c = b & (msno <= 2) & (dz[1] > (0.10 if glacier else 0.20))
    dtdz = (tsno[0] - tsno[1]) / ((dz[0] + dz[1]) / 2.0)
    dz2h = dz[1] / 2.0
    t3 = tsno[1] - dtdz * dz2h / 2.0
    t3_ge = t3 >= C.TFRZ
    new_t2 = sel(t3_ge, tsno[1], tsno[1] + dtdz * dz2h / 2.0)
    new_t3 = sel(t3_ge, tsno[1], t3)
    dz = sel(c, put1(put1(dz, 1, dz2h), 2, dz2h), dz)
    swice = sel(c, put1(put1(swice, 1, swice[1] / 2), 2, swice[1] / 2), swice)
    swliq = sel(c, put1(put1(swliq, 1, swliq[1] / 2), 2, swliq[1] / 2), swliq)
    tsno = sel(c, put1(put1(tsno, 1, new_t2), 2, new_t3), tsno)
    msno = sel(c, 3, msno)

    # MSNO>2, second layer capped at 0.2 (:7345-7358)
    d = multi & (msno > 2) & (dz[1] > 0.2)
    drr2 = dz[1] - 0.2
    propd = drr2 / sanitize(dz[1], dz[1] > 0, 1.0)
    zwice2 = propd * swice[1]
    zwliq2 = propd * swliq[1]
    propd2 = 0.2 / sanitize(dz[1], dz[1] > 0, 1.0)
    dzc3, wliqc3, wicec3, tc3 = _combo(dz[2], swliq[2], swice[2], tsno[2],
                                       drr2, zwliq2, zwice2, tsno[1])
    dz = sel(d, put1(put1(dz, 1, 0.2), 2, dzc3), dz)
    swice = sel(d, put1(put1(swice, 1, propd2 * swice[1]), 2, wicec3), swice)
    swliq = sel(d, put1(put1(swliq, 1, propd2 * swliq[1]), 2, wliqc3), swliq)
    tsno = sel(d, put1(tsno, 2, tc3), tsno)

    isnow_new = sel(multi, -msno, isnow)
    top_new = isnow_new + nsnow
    k = jnp.arange(nsnow)
    live = k < msno

    def back(xl, old):
        xl = sel(live, xl, 0.0)
        return sel(multi, roll_to_front(xl, -top_new), old)

    return SnowPack(isnow_new, back(swice, pk.snice), back(swliq, pk.snliq),
                    back(tsno, pk.stc_sn), back(dz, pk.dz_sn), pk.sneqv,
                    pk.snowh, pk.sice, pk.sh2o, pk.ponding1, pk.ponding2)


def compact(cfg, pk: SnowPack, imelt_sn, ficeold, stc_sn_in=None) -> SnowPack:
    """Snow compaction (COMPACT :7427-7528)."""
    nsnow = cfg.nsnow
    dt = cfg.dt
    c2, c3, c4, c5 = 21.0e-3, 2.5e-6, 0.04, 2.0
    dm, eta0 = 100.0, 0.8e6

    isnow = pk.isnow
    act = jnp.arange(nsnow) >= (isnow + nsnow)
    snice, snliq, dz = pk.snice, pk.snliq, pk.dz_sn
    stc_sn = pk.stc_sn if stc_sn_in is None else stc_sn_in

    wx = snice + snliq
    fice = snice / sanitize(wx, wx > 0, 1.0)
    dzs = sanitize(dz, act & (dz > 0), 1.0)
    void = 1.0 - (snice / C.DENICE + snliq / C.DENH2O) / dzs
    eligible = act & (void > 0.001) & (snice > 0.1)

    bi = snice / dzs
    td = jnp.maximum(0.0, C.TFRZ - stc_sn)
    dexpf = jnp.exp(-c4 * td)
    ddz1 = -c3 * dexpf
    ddz1 = sel(bi > dm, ddz1 * jnp.exp(-46.0e-3 * (bi - dm)), ddz1)
    ddz1 = sel(snliq > 0.01 * dzs, ddz1 * c5, ddz1)

    # burden: overlying snow mass (exclusive cumsum over active layers)
    wx_act = sel(act, wx, 0.0)
    burden = cumsum_small(wx_act) - wx_act
    ddz2 = -(burden + 0.5 * wx) * jnp.exp(-0.08 * td - c2 * bi) / eta0

    ddz3 = sel(imelt_sn == 1,
                     -jnp.maximum(0.0, (ficeold - fice) / jnp.maximum(1.0e-6, ficeold)) / dt,
                     0.0)

    pdzdtc = jnp.maximum(-0.5, (ddz1 + ddz2 + ddz3) * dt)
    dz_new = sel(eligible, dz * (1.0 + pdzdtc), dz)
    return pk._replace(dz_sn=dz_new)


def snowfall(cfg, pk: SnowPack, qsnow, snowhin, sfctmp,
             glacier=False) -> SnowPack:
    """Accumulate new snowfall; create the first layer at 0.025 m —
    0.05 m on glacier ice (SNOWFALL :6998-7063;
    SNOWFALL_GLACIER :2283)."""
    dt = cfg.dt
    nsnow = cfg.nsnow
    isnow, snowh, sneqv = pk.isnow, pk.snowh, pk.sneqv
    snice, snliq, stc_sn, dz_sn = pk.snice, pk.snliq, pk.stc_sn, pk.dz_sn

    shallow = (isnow == 0) & (qsnow > 0.0)
    snowh = sel(shallow, snowh + snowhin * dt, snowh)
    sneqv = sel(shallow, sneqv + qsnow * dt, sneqv)

    newnode = shallow & (snowh >= (0.05 if glacier else 0.025))
    bot = nsnow - 1
    isnow = sel(newnode, -1, isnow)
    dz_sn = put1(dz_sn, bot, sel(newnode, snowh, dz_sn[bot]))
    stc_sn = put1(stc_sn, bot, sel(newnode,
                                          jnp.minimum(273.16, sfctmp),
                                          stc_sn[bot]))
    snice = put1(snice, bot, sel(newnode, sneqv, snice[bot]))
    snliq = put1(snliq, bot, sel(newnode, 0.0, snliq[bot]))
    snowh = sel(newnode, 0.0, snowh)

    # snow falling on existing layered pack (:7057-7060)
    layered = (isnow < 0) & ~newnode & (qsnow > 0.0)
    top = isnow + nsnow
    snice = sel(layered, add1(snice, top, qsnow * dt), snice)
    dz_sn = sel(layered, add1(dz_sn, top, snowhin * dt), dz_sn)

    return pk._replace(isnow=isnow, snowh=snowh, sneqv=sneqv,
                       snice=snice, snliq=snliq, stc_sn=stc_sn,
                       dz_sn=dz_sn)


def snowh2o(cfg, pk: SnowPack, qsnfro, qsnsub, qrain):
    """Liquid percolation through the snowpack (SNOWH2O :7530-7678).
    Returns (pack, qsnbot)."""
    nsnow = cfg.nsnow
    dt = cfg.dt
    dz_soil1 = cfg.dzs[0]
    isnow = pk.isnow
    snice, snliq, dz_sn = pk.snice, pk.snliq, pk.dz_sn
    sneqv, snowh, sice, sh2o = pk.sneqv, pk.snowh, pk.sice, pk.sh2o

    # no snow at all: frost/sublimation exchanges with soil (:7593-7599)
    none = sneqv == 0.0
    sice = add1(sice, 0, sel(none, (qsnfro - qsnsub) * dt / (dz_soil1 * 1000.0), 0.0))
    sh2o = add1(sh2o, 0, jnp.minimum(sice[0], 0.0))
    sice = put1(sice, 0, jnp.maximum(sice[0], 0.0))

    # shallow layerless snow (:7606-7620)
    shallow = (isnow == 0) & (sneqv > 0.0)
    temp = sanitize(sneqv, shallow, 1.0)
    sneqv_s = sneqv - qsnsub * dt + qsnfro * dt
    propor = sneqv_s / temp
    snowh = sel(shallow, jnp.maximum(0.0, propor * snowh), snowh)
    sneqv = sel(shallow, sneqv_s, sneqv)
    negv = shallow & (sneqv < 0.0)
    sice = add1(sice, 0, sel(negv, sneqv / (dz_soil1 * 1000.0), 0.0))
    sneqv = sel(negv, 0.0, sneqv)
    snowh = sel(negv, 0.0, snowh)
    sh2o = add1(sh2o, 0, jnp.minimum(sice[0], 0.0))
    sice = put1(sice, 0, jnp.maximum(sice[0], 0.0))

    tiny = (snowh <= 1.0e-8) | (sneqv <= 1.0e-6)
    snowh = sel(tiny, 0.0, snowh)
    sneqv = sel(tiny, 0.0, sneqv)

    # deep snow: top-layer sublimation (:7626-7643)
    deep = isnow < 0
    top = isnow + nsnow
    wgdif = take1(snice, top) - qsnsub * dt + qsnfro * dt
    snice = sel(deep, put1(snice, top, wgdif), snice)

    pk2 = SnowPack(isnow, snice, snliq, pk.stc_sn, dz_sn, sneqv, snowh,
                   sice, sh2o, pk.ponding1, pk.ponding2)
    need_combine = deep & (wgdif < 1.0e-6)
    ck = combine(cfg, pk2)
    pk2 = SnowPack(*[sel(need_combine, a, b_)
                     for a, b_ in zip(ck, pk2)])
    isnow, snice, snliq = pk2.isnow, pk2.snice, pk2.snliq
    dz_sn, sneqv, snowh = pk2.dz_sn, pk2.sneqv, pk2.snowh
    sice, sh2o = pk2.sice, pk2.sh2o
    deep = isnow < 0
    top = isnow + nsnow
    snliq = sel(deep,
                      put1(snliq, top, jnp.maximum(
                          0.0, take1(snliq, top) + qrain * dt)),
                      snliq)

    # percolation (:7650-7675)
    act = jnp.arange(nsnow) >= top
    dzs = sanitize(dz_sn, act & (dz_sn > 0), 1.0)
    vol_ice = jnp.minimum(1.0, snice / (dzs * C.DENICE))
    epore = 1.0 - vol_ice
    vol_liq = jnp.minimum(epore, snliq / (dzs * C.DENH2O))

    qin = jnp.zeros((), snliq.dtype)
    qout = jnp.zeros((), snliq.dtype)
    for j in range(nsnow):
        on = act[j] & deep
        snliq = add1(snliq, j, sel(on, qin, 0.0))
        # reference uses VOL_LIQ computed before the loop (:7650-7657)
        if j < nsnow - 1:
            blocked = (epore[j] < 0.05) | (epore[j + 1] < 0.05)
            qo = jnp.maximum(0.0, (vol_liq[j] - C.SSI * epore[j]) * dz_sn[j])
            qo = jnp.minimum(qo, (1.0 - vol_ice[j + 1] - vol_liq[j + 1]) * dz_sn[j + 1])
            qo = sel(blocked, 0.0, qo)
        else:
            qo = jnp.maximum(0.0, (vol_liq[j] - C.SSI * epore[j]) * dz_sn[j])
        qo = qo * 1000.0
        snliq = add1(snliq, j, sel(on, -qo, 0.0))
        qin = sel(on, qo, qin)
        qout = sel(on, qo, qout)

    qsnbot = sel(deep, qout / dt, 0.0)
    pk3 = SnowPack(isnow, snice, snliq, pk2.stc_sn, dz_sn, sneqv, snowh,
                   sice, sh2o, pk2.ponding1, pk2.ponding2)
    return pk3, qsnbot


class SnowWaterOut(NamedTuple):
    isnow: jnp.ndarray
    snice: jnp.ndarray
    snliq: jnp.ndarray
    stc: jnp.ndarray       # full (nsnow+nsoil,) with snow part updated
    zsnso: jnp.ndarray     # rebuilt (nsnow+nsoil,)
    dzsnso: jnp.ndarray
    sneqv: jnp.ndarray
    snowh: jnp.ndarray
    sice: jnp.ndarray
    sh2o: jnp.ndarray
    qsnbot: jnp.ndarray
    snoflow: jnp.ndarray
    ponding1: jnp.ndarray
    ponding2: jnp.ndarray


def snowwater(cfg, isnow, snice, snliq, stc, zsnso, dzsnso, sneqv,
              snowh, sice, sh2o, imelt, ficeold, qsnow, qsnfro, qsnsub,
              qrain, snowhin, sfctmp, glacier=False) -> SnowWaterOut:
    """Snowpack driver (SNOWWATER :6868-6996; glacier=True selects the
    SNOWWATER_GLACIER layer thresholds, :2180-2265)."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    dt = cfg.dt
    zero = jnp.zeros((), stc.dtype)
    pk = SnowPack(isnow, snice, snliq, stc[:nsnow], dzsnso[:nsnow],
                  sneqv, snowh, sice, sh2o, zero, zero)

    pk = snowfall(cfg, pk, qsnow, snowhin, sfctmp, glacier=glacier)

    multi = pk.isnow < 0
    pc = compact(cfg, pk, imelt[:nsnow], ficeold)
    pk = SnowPack(*[sel(multi, a, b_) for a, b_ in zip(pc, pk)])
    cb = combine(cfg, pk, glacier=glacier)
    pk = SnowPack(*[sel(multi, a, b_) for a, b_ in zip(cb, pk)])
    multi = pk.isnow < 0
    dv = divide(cfg, pk, glacier=glacier)
    pk = SnowPack(*[sel(multi, a, b_) for a, b_ in zip(dv, pk)])

    pk, qsnbot = snowh2o(cfg, pk, qsnfro, qsnsub, qrain)

    # zero empty layers (:6949-6955)
    isnow = pk.isnow
    act = jnp.arange(nsnow) >= (isnow + nsnow)
    snice = sel(act, pk.snice, 0.0)
    snliq = sel(act, pk.snliq, 0.0)
    stc_sn = sel(act, pk.stc_sn, 0.0)
    dz_sn = sel(act, pk.dz_sn, 0.0)
    sneqv, snowh = pk.sneqv, pk.snowh

    # glacier equilibrium: shave SWE > 2000 mm (:6959-6965)
    bot = nsnow - 1
    over = sneqv > 2000.0
    bdsnow = snice[bot] / sanitize(dz_sn[bot], dz_sn[bot] > 0, 1.0)
    snoflow_amt = sel(over, sneqv - 2000.0, 0.0)
    snice = add1(snice, bot, -snoflow_amt)
    dz_sn = add1(dz_sn, bot, -snoflow_amt / sanitize(bdsnow, over, 1.0)
                              * over.astype(dz_sn.dtype))
    snoflow = snoflow_amt / dt

    # total SWE for layered snow (:6969-6974)
    multi = isnow < 0
    sneqv = sel(multi, jnp.sum(sel(act, snice + snliq, 0.0)),
                      sneqv)

    # rebuild zsnso / dzsnso (:6976-6994)
    zsoil = jnp.asarray(cfg.zsoil, stc.dtype)
    dzs_soil = jnp.asarray(cfg.dzs, stc.dtype)
    cum = cumsum_small(sel(act, dz_sn, 0.0))
    z_sn = sel(act, -(cum), 0.0)
    snowdepth = take1(cum, nsnow - 1)
    z_soil_off = zsoil - snowdepth
    zsnso_new = jnp.concatenate([z_sn, z_soil_off])
    dzsnso_new = jnp.concatenate([sel(act, dz_sn, 0.0), dzs_soil])

    stc_new = jnp.concatenate([stc_sn, stc[nsnow:]])

    return SnowWaterOut(isnow, snice, snliq, stc_new, zsnso_new,
                        dzsnso_new, sneqv, snowh, pk.sice, pk.sh2o,
                        qsnbot, snoflow, pk.ponding1, pk.ponding2)
