"""Melting/freezing of snow and soil water.

Reference: PHASECHANGE (module_sf_noahmplsm.F90:6039-6245), FRH2O
Koren99 supercooled-water iteration (:6247-6380).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from .common import sanitize, snso_layer_mask, sel, band


def frh2o(p, tkelv, smc, sh2o):
    """Supercooled liquid water (FRH2O :6247-6380).

    Newton iteration on the log form of Koren99 eq 17 (CK=8), fixed 10
    iterations with convergence latch; Flerchinger explicit fallback
    when unconverged.  Vectorized over the layer axis.
    """
    ck, blim, err = 8.0, 5.5, 0.005
    bx = jnp.minimum(p.bexp, blim)
    warm = tkelv > (C.TFRZ - 1.0e-3)
    tk = sel(warm, C.TFRZ - 1.0, tkelv)  # sanitize for log()

    swl0 = jnp.clip(smc - sh2o, 0.0, smc - 0.02)

    def body(i, carry):
        swl, kcount = carry
        df = (jnp.log((p.psisat * C.GRAV / C.HFUS)
                      * ((1.0 + ck * swl) ** 2)
                      * (p.smcmax / (smc - swl)) ** bx)
              - jnp.log(-(tk - C.TFRZ) / tk))
        denom = 2.0 * ck / (1.0 + ck * swl) + bx / (smc - swl)
        swlk = jnp.clip(swl - df / denom, 0.0, smc - 0.02)
        dswl = jnp.abs(swlk - swl)
        active = kcount == 0
        # add, don't select: int selects on splat loop carries trip a
        # Mosaic replicated-layout inference bug
        kcount = kcount + (active & (dswl <= err)).astype(jnp.int32)
        swl = sel(active, swlk, swl)
        return swl, kcount

    kc0 = (swl0 * 0.0).astype(jnp.int32)  # tiled zero (see stomata.py)
    swl, kcount = jax.lax.fori_loop(0, 10, body, (swl0, kc0))
    free_iter = smc - swl

    # Flerchinger explicit fallback (:6355-6366)
    fk = ((C.HFUS / (C.GRAV * (-p.psisat))) * ((tk - C.TFRZ) / tk)) ** (-1.0 / bx) * p.smcmax
    fk = jnp.maximum(fk, 0.02)
    free_expl = jnp.minimum(fk, smc)

    free = sel(kcount == 0, free_expl, free_iter)
    return sel(warm, smc, free)


class PhaseChangeOut(NamedTuple):
    stc: jnp.ndarray
    snice: jnp.ndarray
    snliq: jnp.ndarray
    sneqv: jnp.ndarray
    snowh: jnp.ndarray
    smc: jnp.ndarray
    sh2o: jnp.ndarray
    qmelt: jnp.ndarray
    imelt: jnp.ndarray   # int32 (nsnow+nsoil,): 1 melt, 2 freeze
    ponding: jnp.ndarray


def phasechange(cfg, p, isnow, fact, dzsnso, stc, snice, snliq, sneqv,
                snowh, smc, sh2o, ist=1) -> PhaseChangeOut:
    """PHASECHANGE (:6039-6245), vectorized over the layer axis."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    n = nsnow + nsoil
    dt = cfg.dt
    act = snso_layer_mask(isnow, nsnow, nsoil)
    j = jnp.arange(n)
    is_snow_layer = j < nsnow
    is_soil = ~is_snow_layer
    dz_soil = dzsnso[nsnow:]

    # layer water masses (mm) (:6105-6112)
    mice = jnp.concatenate([snice, (smc - sh2o) * dz_soil * 1000.0])
    mliq = jnp.concatenate([snliq, sh2o * dz_soil * 1000.0])
    wice0, wliq0 = mice, mliq
    wmass0 = mice + mliq

    # supercooled water (soil only) (:6124-6137)
    stc_soil = stc[nsnow:]
    if ist == 1:
        if cfg.opt_frz == 1:
            smp = C.HFUS * (C.TFRZ - stc_soil) / (C.GRAV * stc_soil)
            sc = p.smcmax * (smp / p.psisat) ** (-1.0 / p.bexp)
            supercool_soil = sel(stc_soil < C.TFRZ, sc, 0.0)
        else:
            supercool_soil = frh2o(p, stc_soil, smc, sh2o)
        supercool_soil = supercool_soil * dz_soil * 1000.0
    else:
        supercool_soil = jnp.zeros_like(stc_soil)
    supercool = jnp.concatenate([jnp.zeros(nsnow, stc.dtype),
                                 supercool_soil])

    # melt/freeze classification (:6140-6154)
    imelt = jnp.zeros(n, jnp.int32)
    imelt = sel(band(act, mice > 0.0, stc >= C.TFRZ), 1, imelt)
    imelt = sel(band(act, mliq > supercool, stc < C.TFRZ), 2, imelt)
    # layerless snow on first soil layer (:6148-6152)
    layerless = (isnow == 0) & (sneqv > 0.0)
    imelt = sel(band(j == nsnow, layerless, stc >= C.TFRZ), 1, imelt)

    # energy surplus/deficit (:6158-6173)
    fact_s = sanitize(fact, band(act, fact != 0.0), 1.0)
    hm = sel(imelt > 0, (stc - C.TFRZ) / fact_s, 0.0)
    stc = sel(imelt > 0, C.TFRZ, stc)
    bad1 = (imelt == 1) & (hm < 0.0)
    bad2 = (imelt == 2) & (hm > 0.0)
    hm = sel(bad1 | bad2, 0.0, hm)
    imelt = sel(bad1 | bad2, 0, imelt)
    xm = hm * dt / C.HFUS

    # layer-less snowpack melting (:6177-6193)
    xm1 = xm[nsnow]
    hm1 = hm[nsnow]
    do_ll = layerless & (xm1 > 0.0)
    temp1 = sneqv
    sneqv_ll = jnp.maximum(0.0, temp1 - xm1)
    propor = sneqv_ll / sel(temp1 > 0, temp1, 1.0)
    snowh_ll = jnp.maximum(0.0, propor * snowh)
    heatr_ll = hm1 - C.HFUS * (temp1 - sneqv_ll) / dt
    xm1_new = sel(heatr_ll > 0.0, heatr_ll * dt / C.HFUS, 0.0)
    hm1_new = sel(heatr_ll > 0.0, heatr_ll, 0.0)
    qmelt_ll = jnp.maximum(0.0, temp1 - sneqv_ll) / dt
    ponding_ll = temp1 - sneqv_ll

    sneqv = sel(do_ll, sneqv_ll, sneqv)
    snowh = sel(do_ll, snowh_ll, snowh)
    xm = sel(band(do_ll, j == nsnow), xm1_new, xm)
    hm = sel(band(do_ll, j == nsnow), hm1_new, hm)
    qmelt = sel(do_ll, qmelt_ll, 0.0)
    ponding = sel(do_ll, ponding_ll, 0.0)

    # per-layer melt/freeze adjustment (:6197-6233)
    engaged = (imelt > 0) & (jnp.abs(hm) > 0.0)
    # melting: xm > 0
    mice_melt = jnp.maximum(0.0, wice0 - xm)
    # freezing: xm < 0
    mice_frz_snow = jnp.minimum(wmass0, wice0 - xm)
    mice_frz_soil = sel(
        wmass0 < supercool, 0.0,
        jnp.maximum(jnp.minimum(wmass0 - supercool, wice0 - xm), 0.0))
    mice_frz = sel(is_snow_layer, mice_frz_snow, mice_frz_soil)
    mice_new = sel(xm > 0.0, mice_melt,
                         sel(xm < 0.0, mice_frz, mice))
    mice = sel(engaged, mice_new, mice)
    heatr = sel(engaged, hm - C.HFUS * (wice0 - mice) / dt, 0.0)
    mliq = sel(engaged, jnp.maximum(0.0, wmass0 - mice), mliq)

    adj = engaged & (jnp.abs(heatr) > 0.0)
    stc = sel(adj, stc + fact_s * heatr, stc)
    stc = sel(band(adj, is_snow_layer, mliq * mice > 0.0), C.TFRZ, stc)

    qmelt = qmelt + jnp.sum(
        sel(band(engaged, is_snow_layer),
                  jnp.maximum(0.0, wice0 - mice) / dt, 0.0))

    snice_new = mice[:nsnow]
    snliq_new = mliq[:nsnow]
    dz_s = sanitize(dz_soil, dz_soil > 0, 1.0)
    sh2o_new = mliq[nsnow:] / (1000.0 * dz_s)
    smc_new = (mliq[nsnow:] + mice[nsnow:]) / (1000.0 * dz_s)

    return PhaseChangeOut(stc, snice_new, snliq_new, sneqv, snowh,
                          smc_new, sh2o_new, qmelt, imelt, ponding)
