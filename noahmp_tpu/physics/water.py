"""Water budget orchestrator.

Reference: WATER (module_sf_noahmplsm.F90:6382-6613): canopy hydrology,
snowpack, soil moisture, groundwater / water-table schemes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from .common import put1, add1, sel
from .snow import canwater, snowwater
from .soil_water import soilwater, groundwater, shallowwatertable

WSLMAX = 5000.0  # maximum lake storage (mm) (:6497)


class WaterOut(NamedTuple):
    # updated prognostics
    isnow: jnp.ndarray
    canliq: jnp.ndarray
    canice: jnp.ndarray
    tv: jnp.ndarray
    snowh: jnp.ndarray
    sneqv: jnp.ndarray
    snice: jnp.ndarray
    snliq: jnp.ndarray
    stc: jnp.ndarray
    zsnso: jnp.ndarray
    dzsnso: jnp.ndarray
    sh2o: jnp.ndarray
    sice: jnp.ndarray
    smc: jnp.ndarray
    zwt: jnp.ndarray
    wa: jnp.ndarray
    wt: jnp.ndarray
    wslake: jnp.ndarray
    smcwtd: jnp.ndarray
    deeprech: jnp.ndarray
    rech: jnp.ndarray
    # diagnostics
    cmc: jnp.ndarray
    ecan: jnp.ndarray
    etran: jnp.ndarray
    fwet: jnp.ndarray
    runsrf: jnp.ndarray
    runsub: jnp.ndarray
    qin: jnp.ndarray
    qdis: jnp.ndarray
    qsnow: jnp.ndarray
    qsnbot: jnp.ndarray
    ponding1: jnp.ndarray
    ponding2: jnp.ndarray
    fpice: jnp.ndarray


def water(cfg, p, isnow, imelt, uu, vv, fcev, fctr, qprecc, qprecl,
          elai, esai, sfctmp, qvap, qdew, btrani, ficeold, ponding, tg,
          fveg, smceq, frozen_canopy, frozen_ground, canliq, canice, tv,
          snowh, sneqv, snice, snliq, stc, zsnso, dzsnso, sh2o, sice,
          smc, zwt, wa, wt, wslake, smcwtd, deeprech, rech,
          ist=1) -> WaterOut:
    """WATER (:6382-6613)."""
    dt = cfg.dt
    nsnow, nsoil = cfg.nsnow, cfg.nsoil

    cw = canwater(cfg, p, sfctmp, uu, vv, fcev, fctr, qprecc, qprecl,
                  elai, esai, tg, fveg, frozen_canopy, canliq, canice,
                  tv, ist=ist)

    # sublimation/frost vs evap/dew partition (:6519-6529)
    has_snow = sneqv > 0.0
    qsnsub = sel(has_snow, jnp.minimum(qvap, sneqv / dt), 0.0)
    qseva = qvap - qsnsub
    qsnfro = sel(has_snow, qdew, 0.0)
    qsdew = qdew - qsnfro

    sw = snowwater(cfg, isnow, snice, snliq, stc, zsnso, dzsnso, sneqv,
                   snowh, sice, sh2o, imelt, ficeold, cw.qsnow, qsnfro,
                   qsnsub, cw.qrain, cw.snowhin, sfctmp)
    isnow, snice, snliq = sw.isnow, sw.snice, sw.snliq
    stc, zsnso, dzsnso = sw.stc, sw.zsnso, sw.dzsnso
    sneqv, snowh, sice, sh2o = sw.sneqv, sw.snowh, sw.sice, sw.sh2o

    # frozen-ground dew/evap into surface ice (:6538-6546)
    dz1 = cfg.dzs[0]
    sice0 = sice[0] + sel(frozen_ground,
                                (qsdew - qseva) * dt / (dz1 * 1000.0), 0.0)
    qsdew = sel(frozen_ground, 0.0, qsdew)
    qseva_m = sel(frozen_ground, 0.0, qseva)
    sh2o = add1(sh2o, 0, jnp.minimum(sice0, 0.0) *
                          sel(frozen_ground, 1.0, 0.0))
    sice = put1(sice, 0, sel(frozen_ground,
                                    jnp.maximum(sice0, 0.0), sice[0]))
    qseva = qseva_m

    # total infiltration input (:6551-6558), m/s
    qinsur = (ponding + sw.ponding1 + sw.ponding2) / dt * 0.001
    qinsur = qinsur + sel(isnow == 0,
                                (sw.qsnbot + qsdew + cw.qrain) * 0.001,
                                (sw.qsnbot + qsdew) * 0.001)
    qseva = qseva * 0.001

    etrani = cw.etran * btrani * 0.001  # (nsoil,), btrani zero below roots

    zero = jnp.zeros((), tv.dtype)
    qin, qdis, runsrf, runsub, qdrain = zero, zero, zero, zero, zero

    if ist == 2:
        # lake water balance (:6571-6575)
        runsrf = sel(wslake >= WSLMAX, qinsur * 1000.0, 0.0)
        wslake = wslake + (qinsur - qseva) * 1000.0 * dt - runsrf * dt
    else:
        so = soilwater(cfg, p, qinsur, qseva, etrani, sice, sh2o, smc,
                       zwt, smcwtd, deeprech)
        sh2o, smc, zwt = so.sh2o, so.smc, so.zwt
        smcwtd, deeprech = so.smcwtd, so.deeprech
        runsrf, qdrain, runsub = so.runsrf, so.qdrain, so.runsub

        if cfg.opt_run == 1:
            gw = groundwater(cfg, p, sice, stc, so.wcnd, so.fcrmax,
                             sh2o, zwt, wa, wt)
            sh2o, zwt, wa, wt = gw.sh2o, gw.zwt, gw.wa, gw.wt
            qin, qdis = gw.qin, gw.qdis
            runsub = qdis
        if cfg.opt_run in (3, 4):
            runsub = runsub + qdrain
        smc = sh2o + sice
        if cfg.opt_run == 5:
            swt = shallowwatertable(cfg, p, smceq, smc, zwt, smcwtd,
                                    qdrain)
            smc, zwt, smcwtd = swt.smc, swt.wtd, swt.smcwtd
            rech = swt.rech
            sh2o = put1(sh2o, -1, smc[-1] - sice[-1])
            runsub = runsub + swt.qdrain
            wa = jnp.zeros_like(wa)

    runsub = runsub + sw.snoflow

    return WaterOut(isnow, cw.canliq, cw.canice, cw.tv, snowh, sneqv,
                    snice, snliq, stc, zsnso, dzsnso, sh2o, sice, smc,
                    zwt, wa, wt, wslake, smcwtd, deeprech, rech, cw.cmc,
                    cw.ecan, cw.etran, cw.fwet, runsrf, runsub, qin,
                    qdis, cw.qsnow, sw.qsnbot, sw.ponding1, sw.ponding2,
                    cw.fpice)
