"""Cold-start initialization.

Reference: NOAHMP_INIT (module_sf_noahmpdrv.F90:847-1177) and SNOW_INIT
(:1182-1283): derive snow layer structure from depth, supercooled soil
liquid from the frozen-soil explicit relation, and state defaults.

Vectorized numpy over a flat column axis; returns a batched ColumnState.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as C
from ..state.state import ColumnState
from ..params.tables import NoahMPTables


def snow_init(cfg, swe, snodep, tg):
    """Snow depth -> layer structure (SNOW_INIT :1182-1283).

    Args are (n,) numpy arrays.  Returns dict of batched snow arrays
    using the framework layout (bottom layer at index nsnow-1).
    """
    n = swe.shape[0]
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    dzsno = np.zeros((n, nsnow), np.float32)   # [0]=top .. [2]=bottom
    isnow = np.zeros(n, np.int32)

    d = snodep
    c1 = d < 0.025
    c2 = (d >= 0.025) & (d <= 0.05)
    c3 = (d > 0.05) & (d <= 0.10)
    c4 = (d > 0.10) & (d <= 0.25)
    c5 = (d > 0.25) & (d <= 0.45)
    c6 = d > 0.45

    isnow[c2] = -1
    dzsno[c2, 2] = d[c2]
    isnow[c3] = -2
    dzsno[c3, 1] = d[c3] / 2.0
    dzsno[c3, 2] = d[c3] / 2.0
    isnow[c4] = -2
    dzsno[c4, 1] = 0.05
    dzsno[c4, 2] = d[c4] - 0.05
    isnow[c5] = -3
    dzsno[c5, 0] = 0.05
    dzsno[c5, 1] = 0.5 * (d[c5] - 0.05)
    dzsno[c5, 2] = 0.5 * (d[c5] - 0.05)
    isnow[c6] = -3
    dzsno[c6, 0] = 0.05
    dzsno[c6, 1] = 0.20
    dzsno[c6, 2] = d[c6] - 0.25

    act = np.arange(nsnow)[None, :] >= (isnow[:, None] + nsnow)
    ratio = np.where(d > 0, swe / np.maximum(d, 1e-12), 0.0)
    snice = np.where(act, dzsno * ratio[:, None], 0.0).astype(np.float32)
    snliq = np.zeros_like(snice)
    tsno = np.where(act, tg[:, None], 0.0).astype(np.float32)

    # zsnso: snow part cumulative, soil part offset by snow depth
    zsoil = np.asarray(cfg.zsoil, np.float32)
    cum = np.cumsum(np.where(act, dzsno, 0.0), axis=1)
    z_sn = np.where(act, -cum, 0.0)
    sdep = cum[:, -1:]
    zsnso = np.concatenate([z_sn, zsoil[None, :] - sdep], axis=1)
    return dict(isnow=isnow, dzsno=dzsno, snice=snice, snliq=snliq,
                tsno=tsno, zsnso=zsnso.astype(np.float32))


def cold_start(cfg, tables: NoahMPTables, vegtyp, soiltyp, tsk, smois,
               stemp, swe=None, snodep=None, canwat=None, tmn=None,
               xice=None, dtype=jnp.float32) -> ColumnState:
    """NOAHMP_INIT equivalent (module_sf_noahmpdrv.F90:979-1177).

    Args: flat (n,) / (n, nsoil) numpy arrays from the init file.
    Returns a batched ColumnState (leading axis n).
    """
    n = np.shape(vegtyp)[0]
    nsoil, nsnow = cfg.nsoil, cfg.nsnow
    vegtyp = np.asarray(vegtyp, np.int32)
    soiltyp = np.clip(np.asarray(soiltyp, np.int32), 1,
                      tables.soil.ncat)
    tsk = np.asarray(tsk, np.float32)
    smois = np.array(smois, np.float32).reshape(n, nsoil)
    tslb = np.array(stemp, np.float32).reshape(n, nsoil)
    swe = np.zeros(n, np.float32) if swe is None else np.asarray(swe, np.float32)
    canwat = np.zeros(n, np.float32) if canwat is None else np.asarray(canwat, np.float32)
    xice = np.zeros(n, np.float32) if xice is None else np.asarray(xice, np.float32)

    if snodep is None:
        snodep = swe * 0.005  # SNOWH = SNOW*0.005 (:1001)
    snodep = np.asarray(snodep, np.float32)

    isice = tables.veg.issnow
    glacier = (vegtyp == isice) & (xice <= 0.0)

    # glacier points (:1034-1042)
    smois = np.where(glacier[:, None], 1.0, smois)
    tslb = np.where(glacier[:, None], np.minimum(tslb, 263.15), tslb)
    swe = np.where(glacier, np.maximum(swe, 10.0), swe)
    snodep = np.where(glacier, swe * 0.01, snodep)

    # supercooled initial liquid (:1051-1066)
    sv = soiltyp - 1
    bx = tables.soil.bexp[sv]
    smcmax = tables.soil.smcmax[sv]
    psisat = tables.soil.psisat[sv]
    smois = np.minimum(smois, smcmax[:, None])
    hlice = 3.335e5  # HLICE in module_sf_noahmpdrv
    frozen = tslb < 273.149
    with np.errstate(invalid="ignore", over="ignore", divide="ignore"):
        fk = ((hlice / (C.GRAV * (-psisat[:, None])))
              * ((tslb - 273.15) / tslb)) ** (-1.0 / bx[:, None]) * smcmax[:, None]
    fk = np.maximum(np.nan_to_num(fk, nan=0.02), 0.02)
    sh2o = np.where(frozen, np.minimum(fk, smois), smois)
    sh2o = np.where(glacier[:, None], 0.0, sh2o)
    ok = (bx > 0) & (smcmax > 0) & (psisat > 0)
    sh2o = np.where(ok[:, None], sh2o,
                    np.where(glacier[:, None], 0.0, smois))

    # state defaults (:1073-1119)
    snow_cap = (swe > 0.0) & (tsk > 273.15)
    tv = np.where(snow_cap, 273.15, tsk)
    tg = np.where(snow_cap, 273.15, tsk)
    tah = np.where(snow_cap, 273.15, tsk)

    sn = snow_init(cfg, swe, snodep, tg)
    # stc: snow part + soil temps
    stc = np.concatenate([sn["tsno"], tslb], axis=1)

    if cfg.opt_run != 5:
        wa = np.full(n, 4900.0, np.float32)
        wt = wa.copy()
        zwt = np.full(n, (25.0 + 2.0) - 4900.0 / 1000.0 / 0.2, np.float32)
    else:
        wa = np.zeros(n, np.float32)
        wt = np.zeros(n, np.float32)
        zwt = np.full(n, -(np.asarray(cfg.zsoil)[-1]) + 2.5, np.float32)

    f = lambda v: jnp.asarray(v, dtype=dtype)
    zeros = np.zeros(n, np.float32)
    return ColumnState(
        isnow=jnp.asarray(sn["isnow"]),
        stc=f(stc), zsnso=f(sn["zsnso"]),
        snice=f(sn["snice"]), snliq=f(sn["snliq"]),
        sneqv=f(swe), sneqvo=f(zeros), snowh=f(snodep),
        smc=f(smois), sh2o=f(sh2o),
        canliq=f(canwat), canice=f(zeros),
        tv=f(tv), eah=f(np.full(n, 2000.0)), tah=f(tah), fwet=f(zeros),
        tg=f(tg), qsfc=f(zeros), qsnow=f(zeros),
        albold=f(np.full(n, 0.65)), tauss=f(zeros),
        cm=f(zeros), ch=f(zeros),
        zwt=f(zwt), wa=f(wa), wt=f(wt), wslake=f(zeros),
        smcwtd=f(smois[:, -1]), deeprech=f(zeros), rech=f(zeros),
        lfmass=f(np.full(n, 50.0)), rtmass=f(np.full(n, 500.0)),
        stmass=f(np.full(n, 50.0)), wood=f(np.full(n, 500.0)),
        stblcp=f(np.full(n, 1000.0)), fastcp=f(np.full(n, 1000.0)),
        lai=f(np.full(n, 2.0)), sai=f(np.full(n, 0.1)),
    )
