"""Per-column parameter hydration.

The reference mutates Fortran module globals per grid cell in `REDPRM`
(module_sf_noahmplsm.F90:9202-9349), called inside the i/j grid loop
(module_sf_noahmpdrv.F90:547).  On TPU we instead gather parameter
vectors for every column once (table lookup by vegtyp/soiltyp), yielding
a struct-of-arrays `ColumnParams` pytree that vmapped column physics
reads directly.  Urban overrides (REDPRM :9294-9300, :9333-9335) become
`where` masks.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from .tables import NoahMPTables, ALBSAT, ALBDRY


@pytree_dataclass
class ColumnParams:
    """All per-column physics parameters (leading axis = columns).

    Soil fields follow REDPRM :9282-9319; veg fields REDPRM :9326-9335
    plus the NOAHMP_VEG_PARAMETERS arrays (module_sf_noahmplsm.F90:215-271)
    gathered by vegtyp.
    """
    # soil hydraulic/thermal (by soiltyp)
    bexp: jnp.ndarray
    smcdry: jnp.ndarray
    f1: jnp.ndarray
    smcmax: jnp.ndarray
    smcref: jnp.ndarray
    psisat: jnp.ndarray
    dksat: jnp.ndarray
    dwsat: jnp.ndarray
    smcwlt: jnp.ndarray
    quartz: jnp.ndarray
    csoil: jnp.ndarray
    # general / derived (REDPRM :9305-9319)
    zbot: jnp.ndarray       # depth of lower soil-temperature boundary (m)
    czil: jnp.ndarray
    kdt: jnp.ndarray        # REFKDT*DKSAT/REFDK
    frzx: jnp.ndarray       # FRZK*(SMCMAX/SMCREF)*(0.412/0.468)
    slope: jnp.ndarray      # SLOPE_DATA(slopetyp)
    # legacy veg (by vegtyp; REDPRM :9326-9335)
    topt: jnp.ndarray
    rgl: jnp.ndarray
    rsmax: jnp.ndarray
    rsmin: jnp.ndarray
    hs: jnp.ndarray
    nroot: jnp.ndarray      # int32
    # Noah-MP veg parameters (MPTABLE)
    ch2op: jnp.ndarray
    dleaf: jnp.ndarray
    z0mvt: jnp.ndarray
    hvt: jnp.ndarray
    hvb: jnp.ndarray
    den: jnp.ndarray
    rc: jnp.ndarray
    saim: jnp.ndarray       # (n, 12)
    laim: jnp.ndarray       # (n, 12)
    sla: jnp.ndarray
    dilefc: jnp.ndarray
    dilefw: jnp.ndarray
    fragr: jnp.ndarray
    ltovrc: jnp.ndarray
    c3psn: jnp.ndarray
    kc25: jnp.ndarray
    akc: jnp.ndarray
    ko25: jnp.ndarray
    ako: jnp.ndarray
    vcmx25: jnp.ndarray
    avcmx: jnp.ndarray
    bp: jnp.ndarray
    mp: jnp.ndarray
    qe25: jnp.ndarray
    aqe: jnp.ndarray
    rmf25: jnp.ndarray
    rms25: jnp.ndarray
    rmr25: jnp.ndarray
    arm: jnp.ndarray
    folnmx: jnp.ndarray
    tmin: jnp.ndarray
    xl: jnp.ndarray
    rhol: jnp.ndarray       # (n, 2)
    rhos: jnp.ndarray       # (n, 2)
    taul: jnp.ndarray       # (n, 2)
    taus: jnp.ndarray       # (n, 2)
    mrp: jnp.ndarray
    cwpvt: jnp.ndarray
    wrrat: jnp.ndarray
    wdpool: jnp.ndarray
    tdlef: jnp.ndarray
    slarea: jnp.ndarray
    eps: jnp.ndarray        # (n, 5)
    # soil-color albedo (by soil color class; fixed class 4 in ref GROUNDALB
    # uses ISC=4, module_sf_noahmplsm.F90:2733)
    albsat: jnp.ndarray     # (n, 2)
    albdry: jnp.ndarray     # (n, 2)
    # per-column type/class metadata
    vegtyp: jnp.ndarray     # int32 (1-based category)
    soiltyp: jnp.ndarray    # int32
    is_urban: jnp.ndarray   # bool


def hydrate(tables: NoahMPTables, vegtyp, soiltyp, slopetyp=None,
            soilcolor=None, dtype=jnp.float32) -> ColumnParams:
    """Gather per-column parameters from tables.

    Args:
      vegtyp, soiltyp: int arrays (1-based category indices, any shape).
      slopetyp: int array or None (defaults to 1, as the offline driver
        passes SLOPETYP=1; module_sf_noahmpdrv.F90 noahmplsm call).
      soilcolor: soil color class (1-based); defaults to 4
        (GROUNDALB uses ISC=4, module_sf_noahmplsm.F90:2733).
    """
    vegtyp = np.asarray(vegtyp, dtype=np.int32)
    soiltyp = np.asarray(soiltyp, dtype=np.int32)
    if slopetyp is None:
        slopetyp = np.ones_like(vegtyp)
    if soilcolor is None:
        soilcolor = np.full_like(vegtyp, 4)
    sv = np.clip(soiltyp - 1, 0, tables.soil.ncat - 1)
    vv = np.clip(vegtyp - 1, 0, tables.veg.nveg - 1)
    sl = np.clip(np.asarray(slopetyp) - 1, 0, len(tables.gen.slope_data) - 1)
    sc = np.clip(np.asarray(soilcolor) - 1, 0, ALBSAT.shape[0] - 1)

    soil = tables.soil
    gen = tables.gen
    leg = tables.veg_legacy
    veg = tables.veg

    urban = vegtyp == veg.isurban

    def f(x):
        return jnp.asarray(x, dtype=dtype)

    smcmax = np.where(urban, 0.45, soil.smcmax[sv])
    smcref = np.where(urban, 0.42, soil.smcref[sv])
    smcwlt = np.where(urban, 0.40, soil.smcwlt[sv])
    smcdry = np.where(urban, 0.40, soil.smcdry[sv])
    csoil = np.where(urban, 3.0e6, gen.csoil)
    dksat = soil.dksat[sv]
    kdt = gen.refkdt * dksat / gen.refdk
    # FRZX adjust skipped for soiltyp 14 = WATER (REDPRM :9314-9317)
    frzfact = (smcmax / np.maximum(smcref, 1e-6)) * (0.412 / 0.468)
    frzx = np.where(soiltyp == 14, gen.frzk, gen.frzk * frzfact)

    kw = dict(
        bexp=f(soil.bexp[sv]), smcdry=f(smcdry), f1=f(soil.f1[sv]),
        smcmax=f(smcmax), smcref=f(smcref), psisat=f(soil.psisat[sv]),
        dksat=f(dksat), dwsat=f(soil.dwsat[sv]), smcwlt=f(smcwlt),
        quartz=f(soil.quartz[sv]), csoil=f(csoil),
        zbot=f(np.full_like(smcmax, gen.zbot)),
        czil=f(np.full_like(smcmax, gen.czil)),
        kdt=f(kdt), frzx=f(frzx), slope=f(gen.slope_data[sl]),
        topt=f(np.full_like(smcmax, leg.topt)),
        rgl=f(leg.rgl[np.clip(vegtyp - 1, 0, leg.ncat - 1)]),
        rsmax=f(np.full_like(smcmax, leg.rsmax)),
        rsmin=f(np.where(urban, 400.0,
                         leg.rsmin[np.clip(vegtyp - 1, 0, leg.ncat - 1)])),
        hs=f(leg.hs[np.clip(vegtyp - 1, 0, leg.ncat - 1)]),
        nroot=jnp.asarray(leg.nroot[np.clip(vegtyp - 1, 0, leg.ncat - 1)],
                          dtype=jnp.int32),
        albsat=f(ALBSAT[sc]), albdry=f(ALBDRY[sc]),
        vegtyp=jnp.asarray(vegtyp, dtype=jnp.int32),
        soiltyp=jnp.asarray(soiltyp, dtype=jnp.int32),
        is_urban=jnp.asarray(urban),
    )
    for name in ("ch2op", "dleaf", "z0mvt", "hvt", "hvb", "den", "rc",
                 "sla", "dilefc", "dilefw", "fragr", "ltovrc", "c3psn",
                 "kc25", "akc", "ko25", "ako", "vcmx25", "avcmx", "bp",
                 "mp", "qe25", "aqe", "rmf25", "rms25", "rmr25", "arm",
                 "folnmx", "tmin", "xl", "mrp", "cwpvt", "wrrat",
                 "wdpool", "tdlef", "slarea"):
        kw[name] = f(veg.data[name][vv])
    for name in ("saim", "laim", "rhol", "rhos", "taul", "taus", "eps"):
        kw[name] = f(veg.data[name][vv])
    return ColumnParams(**kw)
