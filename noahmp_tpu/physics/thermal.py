"""Thermal properties of the snow/soil column.

Reference: THERMOPROP (module_sf_noahmplsm.F90:1845-1955), CSNOW
(:1957-2012), TDFCND (:2014-2118).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from .common import snow_layer_mask, snso_layer_mask, sanitize, put1, sel


class SnowThermal(NamedTuple):
    tksno: jnp.ndarray    # (nsnow,) conductivity (W/m/K)
    cvsno: jnp.ndarray    # (nsnow,) volumetric heat capacity (J/m3/K)
    snicev: jnp.ndarray   # (nsnow,) partial volume ice
    snliqv: jnp.ndarray   # (nsnow,) partial volume liquid
    epore: jnp.ndarray    # (nsnow,) effective porosity


def csnow(isnow, snice, snliq, dzsnso_snow, nsnow: int) -> SnowThermal:
    """Snow volumetric heat capacity and conductivity (CSNOW :1957-2012).

    ``dzsnso_snow`` is the snow part (nsnow,) of the thickness vector.
    Inactive layers produce zeros.
    """
    act = snow_layer_mask(isnow, nsnow)
    dz = sanitize(dzsnso_snow, act, 1.0)
    snicev = jnp.minimum(1.0, snice / (dz * C.DENICE))
    epore = 1.0 - snicev
    snliqv = jnp.minimum(epore, snliq / (dz * C.DENH2O))
    bdsnoi = (snice + snliq) / dz
    cvsno = C.CICE * snicev + C.CWAT * snliqv
    tksno = 3.2217e-6 * bdsnoi ** 2  # Stieglitz (Yen, 1965)
    z = jnp.zeros_like(snice)
    return SnowThermal(sel(act, tksno, z), sel(act, cvsno, z),
                       sel(act, snicev, z), sel(act, snliqv, z),
                       sel(act, epore, z))


def tdfcnd(p, smc, sh2o):
    """Soil thermal conductivity, Johansen/Peters-Lidard (TDFCND :2014-2118).

    Vectorized over the (nsoil,) layer axis.
    """
    smcmax, quartz = p.smcmax, p.quartz
    satratio = smc / smcmax
    thkw = 0.57
    thko = 2.0
    thkqtz = 7.7
    thks = (thkqtz ** quartz) * (thko ** (1.0 - quartz))
    xunfroz = sh2o / jnp.maximum(smc, 1.0e-10)
    xu = xunfroz * smcmax
    thksat = (thks ** (1.0 - smcmax)) * (C.TKICE ** (smcmax - xu)) * (thkw ** xu)
    gammd = (1.0 - smcmax) * 2700.0
    thkdry = (0.135 * gammd + 64.7) / (2700.0 - 0.947 * gammd)
    frozen = (sh2o + 0.0005) < smc
    ake_unfrozen = sel(satratio > 0.1,
                             jnp.log10(jnp.maximum(satratio, 0.1)) + 1.0,
                             0.0)
    ake = sel(frozen, satratio, ake_unfrozen)
    return ake * (thksat - thkdry) + thkdry


class ThermoProp(NamedTuple):
    df: jnp.ndarray       # (nsnow+nsoil,) thermal conductivity
    hcpct: jnp.ndarray    # (nsnow+nsoil,) heat capacity
    snicev: jnp.ndarray   # (nsnow,)
    snliqv: jnp.ndarray   # (nsnow,)
    epore: jnp.ndarray    # (nsnow,)
    fact: jnp.ndarray     # (nsnow+nsoil,) dt/(hcpct*dz), phase-change factor


def thermoprop(cfg, p, isnow, dzsnso, snowh, snice, snliq, smc, sh2o,
               stc, ist=1) -> ThermoProp:
    """Layer conductivity/heat capacity (THERMOPROP :1845-1955).

    ``ist``: 1 soil, 2 lake (static int for now — the grid driver calls
    the lake branch separately if needed).
    """
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    sn = csnow(isnow, snice, snliq, dzsnso[:nsnow], nsnow)

    sice = smc - sh2o
    hcpct_soil = (sh2o * C.CWAT + (1.0 - p.smcmax) * p.csoil
                  + (p.smcmax - smc) * C.CPAIR + sice * C.CICE)
    df_soil = tdfcnd(p, smc, sh2o)
    # urban override (:1913-1917)
    df_soil = sel(p.is_urban, 3.24, df_soil)

    if ist == 2:  # lake (:1926-1936)
        unfrozen = stc[nsnow:] > C.TFRZ
        hcpct_soil = sel(unfrozen, C.CWAT, C.CICE)
        df_soil = sel(unfrozen, C.TKWAT, C.TKICE)

    df = jnp.concatenate([sn.tksno, df_soil])
    hcpct = jnp.concatenate([sn.cvsno, hcpct_soil])

    act = snso_layer_mask(isnow, nsnow, nsoil)
    dz_safe = sanitize(dzsnso, act, 1.0)
    fact = sel(act, cfg.dt / (hcpct * dz_safe), 0.0)

    # snow/soil interface blending of first soil layer (:1948-1953)
    dz1 = dzsnso[nsnow]
    df1_nosnow = (df[nsnow] * dz1 + 0.35 * snowh) / (snowh + dz1)
    dz0 = dzsnso[nsnow - 1]
    df0 = df[nsnow - 1]
    df1_snow = (df[nsnow] * dz1 + df0 * dz0) / jnp.maximum(dz0 + dz1, 1e-12)
    df1 = sel(isnow == 0, df1_nosnow, df1_snow)
    df = put1(df, nsnow, df1)

    return ThermoProp(df, hcpct, sn.snicev, sn.snliqv, sn.epore, fact)
