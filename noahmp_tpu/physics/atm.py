"""Atmospheric forcing preprocessing and vegetation phenology.

Reference: ATM (module_sf_noahmplsm.F90:949-1007) and PHENOLOGY
(:1010-1104).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from .common import MPE, take1, sel


class AtmOut(NamedTuple):
    thair: jnp.ndarray   # potential temperature (K)
    qair: jnp.ndarray    # specific humidity (kg/kg)
    eair: jnp.ndarray    # vapor pressure (Pa)
    rhoair: jnp.ndarray  # air density (kg/m3)
    qprecc: jnp.ndarray  # convective precip (mm/s)
    qprecl: jnp.ndarray  # large-scale precip (mm/s)
    solad: jnp.ndarray   # (2,) direct solar vis/nir (W/m2)
    solai: jnp.ndarray   # (2,) diffuse solar vis/nir (W/m2)
    swdown: jnp.ndarray  # downward solar, zeroed at night (W/m2)


def atm(sfcprs, sfctmp, q2, prcp, soldn, cosz) -> AtmOut:
    """Re-process atmospheric forcing (ATM, :949-1007).

    The driver already supplies specific humidity in ``q2``
    (module_sf_noahmpdrv.F90:458), so no mixing-ratio conversion here
    (matches the reference's WRF convention, :470-471).
    """
    pair = sfcprs
    thair = sfctmp * (sfcprs / pair) ** (C.RAIR / C.CPAIR)
    qair = q2
    eair = qair * sfcprs / (0.622 + 0.378 * qair)
    rhoair = (sfcprs - 0.378 * eair) / (C.RAIR * sfctmp)
    qprecc = 0.10 * prcp
    qprecl = 0.90 * prcp
    swdown = sel(cosz <= 0.0, 0.0, soldn)
    solad = jnp.stack([swdown * 0.7 * 0.5, swdown * 0.7 * 0.5])
    solai = jnp.stack([swdown * 0.3 * 0.5, swdown * 0.3 * 0.5])
    return AtmOut(thair, qair, eair, rhoair, qprecc, qprecl,
                  solad, solai, swdown)


class PhenologyOut(NamedTuple):
    lai: jnp.ndarray    # updated (table-interp) LAI, before burying
    sai: jnp.ndarray
    htop: jnp.ndarray   # canopy top (m)
    elai: jnp.ndarray   # LAI after snow burying
    esai: jnp.ndarray
    igs: jnp.ndarray    # growing-season index (0/1)


def phenology(cfg, p, snowh, tv, lat, yearlen, julian, lai, sai,
              veg_flags) -> PhenologyOut:
    """Vegetation phenology (PHENOLOGY, :1010-1104).

    ``p`` is the per-column ColumnParams; ``veg_flags`` is a dict with
    bools is_water/is_barren/is_snow/is_urban for this column.
    Monthly LAI/SAI table interpolation with S-hemisphere half-year
    shift (:1052-1071), canopy snow-burial (:1083-1091), growing season
    from TV>TMIN (:1097-1101).
    """
    yearlen_f = yearlen.astype(lai.dtype) if hasattr(yearlen, "astype") else jnp.asarray(yearlen, lai.dtype)
    if cfg.dveg in (1, 3, 4):
        day = sel(lat >= 0.0, julian,
                        jnp.mod(julian + 0.5 * yearlen_f, yearlen_f))
        t = 12.0 * day / yearlen_f
        it1 = jnp.floor(t + 0.5).astype(jnp.int32)  # Fortran INT(T+0.5)
        wt1 = (it1.astype(t.dtype) + 0.5) - t
        wt2 = 1.0 - wt1
        # Month wrap (IT1<1 -> 12, IT2>12 -> 1, :1060-1061) done with mod
        # arithmetic — an int select here trips a Mosaic relayout bug.
        idx1 = jnp.mod(it1 + 11, 12)   # 0-based month of IT1
        idx2 = jnp.mod(it1, 12)        # 0-based month of IT2=IT1+1
        # p.laim/p.saim are (12,) per-column monthly tables (1-based months)
        lai = wt1 * take1(p.laim, idx1) + wt2 * take1(p.laim, idx2)
        sai = wt1 * take1(p.saim, idx1) + wt2 * take1(p.saim, idx2)

    sai = sel(sai < 0.01, 0.0, sai)
    lai = sel((lai < 0.05) | (sai == 0.0), 0.0, lai)

    is_nonveg = (veg_flags["is_water"] | veg_flags["is_barren"]
                 | veg_flags["is_snow"] | veg_flags["is_urban"])
    lai = sel(is_nonveg, 0.0, lai)
    sai = sel(is_nonveg, 0.0, sai)

    # burying by snow (:1083-1091)
    hvb, hvt = p.hvb, p.hvt
    db = jnp.minimum(jnp.maximum(snowh - hvb, 0.0), hvt - hvb)
    fb = db / jnp.maximum(1.0e-6, hvt - hvb)
    # short vegetation special case
    snowhc = hvt * jnp.exp(-snowh / 0.2)
    fb_short = jnp.minimum(snowh, snowhc) / jnp.maximum(snowhc, 1.0e-6)
    fb = sel((hvt > 0.0) & (hvt <= 1.0), fb_short, fb)

    elai = lai * (1.0 - fb)
    esai = sai * (1.0 - fb)
    esai = sel(esai < 0.01, 0.0, esai)
    elai = sel((elai < 0.05) | (esai == 0.0), 0.0, elai)

    igs = sel(tv > p.tmin, 1.0, 0.0)
    htop = hvt
    return PhenologyOut(lai, sai, htop, elai, esai, igs)


def compute_fveg(cfg, shdfac, shdmax, lai, sai, elai, esai, is_urban,
                 is_barren):
    """Green vegetation fraction from the DVEG option
    (NOAHMP_SFLX :831-845)."""
    if cfg.dveg == 1:
        fveg = jnp.maximum(shdfac, 0.01)
    elif cfg.dveg in (2, 3):
        fveg = jnp.maximum(1.0 - jnp.exp(-0.52 * (lai + sai)), 0.01)
    elif cfg.dveg in (4, 5):
        fveg = jnp.maximum(shdmax, 0.01)
    else:
        raise ValueError(f"unknown dveg {cfg.dveg}")
    fveg = sel(is_urban | is_barren, 0.0, fveg)
    fveg = sel(elai + esai == 0.0, 0.0, fveg)
    return fveg
