"""State containers for the column model.

Layer indexing convention (0-based, fixed shapes — the TPU-friendly
encoding of the reference's negative-index snow arrays,
module_hrldas_noahmp_vars.F90:245-248):

  * combined snow+soil arrays (``stc``, ``zsnso``): shape
    ``(nsnow+nsoil,)``; entry ``j`` corresponds to Fortran index
    ``iz = j - nsnow + 1`` (so ``j = nsnow-1`` is the snow layer next to
    the ground, ``j = nsnow`` is the first soil layer).
  * snow-only arrays (``snice``, ``snliq``): shape ``(nsnow,)``, same
    mapping restricted to ``iz <= 0``.
  * ``isnow`` keeps the Fortran sign convention: 0 = no explicit snow
    layers, -1..-nsnow = that many active layers.  Active snow layers
    occupy ``j in [isnow + nsnow, nsnow)``; inactive entries hold zeros.

All fields are per-column scalars or per-column (z,) vectors; the grid
driver vmaps over a leading columns axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass
from .. import constants as C


@pytree_dataclass
class ColumnState:
    """Prognostic state advanced by one call to ``noahmp_sflx``.

    Mirrors the INOUT list of NOAHMP_SFLX
    (module_sf_noahmplsm.F90:528-535, :559-777).
    """
    # snow/soil layers
    isnow: jnp.ndarray     # int32, Fortran sign convention (<= 0)
    stc: jnp.ndarray       # (nsnow+nsoil,) snow/soil temperature [K]
    zsnso: jnp.ndarray     # (nsnow+nsoil,) layer-bottom depth [m] (<0)
    snice: jnp.ndarray     # (nsnow,) snow layer ice [mm]
    snliq: jnp.ndarray     # (nsnow,) snow layer liquid [mm]
    sneqv: jnp.ndarray     # snow water equivalent [mm]
    sneqvo: jnp.ndarray    # SWE at last step [mm]
    snowh: jnp.ndarray     # snow height [m]
    # soil water
    smc: jnp.ndarray       # (nsoil,) total soil moisture [m3/m3]
    sh2o: jnp.ndarray      # (nsoil,) liquid soil moisture [m3/m3]
    # canopy
    canliq: jnp.ndarray    # intercepted liquid [mm]
    canice: jnp.ndarray    # intercepted ice [mm]
    tv: jnp.ndarray        # vegetation temperature [K]
    eah: jnp.ndarray       # canopy air vapor pressure [Pa]
    tah: jnp.ndarray       # canopy air temperature [K]
    fwet: jnp.ndarray      # wetted/snowed canopy fraction
    # ground / surface
    tg: jnp.ndarray        # ground temperature [K]
    qsfc: jnp.ndarray      # surface mixing ratio [kg/kg]
    qsnow: jnp.ndarray     # snowfall rate on ground [mm/s]
    albold: jnp.ndarray    # previous snow albedo (CLASS)
    tauss: jnp.ndarray     # non-dimensional snow age
    cm: jnp.ndarray        # momentum drag coefficient
    ch: jnp.ndarray        # sensible heat exchange coefficient
    # water table / aquifer
    zwt: jnp.ndarray       # depth to water table [m]
    wa: jnp.ndarray        # aquifer storage [mm]
    wt: jnp.ndarray        # aquifer + saturated-soil storage [mm]
    wslake: jnp.ndarray    # lake water storage [mm]
    # MMF groundwater (opt_run=5)
    smcwtd: jnp.ndarray    # moisture between soil bottom and WT [m3/m3]
    deeprech: jnp.ndarray  # deep recharge [m]
    rech: jnp.ndarray      # shallow recharge [m]
    # dynamic vegetation carbon pools
    lfmass: jnp.ndarray    # leaf mass [g/m2]
    rtmass: jnp.ndarray    # fine root mass [g/m2]
    stmass: jnp.ndarray    # stem mass [g/m2]
    wood: jnp.ndarray      # wood mass [g/m2]
    stblcp: jnp.ndarray    # stable carbon pool [g/m2]
    fastcp: jnp.ndarray    # fast carbon pool [g/m2]
    lai: jnp.ndarray       # leaf area index (before burying)
    sai: jnp.ndarray       # stem area index


@pytree_dataclass
class Forcing:
    """Atmospheric forcing for one step (per column)."""
    sfctmp: jnp.ndarray    # air temperature at zlvl [K]
    sfcprs: jnp.ndarray    # surface pressure [Pa]
    psfc: jnp.ndarray      # pressure at lowest model level [Pa]
    uu: jnp.ndarray        # wind u [m/s]
    vv: jnp.ndarray        # wind v [m/s]
    q2: jnp.ndarray        # specific humidity [kg/kg] (driver-converted)
    qc: jnp.ndarray        # cloud water mixing ratio (opt_sfc=3/4 only)
    soldn: jnp.ndarray     # downward shortwave [W/m2]
    lwdn: jnp.ndarray      # downward longwave [W/m2]
    prcp: jnp.ndarray      # precipitation rate [mm/s]
    tbot: jnp.ndarray      # deep soil temperature [K]
    pblh: jnp.ndarray      # PBL height (opt_sfc=3/4 only) [m]
    # time/space
    cosz: jnp.ndarray      # cosine solar zenith angle
    lat: jnp.ndarray       # latitude [radians]
    julian: jnp.ndarray    # fractional day of year
    yearlen: jnp.ndarray   # int32: days in year (365/366)
    # vegetation fraction forcing
    shdfac: jnp.ndarray    # green vegetation fraction [0-1]
    shdmax: jnp.ndarray    # annual max vegetation fraction [0-1]
    # trace gases / nitrogen (driver constants by default)
    co2air: jnp.ndarray    # CO2 partial pressure [Pa]
    o2air: jnp.ndarray     # O2 partial pressure [Pa]
    foln: jnp.ndarray      # foliage nitrogen [%]
    ficeold: jnp.ndarray   # (nsnow,) prior snow-layer ice fraction
    smceq: jnp.ndarray     # (nsoil,) equilibrium soil moisture (opt_run=5)


def initial_column_state(cfg, tsk=285.0, smc0=0.3, dtype=jnp.float32):
    """A neutral cold-start column state (no snow), for tests.

    The full NOAHMP_INIT equivalent lives in noahmp_tpu.driver.init.
    """
    ns = cfg.nsnow + cfg.nsoil
    zsoil = np.asarray(cfg.zsoil, dtype=np.float32)
    zsnso = np.concatenate([np.zeros(cfg.nsnow, np.float32), zsoil])
    f = lambda v: jnp.asarray(v, dtype=dtype)
    zi = lambda v: jnp.asarray(v, dtype=jnp.int32)
    return ColumnState(
        isnow=zi(0),
        stc=f(np.full(ns, tsk)),
        zsnso=f(zsnso),
        snice=f(np.zeros(cfg.nsnow)),
        snliq=f(np.zeros(cfg.nsnow)),
        sneqv=f(0.0), sneqvo=f(0.0), snowh=f(0.0),
        smc=f(np.full(cfg.nsoil, smc0)),
        sh2o=f(np.full(cfg.nsoil, smc0)),
        canliq=f(0.0), canice=f(0.0),
        tv=f(tsk), eah=f(2000.0), tah=f(tsk), fwet=f(0.0),
        tg=f(tsk), qsfc=f(0.0), qsnow=f(0.0),
        albold=f(0.65), tauss=f(0.0),
        cm=f(0.1), ch=f(0.1),
        zwt=f(2.5), wa=f(4900.0), wt=f(4900.0), wslake=f(0.0),
        smcwtd=f(smc0), deeprech=f(0.0), rech=f(0.0),
        lfmass=f(50.0), rtmass=f(500.0), stmass=f(50.0),
        wood=f(500.0), stblcp=f(1000.0), fastcp=f(1000.0),
        lai=f(2.0), sai=f(0.1),
    )
