"""Static model configuration.

The reference routes 12 physics option integers from the namelist into
Fortran module globals at runtime (`noahmp_options`,
/root/reference/phys/module_sf_noahmplsm.F90:9352-9388).  In the TPU
framework the options are a frozen, hashable dataclass passed as a
*static* argument to jitted functions, so XLA compiles one specialization
per option combination (no runtime branch divergence inside the kernel).

Option meanings (module_sf_noahmplsm.F90:105-177):
  dveg     1-5: dynamic vegetation (2|5 -> CARBON active)
  opt_crs  1 Ball-Berry, 2 Jarvis
  opt_btr  1 Noah, 2 CLM, 3 SSiB soil-stress
  opt_run  1 TOPMODEL+SIMGM gw, 2 SIMTOP equilibrium WT, 3 free drainage,
           4 BATS, 5 Miguez-Macho & Fan (MMF) groundwater
  opt_sfc  1 M-O, 2 Chen97, 3 MYJ, 4 YSU
  opt_frz  1 closed-form supercooled water, 2 Koren iteration
  opt_inf  1 linear frozen-soil permeability, 2 nonlinear
  opt_rad  1 gap=f(solar angle,3D), 2 gap=0, 3 gap=1-FVEG
  opt_alb  1 BATS, 2 CLASS snow albedo
  opt_snf  1 Jordan91, 2 T<TFRZ+2.2, 3 T<TFRZ precipitation partition
  opt_tbot 1 zero-flux bottom, 2 TBOT at ZBOT
  opt_stc  1 semi-implicit, 2 full-implicit top layer
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from . import constants as C


@dataclasses.dataclass(frozen=True)
class NoahMPConfig:
    """Hashable static configuration (jit static arg)."""

    # physics options (defaults = run/noahmp.namelist:22-33)
    dveg: int = 3
    opt_crs: int = 1
    opt_btr: int = 1
    opt_run: int = 1
    opt_sfc: int = 1
    opt_frz: int = 1
    opt_inf: int = 1
    opt_rad: int = 3
    opt_alb: int = 2
    opt_snf: int = 1
    opt_tbot: int = 2
    opt_stc: int = 1

    # structural
    nsoil: int = 4
    nsnow: int = C.NSNOW
    # soil layer thicknesses, top-down (m) (run/noahmp.namelist:42-46)
    dzs: Tuple[float, ...] = (0.1, 0.3, 0.6, 1.0)

    # timestep (s) and forcing height (m)
    dt: float = 3600.0
    zlvl: float = 30.0

    # land-use dataset: "USGS" or "MODIFIED_IGBP_MODIS_NOAH"
    llanduse: str = "USGS"

    # carbon active? (NOAHMP_SFLX :909-917)
    @property
    def run_carbon(self) -> bool:
        return self.dveg in (2, 5)

    def __post_init__(self):
        if self.dveg == 2 and self.opt_crs != 1:
            raise ValueError("dveg=2 requires opt_crs=1 (Ball-Berry)")
        if len(self.dzs) != self.nsoil:
            raise ValueError("len(dzs) must equal nsoil")
        for name, hi in (("dveg", 5), ("opt_crs", 2), ("opt_btr", 3),
                         ("opt_run", 5), ("opt_sfc", 4), ("opt_frz", 2),
                         ("opt_inf", 2), ("opt_rad", 3), ("opt_alb", 2),
                         ("opt_snf", 3), ("opt_tbot", 2), ("opt_stc", 2)):
            v = getattr(self, name)
            if not (1 <= v <= hi):
                raise ValueError(f"{name}={v} out of range 1..{hi}")

    @property
    def zsoil(self) -> Tuple[float, ...]:
        """Depth of soil layer *bottoms*, negative downward.

        Mirrors module_sf_noahmpdrv.F90:392-395 (ZSOIL from DZS).
        """
        z = []
        acc = 0.0
        for d in self.dzs:
            acc -= d
            z.append(acc)
        return tuple(z)
