"""Shared helpers for vectorized column physics.

Numerical-safety conventions for branchless (``where``-merged) physics:
every division that can hit zero in the *inactive* branch must divide by
a sanitized denominator, because ``jnp.where`` evaluates both branches.
"""

from __future__ import annotations

import jax.numpy as jnp

MPE = 1.0e-6  # reference's overflow guard (module_sf_noahmplsm.F90:1517)


def safe_div(num, den, eps=MPE):
    """num/den with |den| clamped away from zero (sign preserved)."""
    den_safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    return num / den_safe


def sanitize(x, cond, fill=1.0):
    """Replace entries where ``cond`` is False by ``fill`` (pre-division)."""
    return jnp.where(cond, x, fill)


def snow_layer_mask(isnow, nsnow: int):
    """Bool (nsnow,): True where a snow layer is active.

    ``isnow`` uses the Fortran sign convention (0, -1, .., -nsnow).
    Active snow layers occupy trailing indices [isnow+nsnow, nsnow).
    """
    j = jnp.arange(nsnow)
    return j >= (isnow + nsnow)


def snso_layer_mask(isnow, nsnow: int, nsoil: int):
    """Bool (nsnow+nsoil,): True for active snow layers + all soil."""
    j = jnp.arange(nsnow + nsoil)
    return j >= (isnow + nsnow)


def dzsnso_from_zsnso(zsnso, isnow, nsnow: int, nsoil: int):
    """Layer thicknesses from layer-bottom depths.

    Mirrors NOAHMP_SFLX :788-794: the top active layer's thickness is
    ``-zsnso[top]``; relies on the invariant that inactive snow entries
    of ``zsnso`` are 0.
    """
    z_prev = jnp.concatenate([jnp.zeros((1,), zsnso.dtype), zsnso[:-1]])
    dz = z_prev - zsnso
    return jnp.where(snso_layer_mask(isnow, nsnow, nsoil), dz, 0.0)


def tdc(t):
    """Kelvin -> Celsius clamped to [-50, 50] (VEGE_FLUX TDC statement
    function, module_sf_noahmplsm.F90:3298)."""
    return jnp.minimum(50.0, jnp.maximum(-50.0, t - 273.16))


def esat(tc):
    """Saturation vapor pressure (Pa) over water & ice and derivatives.

    ``tc`` is temperature in CELSIUS (callers pass ``tdc(T)``).
    6th-order polynomials; reference ESAT
    (module_sf_noahmplsm.F90:5272-5321).
    Returns (esw, esi, desw, desi).
    """
    a0, a1, a2, a3 = 6.107799961, 4.436518521e-01, 1.428945805e-02, 2.650648471e-04
    a4, a5, a6 = 3.031240396e-06, 2.034080948e-08, 6.136820929e-11
    b0, b1, b2, b3 = 6.109177956, 5.034698970e-01, 1.886013408e-02, 4.176223716e-04
    b4, b5, b6 = 5.824720280e-06, 4.838803174e-08, 1.838826904e-10
    c0, c1, c2, c3 = 4.438099984e-01, 2.857002636e-02, 7.938054040e-04, 1.215215065e-05
    c4, c5, c6 = 1.036561403e-07, 3.532421810e-10, -7.090244804e-13
    d0, d1, d2, d3 = 5.030305237e-01, 3.773255020e-02, 1.267995369e-03, 2.477563108e-05
    d4, d5, d6 = 3.005693132e-07, 2.158542548e-09, 7.131097725e-12

    esw = 100.0 * (a0 + tc * (a1 + tc * (a2 + tc * (a3 + tc * (a4 + tc * (a5 + tc * a6))))))
    esi = 100.0 * (b0 + tc * (b1 + tc * (b2 + tc * (b3 + tc * (b4 + tc * (b5 + tc * b6))))))
    desw = 100.0 * (c0 + tc * (c1 + tc * (c2 + tc * (c3 + tc * (c4 + tc * (c5 + tc * c6))))))
    desi = 100.0 * (d0 + tc * (d1 + tc * (d2 + tc * (d3 + tc * (d4 + tc * (d5 + tc * d6))))))
    return esw, esi, desw, desi
