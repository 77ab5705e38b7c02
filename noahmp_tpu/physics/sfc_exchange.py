"""Surface-layer exchange coefficients.

Reference: SFCDIF1 — Monin-Obukhov (module_sf_noahmplsm.F90:4061-4222),
SFCDIF2 — Chen97 (:4224-4423), RAGRB — within-canopy resistances
(:3960-4059).

These run inside fixed-count stability iterations; all state that the
Fortran carries across iterations (MOZ, MOZSGN, FM, FH, FM2, FH2, FV,
MOZG, FHG) is explicit carry here so the loops can be `lax.fori_loop`s
under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as C
from .common import MPE, atan_tpu, sel


class Sfcdif1State(NamedTuple):
    moz: jnp.ndarray
    mozsgn: jnp.ndarray  # int32
    fm: jnp.ndarray
    fh: jnp.ndarray
    fm2: jnp.ndarray
    fh2: jnp.ndarray
    fv: jnp.ndarray


def sfcdif1_init(dtype=jnp.float32):
    z = jnp.zeros((), dtype)
    return Sfcdif1State(z, jnp.zeros((), jnp.int32), z, z, z, z,
                        jnp.asarray(0.1, dtype))


class Sfcdif1Out(NamedTuple):
    state: Sfcdif1State
    cm: jnp.ndarray
    ch: jnp.ndarray
    fv: jnp.ndarray
    ch2: jnp.ndarray


def sfcdif1(it, s: Sfcdif1State, sfctmp, rhoair, h, qair, zlvl, zpd,
            z0m, z0h, ur) -> Sfcdif1Out:
    """One M-O iteration (SFCDIF1 :4061-4222).

    ``it`` is the 0-based traced iteration index (Fortran ITER-1).
    """
    first = it == 0
    mozold = s.moz

    dz = jnp.maximum(zlvl - zpd, 1.0e-3)
    tmpcm = jnp.log(dz / z0m)
    tmpch = jnp.log(dz / z0h)
    tmpcm2 = jnp.log((2.0 + z0m) / z0m)
    tmpch2 = jnp.log((2.0 + z0h) / z0h)

    tvir = (1.0 + 0.61 * qair) * sfctmp
    tmp1 = C.VKC * (C.GRAV / tvir) * h / (rhoair * C.CPAIR)
    tmp1 = sel(jnp.abs(tmp1) <= MPE, MPE, tmp1)
    mol = -1.0 * s.fv ** 3 / tmp1
    moz = sel(first, 0.0, jnp.minimum(dz / mol, 1.0))
    moz2 = sel(first, 0.0, jnp.minimum((2.0 + z0h) / mol, 1.0))
    fv = sel(first, 0.0, s.fv)

    mozsgn = s.mozsgn + sel(mozold * moz < 0.0, 1, 0).astype(jnp.int32)
    latch = mozsgn >= 2
    moz = sel(latch, 0.0, moz)
    moz2 = sel(latch, 0.0, moz2)
    fm = sel(latch, 0.0, s.fm)
    fh = sel(latch, 0.0, s.fh)
    fm2 = sel(latch, 0.0, s.fm2)
    fh2 = sel(latch, 0.0, s.fh2)

    # stability functions (:4155-4180)
    def psi(m):
        t1 = (1.0 - 16.0 * jnp.minimum(m, 0.0)) ** 0.25
        t2 = jnp.log((1.0 + t1 * t1) / 2.0)
        t3 = jnp.log((1.0 + t1) / 2.0)
        fm_u = 2.0 * t3 + t2 - 2.0 * atan_tpu(t1) + 1.5707963
        fh_u = 2.0 * t2
        fm_s = -5.0 * m
        return (sel(m < 0.0, fm_u, fm_s),
                sel(m < 0.0, fh_u, fm_s))

    fmnew, fhnew = psi(moz)
    fm2new, fh2new = psi(moz2)

    fm = sel(first, fmnew, 0.5 * (fm + fmnew))
    fh = sel(first, fhnew, 0.5 * (fh + fhnew))
    fm2 = sel(first, fm2new, 0.5 * (fm2 + fm2new))
    fh2 = sel(first, fh2new, 0.5 * (fh2 + fh2new))

    fh = jnp.minimum(fh, 0.9 * tmpch)
    fm = jnp.minimum(fm, 0.9 * tmpcm)
    fh2 = jnp.minimum(fh2, 0.9 * tmpch2)
    fm2 = jnp.minimum(fm2, 0.9 * tmpcm2)

    def guard(x):
        return sel(jnp.abs(x) <= MPE, MPE, x)

    cmfm = guard(tmpcm - fm)
    chfh = guard(tmpch - fh)
    cm2fm2 = guard(tmpcm2 - fm2)
    ch2fh2 = guard(tmpch2 - fh2)
    cm = C.VKC * C.VKC / (cmfm * cmfm)
    ch = C.VKC * C.VKC / (cmfm * chfh)
    fv_new = ur * jnp.sqrt(cm)
    ch2 = C.VKC * fv_new / ch2fh2

    st = Sfcdif1State(moz, mozsgn, fm, fh, fm2, fh2, fv_new)
    return Sfcdif1Out(st, cm, ch, fv_new, ch2)


class RagrbOut(NamedTuple):
    mozg: jnp.ndarray
    fhg: jnp.ndarray
    ramg: jnp.ndarray
    rahg: jnp.ndarray
    rawg: jnp.ndarray
    rb: jnp.ndarray


def ragrb(it, vaie, rhoair, hg, tah, zpd, z0mg, z0hg, hcan, uc, z0h,
          fv, cwp, dleaf, mozg_prev, fhg_prev) -> RagrbOut:
    """Within-canopy aerodynamic + leaf boundary resistances
    (RAGRB :3960-4059)."""
    first = it == 0
    tmp1 = C.VKC * (C.GRAV / tah) * hg / (rhoair * C.CPAIR)
    tmp1 = sel(jnp.abs(tmp1) <= MPE, MPE, tmp1)
    molg = -1.0 * fv ** 3 / tmp1
    mozg = sel(first, 0.0, jnp.minimum((zpd - z0mg) / molg, 1.0))

    fhgnew = sel(mozg < 0.0,
                       (1.0 - 15.0 * jnp.minimum(mozg, 0.0)) ** (-0.25),
                       1.0 + 4.7 * mozg)
    fhg = sel(first, fhgnew, 0.5 * (fhg_prev + fhgnew))

    cwpc = jnp.sqrt(jnp.maximum(cwp * vaie * hcan * fhg, 1.0e-12))
    tmp1 = jnp.exp(-cwpc * z0hg / hcan)
    tmp2 = jnp.exp(-cwpc * (z0h + zpd) / hcan)
    tmprah2 = hcan * jnp.exp(jnp.minimum(cwpc, 50.0)) / cwpc * (tmp1 - tmp2)

    kh = jnp.maximum(C.VKC * fv * (hcan - zpd), MPE)
    ramg = jnp.zeros_like(kh)
    rahg = tmprah2 / kh
    rawg = rahg

    tmprb = cwpc * 50.0 / (1.0 - jnp.exp(-cwpc / 2.0))
    rb = tmprb * jnp.sqrt(dleaf / jnp.maximum(uc, MPE))
    return RagrbOut(mozg, fhg, ramg, rahg, rawg, rb)
