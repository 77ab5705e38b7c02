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
    """Replace entries where ``cond`` is False by ``fill`` (pre-division).
    Rank-safe for Mosaic (uses sel)."""
    return sel(cond, x, fill)


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


def _norm_idx(idx, k):
    if isinstance(idx, int) and idx < 0:
        idx += k
    return jnp.clip(idx, 0, k - 1)


def take1(a, idx):
    """Per-column dynamic gather a[idx] over a tiny layer axis, as
    one-hot arithmetic (TPU-friendly: no gather op; vectorizes cleanly
    under vmap and lowers inside Pallas kernels).  idx is clipped
    (negative static indices wrap, matching numpy)."""
    k = a.shape[0]
    idx = _norm_idx(idx, k)
    oh = jnp.arange(k) == idx
    return jnp.sum(jnp.where(oh, a, jnp.zeros_like(a)), axis=0)


def put1(a, idx, val):
    """a.at[idx].set(val) via select (no scatter)."""
    k = a.shape[0]
    idx = _norm_idx(idx, k)
    return jnp.where(jnp.arange(k) == idx, val, a)


def add1(a, idx, val):
    """a.at[idx].add(val) via select (no scatter)."""
    k = a.shape[0]
    idx = _norm_idx(idx, k)
    return a + jnp.where(jnp.arange(k) == idx, val, jnp.zeros_like(a))


def roll_to_front(a, start):
    """local[k] = a[(start+k) % n] for tiny n (dynamic roll without the
    gather that jnp.roll(traced shift) lowers to)."""
    n = a.shape[0]
    return jnp.stack([take1(a, (start + k) % n) for k in range(n)])


def atan_tpu(x):
    """arctan via argument reduction + odd polynomial (Mosaic lacks an
    atan primitive).  Max error ~2e-7 rad over the real line: reduce to
    |t| <= tan(pi/8) with atan(x)=pi/2-atan(1/x) and
    atan(x)=pi/4+atan((x-1)/(x+1)), then a 6-term Taylor series."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    inv = a > 1.0
    a1 = jnp.where(inv, 1.0 / jnp.maximum(a, 1e-30), a)
    red = a1 > 0.41421356
    t = jnp.where(red, (a1 - 1.0) / (a1 + 1.0), a1)
    w = t * t
    p = t * (1.0 + w * (-1.0 / 3.0 + w * (1.0 / 5.0 + w * (-1.0 / 7.0
              + w * (1.0 / 9.0 - w / 11.0)))))
    r = jnp.where(red, 0.78539816 + p, p)
    r = jnp.where(inv, 1.57079633 - r, r)
    return s * r


def cumsum_small(x):
    """Prefix sum along axis 0 for tiny static lengths, unrolled
    (Mosaic has no cumsum primitive)."""
    outs = []
    acc = jnp.zeros_like(x[0])
    for k in range(x.shape[0]):
        acc = acc + x[k]
        outs.append(acc)
    return jnp.stack(outs)


def first_true_idx(h, default):
    """Index of the first True in a tiny bool vector (no argmax —
    Mosaic's reduce-index is f32-only).  ``default`` when none True."""
    seen = cumsum_small(h.astype(jnp.int32))
    first = h & (seen == 1)
    k = h.shape[0]
    idx = jnp.sum(jnp.where(first, jnp.arange(k), 0))
    return jnp.where(jnp.any(h), idx, default)


def last_true_idx(h, default):
    """Index of the last True in a tiny bool vector."""
    k = h.shape[0]
    idx = jnp.max(jnp.where(h, jnp.arange(k), -1))
    return jnp.where(jnp.any(h), idx, default)


def sel(cond, a, b):
    """Three-arg ``jnp.where`` that never rank-expands booleans.

    Mosaic cannot reshape i1 vectors (e.g. (8,128) -> (8,128,1) when a
    per-column mask broadcasts over a layer axis); broadcasting the
    condition as int32 and comparing at full shape sidesteps it with no
    numeric change.  Used throughout the column physics so the whole
    step lowers inside one Pallas kernel.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(cond, jnp.int32)
    shape = jnp.broadcast_shapes(c.shape, a.shape, b.shape)
    cb = c + jnp.zeros(shape, jnp.int32)
    if a.dtype == jnp.bool_ or b.dtype == jnp.bool_:
        # Mosaic lowers select-on-i1-operands through an i8->i1 trunc it
        # can't vectorize; select in the int32 domain instead.
        out = jnp.where(cb != 0, jnp.asarray(a, jnp.int32),
                        jnp.asarray(b, jnp.int32))
        return out != 0
    return jnp.where(cb != 0, a, b)


def band(*masks):
    """Logical AND over bool masks of mixed ranks, broadcast in the
    int32 domain (Mosaic cannot rank-expand i1 vectors)."""
    acc = jnp.asarray(masks[0], jnp.int32)
    for m in masks[1:]:
        acc = acc * jnp.asarray(m, jnp.int32)
    return acc != 0
