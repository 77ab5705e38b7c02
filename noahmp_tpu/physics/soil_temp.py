"""Snow/soil heat diffusion with implicit tridiagonal solve.

Reference: TSNOSOI (module_sf_noahmplsm.F90:5707-5822), HRT
(:5825-5922), HSTEP (:5925-5977), ROSR12 Thomas solve (:5979-6036).

The Fortran solves a tridiagonal system over the *dynamic* range
[ISNOW+1, NSOIL].  Here the system is fixed-shape (nsnow+nsoil) with
identity rows (a=c=0, b=1, d=0) for inactive snow layers, which yields
bit-identical active-layer results because the first active row always
has a=0.  The solve is an unrolled Thomas algorithm over <=7 layers —
in-register on TPU, no scan overhead.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import sanitize, snso_layer_mask, sel, band


def tridiag_thomas(a, b, c, d):
    """Thomas algorithm over the full fixed-length layer axis.

    Matches ROSR12 (:5979-6036) with NTOP = 0 — callers neutralize
    inactive leading rows to identity.  Unrolled python loop: layer
    count is static & tiny.
    """
    n = a.shape[0]
    p = [None] * n
    delta = [None] * n
    p[0] = -c[0] / b[0]
    delta[0] = d[0] / b[0]
    for k in range(1, n):
        denom = b[k] + a[k] * p[k - 1]
        p[k] = -c[k] / denom
        delta[k] = (d[k] - a[k] * delta[k - 1]) / denom
    x = [None] * n
    x[n - 1] = delta[n - 1]
    for k in range(n - 2, -1, -1):
        x[k] = p[k] * x[k + 1] + delta[k]
    return jnp.stack(x)


def hrt(cfg, isnow, zsnso, stc, tbot, zbotsno, df, hcpct, ssoil, opt_stc,
        opt_tbot):
    """Assemble the heat-equation tridiagonal (HRT :5825-5922).

    Returns (ai, bi, ci, rhsts, botflx) with inactive rows zeroed.
    """
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    n = nsnow + nsoil
    act = snso_layer_mask(isnow, nsnow, nsoil)
    j = jnp.arange(n)
    top = isnow + nsnow
    is_top = j == top
    is_bot = j == (n - 1)

    z_prev = jnp.concatenate([jnp.zeros((1,), zsnso.dtype), zsnso[:-1]])
    z_next = jnp.concatenate([zsnso[1:], zsnso[-1:]])  # pad; bot handled
    stc_next = jnp.concatenate([stc[1:], stc[-1:]])
    df_prev = jnp.concatenate([df[:1], df[:-1]])

    denom = sanitize((z_prev - zsnso) * hcpct, act, 1.0)
    # interface gradient formulas (:5873-5898); top row's z_prev=0 makes
    # the generic (z_prev - z_next) == Fortran's -ZSNSO(K+1) at the top.
    temp1 = sanitize(z_prev - z_next, band(act, ~is_bot), 1.0)
    ddz = 2.0 / temp1
    dtsdz = 2.0 * (stc - stc_next) / temp1
    dtsdz_prev = jnp.concatenate([dtsdz[:1], dtsdz[:-1]])
    ddz_prev = jnp.concatenate([ddz[:1], ddz[:-1]])

    # bottom-layer gradient & boundary flux (:5889-5896)
    if opt_tbot == 1:
        botflx = jnp.zeros((), stc.dtype)
    else:
        dtsdz_bot = (stc[n - 1] - tbot) / (0.5 * (zsnso[n - 2] + zsnso[n - 1]) - zbotsno)
        botflx = -df[n - 1] * dtsdz_bot

    eflux_top = df * dtsdz - ssoil
    eflux_mid = df * dtsdz - df_prev * dtsdz_prev
    eflux_bot = -botflx - df_prev * dtsdz_prev
    eflux = sel(is_top, eflux_top,
                      sel(is_bot, eflux_bot, eflux_mid))

    ai = sel(is_top, 0.0, -df_prev * ddz_prev / denom)
    ci = sel(is_bot, 0.0, -df * ddz / denom)
    if opt_stc == 1:
        bi_top = -ci
    else:
        z0sq = sanitize(0.5 * zsnso * zsnso * hcpct, act, 1.0)
        bi_top = -ci + df / z0sq
    bi = sel(is_top, bi_top, -(ai + ci))
    rhsts = eflux / (-denom)

    zero = jnp.zeros_like(ai)
    return (sel(act, ai, zero), sel(act, bi, zero),
            sel(act, ci, zero), sel(act, rhsts, zero), botflx)


def tsnosoi(cfg, p, isnow, zsnso, dzsnso, stc, tbot, ssoil, df, hcpct,
            snowh):
    """Advance snow/soil temperatures one implicit step
    (TSNOSOI + HSTEP :5707-5977).  Returns new stc."""
    nsnow, nsoil = cfg.nsnow, cfg.nsoil
    act = snso_layer_mask(isnow, nsnow, nsoil)
    zbotsno = p.zbot - snowh

    ai, bi, ci, rhsts, _ = hrt(cfg, isnow, zsnso, stc, tbot, zbotsno,
                               df, hcpct, ssoil, cfg.opt_stc,
                               cfg.opt_tbot)
    dt = cfg.dt
    a = ai * dt
    b = 1.0 + bi * dt
    c = ci * dt
    d = rhsts * dt
    # inactive rows are identity with d=0 -> delta 0
    delta = tridiag_thomas(a, b, c, d)
    return sel(act, stc + delta, stc)
