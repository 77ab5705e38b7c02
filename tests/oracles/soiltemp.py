"""Scalar oracle: snow/soil heat diffusion — TSNOSOI (:5707-5822), HRT
(:5825-5922), HSTEP (:5925-5977), ROSR12 (:5979-6036) of
module_sf_noahmplsm.F90.  Fortran-indexed dicts J=-NSNOW+1..NSOIL.
Test fixture only."""

from .soilwater import rosr12


def hrt(nsnow, nsoil, isnow, zsnso, stc, tbot, zbot, dt, df, hcpct,
        ssoil, opt_stc, opt_tbot):
    """HRT. Returns (ai, bi, ci, rhsts, botflx) dicts isnow+1..nsoil."""
    phi = {k: 0.0 for k in range(isnow + 1, nsoil + 1)}
    denom, ddz, dtsdz, eflux = {}, {}, {}, {}
    botflx = 0.0
    for k in range(isnow + 1, nsoil + 1):
        if k == isnow + 1:
            denom[k] = -zsnso[k] * hcpct[k]
            temp1 = -zsnso[k + 1]
            ddz[k] = 2.0 / temp1
            dtsdz[k] = 2.0 * (stc[k] - stc[k + 1]) / temp1
            eflux[k] = df[k] * dtsdz[k] - ssoil - phi[k]
        elif k < nsoil:
            denom[k] = (zsnso[k - 1] - zsnso[k]) * hcpct[k]
            temp1 = zsnso[k - 1] - zsnso[k + 1]
            ddz[k] = 2.0 / temp1
            dtsdz[k] = 2.0 * (stc[k] - stc[k + 1]) / temp1
            eflux[k] = (df[k] * dtsdz[k] - df[k - 1] * dtsdz[k - 1]) \
                - phi[k]
        else:
            denom[k] = (zsnso[k - 1] - zsnso[k]) * hcpct[k]
            if opt_tbot == 1:
                botflx = 0.0
            if opt_tbot == 2:
                dtsdz[k] = (stc[k] - tbot) / (
                    0.5 * (zsnso[k - 1] + zsnso[k]) - zbot)
                botflx = -df[k] * dtsdz[k]
            eflux[k] = (-botflx - df[k - 1] * dtsdz[k - 1]) - phi[k]

    ai, bi, ci, rhsts = {}, {}, {}, {}
    for k in range(isnow + 1, nsoil + 1):
        if k == isnow + 1:
            ai[k] = 0.0
            ci[k] = -df[k] * ddz[k] / denom[k]
            if opt_stc == 1:
                bi[k] = -ci[k]
            if opt_stc == 2:
                bi[k] = -ci[k] + df[k] / (
                    0.5 * zsnso[k] * zsnso[k] * hcpct[k])
        elif k < nsoil:
            ai[k] = -df[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = -df[k] * ddz[k] / denom[k]
            bi[k] = -(ai[k] + ci[k])
        else:
            ai[k] = -df[k - 1] * ddz[k - 1] / denom[k]
            ci[k] = 0.0
            bi[k] = -(ai[k] + ci[k])
        rhsts[k] = eflux[k] / (-denom[k])
    return ai, bi, ci, rhsts, botflx


def tsnosoi(nsnow, nsoil, isnow, ist, tbot, zsnso, ssoil, df, hcpct,
            zbot, sag, dt, snowh, dzsnso, tg, stc, opt_stc, opt_tbot):
    """TSNOSOI + HSTEP: one implicit heat step. Returns new stc dict."""
    stc = dict(stc)
    zbotsno = zbot - snowh
    ai, bi, ci, rhsts = {}, {}, {}, {}
    ai, bi, ci, rhsts, _ = hrt(nsnow, nsoil, isnow, zsnso, stc, tbot,
                               zbotsno, dt, df, hcpct, ssoil, opt_stc,
                               opt_tbot)
    # HSTEP
    for k in range(isnow + 1, nsoil + 1):
        rhsts[k] = rhsts[k] * dt
        ai[k] = ai[k] * dt
        bi[k] = 1.0 + bi[k] * dt
        ci[k] = ci[k] * dt
    delta = rosr12(ai, bi, ci, rhsts, isnow + 1, nsoil)
    for k in range(isnow + 1, nsoil + 1):
        stc[k] = stc[k] + delta[k]
    return stc
