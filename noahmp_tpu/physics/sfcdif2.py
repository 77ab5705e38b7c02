"""Chen97 (original Noah) surface exchange scheme, OPT_SFC=2.

Reference: SFCDIF2 (module_sf_noahmplsm.F90:4224-4423).  Paulson
psi-functions; returns exchange coefficients with wind speed folded in
(AKMS = CM*UR convention, undone by the caller :3335-3336).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import atan_tpu, sel


def sfcdif2(it, z0, thz0, thlm, sfcspd, czil, zlm, akms, akhs, rlmo,
            wstar2, ustar):
    """One Chen97 iteration.  All of (akms, akhs, rlmo, wstar2, ustar)
    are carried across iterations.  Returns the updated five-tuple."""
    wwst = 1.2
    wwst2 = wwst * wwst
    vkrm = 0.40
    excm = 0.001
    beta = 1.0 / 270.0
    btg = beta * 9.80616
    elfc = vkrm * btg
    wold = 0.15
    wnew = 1.0 - wold
    pihf = 3.14159265 / 2.0
    epsu2 = 1.0e-4
    epsust = 0.07
    ztmin = -5.0
    ztmax = 1.0
    hpbl = 1000.0
    sqvisc = 258.2
    ric = 0.183
    fhneu = 0.8
    rfc = 0.191

    def pspmu(xx):
        return (-2.0 * jnp.log((xx + 1.0) * 0.5)
                - jnp.log((xx * xx + 1.0) * 0.5)
                + 2.0 * atan_tpu(xx) - pihf)

    def pspms(yy):
        return 5.0 * yy

    def psphu(xx):
        return -2.0 * jnp.log((xx * xx + 1.0) * 0.5)

    def psphs(yy):
        return 5.0 * yy

    zilfc = -czil * vkrm * sqvisc
    zu = z0
    rdz = 1.0 / zlm
    cxch = excm * rdz
    dthv = thlm - thz0
    du2 = jnp.maximum(sfcspd * sfcspd, epsu2)
    btgh = btg * hpbl

    first = it == 0
    wstar2_i = sel(btgh * akhs * dthv != 0.0,
                         wwst2 * jnp.abs(btgh * akhs * dthv) ** (2.0 / 3.0),
                         0.0)
    wstar2 = sel(first, wstar2_i, wstar2)
    ustar_i = jnp.maximum(jnp.sqrt(akms * jnp.sqrt(du2 + wstar2)), epsust)
    ustar = sel(first, ustar_i, ustar)
    rlmo = sel(first, elfc * akhs * dthv / ustar ** 3, rlmo)

    zt = jnp.maximum(1.0e-6, jnp.exp(zilfc * jnp.sqrt(ustar * z0)) * z0)
    zslu = zlm + zu
    zslt = zlm + zt
    rlogu = jnp.log(zslu / zu)
    rlogt = jnp.log(zslt / zt)

    zetalt = jnp.maximum(zslt * rlmo, ztmin)
    rlmo = zetalt / zslt
    zetalu = zslu * rlmo
    zetau = zu * rlmo
    zetat = zt * rlmo

    # unstable branch (Paulson)
    def qq(x):
        return jnp.sqrt(jnp.sqrt(jnp.maximum(1.0 - 16.0 * x, 1e-10)))

    xlu, xlt, xu, xt = qq(zetalu), qq(zetalt), qq(zetau), qq(zetat)
    simm_u = pspmu(xlu) - pspmu(xu) + rlogu
    simh_u = psphu(xlt) - psphu(xt) + rlogt
    # stable branch
    zetalu_s = jnp.minimum(zetalu, ztmax)
    zetalt_s = jnp.minimum(zetalt, ztmax)
    simm_s = pspms(zetalu_s) - pspms(zetau) + rlogu
    simh_s = psphs(zetalt_s) - psphs(zetat) + rlogt

    unstable = rlmo < 0.0
    simm = sel(unstable, simm_u, simm_s)
    simh = sel(unstable, simh_u, simh_s)

    ustar = jnp.maximum(jnp.sqrt(akms * jnp.sqrt(du2 + wstar2)), epsust)
    zt = jnp.maximum(1.0e-6, jnp.exp(zilfc * jnp.sqrt(ustar * z0)) * z0)
    zslt = zlm + zt
    rlogt = jnp.log(zslt / zt)
    ustark = ustar * vkrm
    akms = jnp.maximum(ustark / simm, cxch)
    akhs = jnp.maximum(ustark / simh, cxch)

    wstar2 = sel(btgh * akhs * dthv != 0.0,
                       wwst2 * jnp.abs(btgh * akhs * dthv) ** (2.0 / 3.0),
                       0.0)
    rlmn = elfc * akhs * dthv / ustar ** 3
    rlmo = rlmo * wold + rlmn * wnew

    return akms, akhs, rlmo, wstar2, ustar
