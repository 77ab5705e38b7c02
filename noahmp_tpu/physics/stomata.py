"""Stomatal resistance & leaf photosynthesis.

Reference: STOMATA — Ball-Berry/Farquhar with CI bisection
(module_sf_noahmplsm.F90:5323-5470), CANRES — Jarvis (:5598-5677),
CALHUM (:5679-5705).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as C
from .common import MPE, sel


def stomata(p, apar, foln, tv, ei, ea, sfctmp, sfcprs, o2, co2, igs,
            btran, rb):
    """Ball-Berry stomatal resistance (s/m) + photosynthesis.

    Vectorized translation of the CI bisection (:5415-5432): fixed 20
    iterations with a convergence latch, matching CIERR=5e-2.
    Returns (rs, psn).
    """
    cf = sfcprs / (8.314 * sfctmp) * 1.0e6
    rs_default = 1.0 / p.bp * cf
    no_light = apar <= 0.0

    fnf = jnp.minimum(foln / jnp.maximum(MPE, p.folnmx), 1.0)
    tc = tv - C.TFRZ
    ppf = 4.6 * apar
    j_et = ppf * p.qe25
    kc = p.kc25 * p.akc ** ((tc - 25.0) / 10.0)
    ko = p.ko25 * p.ako ** ((tc - 25.0) / 10.0)
    awc = kc * (1.0 + o2 / ko)
    cp = 0.5 * kc / ko * o2 * 0.21
    vcmx = (p.vcmx25
            / (1.0 + jnp.exp((-2.2e5 + 710.0 * (tc + C.TFRZ)) / (8.314 * (tc + C.TFRZ))))
            * fnf * btran * (p.avcmx ** ((tc - 25.0) / 10.0)))
    rlb = rb / cf

    c3 = p.c3psn

    def ci2ci(ci):
        """CI -> (FCI, RS, PSN) (contained CI2CI :5440-5470)."""
        wj = jnp.maximum(ci - cp, 0.0) * j_et / (ci + 2.0 * cp) * c3 + j_et * (1.0 - c3)
        wc = jnp.maximum(ci - cp, 0.0) * vcmx / (ci + awc) * c3 + vcmx * (1.0 - c3)
        we = 0.5 * vcmx * c3 + 4000.0 * vcmx * ci / sfcprs * (1.0 - c3)
        psn = jnp.minimum(jnp.minimum(wj, wc), we) * igs
        cs = jnp.maximum(co2 - 1.37 * rlb * sfcprs * psn, MPE)
        a = p.mp * psn * sfcprs * ea / (cs * ei) + p.bp
        b = (p.mp * psn * sfcprs / cs + p.bp) * rlb - 1.0
        cc = -rlb
        disc = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * cc, 0.0))
        q = sel(b >= 0.0, -0.5 * (b + disc), -0.5 * (b - disc))
        r1 = q / a
        r2 = cc / sel(jnp.abs(q) < 1e-20, 1e-20, q)
        rs = jnp.maximum(r1, r2)
        fci = jnp.maximum(cs - psn * sfcprs * 1.65 * rs, 0.0)
        return fci, rs, psn

    cierr = 5.0e-2

    def body(i, carry):
        # int32 `done` carry: Mosaic can't round-trip i1 loop state
        cihi, cilow, rs, psn, done = carry
        ci = 0.5 * (cihi + cilow)
        fci, rs_new, psn_new = ci2ci(ci)
        was_done = done != 0
        rs = sel(was_done, rs, rs_new)
        psn = sel(was_done, psn, psn_new)
        conv = ((cihi - cilow) <= cierr) | (jnp.abs(fci - ci) <= MPE)
        go_up = fci > ci
        stop = was_done | conv
        cilow = sel(stop, cilow, sel(go_up, ci, cilow))
        cihi = sel(stop, cihi, sel(go_up, cihi, ci))
        # latch via max, not select: a select with two splat operands
        # makes Mosaic infer a replicated layout it can't relayout to
        done = jnp.maximum(done, conv.astype(jnp.int32))
        return cihi, cilow, rs, psn, done

    cihi0 = 1.5 * co2
    cilow0 = jnp.zeros_like(co2)
    rs0 = rs_default / cf  # in s m2/umol units during iteration
    psn0 = jnp.zeros_like(co2)
    # data-dependent zero: a constant-splat int carry makes Mosaic pin
    # the loop layout as replicated, which the tiled body can't match
    done0 = (co2 * 0.0).astype(jnp.int32)
    _, _, rs, psn, _ = jax.lax.fori_loop(
        0, 20, body, (cihi0, cilow0, rs0, psn0, done0))

    rs = rs * cf
    rs = sel(no_light, rs_default, rs)
    psn = sel(no_light, 0.0, psn)
    return rs, psn


def calhum(sfctmp, sfcprs):
    """Saturation mixing ratio + derivative (CALHUM :5679-5705)."""
    a2, a3, a4 = 17.67, 273.15, 29.65
    elwv, e0, rv, eps = 2.501e6, 0.611, 461.0, 0.622
    a23m4 = a2 * (a3 - a4)
    es = e0 * jnp.exp(elwv / rv * (1.0 / a3 - 1.0 / sfctmp))
    sfcprsx = sfcprs * 1.0e-3
    q2sat = eps * es / (sfcprsx - es) * 1.0e3  # g/kg
    dqsdt2 = (q2sat / (1.0 + q2sat)) * a23m4 / (sfctmp - a4) ** 2
    return q2sat * 1.0e-3, dqsdt2


def canres(p, par, sfctmp, rcsoil, eah, sfcprs):
    """Jarvis canopy resistance (CANRES :5598-5677). Returns (rc, psn)."""
    q2 = 0.622 * eah / (sfcprs - 0.378 * eah)
    q2 = q2 / (1.0 + q2)
    q2sat, _ = calhum(sfctmp, sfcprs)
    ff = 2.0 * par / p.rgl
    rcs = jnp.maximum((ff + p.rsmin / p.rsmax) / (1.0 + ff), 0.0001)
    rct = jnp.maximum(1.0 - 0.0016 * (p.topt - sfctmp) ** 2, 0.0001)
    rcq = jnp.maximum(1.0 / (1.0 + p.hs * jnp.maximum(0.0, q2sat - q2)), 0.01)
    rc = p.rsmin / (rcs * rct * rcq * jnp.maximum(rcsoil, MPE))
    psn = jnp.full_like(rc, -999.99)
    return rc, psn
