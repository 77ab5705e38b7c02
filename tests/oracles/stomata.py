"""Scalar oracle: ESAT (module_sf_noahmplsm.F90:5272-5321), STOMATA
bisection (:5323-5470), CANRES (:5598-5677), CALHUM (:5679-5705),
transliterated from the Fortran text.  Test fixture only."""

import math

from . import TFRZ


def esat(t):
    """ESAT: t in Celsius; returns (esw, esi, desw, desi) in Pa."""
    A = (6.107799961, 4.436518521e-01, 1.428945805e-02, 2.650648471e-04,
         3.031240396e-06, 2.034080948e-08, 6.136820929e-11)
    B = (6.109177956, 5.034698970e-01, 1.886013408e-02, 4.176223716e-04,
         5.824720280e-06, 4.838803174e-08, 1.838826904e-10)
    C = (4.438099984e-01, 2.857002636e-02, 7.938054040e-04, 1.215215065e-05,
         1.036561403e-07, 3.532421810e-10, -7.090244804e-13)
    D = (5.030305237e-01, 3.773255020e-02, 1.267995369e-03, 2.477563108e-05,
         3.005693132e-07, 2.158542548e-09, 7.131097725e-12)

    def poly(c):
        r = c[6]
        for k in range(5, -1, -1):
            r = c[k] + t * r
        return 100.0 * r

    return poly(A), poly(B), poly(C), poly(D)


def stomata(apar, foln, tv, ei, ea, sfctmp, sfcprs, o2, co2, igs, btran,
            rb, mpe, c3psn, kc25, akc, ko25, ako, vcmx25, avcmx, bp, mp,
            qe25, folnmx):
    """STOMATA (:5323-5470): CI bisection, NITER=20, CIERR=5e-2.
    Returns (rs [s/m], psn)."""
    CIERR = 5e-2
    NITER = 20

    cf = sfcprs / (8.314 * sfctmp) * 1.0e06
    rs = 1.0 / bp * cf
    psn = 0.0
    if apar <= 0.0:
        return rs, psn

    fnf = min(foln / max(mpe, folnmx), 1.0)
    tc = tv - TFRZ
    ppf = 4.6 * apar
    j = ppf * qe25
    kc = kc25 * akc ** ((tc - 25.0) / 10.0)
    ko = ko25 * ako ** ((tc - 25.0) / 10.0)
    awc = kc * (1.0 + o2 / ko)
    cp = 0.5 * kc / ko * o2 * 0.21
    vcmx = (vcmx25
            / (1.0 + math.exp((-2.2e05 + 710.0 * (tc + TFRZ))
                              / (8.314 * (tc + TFRZ))))
            * fnf * btran * (avcmx ** ((tc - 25.0) / 10.0)))
    rlb = rb / cf

    def ci2ci(ci):
        wj = max(ci - cp, 0.0) * j / (ci + 2.0 * cp) * c3psn \
            + j * (1.0 - c3psn)
        wc = max(ci - cp, 0.0) * vcmx / (ci + awc) * c3psn \
            + vcmx * (1.0 - c3psn)
        we = 0.5 * vcmx * c3psn + 4000.0 * vcmx * ci / sfcprs * (1.0 - c3psn)
        psn_ = min(wj, wc, we) * igs
        cs = max(co2 - 1.37 * rlb * sfcprs * psn_, mpe)
        a = mp * psn_ * sfcprs * ea / (cs * ei) + bp
        b = (mp * psn_ * sfcprs / cs + bp) * rlb - 1.0
        c = -rlb
        if b >= 0.0:
            q = -0.5 * (b + math.sqrt(b * b - 4.0 * a * c))
        else:
            q = -0.5 * (b - math.sqrt(b * b - 4.0 * a * c))
        r1 = q / a
        r2 = c / q
        rs_ = max(r1, r2)
        fci = max(cs - psn_ * sfcprs * 1.65 * rs_, 0.0)
        return fci, rs_, psn_

    cihi = 1.5 * co2
    cilow = 0.0
    for _ in range(NITER):
        ci = 0.5 * (cihi + cilow)
        fci, rs, psn = ci2ci(ci)
        if ((cihi - cilow) <= CIERR) or abs(fci - ci) <= mpe:
            break
        elif fci > ci:
            cilow = ci
        else:
            cihi = ci

    return rs * cf, psn


def calhum(sfctmp, sfcprs):
    """CALHUM (:5679-5705). Returns (q2sat [g/g], dqsdt2)."""
    A2, A3, A4 = 17.67, 273.15, 29.65
    ELWV, E0, RV, EPSILON = 2.501e6, 0.611, 461.0, 0.622
    A23M4 = A2 * (A3 - A4)
    es = E0 * math.exp(ELWV / RV * (1.0 / A3 - 1.0 / sfctmp))
    sfcprsx = sfcprs * 1.0e-3
    q2sat = EPSILON * es / (sfcprsx - es)
    q2sat = q2sat * 1.0e3
    dqsdt2 = (q2sat / (1 + q2sat)) * A23M4 / (sfctmp - A4) ** 2
    q2sat = q2sat / 1.0e3
    return q2sat, dqsdt2


def canres(par, sfctmp, rcsoil, eah, sfcprs, rsmin, rsmax, topt, rgl, hs):
    """CANRES (:5598-5677). Returns rc."""
    q2 = 0.622 * eah / (sfcprs - 0.378 * eah)
    q2 = q2 / (1.0 + q2)
    q2sat, _ = calhum(sfctmp, sfcprs)
    ff = 2.0 * par / rgl
    rcs = max((ff + rsmin / rsmax) / (1.0 + ff), 0.0001)
    rct = max(1.0 - 0.0016 * ((topt - sfctmp) ** 2.0), 0.0001)
    rcq = max(1.0 / (1.0 + hs * max(0.0, q2sat - q2)), 0.01)
    rc = rsmin / (rcs * rct * rcq * rcsoil)
    return rc
