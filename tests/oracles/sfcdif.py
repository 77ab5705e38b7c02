"""Scalar oracles: SFCDIF1 (module_sf_noahmplsm.F90:4061-4222),
SFCDIF2 (:4224-4423), RAGRB (:3960-4059), transliterated from the
Fortran text.  State carried across iterations is passed/returned
explicitly.  Test fixture only."""

import math

from . import GRAV, VKC, CPAIR


def sfcdif1(iter_, sfctmp, rhoair, h, qair, zlvl, zpd, z0m, z0h, ur,
            mpe, moz, mozsgn, fm, fh, fm2, fh2, fv):
    """SFCDIF1, iter_ is the Fortran 1-based ITER.
    Returns dict with updated state + cm/ch/fv/ch2."""
    mozold = moz
    tmpcm = math.log((zlvl - zpd) / z0m)
    tmpch = math.log((zlvl - zpd) / z0h)
    tmpcm2 = math.log((2.0 + z0m) / z0m)
    tmpch2 = math.log((2.0 + z0h) / z0h)

    if iter_ == 1:
        fv = 0.0
        moz = 0.0
        moz2 = 0.0
    else:
        tvir = (1.0 + 0.61 * qair) * sfctmp
        tmp1 = VKC * (GRAV / tvir) * h / (rhoair * CPAIR)
        if abs(tmp1) <= mpe:
            tmp1 = mpe
        mol = -1.0 * fv ** 3 / tmp1
        moz = min((zlvl - zpd) / mol, 1.0)
        moz2 = min((2.0 + z0h) / mol, 1.0)

    if mozold * moz < 0.0:
        mozsgn += 1
    if mozsgn >= 2:
        moz = 0.0
        fm = 0.0
        fh = 0.0
        moz2 = 0.0
        fm2 = 0.0
        fh2 = 0.0

    if moz < 0.0:
        tmp1 = (1.0 - 16.0 * moz) ** 0.25
        tmp2 = math.log((1.0 + tmp1 * tmp1) / 2.0)
        tmp3 = math.log((1.0 + tmp1) / 2.0)
        fmnew = 2.0 * tmp3 + tmp2 - 2.0 * math.atan(tmp1) + 1.5707963
        fhnew = 2 * tmp2
        tmp12 = (1.0 - 16.0 * moz2) ** 0.25
        tmp22 = math.log((1.0 + tmp12 * tmp12) / 2.0)
        tmp32 = math.log((1.0 + tmp12) / 2.0)
        fm2new = 2.0 * tmp32 + tmp22 - 2.0 * math.atan(tmp12) + 1.5707963
        fh2new = 2 * tmp22
    else:
        fmnew = -5.0 * moz
        fhnew = fmnew
        fm2new = -5.0 * moz2
        fh2new = fm2new

    if iter_ == 1:
        fm, fh, fm2, fh2 = fmnew, fhnew, fm2new, fh2new
    else:
        fm = 0.5 * (fm + fmnew)
        fh = 0.5 * (fh + fhnew)
        fm2 = 0.5 * (fm2 + fm2new)
        fh2 = 0.5 * (fh2 + fh2new)

    fh = min(fh, 0.9 * tmpch)
    fm = min(fm, 0.9 * tmpcm)
    fh2 = min(fh2, 0.9 * tmpch2)
    fm2 = min(fm2, 0.9 * tmpcm2)

    cmfm = tmpcm - fm
    chfh = tmpch - fh
    cm2fm2 = tmpcm2 - fm2
    ch2fh2 = tmpch2 - fh2
    if abs(cmfm) <= mpe:
        cmfm = mpe
    if abs(chfh) <= mpe:
        chfh = mpe
    if abs(cm2fm2) <= mpe:
        cm2fm2 = mpe
    if abs(ch2fh2) <= mpe:
        ch2fh2 = mpe
    cm = VKC * VKC / (cmfm * cmfm)
    ch = VKC * VKC / (cmfm * chfh)
    ch2 = VKC * VKC / (cm2fm2 * ch2fh2)

    fv = ur * math.sqrt(cm)
    ch2 = VKC * fv / ch2fh2

    return dict(moz=moz, mozsgn=mozsgn, fm=fm, fh=fh, fm2=fm2, fh2=fh2,
                fv=fv, cm=cm, ch=ch, ch2=ch2)


def sfcdif2(iter_, z0, thz0, thlm, sfcspd, czil, zlm,
            akms, akhs, rlmo, wstar2, ustar):
    """SFCDIF2 (Chen97), iter_ is the Fortran 1-based ITER.
    Returns (akms, akhs, rlmo, wstar2, ustar)."""
    WWST = 1.2
    WWST2 = WWST * WWST
    VKRM = 0.40
    EXCM = 0.001
    BETA = 1.0 / 270.0
    BTG = BETA * GRAV
    ELFC = VKRM * BTG
    WOLD = 0.15
    WNEW = 1.0 - WOLD
    PIHF = 3.14159265 / 2.0
    EPSU2 = 1.0e-4
    EPSUST = 0.07
    ZTMIN = -5.0
    ZTMAX = 1.0
    HPBL = 1000.0
    SQVISC = 258.2

    def pspmu(xx):
        return (-2.0 * math.log((xx + 1.0) * 0.5)
                - math.log((xx * xx + 1.0) * 0.5)
                + 2.0 * math.atan(xx) - PIHF)

    def pspms(yy):
        return 5.0 * yy

    def psphu(xx):
        return -2.0 * math.log((xx * xx + 1.0) * 0.5)

    def psphs(yy):
        return 5.0 * yy

    zilfc = -czil * VKRM * SQVISC
    zu = z0
    rdz = 1.0 / zlm
    cxch = EXCM * rdz
    dthv = thlm - thz0
    du2 = max(sfcspd * sfcspd, EPSU2)
    btgh = BTG * HPBL

    if iter_ == 1:
        if btgh * akhs * dthv != 0.0:
            wstar2 = WWST2 * abs(btgh * akhs * dthv) ** (2.0 / 3.0)
        else:
            wstar2 = 0.0
        ustar = max(math.sqrt(akms * math.sqrt(du2 + wstar2)), EPSUST)
        rlmo = ELFC * akhs * dthv / ustar ** 3

    zt = max(1.0e-6, math.exp(zilfc * math.sqrt(ustar * z0)) * z0)
    zslu = zlm + zu
    zslt = zlm + zt
    rlogu = math.log(zslu / zu)
    rlogt = math.log(zslt / zt)

    zetalt = max(zslt * rlmo, ZTMIN)
    rlmo = zetalt / zslt
    zetalu = zslu * rlmo
    zetau = zu * rlmo
    zetat = zt * rlmo

    if rlmo < 0.0:
        xlu = math.sqrt(math.sqrt(1.0 - 16.0 * zetalu))
        xlt = math.sqrt(math.sqrt(1.0 - 16.0 * zetalt))
        xu = math.sqrt(math.sqrt(1.0 - 16.0 * zetau))
        xt = math.sqrt(math.sqrt(1.0 - 16.0 * zetat))
        psmz = pspmu(xu)
        simm = pspmu(xlu) - psmz + rlogu
        pshz = psphu(xt)
        simh = psphu(xlt) - pshz + rlogt
    else:
        zetalu = min(zetalu, ZTMAX)
        zetalt = min(zetalt, ZTMAX)
        psmz = pspms(zetau)
        simm = pspms(zetalu) - psmz + rlogu
        pshz = psphs(zetat)
        simh = psphs(zetalt) - pshz + rlogt

    ustar = max(math.sqrt(akms * math.sqrt(du2 + wstar2)), EPSUST)
    zt = max(1.0e-6, math.exp(zilfc * math.sqrt(ustar * z0)) * z0)
    zslt = zlm + zt
    rlogt = math.log(zslt / zt)
    ustark = ustar * VKRM
    akms = max(ustark / simm, cxch)
    akhs = max(ustark / simh, cxch)

    if btgh * akhs * dthv != 0.0:
        wstar2 = WWST2 * abs(btgh * akhs * dthv) ** (2.0 / 3.0)
    else:
        wstar2 = 0.0
    rlmn = ELFC * akhs * dthv / ustar ** 3
    rlma = rlmo * WOLD + rlmn * WNEW
    rlmo = rlma

    return akms, akhs, rlmo, wstar2, ustar


def ragrb(iter_, vai, rhoair, hg, tah, zpd, z0mg, z0hg, hcan, uc, z0h,
          fv, cwp, dleaf, mpe, mozg, fhg):
    """RAGRB (:3960-4059), iter_ is Fortran 1-based ITER.
    Returns dict(mozg, fhg, ramg, rahg, rawg, rb)."""
    mozg_new = 0.0
    if iter_ > 1:
        tmp1 = VKC * (GRAV / tah) * hg / (rhoair * CPAIR)
        if abs(tmp1) <= mpe:
            tmp1 = mpe
        molg = -1.0 * fv ** 3 / tmp1
        mozg_new = min((zpd - z0mg) / molg, 1.0)
    mozg = mozg_new

    if mozg < 0.0:
        fhgnew = (1.0 - 15.0 * mozg) ** (-0.25)
    else:
        fhgnew = 1.0 + 4.7 * mozg
    if iter_ == 1:
        fhg = fhgnew
    else:
        fhg = 0.5 * (fhg + fhgnew)

    cwpc = (cwp * vai * hcan * fhg) ** 0.5
    tmp1 = math.exp(-cwpc * z0hg / hcan)
    tmp2 = math.exp(-cwpc * (z0h + zpd) / hcan)
    tmprah2 = hcan * math.exp(cwpc) / cwpc * (tmp1 - tmp2)

    kh = max(VKC * fv * (hcan - zpd), mpe)
    ramg = 0.0
    rahg = tmprah2 / kh
    rawg = rahg

    tmprb = cwpc * 50.0 / (1.0 - math.exp(-cwpc / 2.0))
    rb = tmprb * math.sqrt(dleaf / uc)
    return dict(mozg=mozg, fhg=fhg, ramg=ramg, rahg=rahg, rawg=rawg,
                rb=rb)
