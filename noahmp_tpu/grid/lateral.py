"""MMF lateral groundwater flow (OPT_RUN=5): the 2D stencil component.

Reference: module_sf_noahmp_groundwater.F90 — WTABLE_mmf_noahmp
(:14-198), LATERALFLOW D8 stencil (:201-295), UPDATEWTD (:298-606);
init: GROUNDWATER_INIT (module_sf_noahmpdrv.F90:1286-1471) and
EQSMOISTURE (:1473-1526).

TPU-native design: the stencil is plain shifted-array arithmetic on the
(ny, nx) grid; under jit with a sharded y-axis XLA lowers the shifts to
collective-permute halo exchanges over ICI automatically — which also
FIXES the reference's tile-seam bug (the MPI version clamps the stencil
at tile edges and never halo-exchanges WTD; SURVEY §2.3 ⚠).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# per-soil-type lateral conductivity factor (:225 DATA KLATFACTOR)
KLATFACTOR = np.array([2., 3., 4., 10., 10., 12., 14., 20., 24., 28.,
                       40., 48., 2., 0., 10., 0., 20., 2., 2.],
                      dtype=np.float32)
FANGLE = 0.45508986  # (:229)


def lateralflow(wtd, klat, fdepth, topo, landmask, area, deltat,
                row0=0, ny_global=None, col0=0, nx_global=None):
    """D8 lateral flow (LATERALFLOW :201-295) on (ny, nx) arrays.

    ``klat`` = SATDK(isltyp) * KLATFACTOR(isltyp) per cell.  Returns
    QLAT (m per WTDDT step).  The outermost ring gets QLAT=0, matching
    the reference's interior-only loop (:254-262, its+1..ite-2 /
    jts+1..jte-2 in global coordinates).

    For multi-host blocks, pass arrays that include the 1-cell halo
    and give ``row0``/``col0`` (global indices of this block's first
    row/col, halo included) and ``ny_global``/``nx_global`` so the
    interior-ring test uses GLOBAL coordinates; the caller slices the
    halo ring off the result."""
    deep = wtd < -1.5
    fd = jnp.maximum(fdepth, 1e-6)
    kcell = jnp.where(
        fdepth > 0.0,
        jnp.where(deep, fdepth * klat * jnp.exp((wtd + 1.5) / fd),
                  klat * (wtd + 1.5 + fdepth)),
        0.0)
    head = topo + wtd

    def sh(a, dy, dx):
        """Neighbor value at offset (dy, dx), edge-clamped."""
        a = jnp.roll(a, (-dy, -dx), axis=(0, 1))
        return a

    q = jnp.zeros_like(wtd)
    for (dy, dx) in [(-1, 1), (-1, 0), (-1, -1), (0, 1), (0, -1),
                     (1, 1), (1, 0), (1, -1)]:
        w = 1.0 / np.sqrt(2.0) if (dy != 0 and dx != 0) else 1.0
        q = q + w * (sh(kcell, dy, dx) + kcell) * (sh(head, dy, dx) - head)

    qlat = FANGLE * q * deltat / jnp.maximum(area, 1.0)

    ny, nx = wtd.shape
    nyg = ny if ny_global is None else int(ny_global)
    nxg = nx if nx_global is None else int(nx_global)
    ii = row0 + jnp.arange(ny)[:, None]
    jj = col0 + jnp.arange(nx)[None, :]
    interior = (ii >= 1) & (ii <= nyg - 3) & (jj >= 1) & (jj <= nxg - 3)
    return jnp.where(interior & (landmask > 0), qlat, 0.0)


# ---------------------------------------------------------------------------
# UPDATEWTD — move TOTWATER into/out of the column (:298-606)
# ---------------------------------------------------------------------------

def _wtd_formula(smck, dzk, smceqk, z_iwtd, z_k, smcmax):
    return (smck * dzk - smceqk * z_iwtd + smcmax * z_k) / \
        jnp.maximum(smcmax - smceqk, 1e-9)


def updatewtd(cfg, p, totwater, wtd, smc, sh2o, smcwtd, smceq):
    """Vectorized UPDATEWTD for one column (vmapped by the caller).

    Returns (wtd, smc, sh2o, smcwtd, qspring).
    """
    nsoil = cfg.nsoil
    dzs = jnp.asarray(cfg.dzs, wtd.dtype)
    zsoil = jnp.asarray(cfg.zsoil, wtd.dtype)
    z0 = jnp.concatenate([jnp.zeros((1,), wtd.dtype), zsoil])  # z0[0]=0
    smcmax = p.smcmax
    psisat = -p.psisat  # reference uses PSISAT = -SATPSI here (:91)
    bexp = p.bexp
    sice = smc - sh2o

    smceqdeep = jnp.maximum(
        smcmax * (psisat / (psisat - dzs[-1])) ** (1.0 / bexp), 1.0e-4)

    # iwtd: deepest k in [1, nsoil-1] with wtd < zsoil(k), else 0 (:320-323)
    ks = jnp.arange(1, nsoil)
    hits = wtd < z0[ks]
    iwtd0 = jnp.where(jnp.any(hits), nsoil - 1 - jnp.argmax(hits[::-1]), 0)

    g = lambda a, i: jnp.take(a, i, mode="clip")

    def fill_up(k1, smc, wtd, tot):
        """Upward saturation fill, k from k1 down to 0 (:335-353)."""
        done = tot <= 0.0
        iwtd = k1 - 1
        for k in range(nsoil, -1, -1):  # 1-based layer ids + virtual 0
            on = (~done) & (k <= k1)
            wtd = jnp.where(on, z0[k], wtd)
            iwtd = jnp.where(on, k - 1, iwtd)
            if k == 0:
                done = done | on
                continue
            cap = dzs[k - 1] * (smcmax - smc[k - 1])
            fits = tot <= cap
            newsmc = jnp.minimum(smc[k - 1] + tot / dzs[k - 1], smcmax)
            wtd_f = jnp.minimum(
                _wtd_formula(newsmc, dzs[k - 1], smceq[k - 1],
                             z0[k - 1], z0[k], smcmax), z0[k - 1])
            smc = smc.at[k - 1].set(
                jnp.where(on, jnp.where(fits, newsmc, smcmax), smc[k - 1]))
            wtd = jnp.where(on & fits & (newsmc > smceq[k - 1]), wtd_f, wtd)
            tot = jnp.where(on, jnp.where(fits, 0.0, tot - cap), tot)
            done = done | (on & fits)
        return smc, wtd, tot

    # ---- rising branches ----
    def rise_p1():
        iwtd = iwtd0
        kwtd = iwtd + 1
        cap = g(dzs, kwtd - 1) * (smcmax - g(smc, kwtd - 1))
        fits = totwater <= cap
        newsmc = jnp.minimum(g(smc, kwtd - 1) + totwater / g(dzs, kwtd - 1),
                             smcmax)
        smc1 = smc.at[kwtd - 1].set(jnp.where(fits, newsmc, smcmax))
        wtd_f = jnp.minimum(
            _wtd_formula(newsmc, g(dzs, kwtd - 1), g(smceq, kwtd - 1),
                         g(z0, iwtd), g(z0, kwtd), smcmax), g(z0, iwtd))
        wtd1 = jnp.where(fits & (newsmc > g(smceq, kwtd - 1)), wtd_f, wtd)
        tot1 = jnp.where(fits, 0.0, totwater - cap)
        smc2, wtd2, tot2 = fill_up(iwtd, smc1, wtd1, tot1)
        use2 = ~fits
        smc_o = jnp.where(use2, smc2, smc1)
        wtd_o = jnp.where(use2, wtd2, wtd1)
        tot_o = jnp.where(use2, tot2, tot1)
        return smc_o, wtd_o, smcwtd, tot_o

    def rise_fict(tot_in, wtd_in):
        cap = (smcmax - smcwtd) * dzs[-1]
        fits = tot_in <= cap
        smcwtd1 = jnp.minimum(smcwtd + tot_in / dzs[-1], smcmax)
        wtd_f = jnp.minimum(
            _wtd_formula(smcwtd1, dzs[-1], smceqdeep, z0[nsoil],
                         z0[nsoil] - dzs[-1], smcmax), z0[nsoil])
        wtd1 = jnp.where(fits & (smcwtd1 > smceqdeep), wtd_f, wtd_in)
        tot1 = jnp.where(fits, 0.0, tot_in - cap)
        smcwtd_o = jnp.where(fits, smcwtd1, smcmax)
        smc2, wtd2, tot2 = fill_up(jnp.asarray(nsoil), smc, wtd1, tot1)
        use2 = ~fits
        return (jnp.where(use2, smc2, smc), jnp.where(use2, wtd2, wtd1),
                smcwtd_o, jnp.where(use2, tot2, tot1))

    def rise_p2():
        return rise_fict(totwater, wtd)

    def rise_p3():
        cap = (smcmax - smcwtd) * (z0[nsoil] - dzs[-1] - wtd)
        fits = totwater <= cap
        wtd1 = wtd + totwater / jnp.maximum(smcmax - smcwtd, 1e-9)
        smc_f, wtd_f, smcwtd_f, tot_f = rise_fict(
            totwater - cap, jnp.full_like(wtd, z0[nsoil] - dzs[-1]))
        return (jnp.where(fits, smc, smc_f),
                jnp.where(fits, wtd1, wtd_f),
                jnp.where(fits, smcwtd, smcwtd_f),
                jnp.where(fits, 0.0, tot_f))

    # ---- falling branches ----
    def fall_n1():
        iwtd = iwtd0
        tot = totwater
        smc_c, wtd_c = smc, wtd
        done = jnp.zeros((), bool)
        iwtd_c = iwtd
        for kw in range(1, nsoil + 1):  # 1-based candidate WT layers
            on = (~done) & (kw >= iwtd + 1)
            capdw = dzs[kw - 1] * (smc_c[kw - 1]
                                   - jnp.maximum(smceq[kw - 1], sice[kw - 1]))
            fits = -tot <= capdw
            newsmc = smc_c[kw - 1] + tot / dzs[kw - 1]
            wtd_f = _wtd_formula(newsmc, dzs[kw - 1], smceq[kw - 1],
                                 g(z0, iwtd_c), z0[kw], smcmax)
            above = newsmc > smceq[kw - 1]
            smc_c = smc_c.at[kw - 1].set(jnp.where(
                on, jnp.where(fits, newsmc,
                              jnp.where(capdw >= 0.0,
                                        smc_c[kw - 1] + capdw / dzs[kw - 1],
                                        smc_c[kw - 1])),
                smc_c[kw - 1]))
            wtd_c = jnp.where(on, jnp.where(fits,
                                            jnp.where(above, wtd_f, z0[kw]),
                                            z0[kw]), wtd_c)
            iwtd_c = jnp.where(on & (fits & ~above | ~fits), iwtd_c + 1, iwtd_c)
            tot = jnp.where(on, jnp.where(
                fits, 0.0, tot + jnp.maximum(capdw, 0.0)), tot)
            done = done | (on & fits)
        # leak into fictitious layer if still short (:513-536)
        need = (iwtd_c == nsoil) & (tot < 0.0)
        capdw = dzs[-1] * (smcwtd - smceqdeep)
        fits = -tot <= capdw
        smcwtd1 = smcwtd + tot / dzs[-1]
        wtd_f = jnp.maximum(
            _wtd_formula(smcwtd1, dzs[-1], smceqdeep, z0[nsoil],
                         z0[nsoil] - dzs[-1], smcmax),
            z0[nsoil] - dzs[-1])
        dzup = (smceqdeep - smcwtd1) * dzs[-1] / jnp.maximum(
            smcmax - smceqdeep, 1e-9)
        wtd2 = (z0[nsoil] - dzs[-1]) - dzup
        smcwtd_o = jnp.where(need,
                             jnp.where(fits, smcwtd1, smceqdeep), smcwtd)
        wtd_o = jnp.where(need, jnp.where(fits, wtd_f, wtd2), wtd_c)
        return smc_c, wtd_o, smcwtd_o, jnp.zeros_like(tot)

    def fall_n2():
        capdw = dzs[-1] * (smcwtd - smceqdeep)
        fits = -totwater <= capdw
        smcwtd1 = smcwtd + totwater / dzs[-1]
        wtd_f = jnp.maximum(
            _wtd_formula(smcwtd1, dzs[-1], smceqdeep, z0[nsoil],
                         z0[nsoil] - dzs[-1], smcmax),
            z0[nsoil] - dzs[-1])
        dzup = (smceqdeep - smcwtd1) * dzs[-1] / jnp.maximum(
            smcmax - smceqdeep, 1e-9)
        wtd2 = (z0[nsoil] - dzs[-1]) - dzup
        return (smc, jnp.where(fits, wtd_f, wtd2),
                jnp.where(fits, smcwtd1, smceqdeep),
                jnp.zeros_like(totwater))

    def fall_n3():
        wgpmid = jnp.maximum(
            smcmax * (psisat / (psisat - (z0[nsoil] - wtd))) ** (1.0 / bexp),
            1.0e-4)
        syielddw = jnp.maximum(smcmax - wgpmid, 1e-9)
        wtdold = wtd
        wtd1 = wtdold + totwater / syielddw
        smcwtd1 = (smcwtd * (z0[nsoil] - wtdold) + wgpmid * (wtdold - wtd1)) \
            / jnp.maximum(z0[nsoil] - wtd1, 1e-9)
        return smc, wtd1, smcwtd1, jnp.zeros_like(totwater)

    rising = totwater > 0.0
    falling = totwater < 0.0
    b1 = wtd >= z0[nsoil]
    b2 = (~b1) & (wtd >= z0[nsoil] - dzs[-1])

    p1 = rise_p1()
    p2 = rise_p2()
    p3 = rise_p3()
    n1 = fall_n1()
    n2 = fall_n2()
    n3 = fall_n3()

    def sel(i):
        rise = jnp.where(b1, p1[i], jnp.where(b2, p2[i], p3[i]))
        fall = jnp.where(b1, n1[i], jnp.where(b2, n2[i], n3[i]))
        base = (smc, wtd, smcwtd, jnp.zeros_like(totwater))[i]
        return jnp.where(rising, rise, jnp.where(falling, fall, base))

    smc_o, wtd_o, smcwtd_o, leftover = sel(0), sel(1), sel(2), sel(3)
    qspring = jnp.where(rising, leftover, 0.0)
    sh2o_o = smc_o - sice
    return wtd_o, smc_o, sh2o_o, smcwtd_o, qspring


# ---------------------------------------------------------------------------
# WTABLE orchestrator + accumulators (:14-198)
# ---------------------------------------------------------------------------

class MMFState(NamedTuple):
    """Per-column MMF groundwater fields
    (module_hrldas_noahmp_vars.F90:151-164)."""
    eqzwt: jnp.ndarray
    riverbed: jnp.ndarray
    rivercond: jnp.ndarray
    pexp: jnp.ndarray
    fdepth: jnp.ndarray
    area: jnp.ndarray
    topo: jnp.ndarray
    qrfs: jnp.ndarray
    qsprings: jnp.ndarray
    qslat: jnp.ndarray
    qrf: jnp.ndarray
    qspring: jnp.ndarray
    rech_acc: jnp.ndarray


def _ring(h, ny, nx, dtype):
    """Normalize one field's halo to the ring dict
    {top/bot: (nx+2,), left/right: (ny,)}.  A (2, nx) array is the
    rows-only legacy format (1-D row partition): left/right are
    physical domain edges, and the ring corners sit outside the global
    interior ring, so zeros are exact there."""
    if isinstance(h, dict):
        return {k: jnp.asarray(v, dtype) for k, v in h.items()}
    h = jnp.asarray(h, dtype)
    z1 = jnp.zeros((1,), dtype)
    return {"top": jnp.concatenate([z1, h[0], z1]),
            "bot": jnp.concatenate([z1, h[1], z1]),
            "left": jnp.zeros((ny,), dtype),
            "right": jnp.zeros((ny,), dtype)}


def _pad_ring(a2, ring):
    """(ny, nx) block + ring dict -> (ny+2, nx+2) haloed array."""
    mid = jnp.concatenate([ring["left"][:, None], a2,
                           ring["right"][:, None]], axis=1)
    return jnp.concatenate([ring["top"][None], mid,
                            ring["bot"][None]], axis=0)


def wtable_mmf(cfg, p, mmf: MMFState, grid_shape, landmask, smceq, wtd,
               smc, sh2o, smcwtd, deeprech, rech, wtddt_minutes=30.0,
               halo=None, row0=0, ny_global=None, col0=0,
               nx_global=None):
    """Per-STEPWTD groundwater update (WTABLE_mmf_noahmp :14-198).

    All column fields are flat (n,) with n = ny*nx; ``grid_shape`` is
    the static (ny, nx) used for the stencil.

    Multi-host blocks: ``halo`` maps each stencil field
    (wtd/klat/fdepth/topo/lm/area) to its 1-cell neighbour ring —
    either the rows-only legacy (2, nx) array (1-D row partition) or
    a dict {top/bot: (nx+2,) incl. corners, left/right: (ny,)} for a
    2-D npx x npy process grid (zeros at physical domain edges; those
    contributions are masked by the global interior ring).
    ``row0``/``col0`` + ``ny_global``/``nx_global`` place the block in
    global coordinates."""
    ny, nx = grid_shape
    deltat = wtddt_minutes * 60.0
    dzs = jnp.asarray(cfg.dzs, wtd.dtype)
    zsoil = jnp.asarray(cfg.zsoil, wtd.dtype)

    klat = p.dksat * jnp.take(jnp.asarray(KLATFACTOR),
                              jnp.clip(p.soiltyp - 1, 0, 18))
    lm2 = jnp.where(landmask, 1, -1).reshape(ny, nx)
    if halo is None:
        qlat2 = lateralflow(wtd.reshape(ny, nx), klat.reshape(ny, nx),
                            mmf.fdepth.reshape(ny, nx),
                            mmf.topo.reshape(ny, nx), lm2,
                            mmf.area.reshape(ny, nx), deltat)
    else:
        dt_ = wtd.dtype
        pad = lambda a2, h: _pad_ring(a2, _ring(h, ny, nx, dt_))
        qlat2 = lateralflow(
            pad(wtd.reshape(ny, nx), halo["wtd"]),
            pad(klat.reshape(ny, nx), halo["klat"]),
            pad(mmf.fdepth.reshape(ny, nx), halo["fdepth"]),
            pad(mmf.topo.reshape(ny, nx), halo["topo"]),
            pad(lm2.astype(dt_), halo["lm"]),
            pad(mmf.area.reshape(ny, nx), halo["area"]),
            deltat, row0=row0 - 1,
            ny_global=ny if ny_global is None else ny_global,
            col0=col0 - 1,
            nx_global=nx if nx_global is None else nx_global,
        )[1:-1, 1:-1]
    qlat = qlat2.reshape(-1)

    # river exchange (:114-129)
    rcond = jnp.where((wtd > mmf.riverbed) & (mmf.eqzwt > mmf.riverbed),
                      mmf.rivercond * jnp.exp(mmf.pexp * (wtd - mmf.eqzwt)),
                      mmf.rivercond)
    qrf = jnp.maximum(rcond * (wtd - mmf.riverbed) * deltat /
                      jnp.maximum(mmf.area, 1.0), 0.0)
    qrf = jnp.where(landmask, qrf, 0.0)

    # deep recharge when WT below fictitious layer (:147-161)
    deep = wtd < (zsoil[-1] - dzs[-1])
    ddz = jnp.where(deep, zsoil[-1] - wtd, 1.0)
    smcwtdmid = 0.5 * (smcwtd + p.smcmax)
    psisat = -p.psisat
    psi = psisat * (p.smcmax / jnp.maximum(smcwtd, 1e-4)) ** p.bexp
    wcnddeep = p.dksat * (smcwtdmid / p.smcmax) ** (2.0 * p.bexp + 3.0)
    wfluxdeep = -deltat * wcnddeep * ((psisat - psi) / ddz - 1.0)
    smcwtd_d = smcwtd + (deeprech - wfluxdeep) / ddz
    wplus = jnp.maximum(smcwtd_d - p.smcmax, 0.0) * ddz
    wminus = jnp.maximum(1.0e-4 - smcwtd_d, 0.0) * ddz
    smcwtd_d = jnp.clip(smcwtd_d, 1.0e-4, p.smcmax)
    wfluxdeep = wfluxdeep + wplus - wminus
    smcwtd = jnp.where(deep, smcwtd_d, smcwtd)
    deeprech_eff = jnp.where(deep, wfluxdeep, deeprech)

    totwater = qlat - qrf + deeprech_eff

    def one(p_col, tot, w, sm, sh, sw, se):
        return updatewtd(cfg, p_col, tot, w, sm, sh, sw, se)

    wtd_n, smc_n, sh2o_n, smcwtd_n, qspring = jax.vmap(one)(
        p, totwater, wtd, smc, sh2o, smcwtd, smceq)

    lm = landmask
    wtd = jnp.where(lm, wtd_n, wtd)
    smc = jnp.where(lm[:, None], smc_n, smc)
    sh2o = jnp.where(lm[:, None], sh2o_n, sh2o)
    smcwtd = jnp.where(lm, smcwtd_n, smcwtd)
    qspring = jnp.where(lm, qspring, 0.0)

    mmf_n = mmf._replace(
        qslat=mmf.qslat + qlat * 1.0e3,
        qrfs=mmf.qrfs + qrf * 1.0e3,
        qsprings=mmf.qsprings + qspring * 1.0e3,
        rech_acc=mmf.rech_acc + deeprech_eff * 1.0e3,
        qrf=qrf, qspring=qspring)
    deeprech_out = jnp.zeros_like(deeprech)
    return wtd, smc, sh2o, smcwtd, deeprech_out, mmf_n


# ---------------------------------------------------------------------------
# initialization (module_sf_noahmpdrv.F90:1286-1526)
# ---------------------------------------------------------------------------

def eqsmoisture(cfg, tables, soiltyp):
    """Per-layer equilibrium soil moisture by Newton iteration
    (EQSMOISTURE :1473-1526).  Host-side numpy; returns (n, nsoil)."""
    nsoil = cfg.nsoil
    zsoil = np.asarray(cfg.zsoil, np.float64)
    sv = np.clip(np.asarray(soiltyp) - 1, 0, tables.soil.ncat - 1)
    smcmax = tables.soil.smcmax[sv].astype(np.float64)
    dwsat = tables.soil.dwsat[sv].astype(np.float64)
    dksat = tables.soil.dksat[sv].astype(np.float64)
    bexp = tables.soil.bexp[sv].astype(np.float64)

    smceq = np.zeros((len(sv), nsoil), np.float32)
    for k in range(nsoil):
        if k == 0:
            ddz = -zsoil[1] * 0.5
        elif k < nsoil - 1:
            ddz = (zsoil[k - 1] - zsoil[k + 1]) * 0.5
        else:
            ddz = zsoil[k - 1] - zsoil[k]
        expon = bexp + 1.0
        aa = dwsat / ddz
        bb = dksat / smcmax ** expon
        smc = 0.5 * smcmax
        # water/bedrock categories can drive the Newton iterate NaN
        # (negative smc under a fractional power); those columns are
        # non-land — backfill the neutral default and silence the
        # benign vectorized-divide warnings
        with np.errstate(invalid="ignore", divide="ignore",
                         over="ignore"):
            for _ in range(100):
                func = (smc - smcmax) * aa + bb * smc ** expon
                dfunc = aa + bb * expon * smc ** bexp
                dx = func / dfunc
                smc = smc - dx
                if np.all(np.abs(dx) < 1.0e-6):
                    break
        smc = np.where(np.isfinite(smc), smc, 0.25)
        smceq[:, k] = np.clip(smc, 1.0e-4, smcmax * 0.99)
    return smceq


def groundwater_init(cfg, tables, soiltyp, vegtyp, isurban, landmask,
                     mmf: MMFState, grid_shape, wtd, smois, sh2o,
                     wtddt_minutes=30.0, halo=None, row0=0,
                     ny_global=None, col0=0, nx_global=None):
    """Equilibrium MMF groundwater initialization
    (GROUNDWATER_INIT, module_sf_noahmpdrv.F90:1286-1471).

    Host-side numpy (init-time only).  One LATERALFLOW + river-exchange
    evaluation sizes the deep flux; the deep soil moisture SMCWTD is
    then found per cell so that the Darcy flux below the column
    compensates QLAT-QRF (100-iteration Newton, :1402-1424), or from
    the closed-form/within-layer branches (:1429-1460).  Layers below
    the water table are saturated and WTD is re-diagnosed against the
    equilibrium profile.  Returns (wtd, smois, sh2o, smoiseq, smcwtd),
    all numpy.
    """
    ny, nx = grid_shape
    n = ny * nx
    nsoil = cfg.nsoil
    zsoil = np.asarray(cfg.zsoil, np.float64)
    dzs = np.asarray(cfg.dzs, np.float64)
    deltat = wtddt_minutes * 60.0

    wtd = np.asarray(wtd, np.float64).copy()
    smois = np.asarray(smois, np.float64).copy()
    sh2o = np.asarray(sh2o, np.float64).copy()

    sv = np.clip(np.asarray(soiltyp) - 1, 0, tables.soil.ncat - 1)
    bx = tables.soil.bexp[sv].astype(np.float64)
    smcmax = tables.soil.smcmax[sv].astype(np.float64)
    psisat = -tables.soil.psisat[sv].astype(np.float64)  # negative
    dksat = tables.soil.dksat[sv].astype(np.float64)
    urban = np.asarray(vegtyp) == isurban
    smcmax = np.where(urban, 0.45, smcmax)

    # one lateral-flow + river-exchange pass (:1349-1374); with a
    # multi-host row block, `halo` carries the neighbour rows (read
    # straight from the global setup files at init — no exchange)
    klat = (dksat * KLATFACTOR[np.clip(sv, 0, 18)]).astype(np.float32)
    lm2 = np.where(np.asarray(landmask), 1, -1).reshape(ny, nx)
    args2d = (jnp.asarray(wtd.reshape(ny, nx), jnp.float32),
              jnp.asarray(klat.reshape(ny, nx)),
              jnp.asarray(np.asarray(mmf.fdepth).reshape(ny, nx)),
              jnp.asarray(np.asarray(mmf.topo).reshape(ny, nx)),
              jnp.asarray(lm2),
              jnp.asarray(np.asarray(mmf.area).reshape(ny, nx)))
    if halo is None:
        qlat = np.asarray(lateralflow(*args2d, deltat)) \
            .reshape(-1).astype(np.float64)
    else:
        padded = [
            _pad_ring(a.astype(jnp.float32),
                      _ring(halo[k], ny, nx, jnp.float32))
            for a, k in zip(args2d, ("wtd", "klat", "fdepth", "topo",
                                     "lm", "area"))]
        qlat = np.asarray(lateralflow(
            *padded, deltat, row0=row0 - 1,
            ny_global=ny if ny_global is None else ny_global,
            col0=col0 - 1,
            nx_global=nx if nx_global is None else nx_global,
        ))[1:-1, 1:-1].reshape(-1).astype(np.float64)
    riverbed = np.asarray(mmf.riverbed, np.float64).reshape(-1)
    eqzwt = np.asarray(mmf.eqzwt, np.float64).reshape(-1)
    rcond = np.where((wtd > riverbed) & (eqzwt > riverbed),
                     np.asarray(mmf.rivercond, np.float64) *
                     np.exp(np.asarray(mmf.pexp, np.float64) * (wtd - eqzwt)),
                     np.asarray(mmf.rivercond, np.float64))
    qrf = np.where(np.asarray(landmask),
                   np.maximum(rcond * (wtd - riverbed) * deltat /
                              np.asarray(mmf.area, np.float64), 0.0), 0.0)

    smoiseq = eqsmoisture(cfg, tables, soiltyp).astype(np.float64)
    smcwtd = np.full(n, 0.0)

    valid = (bx > 0.0) & (smcmax > 0.0) & (-psisat > 0.0)
    # water/invalid cells are masked by `valid` below; keep their
    # intermediate math from spamming divide warnings
    err = np.errstate(divide="ignore", invalid="ignore")
    err.__enter__()
    zbot = zsoil[nsoil - 1]
    deep = wtd < zbot - dzs[nsoil - 1]
    mid = (~deep) & (wtd < zbot)

    # deep branch: Newton on SMC so the Darcy flux matches QLAT-QRF
    expon = 2.0 * bx + 3.0
    ddz = zbot - wtd
    ccn = psisat / np.where(np.abs(ddz) > 1e-9, ddz, 1e-9)
    flux = (qlat - qrf) / deltat
    smc = np.full(n, 0.5) * smcmax
    for _ in range(100):
        dd = (smc + smcmax) / (2.0 * smcmax)
        aa = -dksat * dd ** expon
        bbb = ccn * ((smcmax / np.maximum(smc, 1e-9)) ** bx - 1.0) + 1.0
        func = aa * bbb - flux
        dfunc = (-dksat * (expon / (2.0 * smcmax)) * dd ** (expon - 1.0) * bbb
                 + aa * ccn * (-bx) * smcmax ** bx
                 * np.maximum(smc, 1e-9) ** (-bx - 1.0))
        dx = func / np.where(np.abs(dfunc) > 1e-30, dfunc, 1e-30)
        upd = np.abs(dx) >= 1e-6
        smc = np.where(deep & valid & upd, smc - dx, smc)
    smcwtd = np.where(deep, np.maximum(smc, 1e-4), smcwtd)

    # mid branch: closed-form between soil bottom and one layer deeper
    smceqdeep = np.maximum(
        smcmax * (psisat / (psisat - dzs[nsoil - 1])) ** (1.0 / bx), 1e-4)
    smcwtd = np.where(mid, smcmax * (wtd - (zbot - dzs[nsoil - 1]))
                      + smceqdeep * (zbot - wtd), smcwtd)

    # within-layers branch: saturate below WTD, re-diagnose WTD (:1440-1460)
    inlay = (~deep) & (~mid)
    smcwtd = np.where(inlay, smcmax, smcwtd)
    zsoil0 = np.concatenate([[0.0], zsoil])  # zsoil0[k] = ZSOIL(K-1)
    done = np.zeros(n, bool)
    for k in range(nsoil - 1, 0, -1):  # K = NSOIL..2
        at = inlay & valid & ~done
        above_wt = wtd >= zsoil0[k]  # WTD >= ZSOIL(K-1)
        sat_here = at & above_wt
        frliq = sh2o[:, k] / np.maximum(smois[:, k], 1e-9)
        smois[:, k] = np.where(sat_here, smcmax, smois[:, k])
        sh2o[:, k] = np.where(sat_here, smcmax * frliq, sh2o[:, k])
        stop = at & ~above_wt
        low = smois[:, k] < smoiseq[:, k]
        # Fortran: WTD = ZSOIL(K) if dry, else
        # (SMOIS(K)*DZS(K) - SMCEQ(K)*ZSOIL(K-1) + SMCMAX*ZSOIL(K))
        #   / (SMCMAX - SMCEQ(K))    [:1449-1455]
        wtd = np.where(stop & low, zsoil[k], wtd)
        wtd = np.where(stop & ~low,
                       (smois[:, k] * dzs[k] - smoiseq[:, k] * zsoil0[k]
                        + smcmax * zsoil[k])
                       / np.where(np.abs(smcmax - smoiseq[:, k]) > 1e-9,
                                  smcmax - smoiseq[:, k], 1e-9),
                       wtd)
        done = done | stop

    # invalid-soil fallback (:1462-1466)
    smoiseq = np.where(valid[:, None], smoiseq, smcmax[:, None])
    smcwtd = np.where(valid, smcwtd, smcmax)
    wtd = np.where(valid, wtd, 0.0)
    err.__exit__(None, None, None)

    return (wtd.astype(np.float32), smois.astype(np.float32),
            sh2o.astype(np.float32), smoiseq.astype(np.float32),
            smcwtd.astype(np.float32))
