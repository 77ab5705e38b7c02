"""Full WRF-coupling surface-layer entry points: MYJSFC and SFCLAY.

The offline HRLDAS driver consumes only the SFCDIF3/SFCDIF4 slices of
the MYJ/YSU schemes (implemented in ``sfcdif34.py``); the *full*
modules exist in the reference to serve WRF atmosphere coupling:

- ``MYJSFC`` grid wrapper: ``phys/module_sf_myjsfc.F90:66-356``
  (profile prep, TKE-based PBL height, 2 m / 10 m supersaturation
  removal);
- MYJ ``SFCDIF`` (full land + sea scheme with the Janjic 1994 viscous
  sublayer over water and Charnock roughness): ``:359-1053``;
- ``MYJSFCINIT`` psi-table setup: ``:1056-1283``;
- ``SFCLAY``/``SFCLAY1D`` (revised MM5 scheme, 4 stability regimes,
  Beljaars convective velocity, optional AHW/Garratt ocean-flux and
  Chen-Zhang land-thermal-roughness options):
  ``phys/module_sf_sfclay.F90:14-240, :244-889``;
- ``sfclayinit``: ``:892-907``.

TPU-first design
----------------
* One batch axis over grid columns — WRF's i/j tile loops collapse
  into vectorized [n] math; the k axis is carried as a trailing
  [n, nz] profile axis (bottom-up orientation; the reference's
  NMM-style top-down flip is an indexing artifact, not physics).
* The reference samples its psi functions into 10001-entry (MYJ) /
  1001-entry (SFCLAY) lookup tables as a CPU optimization and then
  linearly interpolates; here the same analytic forms are evaluated
  directly on the VPU — no gather traffic, error bounded by the
  table's own O(dzeta^2) interpolation error
  (pinned in tests/test_golden_wrf_coupling.py).
* The MYJ ITRMX=5 fixed-point iteration runs as a ``lax.fori_loop``
  computing the sea (viscous-sublayer) and land (Zilitinkevich)
  branches for every point and merging by mask — branchless, so one
  XLA program serves any land/sea mix.
* First-timestep special cases (NTSD==1 branches) are a *static*
  ``first_step`` flag: two specialized executables, no traced
  conditionals.

Goldens: tests/test_golden_wrf_coupling.py pins every output against
scalar float64 transliterations of the reference's table path
(tests/oracles/wrf_coupling.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..utils.pytree import pytree_dataclass
from .common import sel
from .sfcdif34 import _psi_myj

# ---------------------------------------------------------------------------
# MODULE_SF_MYJSFC constants (module_sf_myjsfc.F90:23-57) and the
# MODULE_MODEL_CONSTANTS values they reference
# (util/module_model_constants.F:17-93, non-NMM branch).
# ---------------------------------------------------------------------------
ITRMX = 5
VKARMAN = 0.4
G = 9.81
R_D = 287.0
CP = 7.0 * R_D / 2.0
XLV = 2.5e6
P1000MB = 1.0e5
P608 = 461.6 / R_D - 1.0          # EP_1
CAPA = R_D / CP
ELOCP = 2.72e6 / CP
RCAP = 1.0 / CAPA
GOCP02 = G / CP * 2.0
GOCP10 = G / CP * 10.0
EPSU2 = 1.0e-6
EPSUST = 1.0e-9
EPSZT = 1.0e-28
A2S = 17.2693882
A3S = 273.16
A4S = 35.86
PQ0 = 379.90516
SEAFC = 0.98
PQ0SEA = PQ0 * SEAFC
EXCML = 1.0e-4
EXCMS = 1.0e-4
QVISC = 2.1e-5
RIC = 0.505
SQVISC = 258.2
TVISC = 2.1e-5
USTC = 0.7
USTR = 0.225
VISC = 1.5e-5
FH = 1.01
WWST = 1.2
WWST2 = WWST * WWST
ZTFC = 1.0
CZIV = 0.35 * 30.0                # SMALL*GLKBS
GRRS = 10.0 / 30.0                # GLKBR/GLKBS
RTVISC = 1.0 / TVISC
RVISC = 1.0 / VISC
RQVISC = 1.0 / QVISC
ZQRZT = 0.84 / 0.84               # SQSC/SQPR
FZQ1 = RTVISC * QVISC * ZQRZT
FZQ2 = RTVISC * QVISC * ZQRZT
FZT1 = RVISC * TVISC * 0.84       # *SQPR
FZT2 = CZIV * GRRS * TVISC * 0.84
FZU1 = CZIV * VISC
USTFC = 0.018 / G
EPSQ2 = 0.2                       # module_model_constants.F:89
CZETMAX = 10.0
FH01 = 1.0
FH02 = 1.0
# psi-argument range (MYJSFCINIT :1181-1186; land and sea use the same
# [-5, 1] range so PSIM1/PSIH1 == PSIM2/PSIH2)
ZTMIN = -5.0
ZTMAX = 1.0 - 1.0e-6              # ZTMAX - EPS (:1279-1280)


@pytree_dataclass
class MYJSfcState:
    """Per-point INOUT surface-layer state carried between MYJSFC calls
    (the INTENT(INOUT) list of module_sf_myjsfc.F90:110-117)."""
    ustar: jnp.ndarray
    znt: jnp.ndarray       # Z0 (sea points evolve it via Charnock)
    thz0: jnp.ndarray
    qz0: jnp.ndarray
    uz0: jnp.ndarray
    vz0: jnp.ndarray
    akhs: jnp.ndarray
    akms: jnp.ndarray
    qsfc: jnp.ndarray      # QS: prognostic over land, diagnosed over sea
    rmol: jnp.ndarray      # 1/Monin-Obukhov length


def myjsfc_init(z0base, restart=False):
    """MYJSFCINIT equivalent (module_sf_myjsfc.F90:1056-1165), non-NMM
    path: LOWLYR=1 (sigma mode) is implicit in the bottom-up layout;
    cold starts set USTAR=0.1.  The psi tables the Fortran builds here
    are evaluated analytically at use sites instead."""
    z0base = jnp.asarray(z0base)
    z = jnp.zeros_like(z0base)
    ustar = z + (0.1 if not restart else 0.1)
    return MYJSfcState(ustar=ustar, znt=z0base, thz0=z, qz0=z, uz0=z,
                       vz0=z, akhs=z, akms=z, qsfc=z, rmol=z)


def _myj_sfcdif(first_step, seamask, ths, qs, psfc, tz0, tsk, pblh,
                wetm, z0base, ulow, vlow, tlow, thlow, thelow, qlow,
                cwmlow, zsl, plow, ustar, z0, uz0, vz0, thz0, qz0,
                akms, akhs):
    """Full MYJ SFCDIF (module_sf_myjsfc.F90:359-1053): sea branch with
    the Janjic viscous sublayer + Charnock Z0, land branch with the
    Zilitinkevich thermal roughness, ITRMX=5 fixed-point iterations,
    then the 2 m / 10 m diagnostic block and WRF driver arrays.

    All arguments are [n] arrays; ``first_step`` is static.
    Returns (state_updates, diags) dicts.
    """
    sea = seamask > 0.5
    rdz = 1.0 / zsl
    cxchl = EXCML * rdz
    cxchs = EXCMS * rdz
    btgx = G / thlow
    elfc = VKARMAN * btgx
    btgh = btgx * jnp.maximum(pblh, 1000.0)

    # --- land-branch loop invariants (:645-717) ---
    qs0 = sel(jnp.logical_and(jnp.asarray(first_step), ~sea), qlow, qs)
    thz0_l = ths
    qz0_l = qs0
    zu_l = z0
    tem_l = (tlow + tz0) * 0.5
    thm_l = (thelow + thz0_l) * 0.5
    a_l = thm_l * P608
    b_l = (ELOCP / tem_l - 1.0 - P608) * thm_l
    dthv_l = ((thelow - thz0_l) * ((qlow + qz0_l + cwmlow) * (0.5 * P608) + 1.0)
              + (qlow - qz0_l + cwmlow) * a_l + cwmlow * b_l)
    du2_l = jnp.maximum(ulow ** 2 + vlow ** 2, EPSU2)
    rib_l = btgx * dthv_l * zsl / du2_l
    zilfc = -0.1 * VKARMAN * SQVISC     # CZIL=0.1 (:692)
    zzil = sel(dthv_l > 0.0,
               sel(rib_l < RIC,
                   zilfc * (1.0 + (rib_l / RIC) ** 2 * CZETMAX),
                   zilfc * (1.0 + CZETMAX)),
               zilfc)
    zslu_l = zsl + zu_l
    rzsu_l = zslu_l / zu_l
    rlogu_l = jnp.log(rzsu_l)
    zslt_l = zsl + zu_l                 # u,v,t same level (:684)

    zeros = jnp.zeros_like(zsl)
    carry0 = dict(ustar=ustar, akms=akms, akhs=akhs, z0=z0, uz0=uz0,
                  vz0=vz0, thz0=thz0, qz0=qz0, qs=qs0, zu=z0, zt=z0,
                  psmz=zeros, pshz=zeros, rlmo=zeros, ustark=zeros,
                  wstar2=zeros, dthv=dthv_l, du2=du2_l, rib=rib_l)

    def body(_, c):
        # ================= SEA branch (:659-636 region) ==============
        z0_sea = jnp.maximum(USTFC * c["ustar"] ** 2, 1.59e-5)
        r1 = c["ustar"] < USTR
        r2 = jnp.logical_and(c["ustar"] >= USTR, c["ustar"] < USTC)
        if first_step:
            akms_e = sel(r1, cxchs, c["akms"])
            akhs_e = sel(r1, cxchs, c["akhs"])
            qs_sea = sel(r1, qlow, c["qs"])
        else:
            akms_e, akhs_e, qs_sea = c["akms"], c["akhs"], c["qs"]
        # regime 1: full viscous sublayer
        zu1 = FZU1 * jnp.sqrt(jnp.sqrt(z0_sea * c["ustar"] * RVISC)) / c["ustar"]
        wght = akms_e * zu1 * RVISC
        rwgh = wght / (wght + 1.0)
        uz0_1 = (ulow * rwgh + c["uz0"]) * 0.5
        vz0_1 = (vlow * rwgh + c["vz0"]) * 0.5
        zt1 = FZT1 * zu1
        zq1 = FZQ1 * zt1
        wghtt1 = akhs_e * zt1 * RTVISC
        wghtq1 = akhs_e * zq1 * RQVISC
        # regime 2: thermal sublayer only
        zt2 = FZT2 * jnp.sqrt(jnp.sqrt(z0_sea * c["ustar"] * RVISC)) / c["ustar"]
        zq2 = FZQ2 * zt2
        wghtt2 = akhs_e * zt2 * RTVISC
        wghtq2 = akhs_e * zq2 * RQVISC
        if first_step:
            thz0_1 = (wghtt1 * thlow + ths) / (wghtt1 + 1.0)
            qz0_1 = (wghtq1 * qlow + qs_sea) / (wghtq1 + 1.0)
            thz0_2 = (wghtt2 * thlow + ths) / (wghtt2 + 1.0)
            qz0_2 = (wghtq2 * qlow + qs_sea) / (wghtq2 + 1.0)
        else:
            thz0_1 = ((wghtt1 * thlow + ths) / (wghtt1 + 1.0) + c["thz0"]) * 0.5
            qz0_1 = ((wghtq1 * qlow + qs_sea) / (wghtq1 + 1.0) + c["qz0"]) * 0.5
            thz0_2 = ((wghtt2 * thlow + ths) / (wghtt2 + 1.0) + c["thz0"]) * 0.5
            qz0_2 = ((wghtq2 * qlow + qs_sea) / (wghtq2 + 1.0) + c["qz0"]) * 0.5
        zu_s = sel(r1, zu1, z0_sea)
        zt_s = sel(r1, zt1, sel(r2, zt2, z0_sea))
        uz0_s = sel(r1, uz0_1, 0.0)
        vz0_s = sel(r1, vz0_1, 0.0)
        thz0_s = sel(r1, thz0_1, sel(r2, thz0_2, ths))
        qz0_s = sel(r1, qz0_1, sel(r2, qz0_2, qs_sea))
        tem = (tlow + tz0) * 0.5
        thm = (thelow + thz0_s) * 0.5
        a = thm * P608
        b = (ELOCP / tem - 1.0 - P608) * thm
        dthv_s = ((thelow - thz0_s) * ((qlow + qz0_s + cwmlow) * (0.5 * P608) + 1.0)
                  + (qlow - qz0_s + cwmlow) * a + cwmlow * b)
        du2_s = jnp.maximum((ulow - uz0_s) ** 2 + (vlow - vz0_s) ** 2, EPSU2)
        rib_s = btgx * dthv_s * zsl / du2_s
        zslu_s = zsl + zu_s
        zslt_s = zsl + zt_s
        rzsu_s = zslu_s / zu_s
        rzst_s = zslt_s / zt_s
        rlogu_s = jnp.log(rzsu_s)
        rlogt_s = jnp.log(rzst_s)
        rlmo_s = elfc * akhs_e * dthv_s / c["ustar"] ** 3
        zetalu = jnp.clip(zslu_s * rlmo_s, ZTMIN, ZTMAX)
        zetalt = jnp.clip(zslt_s * rlmo_s, ZTMIN, ZTMAX)
        zetau = jnp.clip(zu_s * rlmo_s, ZTMIN / rzsu_s, ZTMAX / rzsu_s)
        zetat = jnp.clip(zt_s * rlmo_s, ZTMIN / rzst_s, ZTMAX / rzst_s)
        psmz_s, _ = _psi_myj(zetau)
        psmzl, _ = _psi_myj(zetalu)
        _, pshz_s = _psi_myj(zetat)
        _, pshzl = _psi_myj(zetalt)
        simm_s = psmzl - psmz_s + rlogu_s
        simh_s = (pshzl - pshz_s + rlogt_s) * FH01
        ustark_s = c["ustar"] * VKARMAN
        akms_s = jnp.maximum(ustark_s / simm_s, cxchs)
        akhs_s = jnp.maximum(ustark_s / simh_s, cxchs)
        wstar2_s = sel(dthv_s <= 0.0,
                       WWST2 * jnp.abs(btgh * akhs_s * dthv_s) ** (2.0 / 3.0),
                       0.0)
        ustar_s = jnp.maximum(jnp.sqrt(akms_s * jnp.sqrt(du2_s + wstar2_s)),
                              EPSUST)

        # ================= LAND branch (:719-805) ====================
        zt_ln = jnp.maximum(
            jnp.exp(zzil * jnp.sqrt(c["ustar"] * z0base)) * z0base, EPSZT)
        rzst_ln = zslt_l / zt_ln
        rlogt_ln = jnp.log(rzst_ln)
        rlmo_ln = elfc * c["akhs"] * dthv_l / c["ustar"] ** 3
        zetalu_ln = jnp.clip(zslu_l * rlmo_ln, ZTMIN, ZTMAX)
        zetalt_ln = jnp.clip(zslt_l * rlmo_ln, ZTMIN, ZTMAX)
        zetau_ln = jnp.clip(zu_l * rlmo_ln, ZTMIN / rzsu_l, ZTMAX / rzsu_l)
        zetat_ln = jnp.clip(zt_ln * rlmo_ln, ZTMIN / rzst_ln, ZTMAX / rzst_ln)
        psmz_ln, _ = _psi_myj(zetau_ln)
        psmzl_ln, _ = _psi_myj(zetalu_ln)
        _, pshz_ln = _psi_myj(zetat_ln)
        _, pshzl_ln = _psi_myj(zetalt_ln)
        simm_ln = psmzl_ln - psmz_ln + rlogu_l
        simh_ln = (pshzl_ln - pshz_ln + rlogt_ln) * FH02
        ustark_ln = c["ustar"] * VKARMAN
        akms_ln = jnp.maximum(ustark_ln / simm_ln, cxchl)
        akhs_ln = jnp.maximum(ustark_ln / simh_ln, cxchl)
        wstar2_ln = sel(dthv_l <= 0.0,
                        WWST2 * jnp.abs(btgh * akhs_ln * dthv_l) ** (2.0 / 3.0),
                        0.0)
        ustar_ln = jnp.maximum(jnp.sqrt(akms_ln * jnp.sqrt(du2_l + wstar2_ln)),
                               EPSUST)

        # ====================== merge by mask ========================
        def m(s, ln):
            return sel(sea, s, ln)
        return dict(
            ustar=m(ustar_s, ustar_ln), akms=m(akms_s, akms_ln),
            akhs=m(akhs_s, akhs_ln), z0=m(z0_sea, c["z0"]),
            uz0=m(uz0_s, 0.0), vz0=m(vz0_s, 0.0),
            thz0=m(thz0_s, thz0_l), qz0=m(qz0_s, qz0_l),
            qs=m(qs_sea, c["qs"]), zu=m(zu_s, zu_l), zt=m(zt_s, zt_ln),
            psmz=m(psmz_s, psmz_ln), pshz=m(pshz_s, pshz_ln),
            rlmo=m(rlmo_s, rlmo_ln), ustark=m(ustark_s, ustark_ln),
            wstar2=m(wstar2_s, wstar2_ln), dthv=m(dthv_s, dthv_l),
            du2=m(du2_s, du2_l), rib=m(rib_s, rib_l))

    c = lax.fori_loop(0, ITRMX, body, carry0)

    # -------- diagnostics block (:820-1005) --------
    umflx = c["akms"] * (ulow - c["uz0"])
    vmflx = c["akms"] * (vlow - c["vz0"])
    hsflx = c["akhs"] * (thlow - c["thz0"])
    hlflx = c["akhs"] * (qlow - c["qz0"])
    zu10 = c["zu"] + 10.0
    zt02 = c["zt"] + 2.0
    zt10 = c["zt"] + 10.0
    rlnu10 = jnp.log(zu10 / c["zu"])
    rlnt02 = jnp.log(zt02 / c["zt"])
    rlnt10 = jnp.log(zt10 / c["zt"])
    ztau10 = jnp.clip(zu10 * c["rlmo"], ZTMIN, ZTMAX)
    ztat02 = jnp.clip(zt02 * c["rlmo"], ZTMIN, ZTMAX)
    ztat10 = jnp.clip(zt10 * c["rlmo"], ZTMIN, ZTMAX)
    psm10, _ = _psi_myj(ztau10)
    _, psh02 = _psi_myj(ztat02)
    _, psh10 = _psi_myj(ztat10)
    simm10 = psm10 - c["psmz"] + rlnu10
    simh02 = (psh02 - c["pshz"] + rlnt02) * FH01   # FH01==FH02==1
    simh10 = (psh10 - c["pshz"] + rlnt10) * FH01
    cxch = sel(sea, cxchs, cxchl)
    akms10 = jnp.maximum(c["ustark"] / simm10, cxch)
    akhs02 = jnp.maximum(c["ustark"] / simh02, cxch)
    akhs10 = jnp.maximum(c["ustark"] / simh10, cxch)
    u10 = umflx / akms10 + c["uz0"]
    v10 = vmflx / akms10 + c["vz0"]
    th02 = hsflx / akhs02 + c["thz0"]
    thz0v, qz0v = c["thz0"], c["qz0"]
    bad02 = jnp.logical_or(
        jnp.logical_and(thlow > thz0v,
                        jnp.logical_or(th02 < thz0v, th02 > thlow)),
        jnp.logical_and(thlow < thz0v,
                        jnp.logical_or(th02 > thz0v, th02 < thlow)))
    th02 = sel(bad02, thz0v + 2.0 * rdz * (thlow - thz0v), th02)
    th10 = hsflx / akhs10 + thz0v
    bad10 = jnp.logical_or(
        jnp.logical_and(thlow > thz0v,
                        jnp.logical_or(th10 < thz0v, th10 > thlow)),
        jnp.logical_and(thlow < thz0v,
                        jnp.logical_or(th10 > thz0v, th10 < thlow)))
    th10 = sel(bad10, thz0v + 10.0 * rdz * (thlow - thz0v), th10)
    q02 = hlflx / akhs02 + qz0v
    q10 = hlflx / akhs10 + qz0v
    pshltr = psfc * jnp.exp(-0.068283 / tlow)

    # "equivalent" shelter Z0 for land 10-m winds (:939-975)
    zuuz = jnp.minimum(c["zu"] * 0.50, 0.18)
    zu_e = jnp.maximum(c["zu"] * 0.35, zuuz)
    zu10_e = zu_e + 10.0
    rlnu10_e = jnp.log(zu10_e / zu_e)
    ztau10_e = jnp.clip(zu10_e * c["rlmo"], ZTMIN, ZTMAX)
    psm10_e, _ = _psi_myj(ztau10_e)
    simm10_e = psm10_e - c["psmz"] + rlnu10_e
    ekms10 = jnp.maximum(c["ustark"] / simm10_e, cxchl)
    u10 = sel(sea, u10, umflx / ekms10 + c["uz0"])
    v10 = sel(sea, v10, vmflx / ekms10 + c["vz0"])

    # WRF driver arrays (:981-1005)
    rlow = plow / (R_D * tlow)
    hfx = -rlow * CP * hsflx
    qfx = -rlow * hlflx * wetm
    qgh = ((1.0 - seamask) * PQ0 + seamask * PQ0SEA) / plow * jnp.exp(
        A2S * (tlow - A3S) / (tlow - A4S))
    qgh = qgh / (1.0 - qgh)
    qs_sea_diag = PQ0SEA / psfc * jnp.exp(A2S * (tsk - A3S) / (tsk - A4S))
    qs_sea_diag = qs_sea_diag / (1.0 - qs_sea_diag)
    qs_out = sel(sea, qs_sea_diag, c["qs"])

    state_updates = dict(ustar=c["ustar"], znt=c["z0"], thz0=c["thz0"],
                         qz0=c["qz0"], uz0=c["uz0"], vz0=c["vz0"],
                         akhs=c["akhs"], akms=c["akms"], qsfc=qs_out,
                         rmol=c["rlmo"])
    diags = dict(
        rib=c["rib"], ct=jnp.zeros_like(zsl),
        chs=c["akhs"], chs2=akhs02, cqs2=akhs02,
        hfx=hfx, qfx=qfx, flx_lh=XLV * qfx,
        flhc=rlow * CP * c["akhs"], flqc=rlow * c["akhs"] * wetm,
        qgh=qgh, cpm=CP * (1.0 + 0.8 * qlow),
        u10=u10, v10=v10, th02=th02, th10=th10, q02=q02, q10=q10,
        pshltr=pshltr)
    return state_updates, diags


def myjsfc(state, first_step, *, dz, pmid, pint, th, t, qv, qc,
           u, v, q2, tsk, xland, mavail, z0base):
    """MYJSFC grid driver (module_sf_myjsfc.F90:66-356) over a batch of
    columns.  Profile arrays are [n, nz] bottom-up (level 0 = lowest);
    ``pint`` is [n, nz+1] with the surface at index 0; ``q2`` is TKE
    (the Fortran's Q2K = 2*Q2, :245).  ``first_step`` (NTSD==1) is a
    static Python bool.

    Returns ``(new_state, diags)``; diags include PBLH, RIB, the
    exchange coefficients/fluxes, and the de-saturated 2 m / 10 m
    shelter diagnostics (:321-348).
    """
    nz = dz.shape[1]
    psfc = pint[:, 0]
    seamask = xland - 1.0
    thsk = tsk / (psfc / P1000MB) ** CAPA
    apesfc = (psfc / P1000MB) ** CAPA

    ratiomx = qv[:, 0]
    qlow = ratiomx / (1.0 + ratiomx)
    cwmlow = qc[:, 0]
    tlow = t[:, 0]
    thlow = th[:, 0]
    thelow = (cwmlow * (-ELOCP / tlow) + 1.0) * thlow
    ulow = u[:, 0]
    vlow = v[:, 0]
    plow = pmid[:, 0]
    zsl = dz[:, 0] * 0.5

    # TKE-based PBL height (:261-277): first level above the lowest
    # whose Q2K=2*TKE falls below EPSQ2*FH; default = domain top.
    zint_top = jnp.cumsum(dz, axis=1)          # top interface heights AGL
    q2k = 2.0 * q2
    mask = q2k[:, 1:] <= EPSQ2 * FH
    first = jnp.argmax(mask, axis=1) + 1
    lpbl = jnp.where(jnp.any(mask, axis=1), first, nz - 1)
    pblh = jnp.take_along_axis(zint_top, lpbl[:, None], axis=1)[:, 0]

    ustar0 = jnp.full_like(tsk, 0.1) if first_step else state.ustar
    tz0 = tsk if first_step else state.thz0 * apesfc

    upd, diags = _myj_sfcdif(
        first_step, seamask, thsk, state.qsfc, psfc, tz0, tsk, pblh,
        mavail, z0base, ulow, vlow, tlow, thlow, thelow, qlow,
        cwmlow, zsl, plow, ustar0, state.znt, state.uz0, state.vz0,
        state.thz0, state.qz0, state.akms, state.akhs)

    # supersaturation removal at 2 m and 10 m (:321-348)
    tshltr = diags["th02"]
    th10 = diags["th10"]
    rapa02 = apesfc - GOCP02 / tshltr
    rapa10 = apesfc - GOCP10 / th10
    t02p = tshltr * rapa02
    t10p = th10 * rapa10
    p02p = rapa02 ** RCAP * P1000MB
    p10p = rapa10 ** RCAP * P1000MB
    qs02 = PQ0 / p02p * jnp.exp(A2S * (t02p - A3S) / (t02p - A4S))
    qs10 = PQ0 / p10p * jnp.exp(A2S * (t10p - A3S) / (t10p - A4S))
    qshltr = jnp.minimum(diags["q02"], qs02)
    q10 = jnp.minimum(diags["q10"], qs10)

    diags = dict(diags, pblh=pblh, tshltr=tshltr, th02=tshltr,
                 t02=tshltr * apesfc, qshltr=qshltr, q10=q10,
                 q02=qshltr / (1.0 - qshltr))
    new_state = MYJSfcState(**upd)
    return new_state, diags


# ===========================================================================
# SFCLAY (revised MM5 surface layer), module_sf_sfclay.F90
# ===========================================================================
VCONVC = 1.0       # :5
CZO = 0.0185       # :6
OZO = 1.59e-5      # :7
XKA = 2.4e-5       # :261
PRT = 1.0          # :262
SVP1, SVP2, SVP3, SVPT0 = 0.6112, 17.67, 29.65, 273.15
EP_1 = 461.6 / R_D - 1.0
EP_2 = R_D / 461.6
KARMAN = 0.4
ROVCP = R_D / CP


def _psi_sfclay_unstable(zol):
    """sfclayinit's PSIMTB/PSIHTB Paulson/Dyer forms
    (module_sf_sfclay.F90:892-907), evaluated analytically."""
    from .common import atan_tpu
    x = jnp.sqrt(jnp.sqrt(1.0 - 16.0 * zol))
    psim = (2.0 * jnp.log(0.5 * (1.0 + x))
            + jnp.log(0.5 * (1.0 + x * x))
            - 2.0 * atan_tpu(x) + 2.0 * atan_tpu(jnp.ones_like(x)))
    y = jnp.sqrt(1.0 - 16.0 * zol)
    psih = 2.0 * jnp.log(0.5 * (1.0 + y))
    return psim, psih


def sfclay(ux, vx, t1d, qv1d, p1d, dz8w1d, psfcpa, tsk, xland, mavail,
           pblh, dx, znt, ust, mol, rmol, zol, qsfc, hfx, qfx, ustm,
           *, isfflx=1, isftcflx=0, iz0tlnd=0, scm_force_flux=False):
    """SFCLAY1D (module_sf_sfclay.F90:244-889) over a batch of columns
    (the SFCLAY i/j wrapper :14-240 collapses into the batch axis; pass
    level-1 slices of the 3-D fields).

    INOUT carries: znt, ust, mol, rmol, zol, qsfc, hfx, qfx, ustm
    (prior-step fluxes feed the Beljaars convective velocity, :476-489).
    Option flags are static ints matching the Fortran optionals.
    Returns a dict of every output the WRF driver consumes, including
    the new carries.
    """
    psfc_cb = psfcpa / 1000.0
    tgdsa = tsk
    thgb = tsk * (P1000MB / psfcpa) ** ROVCP
    pl = p1d / 1000.0
    scr3 = t1d
    thcon = (P1000MB * 0.001 / pl) ** ROVCP
    thx = scr3 * thcon
    qx = qv1d
    tvcon = 1.0 + EP_1 * qx
    thvx = thx * tvcon
    scr4 = scr3 * tvcon
    cpm = CP * (1.0 + 0.8 * qx)

    e1 = SVP1 * jnp.exp(SVP2 * (tgdsa - SVPT0) / (tgdsa - SVP3))
    qsfc = sel(jnp.logical_or(xland > 1.5, qsfc <= 0.0),
               EP_2 * e1 / (psfc_cb - e1), qsfc)
    e1l = SVP1 * jnp.exp(SVP2 * (t1d - SVPT0) / (t1d - SVP3))
    qgh = EP_2 * e1l / (pl - e1l)

    rhox = psfc_cb * 1000.0 / (R_D * scr4)
    za = 0.5 * dz8w1d
    govrth = G / thx

    gz1oz0 = jnp.log(za / znt)
    gz2oz0 = jnp.log(2.0 / znt)
    gz10oz0 = jnp.log(10.0 / znt)
    water = (xland - 1.5) >= 0.0
    wspd0 = jnp.sqrt(ux * ux + vx * vx)
    tskv = thgb * (1.0 + EP_1 * qsfc)
    dthvdz = thvx - tskv
    # Beljaars (land) / Wyngaard (water) convective velocity (:476-489)
    fluxc = jnp.maximum(hfx / rhox / CP + EP_1 * tskv * qfx / rhox, 0.0)
    vconv_land = VCONVC * (G / tgdsa * pblh * fluxc) ** 0.33
    vconv_water = 2.0 * jnp.sqrt(jnp.maximum(-dthvdz, 0.0))
    vconv = sel(water, vconv_water, vconv_land)
    vsgd = 0.32 * jnp.maximum(dx / 5000.0 - 1.0, 0.0) ** 0.33
    wspd = jnp.sqrt(wspd0 * wspd0 + vconv * vconv + vsgd * vsgd)
    wspd = jnp.maximum(wspd, 0.1)
    br = govrth * za * dthvdz / (wspd * wspd)
    br = sel(mol < 0.0, jnp.minimum(br, 0.0), br)   # :494

    # ---- stability regimes (:317-366 of SFCLAY1D numbering) ----
    reg1 = br >= 0.2
    reg2 = jnp.logical_and(br > 0.0, br < 0.2)
    reg3 = br == 0.0
    reg4 = br < 0.0
    regime = jnp.where(reg1, 1.0,
                       jnp.where(reg2, 2.0, jnp.where(reg3, 3.0, 4.0)))

    # regime 1
    psim_1 = jnp.maximum(-10.0 * gz1oz0, -10.0)
    psim10_1 = jnp.maximum(10.0 / za * psim_1, -10.0)
    psim2_1 = jnp.maximum(2.0 / za * psim_1, -10.0)
    rmol_1 = sel(ust < 0.01, br * gz1oz0,
                 KARMAN * govrth * za * mol / (ust * ust))
    rmol_1 = jnp.minimum(rmol_1, 9.999) / za

    # regime 2
    psim_2 = jnp.maximum(-5.0 * br * gz1oz0 / (1.1 - 5.0 * br), -10.0)
    psim10_2 = jnp.maximum(10.0 / za * psim_2, -10.0)
    psim2_2 = jnp.maximum(2.0 / za * psim_2, -10.0)
    zol_2 = br * gz1oz0 / (1.00001 - 5.0 * br)
    zol_2 = sel(zol_2 > 0.5,
                jnp.minimum((1.89 * gz1oz0 + 44.2) * br * br
                            + (1.18 * gz1oz0 - 1.37) * br, 9.999),
                zol_2)
    rmol_2 = zol_2 / za

    # regime 3
    zol_3 = sel(ust < 0.01, br * gz1oz0,
                KARMAN * govrth * za * mol / (ust * ust))
    rmol_3 = zol_3 / za

    # regime 4 (free convection, tabulated psi -> analytic)
    zol_4r = sel(ust < 0.01, br * gz1oz0,
                 KARMAN * govrth * za * mol / (ust * ust))
    zol10 = jnp.clip(10.0 / za * zol_4r, -9.9999, 0.0)
    zol2_ = jnp.clip(2.0 / za * zol_4r, -9.9999, 0.0)
    zol_4 = jnp.clip(zol_4r, -9.9999, 0.0)
    psim_4, psih_4 = _psi_sfclay_unstable(zol_4)
    psim10_4, psih10_4 = _psi_sfclay_unstable(zol10)
    psim2_4, psih2_4 = _psi_sfclay_unstable(zol2_)
    psih_4 = jnp.minimum(psih_4, 0.9 * gz1oz0)
    psim_4 = jnp.minimum(psim_4, 0.9 * gz1oz0)
    psih2_4 = jnp.minimum(psih2_4, 0.9 * gz2oz0)
    psim10_4 = jnp.minimum(psim10_4, 0.9 * gz10oz0)
    psih10_4 = jnp.minimum(psih10_4, 0.9 * gz10oz0)
    rmol_4 = zol_4 / za

    def pick(v1, v2, v3, v4):
        return jnp.where(reg1, v1,
                         jnp.where(reg2, v2, jnp.where(reg3, v3, v4)))

    psim = pick(psim_1, psim_2, 0.0, psim_4)
    psih = pick(psim_1, psim_2, 0.0, psih_4)
    psim10 = pick(psim10_1, psim10_2, 0.0, psim10_4)
    psih10 = pick(psim10_1, psim10_2, 0.0, psih10_4)
    psim2 = pick(psim2_1, psim2_2, 0.0, psim2_4)
    psih2 = pick(psim2_1, psim2_2, 0.0, psih2_4)
    zol = pick(zol, zol_2, zol_3, zol_4)
    rmol = pick(rmol_1, rmol_2, rmol_3, rmol_4)

    # ---- friction velocity + 2m/10m diagnostics (:672-780) ----
    dtg = thx - thgb
    psix = gz1oz0 - psim
    psix10 = gz10oz0 - psim10
    psit = jnp.maximum(gz1oz0 - psih, 2.0)
    zl = sel(water, znt, 0.01)
    psiq = jnp.log(KARMAN * ust * za / XKA + za / zl) - psih
    psit2 = gz2oz0 - psih2
    psiq2 = jnp.log(KARMAN * ust * 2.0 / XKA + 2.0 / zl) - psih2
    psiq10 = jnp.log(KARMAN * ust * 10.0 / XKA + 10.0 / zl) - psih10
    if isftcflx == 1:
        z0q = 1.0e-4
        psiq_w = jnp.log(za / z0q) - psih
        psiq2_w = jnp.log(2.0 / z0q) - psih2
        psiq10_w = jnp.log(10.0 / z0q) - psih10
        psiq = sel(water, psiq_w, psiq)
        psit = sel(water, psiq_w, psit)
        psiq2 = sel(water, psiq2_w, psiq2)
        psiq10 = sel(water, psiq10_w, psiq10)
        psit2 = sel(water, psiq2_w, psit2)
    elif isftcflx == 2:
        visc_t = (1.32 + 0.009 * (scr3 - 273.15)) * 1.0e-5
        restar = ust * znt / visc_t
        gz0ozt = 0.40 * (7.3 * jnp.sqrt(jnp.sqrt(restar)) * jnp.sqrt(0.71) - 5.0)
        gz0ozq = 0.40 * (7.3 * jnp.sqrt(jnp.sqrt(restar)) * jnp.sqrt(0.60) - 5.0)
        psit = sel(water, gz1oz0 - psih + gz0ozt, psit)
        psiq = sel(water, gz1oz0 - psih + gz0ozq, psiq)
        psit2 = sel(water, gz2oz0 - psih2 + gz0ozt, psit2)
        psiq2 = sel(water, gz2oz0 - psih2 + gz0ozq, psiq2)
        psiq10 = sel(water, gz10oz0 - psih + gz0ozq, psiq10)
    ck = (KARMAN / psix10) * (KARMAN / psiq10)
    cd = (KARMAN / psix10) * (KARMAN / psix10)
    cka = (KARMAN / psix) * (KARMAN / psiq)
    cda = (KARMAN / psix) * (KARMAN / psix)
    if iz0tlnd == 1:
        visc_t = (1.32 + 0.009 * (scr3 - 273.15)) * 1.0e-5
        restar_l = ust * znt / visc_t
        czil = 10.0 ** (-0.40 * (znt / 0.07))
        corr = czil * KARMAN * jnp.sqrt(restar_l)
        psit = sel(~water, gz1oz0 - psih + corr, psit)
        psiq = sel(~water, gz1oz0 - psih + corr, psiq)
        psit2 = sel(~water, gz2oz0 - psih2 + corr, psit2)
        psiq2 = sel(~water, gz2oz0 - psih2 + corr, psiq2)

    ust_new = 0.5 * ust + 0.5 * KARMAN * wspd / psix
    wspdi = jnp.sqrt(ux * ux + vx * vx)
    ustm_new = 0.5 * ustm + 0.5 * KARMAN * wspdi / psix
    u10 = ux * psix10 / psix
    v10 = vx * psix10 / psix
    th2 = thgb + dtg * psit2 / psit
    q2m = qsfc + (qx - qsfc) * psiq2 / psiq
    t2 = th2 * (psfcpa / P1000MB) ** ROVCP
    ust_new = sel(~water, jnp.maximum(ust_new, 0.1), ust_new)
    mol_new = KARMAN * dtg / psit / PRT
    denomq, denomq2, denomt2 = psiq, psiq2, psit2
    fm, fh_out = psix, psit

    out = dict(regime=regime, br=br, wspd=wspd, gz1oz0=gz1oz0,
               psim=psim, psih=psih, fm=fm, fh=fh_out, zol=zol,
               rmol=rmol, mol=mol_new, ust=ust_new, ustm=ustm_new,
               u10=u10, v10=v10, th2=th2, t2=t2, q2=q2m, qgh=qgh,
               cpm=cpm, qsfc=qsfc, ck=ck, cka=cka, cd=cd, cda=cda,
               znt=znt)
    if not scm_force_flux:
        hfx = jnp.zeros_like(hfx)
        qfx = jnp.zeros_like(qfx)
    if isfflx == 0:
        out.update(hfx=hfx, qfx=qfx, lh=XLV * qfx,
                   flhc=jnp.zeros_like(hfx), flqc=jnp.zeros_like(hfx),
                   chs=jnp.zeros_like(hfx), chs2=jnp.zeros_like(hfx),
                   cqs2=jnp.zeros_like(hfx))
        return out

    # water roughness update (:688-707) with the updated ust
    znt_w = CZO * ust_new * ust_new / G + OZO
    if isftcflx != 0:
        zw = jnp.minimum((ust_new / 1.06) ** 0.3, 1.0)
        zn1 = 0.011 * ust_new * ust_new / G + OZO
        zn2 = (10.0 * jnp.exp(-9.5 * ust_new ** (-1.0 / 3.0))
               + 0.11 * 1.5e-5 / jnp.maximum(ust_new, 0.01))
        znt_w = jnp.clip((1.0 - zw) * zn1 + zw * zn2, 1.27e-7, 2.85e-3)
    znt_new = sel(water, znt_w, znt)
    flqc = rhox * mavail * ust_new * KARMAN / denomq
    dtthx = jnp.abs(thx - thgb)
    flhc = sel(dtthx > 1.0e-5,
               cpm * rhox * ust_new * mol_new / (thx - thgb), 0.0)
    if scm_force_flux:
        qfx_new, hfx_new = qfx, hfx
    else:
        qfx_new = jnp.maximum(flqc * (qsfc - qx), 0.0)
        hfx_w = flhc * (thgb - thx)
        if isftcflx != 0:
            hfx_w = hfx_w + rhox * ustm_new * ustm_new * wspdi
        hfx_l = jnp.maximum(flhc * (thgb - thx), -250.0)
        hfx_new = sel(water, hfx_w, hfx_l)
    lh = XLV * qfx_new
    chs = ust_new * KARMAN / denomq
    cqs2 = ust_new * KARMAN / denomq2
    chs2 = ust_new * KARMAN / denomt2
    out.update(hfx=hfx_new, qfx=qfx_new, lh=lh, flhc=flhc, flqc=flqc,
               chs=chs, chs2=chs2, cqs2=cqs2, znt=znt_new)
    return out
