"""Golden-parity trajectory: the full vectorized NOAHMP_SFLX column
step vs the composed scalar Fortran oracle (tests/oracles/sflx.py),
integrated over multi-day diurnal forcing.

This is the BASELINE.md correctness-oracle stand-in: "allclose on
prognostics (SMC, SH2O, STC, SNEQV, snow layers, canopy storage, ZWT)
after N timesteps from identical cold start" — with the reference
role played by an independent double-precision transliteration of the
Fortran text instead of the (uncompilable-here) noahmp.exe."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from noahmp_tpu.params.tables import load_tables
from noahmp_tpu.params.hydrate import hydrate
from noahmp_tpu.params import default_table_dir
from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.state.state import initial_column_state, Forcing
from noahmp_tpu.physics.sflx import noahmp_sflx

from oracles import sflx as O

f32 = jnp.float32
NSNOW, NSOIL = 3, 4
ZSOIL = (-0.1, -0.4, -1.0, -2.0)


def _params(vegtyp=7, soiltyp=3):
    t = load_tables(default_table_dir(), "USGS")
    return jtu.tree_map(lambda x: x[0],
                        hydrate(t, np.array([vegtyp]), np.array([soiltyp])))


def _par_dict(p):
    """Hydrated ColumnParams -> oracle par dict (f32-rounded floats)."""
    g = lambda k: float(np.asarray(getattr(p, k)))
    v2 = lambda k: [float(x) for x in np.asarray(getattr(p, k))]
    d = {k: g(k) for k in (
        "bexp", "smcmax", "smcref", "psisat", "dksat", "dwsat",
        "smcwlt", "quartz", "czil", "kdt", "frzx", "slope", "topt",
        "rgl", "rsmax", "rsmin", "hs", "ch2op", "dleaf", "z0mvt",
        "hvt", "hvb", "rc", "c3psn", "kc25", "akc", "ko25", "ako",
        "vcmx25", "avcmx", "bp", "mp", "qe25", "folnmx", "tmin", "xl")}
    d["cwp"] = g("cwpvt")
    d["nroot"] = int(np.asarray(p.nroot))
    d["laim"] = v2("laim")
    d["saim"] = v2("saim")
    d["rhol"] = v2("rhol")
    d["rhos"] = v2("rhos")
    d["taul"] = v2("taul")
    d["taus"] = v2("taus")
    d["is_urban"] = bool(np.asarray(p.is_urban))
    # carbon-pool params (CARBON/CO2FLUX :8723-9105)
    for k in ("sla", "ltovrc", "dilefc", "dilefw", "fragr", "mrp",
              "wrrat", "wdpool", "tdlef", "arm", "rmf25", "rms25",
              "rmr25"):
        d[k] = g(k)
    vt = int(np.asarray(p.vegtyp))
    d["is_eblforest"] = vt == 13   # USGS EBLFOREST
    # PHENOLOGY zeroing for non-vegetated classes (water/barren/snow/
    # urban, module_sf_noahmplsm.F90:1073-1079; USGS indices)
    d["pheno_masked"] = vt in (16, 19, 24) or d["is_urban"]
    return d


def _state_to_oracle(s):
    """ColumnState -> oracle state dict (Fortran-indexed)."""
    a = lambda k: np.asarray(getattr(s, k), np.float64)
    snJ = lambda arr: {j: float(arr[j + NSNOW - 1])
                       for j in range(-NSNOW + 1, 1)}
    allJ = lambda arr: {j: float(arr[j + NSNOW - 1])
                        for j in range(-NSNOW + 1, NSOIL + 1)}
    soil = lambda arr: {k: float(arr[k - 1]) for k in range(1, NSOIL + 1)}
    return dict(
        isnow=int(s.isnow), stc=allJ(a("stc")), zsnso=allJ(a("zsnso")),
        snice=snJ(a("snice")), snliq=snJ(a("snliq")),
        sneqv=float(s.sneqv), sneqvo=float(s.sneqvo),
        snowh=float(s.snowh), smc=soil(a("smc")), sh2o=soil(a("sh2o")),
        canliq=float(s.canliq), canice=float(s.canice),
        tv=float(s.tv), eah=float(s.eah), tah=float(s.tah),
        fwet=float(s.fwet), tg=float(s.tg), qsfc=float(s.qsfc),
        qsnow=float(s.qsnow), albold=float(s.albold),
        tauss=float(s.tauss), cm=float(s.cm), ch=float(s.ch),
        zwt=float(s.zwt), wa=float(s.wa), wt=float(s.wt),
        wslake=float(s.wslake), smcwtd=float(s.smcwtd),
        deeprech=float(s.deeprech), rech=float(s.rech),
        lai=float(s.lai), sai=float(s.sai),
        lfmass=float(s.lfmass), rtmass=float(s.rtmass),
        stmass=float(s.stmass), wood=float(s.wood),
        stblcp=float(s.stblcp), fastcp=float(s.fastcp))


def _forcing(hour, cold=False, prcp_mm_hr=0.0, lat=0.7, tbot=285.0):
    h = hour % 24
    cosz = float(np.sin(np.pi * (h - 6) / 12.0)) if 6 <= h <= 18 else 0.0
    cosz = max(0.0, cosz)
    tair = (265.0 if cold else 282.0) + 8.0 * cosz
    return dict(sfctmp=tair, sfcprs=95000.0, psfc=95000.0, uu=2.5,
                vv=1.0, q2=0.004 if cold else 0.007, qc=0.0,
                soldn=800.0 * cosz, lwdn=220.0 if cold else 330.0,
                prcp=prcp_mm_hr / 3600.0, tbot=tbot, pblh=500.0,
                cosz=cosz, lat=lat, julian=(hour / 24.0) % 365,
                co2air=95000.0 * 395.0e-6, o2air=95000.0 * 0.209,
                foln=1.0)


def _jax_forcing(fd, ficeold):
    return Forcing(
        sfctmp=f32(fd["sfctmp"]), sfcprs=f32(fd["sfcprs"]),
        psfc=f32(fd["psfc"]), uu=f32(fd["uu"]), vv=f32(fd["vv"]),
        q2=f32(fd["q2"]), qc=f32(fd["qc"]), soldn=f32(fd["soldn"]),
        lwdn=f32(fd["lwdn"]), prcp=f32(fd["prcp"]),
        tbot=f32(fd["tbot"]), pblh=f32(fd["pblh"]),
        cosz=f32(fd["cosz"]), lat=f32(fd["lat"]),
        julian=f32(fd["julian"]), yearlen=jnp.int32(365),
        shdfac=f32(0.8), shdmax=f32(0.9), co2air=f32(fd["co2air"]),
        o2air=f32(fd["o2air"]), foln=f32(fd["foln"]),
        ficeold=jnp.asarray(ficeold, jnp.float32),
        smceq=jnp.full(4, 0.25, jnp.float32))


def _opts(cfg):
    return dict(dveg=cfg.dveg, opt_crs=cfg.opt_crs, opt_btr=cfg.opt_btr,
                opt_run=cfg.opt_run, opt_sfc=cfg.opt_sfc,
                opt_frz=cfg.opt_frz, opt_inf=cfg.opt_inf,
                opt_rad=cfg.opt_rad, opt_alb=cfg.opt_alb,
                opt_snf=cfg.opt_snf, opt_tbot=cfg.opt_tbot,
                opt_stc=cfg.opt_stc)


def _ficeold_from(snice, snliq, isnow):
    """FICEOLD from pre-step snow state (module_sf_noahmpdrv.F90:516-518)."""
    out = np.zeros(NSNOW)
    for k in range(NSNOW):
        j = k - NSNOW + 1
        if j >= isnow + 1 and (snice[k] + snliq[k]) > 0:
            out[k] = snice[k] / (snice[k] + snliq[k])
    return out


def _fields(cfg):
    base = (["tg", "tv", "tah", "eah", "sneqv", "snowh", "canliq",
             "canice", "zwt", "wa", "isnow"]
            + [f"{f}{k}" for f in ("smc", "sh2o", "stc")
               for k in range(1, NSOIL + 1)]
            + ["fsa", "fsh", "fira"])
    if cfg.dveg in (2, 5):
        base += ["lfmass", "rtmass", "stmass", "wood", "stblcp",
                 "fastcp", "lai", "sai", "nee", "gpp", "npp"]
    return base


def _jax_row(cfg, s, d):
    row = {
        "tg": float(s.tg), "tv": float(s.tv), "tah": float(s.tah),
        "eah": float(s.eah), "sneqv": float(s.sneqv),
        "snowh": float(s.snowh), "canliq": float(s.canliq),
        "canice": float(s.canice), "zwt": float(s.zwt),
        "wa": float(s.wa), "isnow": float(s.isnow),
        "fsa": float(d.fsa), "fsh": float(d.fsh),
        "fira": float(d.fira)}
    for k in range(1, NSOIL + 1):
        row[f"smc{k}"] = float(s.smc[k - 1])
        row[f"sh2o{k}"] = float(s.sh2o[k - 1])
        row[f"stc{k}"] = float(s.stc[k + NSNOW - 1])
    if cfg.dveg in (2, 5):
        for k in ("lfmass", "rtmass", "stmass", "wood", "stblcp",
                  "fastcp", "lai", "sai"):
            row[k] = float(getattr(s, k))
        row["nee"], row["gpp"], row["npp"] = (float(d.nee),
                                              float(d.gpp),
                                              float(d.npp))
    return row


def _oracle_row(cfg, os_, od):
    row = {k: float(os_[k]) for k in
           ("tg", "tv", "tah", "eah", "sneqv", "snowh", "canliq",
            "canice", "zwt", "wa", "isnow")}
    for k in range(1, NSOIL + 1):
        row[f"smc{k}"] = os_["smc"][k]
        row[f"sh2o{k}"] = os_["sh2o"][k]
        row[f"stc{k}"] = os_["stc"][k]
    row["fsa"], row["fsh"], row["fira"] = (od["fsa"], od["fsh"],
                                           od["fira"])
    if cfg.dveg in (2, 5):
        for k in ("lfmass", "rtmass", "stmass", "wood", "stblcp",
                  "fastcp", "lai", "sai"):
            row[k] = os_[k]
        row["nee"], row["gpp"], row["npp"] = (od["nee"], od["gpp"],
                                              od["npp"])
    return row


def _run_pair(cfg, scenario, hours, tol, vegtyp=7, soiltyp=3,
              tsk=282.0, smc0=0.3):
    """JAX trajectory vs the composed scalar oracle.  The JAX side runs
    first (collecting the per-hour FICEOLD the driver would feed both
    models, module_sf_noahmpdrv.F90:516-518); the oracle trajectory is
    then replayed from the disk cache (tests/oracle_cache.py) or
    computed and cached — it is deterministic double-precision Python,
    keyed by the oracle sources and every input including the FICEOLD
    sequence, so a hit is bit-identical to recomputation."""
    import oracle_cache

    p = _params(vegtyp, soiltyp)
    par = _par_dict(p)
    s = initial_column_state(cfg, tsk=tsk, smc0=smc0)
    os0 = _state_to_oracle(s)
    opts = _opts(cfg)
    zs = {k: ZSOIL[k - 1] for k in range(1, NSOIL + 1)}
    smceq = {k: 0.25 for k in range(1, NSOIL + 1)}
    fields = _fields(cfg)

    # --- JAX trajectory -------------------------------------------------
    step = jax.jit(lambda s, f: noahmp_sflx(cfg, p, s, f))
    fds, fices, jrows = [], [], []
    for hour in range(hours):
        fd = scenario(hour)
        fds.append(fd)
        fice = _ficeold_from(np.asarray(s.snice, np.float64),
                             np.asarray(s.snliq, np.float64),
                             int(s.isnow))
        fices.append([float(x) for x in fice])
        s, d = step(s, _jax_forcing(fd, fice))
        jrows.append(_jax_row(cfg, s, d))

    # --- oracle trajectory (cached) --------------------------------------
    key = dict(kind="sflx", par=par, opts=opts, hours=hours,
               dt=cfg.dt, zlvl=cfg.zlvl, fds=fds, fices=fices,
               init=os0, zs=zs, smceq=smceq, fields=fields)
    orc = oracle_cache.get(key)
    if orc is None:
        os_ = os0
        rows = []
        for hour in range(hours):
            fd = fds[hour]
            fice_d = {j: fices[hour][j + NSNOW - 1]
                      for j in range(-NSNOW + 1, 1)}
            os_, od = O.sflx(
                par, opts, NSNOW, NSOIL, cfg.dt, fd["lat"], 365,
                fd["julian"], fd["cosz"], cfg.zlvl, 0.8, 0.9, 0, 1, 4,
                smceq, fd["sfctmp"], fd["sfcprs"], fd["psfc"],
                fd["uu"], fd["vv"], fd["q2"], fd["soldn"], fd["lwdn"],
                fd["prcp"], fd["tbot"], fd["co2air"], fd["o2air"],
                fd["foln"], fice_d, zs, os_)
            rows.append(_oracle_row(cfg, os_, od))
        orc = {f: np.array([r[f] for r in rows]) for f in fields}
        oracle_cache.put(key, orc)

    # --- worst-case divergence per field ---------------------------------
    worst = {}
    for hour in range(hours):
        for name in fields:
            got, want = jrows[hour][name], float(orc[name][hour])
            dv = abs(got - want)
            if name not in worst or dv > worst[name][0]:
                worst[name] = (dv, hour, got, want)

    failures = []
    for name, (dv, hour, got, want) in sorted(worst.items()):
        lim = tol.get(name.rstrip("1234"), tol.get(name, None))
        if lim is None:
            continue
        if dv > lim:
            failures.append(f"{name}: |{got:.6g} - {want:.6g}| = "
                            f"{dv:.3g} > {lim} at hour {hour}")
    assert not failures, "trajectory diverged:\n" + "\n".join(failures)
    return worst


TOL_WARM = dict(tg=0.3, tv=0.3, tah=0.3, eah=25.0, sneqv=0.5,
                snowh=5e-3, canliq=0.05, canice=0.05, zwt=0.02, wa=1.0,
                isnow=0.0, smc=3e-3, sh2o=3e-3, stc=0.3, fsa=2.0,
                fsh=6.0, fira=6.0)


def test_sflx_trajectory_warm_rain():
    """3 days, grassland, diurnal cycle with a rain band."""
    cfg = NoahMPConfig()
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=3.0 if 10 <= h < 20 else 0.0), 72, TOL_WARM)


def test_sflx_trajectory_chen97_jarvis():
    """Alternate scheme combo: OPT_SFC=2 + Jarvis + BATS albedo."""
    cfg = NoahMPConfig(opt_sfc=2, opt_crs=2, opt_alb=1, opt_btr=2,
                       opt_run=3, opt_frz=2, opt_inf=2, opt_rad=1,
                       opt_stc=2, opt_tbot=1)
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=2.0 if 30 <= h < 40 else 0.0), 72, TOL_WARM)


TOL_SNOW = dict(tg=1.0, tv=1.0, tah=1.0, eah=40.0, sneqv=1.5,
                snowh=2e-2, canliq=0.05, canice=0.3, zwt=0.05, wa=2.0,
                isnow=0.0, smc=5e-3, sh2o=5e-3, stc=1.0, fsa=4.0,
                fsh=15.0, fira=15.0)


def test_sflx_trajectory_snow_cycle():
    """Cold snap: snowfall, multi-layer pack, melt-out."""
    cfg = NoahMPConfig()

    def scen(h):
        cold = 24 <= h < 96
        return _forcing(h, cold=cold,
                        prcp_mm_hr=2.0 if 30 <= h < 40 else 0.0)

    worst = _run_pair(cfg, scen, 120, TOL_SNOW)


# -- dynamic vegetation (DVEG=2|5): carbon pools -------------------------

TOL_CARBON = dict(TOL_WARM, lfmass=0.5, rtmass=0.5, stmass=0.5,
                  wood=0.5, stblcp=0.5, fastcp=0.5, lai=0.02, sai=0.01,
                  nee=5e-7, gpp=5e-7, npp=5e-7)


def test_sflx_trajectory_dveg2_carbon():
    """3 days, grassland, CARBON pools active (DVEG=2, Ball-Berry):
    LFMASS/STMASS/RTMASS/WOOD/FASTCP/STBLCP trajectories plus
    NEE/GPP/NPP vs the CO2FLUX oracle (VERDICT r2 item 5)."""
    cfg = NoahMPConfig(dveg=2)
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=3.0 if 10 <= h < 20 else 0.0), 72, TOL_CARBON)


def test_sflx_trajectory_dveg5_forest_carbon():
    """DVEG=5 (predicted LAI, FVEG=SHDMAX) on deciduous broadleaf
    forest (USGS 11) — exercises the wood pool and the WRRAT/WDPOOL
    allocation split, plus a dry-down to drive leaf death (SD term)."""
    cfg = NoahMPConfig(dveg=5)
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=2.0 if 12 <= h < 16 else 0.0), 96, TOL_CARBON,
        vegtyp=11, smc0=0.22)


# -- MYJ / YSU surface-layer schemes (OPT_SFC=3/4), composed -------------

# the TPU kernels use analytic psi forms where the reference
# interpolates its 10001/1001-entry tables (quantified <5e-3 relative
# in test_golden_sfcdif34); over multi-day composed trajectories the
# accumulated state tolerance is slightly wider than TOL_WARM
TOL_SFC34 = dict(tg=0.5, tv=0.5, tah=0.5, eah=30.0, sneqv=0.5,
                 snowh=5e-3, canliq=0.05, canice=0.05, zwt=0.02,
                 wa=1.0, isnow=0.0, smc=3e-3, sh2o=3e-3, stc=0.5,
                 fsa=2.0, fsh=10.0, fira=10.0)


def test_sflx_trajectory_myj():
    """3 days grassland with rain under OPT_SFC=3 (MYJ exchange
    coefficients inside loop1/loop3, UR-divided inout carry,
    MYJ-consistent 2m diagnostics) vs the composed oracle
    (VERDICT r2 item 6)."""
    cfg = NoahMPConfig(opt_sfc=3)
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=3.0 if 10 <= h < 20 else 0.0), 72, TOL_SFC34)


def test_sflx_trajectory_ysu():
    """3 days under OPT_SFC=4 (YSU/revised-MM5 scheme: regime select,
    QFX feedback into the next iteration, 0.5/0.5 USTAR relaxation)
    vs the composed oracle, including a cold snap."""
    cfg = NoahMPConfig(opt_sfc=4)

    def scen(h):
        return _forcing(h, cold=48 <= h < 60,
                        prcp_mm_hr=2.0 if 30 <= h < 40 else 0.0)

    _run_pair(cfg, scen, 72, TOL_SFC34)


# -- biome / soil sweep (VERDICT r2 item 8): the composed oracle ---------
# previously only met the full column through one grassland point;
# these compose the two-stream-heavy forest canopy, the bare-dominant
# loop3 path over clay, and frozen organic soil at high latitude.

def test_sflx_trajectory_needleleaf_forest():
    """Evergreen needleleaf forest (USGS 14): dense canopy ->
    TWOSTREAM + RAGRB + the canopy Newton loop dominate; rain band
    exercises interception at high LAI."""
    cfg = NoahMPConfig()
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=3.0 if 10 <= h < 20 else 0.0), 72, TOL_WARM,
        vegtyp=14)


def test_sflx_trajectory_bare_clay():
    """Barren (USGS 19) over clay (STAS 12): PHENOLOGY zeroes
    LAI/SAI, FVEG=0, so the whole column runs through BARE_FLUX
    (loop3) with clay's slow drainage (low DKSAT, high SMCREF)."""
    cfg = NoahMPConfig()
    _run_pair(cfg, lambda h: _forcing(
        h, prcp_mm_hr=4.0 if 8 <= h < 24 else 0.0), 72, TOL_WARM,
        vegtyp=19, soiltyp=12, smc0=0.35)


def test_sflx_trajectory_organic_highlat_winter():
    """Organic soil (STAS 13) grassland at 63N in deep winter: a long
    cold spell with snowfall composes frozen-soil PHASECHANGE/FRH2O,
    CSNOW/TDFCND on organic material, and the snow stack."""
    cfg = NoahMPConfig()

    def scen(h):
        return _forcing(h, cold=h >= 12, lat=1.1, tbot=274.0,
                        prcp_mm_hr=1.5 if 24 <= h < 36 else 0.0)

    _run_pair(cfg, scen, 96, TOL_SNOW, soiltyp=13, tsk=272.0,
              smc0=0.35)
