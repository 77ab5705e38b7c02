"""Golden-parity trajectory: the vectorized NOAHMP_GLACIER column step
(noahmp_tpu.physics.glacier) vs the composed scalar Fortran oracle
(tests/oracles/glacier.py), integrated over a multi-day high-latitude
scenario: snowfall building a multi-layer pack (SNOWFALL/COMPACT/
COMBINE/DIVIDE), the GLACIER_FLUX Newton solve through cold and warm
regimes, PHASECHANGE_GLACIER's residual-heat redistribution over the
ice 'soil', and the melt-out with RUNSRF/RUNSUB closure
(module_sf_noahmp_glacier.F90:150-338).  VERDICT r2 item 4."""

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
from noahmp_tpu.physics.glacier import noahmp_glacier

from oracles import glacier as OG

f32 = jnp.float32
NSNOW, NSOIL = 3, 4
ZSOIL = (-0.1, -0.4, -1.0, -2.0)


def _params():
    t = load_tables(default_table_dir(), "USGS")
    # USGS 24 = snow/ice, soil cat 14 = water->ice fill
    return jtu.tree_map(lambda x: x[0],
                        hydrate(t, np.array([24]), np.array([14])))


def _glacier_state(cfg, tsk=260.0):
    """Glacier cold start: saturated frozen 'soil'
    (module_sf_noahmpdrv.F90:1034-1042 via driver/init.py)."""
    s = initial_column_state(cfg, tsk=tsk, smc0=1.0)
    import dataclasses
    return dataclasses.replace(
        s, sh2o=jnp.zeros(cfg.nsoil, f32),
        smc=jnp.ones(cfg.nsoil, f32),
        stc=jnp.minimum(s.stc, 263.15).astype(f32),
        tg=f32(min(tsk, 263.15)), tv=f32(min(tsk, 263.15)))


def _state_to_oracle(s):
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
        tg=float(s.tg), qsfc=float(s.qsfc), qsnow=float(s.qsnow),
        albold=float(s.albold), tauss=float(s.tauss), cm=float(s.cm),
        ch=float(s.ch))


def _forcing(hour, warm=False, prcp_mm_hr=0.0):
    h = hour % 24
    cosz = float(np.sin(np.pi * (h - 6) / 12.0)) if 6 <= h <= 18 else 0.0
    cosz = max(0.0, cosz * 0.45)            # high-latitude sun
    tair = (278.0 if warm else 258.0) + 6.0 * cosz
    return dict(sfctmp=tair, sfcprs=85000.0, uu=4.0, vv=1.5,
                q2=0.0035 if warm else 0.0009, soldn=700.0 * cosz,
                lwdn=300.0 if warm else 190.0,
                prcp=prcp_mm_hr / 3600.0, tbot=268.0, cosz=cosz)


def _jax_forcing(fd, ficeold, n):
    z = lambda v: f32(v)
    return Forcing(
        sfctmp=z(fd["sfctmp"]), sfcprs=z(fd["sfcprs"]),
        psfc=z(fd["sfcprs"]), uu=z(fd["uu"]), vv=z(fd["vv"]),
        q2=z(fd["q2"]), qc=z(0.0), soldn=z(fd["soldn"]),
        lwdn=z(fd["lwdn"]), prcp=z(fd["prcp"]), tbot=z(fd["tbot"]),
        pblh=z(500.0), cosz=z(fd["cosz"]), lat=z(1.2),
        julian=z(0.0), yearlen=jnp.int32(365), shdfac=z(0.0),
        shdmax=z(0.0), co2air=z(85000.0 * 395.0e-6),
        o2air=z(85000.0 * 0.209), foln=z(1.0),
        ficeold=jnp.asarray(ficeold, f32),
        smceq=jnp.full(4, 0.25, f32))


def _ficeold_from(snice, snliq, isnow):
    out = np.zeros(NSNOW)
    for k in range(NSNOW):
        j = k - NSNOW + 1
        if j >= isnow + 1 and (snice[k] + snliq[k]) > 0:
            out[k] = snice[k] / (snice[k] + snliq[k])
    return out


_DIAGS = ("fsa", "fsh", "fira", "fgev", "ssoil", "runsrf", "runsub",
          "qmelt")


def _run_pair(cfg, scenario, hours, tol):
    """JAX glacier trajectory vs the composed scalar oracle; the oracle
    side replays from the disk cache (tests/oracle_cache.py) when its
    sources and every input — including the per-hour FICEOLD sequence
    taken from the JAX state — are unchanged."""
    import oracle_cache

    p = _params()
    s = _glacier_state(cfg)
    os0 = _state_to_oracle(s)
    opts = dict(opt_alb=cfg.opt_alb, opt_snf=cfg.opt_snf,
                opt_stc=cfg.opt_stc, opt_tbot=cfg.opt_tbot)
    zs = {k: ZSOIL[k - 1] for k in range(1, NSOIL + 1)}

    fields = (["tg", "sneqv", "snowh", "isnow", "tauss", "albold"]
              + [f"{f}{k}" for f in ("stc", "sh2o")
                 for k in range(1, NSOIL + 1)]
              + [f"{f}_j{j}" for f in ("snice", "snliq", "stcsn")
                 for j in range(-NSNOW + 1, 1)]
              + list(_DIAGS))

    # --- JAX trajectory -------------------------------------------------
    step = jax.jit(lambda s, f: noahmp_glacier(cfg, p, s, f))
    fds, fices, jrows = [], [], []
    for hour in range(hours):
        fd = scenario(hour)
        fds.append(fd)
        fice = _ficeold_from(np.asarray(s.snice, np.float64),
                             np.asarray(s.snliq, np.float64),
                             int(s.isnow))
        fices.append([float(x) for x in fice])
        s, d = step(s, _jax_forcing(fd, fice, 1))
        row = {"tg": float(s.tg), "sneqv": float(s.sneqv),
               "snowh": float(s.snowh), "isnow": float(s.isnow),
               "tauss": float(s.tauss), "albold": float(s.albold)}
        for k in range(1, NSOIL + 1):
            row[f"stc{k}"] = float(s.stc[k + NSNOW - 1])
            row[f"sh2o{k}"] = float(s.sh2o[k - 1])
        for j in range(-NSNOW + 1, 1):
            k = j + NSNOW - 1
            row[f"snice_j{j}"] = float(s.snice[k])
            row[f"snliq_j{j}"] = float(s.snliq[k])
            row[f"stcsn_j{j}"] = float(s.stc[k])
        for name in _DIAGS:
            row[name] = float(getattr(d, name))
        jrows.append(row)

    # --- oracle trajectory (cached) --------------------------------------
    key = dict(kind="glacier", opts=opts, hours=hours, dt=cfg.dt,
               zlvl=cfg.zlvl, fds=fds, fices=fices, init=os0, zs=zs,
               fields=fields)
    orc = oracle_cache.get(key)
    if orc is None:
        os_ = os0
        rows = []
        for hour in range(hours):
            fd = fds[hour]
            fice_d = {j: fices[hour][j + NSNOW - 1]
                      for j in range(-NSNOW + 1, 1)}
            os_, od = OG.noahmp_glacier(
                opts, NSNOW, NSOIL, cfg.dt, fd["cosz"], fd["sfctmp"],
                fd["sfcprs"], fd["uu"], fd["vv"], fd["q2"],
                fd["soldn"], fd["prcp"], fd["lwdn"], fd["tbot"],
                cfg.zlvl, fice_d, zs, os_)
            row = {"tg": os_["tg"], "sneqv": os_["sneqv"],
                   "snowh": os_["snowh"], "isnow": float(os_["isnow"]),
                   "tauss": os_["tauss"], "albold": os_["albold"]}
            for k in range(1, NSOIL + 1):
                row[f"stc{k}"] = os_["stc"][k]
                row[f"sh2o{k}"] = os_["sh2o"][k]
            for j in range(-NSNOW + 1, 1):
                row[f"snice_j{j}"] = os_["snice"][j]
                row[f"snliq_j{j}"] = os_["snliq"][j]
                row[f"stcsn_j{j}"] = os_["stc"][j]
            for name in _DIAGS:
                row[name] = od[name]
            rows.append(row)
        orc = {f: np.array([r[f] for r in rows]) for f in fields}
        oracle_cache.put(key, orc)

    # --- compare ----------------------------------------------------------
    worst = {}
    for hour in range(hours):
        jr = jrows[hour]
        isn = int(jr["isnow"])
        assert isn == int(orc["isnow"][hour]), (
            f"isnow diverged at hour {hour}: {isn} vs "
            f"{int(orc['isnow'][hour])}")

        def rec(name, got, want):
            dv = abs(got - want)
            if name not in worst or dv > worst[name][0]:
                worst[name] = (dv, hour, got, want)

        for name in fields:
            if name.startswith(("snice_j", "snliq_j", "stcsn_j")):
                j = int(name.split("_j")[1])
                if j < isn + 1:
                    continue        # inactive snow layer this hour
                base = {"snice_j": "snice", "snliq_j": "snliq",
                        "stcsn_j": "stc_sn"}[name.split("_j")[0] + "_j"]
                rec(f"{base}[{j}]", jr[name], float(orc[name][hour]))
            else:
                rec(name, jr[name], float(orc[name][hour]))

    failures = []
    for name, (dv, hour, got, want) in sorted(worst.items()):
        key = name.rstrip("1234").split("[")[0]
        lim = tol.get(key, tol.get(name))
        if lim is None:
            continue
        if dv > lim:
            failures.append(f"{name}: |{got:.6g} - {want:.6g}| = "
                            f"{dv:.3g} > {lim} at hour {hour}")
    assert not failures, "glacier trajectory diverged:\n" + \
        "\n".join(failures)
    return worst


TOL = dict(tg=0.5, sneqv=1.0, snowh=1e-2, isnow=0.0, tauss=0.05,
           albold=0.01, stc=0.5, stc_sn=1.0, sh2o=3e-3,
           snice=1.0, snliq=0.5, fsa=1.0, fsh=8.0, fira=8.0,
           fgev=8.0, ssoil=8.0, runsrf=5e-4, runsub=5e-4, qmelt=5e-4)


def test_glacier_trajectory_snow_build_melt():
    """5 days: snowfall builds a layered pack over bare land ice, a
    warm spell melts it out.  Default options (CLASS albedo, Jordan
    snowfall partition, OPT_STC=1 semi-implicit)."""
    cfg = NoahMPConfig()

    def scen(h):
        warm = h >= 72
        return _forcing(h, warm=warm,
                        prcp_mm_hr=2.5 if 6 <= h < 30 else 0.0)

    _run_pair(cfg, scen, 120, TOL)


def test_glacier_trajectory_bats_fullimplicit():
    """Option variant: BATS snow albedo, temperature-threshold snowfall
    partition, OPT_STC=2 full-implicit, OPT_TBOT=1 zero-flux bottom."""
    cfg = NoahMPConfig(opt_alb=1, opt_snf=2, opt_stc=2, opt_tbot=1)

    def scen(h):
        warm = 48 <= h < 84
        return _forcing(h, warm=warm,
                        prcp_mm_hr=3.0 if 3 <= h < 24 else
                        (1.5 if 90 <= h < 100 else 0.0))

    _run_pair(cfg, scen, 120, TOL)
