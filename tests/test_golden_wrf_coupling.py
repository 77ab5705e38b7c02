"""Golden parity for the FULL WRF-coupling surface-layer entry points
(closing the SURVEY §2.3 "surface-layer schemes" row completely: the
offline-consumed SFCDIF3/4 slices are covered by
test_golden_sfcdif34.py; these cover the WRF-facing MYJSFC and SFCLAY
drivers themselves — module_sf_myjsfc.F90:66-1053,
module_sf_sfclay.F90:244-889).

The shipped implementation evaluates psi analytically on the VPU; the
oracles (tests/oracles/wrf_coupling.py) keep the reference's lookup
tables, so the comparisons bound the analytic-vs-table condensation
exactly as the sfcdif34 goldens do.  Sea-point tolerances account for
the viscous-sublayer regime thresholds (USTR=0.225 / USTC=0.7): a
float32 ustar trajectory that straddles a threshold can take a
different (equally valid) branch than the float64 oracle, so a small
number of near-threshold columns may exceed the tight bound.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.physics import wrf_coupling as W

from oracles import wrf_coupling as O

RNG = np.random.default_rng(20260821)
F32 = lambda a: jnp.asarray(a, jnp.float32)


def _grid(n, nz):
    """Plausible bottom-up column profiles + surface fields."""
    psfc = RNG.uniform(8.2e4, 1.02e5, n)
    dz = RNG.uniform(25.0, 90.0, (n, nz))
    zint = np.concatenate([np.zeros((n, 1)), np.cumsum(dz, 1)], 1)
    zmid = 0.5 * (zint[:, :-1] + zint[:, 1:])
    t0 = RNG.uniform(262.0, 306.0, n)[:, None]
    t = t0 - 6.5e-3 * zmid
    pint = np.zeros((n, nz + 1))
    pint[:, 0] = psfc
    for k in range(nz):
        pint[:, k + 1] = pint[:, k] * np.exp(-9.81 * dz[:, k] / (287.0 * t[:, k]))
    pmid = 0.5 * (pint[:, :-1] + pint[:, 1:])
    th = t * (1.0e5 / pmid) ** (2.0 / 7.0)
    qv = RNG.uniform(2e-4, 1.5e-2, (n, nz))
    qc = np.where(RNG.random((n, nz)) < 0.25,
                  RNG.uniform(0.0, 5e-4, (n, nz)), 0.0)
    # TKE decaying with height; some columns start below the PBL
    # threshold so the "no level found" default path is exercised too
    q2 = (RNG.uniform(0.02, 2.0, n)[:, None]
          * np.exp(-zmid / RNG.uniform(150.0, 900.0, n)[:, None]))
    u = RNG.uniform(-14.0, 14.0, (n, nz))
    v = RNG.uniform(-14.0, 14.0, (n, nz))
    xland = np.where(np.arange(n) % 2 == 0, 1.0, 2.0)
    tsk = t[:, 0] + RNG.uniform(-9.0, 9.0, n)
    mavail = np.where(xland > 1.5, 1.0, RNG.uniform(0.05, 1.0, n))
    z0base = np.where(xland > 1.5, 1.59e-5, RNG.uniform(0.01, 0.9, n))
    return dict(dz=dz, pmid=pmid, pint=pint, th=th, t=t, qv=qv, qc=qc,
                u=u, v=v, q2=q2, tsk=tsk, xland=xland, mavail=mavail,
                z0base=z0base)


def _rel(got, want, floor):
    return np.abs(got - want) / np.maximum(np.abs(want), floor)


def test_myjsfc_full_grid_vs_oracle():
    """MYJSFC over a mixed land/sea batch, first step + 3 carried
    steps, against the scalar table-psi oracle."""
    n, nz, nsteps = 96, 6, 4
    g = _grid(n, nz)
    state = W.myjsfc_init(F32(g["z0base"]))

    # oracle per-column state dicts
    ostate = [dict(ustar=0.1, znt=g["z0base"][i], thz0=0.0, qz0=0.0,
                   uz0=0.0, vz0=0.0, akhs=0.0, akms=0.0, qsfc=0.0,
                   rmol=0.0) for i in range(n)]

    step_fn = {}
    for step in range(nsteps):
        first = step == 0
        # deterministic forcing drift between steps
        tsk = g["tsk"] + 0.7 * step
        u = g["u"] * (1.0 + 0.05 * step)
        if first not in step_fn:
            step_fn[first] = jax.jit(
                lambda s, dz, pmid, pint, th, t, qv, qc, u, v, q2, tsk,
                xland, mavail, z0base, _f=first: W.myjsfc(
                    s, _f, dz=dz, pmid=pmid, pint=pint, th=th, t=t,
                    qv=qv, qc=qc, u=u, v=v, q2=q2, tsk=tsk,
                    xland=xland, mavail=mavail, z0base=z0base))
        state, diags = step_fn[first](
            state, F32(g["dz"]), F32(g["pmid"]), F32(g["pint"]),
            F32(g["th"]), F32(g["t"]), F32(g["qv"]), F32(g["qc"]),
            F32(u), F32(g["v"]), F32(g["q2"]), F32(tsk),
            F32(g["xland"]), F32(g["mavail"]), F32(g["z0base"]))

        odiags = []
        for i in range(n):
            r = O.myjsfc_column_oracle(
                first, g["dz"][i], g["pmid"][i], g["pint"][i],
                g["th"][i], g["t"][i], g["qv"][i], g["qc"][i], u[i],
                g["v"][i], g["q2"][i], tsk[i], g["xland"][i],
                g["mavail"][i], g["z0base"][i], ostate[i])
            for k in ostate[i]:
                ostate[i][k] = r[k]
            odiags.append(r)

    sea = g["xland"] > 1.5
    # near a viscous-regime threshold the f32/f64 trajectories may
    # branch apart; exclude those few sea columns from the tight bound
    ustar_o = np.array([s["ustar"] for s in ostate])
    near_thr = sea & (np.minimum(np.abs(ustar_o - O.USTR),
                                 np.abs(ustar_o - O.USTC)) < 0.02)
    ok = ~near_thr
    assert ok.sum() >= n - 8, "threshold exclusion should be rare"

    def chk(name, got, want, tol, floor=1e-5):
        rel = _rel(np.asarray(got), np.asarray(want), floor)[ok]
        assert np.max(rel) < tol, (
            f"{name}: max rel {np.max(rel):.3e} at col "
            f"{np.where(ok)[0][np.argmax(rel)]}")

    want = {k: np.array([d[k] for d in odiags]) for k in odiags[0]}
    # state carries after 4 chained steps
    chk("ustar", state.ustar, ustar_o, 5e-3)
    chk("akhs", state.akhs, want["akhs"], 1e-2, 1e-4)
    chk("akms", state.akms, want["akms"], 1e-2, 1e-4)
    chk("thz0", state.thz0, want["thz0"], 5e-3)
    chk("qz0", state.qz0, want["qz0"], 1e-2, 1e-5)
    chk("znt", state.znt, want["znt"], 5e-3)
    chk("qsfc", state.qsfc, want["qsfc"], 5e-3)
    # diagnostics of the final step
    chk("pblh", diags["pblh"], want["pblh"], 1e-5)   # pure geometry
    chk("rib", diags["rib"], want["rib"], 1e-2, 1e-3)
    chk("hfx", diags["hfx"], want["hfx"], 2e-2, 5.0)
    chk("qfx", diags["qfx"], want["qfx"], 2e-2, 1e-5)
    chk("flhc", diags["flhc"], want["flhc"], 1e-2, 1e-2)
    chk("flqc", diags["flqc"], want["flqc"], 1e-2, 1e-5)
    chk("u10", diags["u10"], want["u10"], 1e-2, 0.2)
    chk("v10", diags["v10"], want["v10"], 1e-2, 0.2)
    chk("th02", diags["th02"], want["th02"], 2e-3)
    chk("t02", diags["t02"], want["t02"], 2e-3)
    chk("q02", diags["q02"], want["q02"], 1e-2, 1e-5)
    chk("q10", diags["q10"], want["q10"], 1e-2, 1e-5)
    chk("pshltr", diags["pshltr"], want["pshltr"], 1e-4)
    chk("qgh", diags["qgh"], want["qgh"], 2e-3)
    chk("cpm", diags["cpm"], want["cpm"], 1e-4)
    chk("chs2", diags["chs2"], want["chs2"], 1e-2, 1e-4)


def test_myjsfc_pblh_default_and_found_paths():
    """PBL height: the TKE threshold scan must match the oracle
    exactly (same interface geometry), including the no-level-found
    default to the domain top."""
    n, nz = 32, 5
    g = _grid(n, nz)
    # force half the columns to stay above threshold everywhere
    g["q2"][: n // 2] = 1.0
    state = W.myjsfc_init(F32(g["z0base"]))
    _, diags = W.myjsfc(
        state, True, dz=F32(g["dz"]), pmid=F32(g["pmid"]),
        pint=F32(g["pint"]), th=F32(g["th"]), t=F32(g["t"]),
        qv=F32(g["qv"]), qc=F32(g["qc"]), u=F32(g["u"]),
        v=F32(g["v"]), q2=F32(g["q2"]), tsk=F32(g["tsk"]),
        xland=F32(g["xland"]), mavail=F32(g["mavail"]),
        z0base=F32(g["z0base"]))
    for i in range(n):
        r = O.myjsfc_column_oracle(
            True, g["dz"][i], g["pmid"][i], g["pint"][i], g["th"][i],
            g["t"][i], g["qv"][i], g["qc"][i], g["u"][i], g["v"][i],
            g["q2"][i], g["tsk"][i], g["xland"][i], g["mavail"][i],
            g["z0base"][i],
            dict(ustar=0.1, znt=g["z0base"][i], thz0=0.0, qz0=0.0,
                 uz0=0.0, vz0=0.0, akhs=0.0, akms=0.0, qsfc=0.0,
                 rmol=0.0))
        np.testing.assert_allclose(np.asarray(diags["pblh"])[i],
                                   r["pblh"], rtol=1e-5)
    # the forced-uniform-TKE columns defaulted to the column top
    top = np.cumsum(g["dz"], 1)[:, -1]
    np.testing.assert_allclose(np.asarray(diags["pblh"])[: n // 2],
                               top[: n // 2], rtol=1e-5)


def _sfclay_inputs(n):
    xland = np.where(np.arange(n) % 2 == 0, 1.0, 2.0)
    psfcpa = RNG.uniform(8.2e4, 1.02e5, n)
    t1d = RNG.uniform(262.0, 306.0, n)
    return dict(
        ux=RNG.uniform(-14.0, 14.0, n), vx=RNG.uniform(-14.0, 14.0, n),
        t1d=t1d, qv1d=RNG.uniform(2e-4, 1.5e-2, n),
        p1d=psfcpa * RNG.uniform(0.985, 0.997, n),
        dz8w1d=RNG.uniform(25.0, 90.0, n), psfcpa=psfcpa,
        tsk=t1d + RNG.uniform(-9.0, 9.0, n), xland=xland,
        mavail=np.where(xland > 1.5, 1.0, RNG.uniform(0.05, 1.0, n)),
        pblh=RNG.uniform(100.0, 2500.0, n),
        dx=RNG.uniform(1000.0, 30000.0, n),
        znt=np.where(xland > 1.5, RNG.uniform(1e-5, 1e-3, n),
                     RNG.uniform(0.01, 0.9, n)),
        ust=RNG.uniform(0.05, 0.7, n),
        mol=RNG.uniform(-0.5, 0.5, n),
        rmol=RNG.uniform(-0.1, 0.1, n),
        zol=RNG.uniform(-1.0, 1.0, n),
        qsfc=RNG.uniform(0.0, 2e-2, n),
        hfx=RNG.uniform(-80.0, 350.0, n),
        qfx=RNG.uniform(0.0, 2e-4, n),
        ustm=RNG.uniform(0.05, 0.7, n))


FIELDS = ["regime", "br", "wspd", "psim", "psih", "fm", "fh", "zol",
          "rmol", "mol", "ust", "ustm", "u10", "v10", "th2", "t2",
          "q2", "qgh", "cpm", "qsfc", "ck", "cka", "cd", "cda", "znt",
          "hfx", "qfx", "lh", "flhc", "flqc", "chs", "chs2", "cqs2"]
FLOORS = dict(br=1e-4, zol=1e-3, rmol=1e-5, mol=1e-3, hfx=5.0, qfx=1e-6,
              lh=5.0, u10=0.2, v10=0.2, flhc=1e-2, flqc=1e-5,
              # psi floors make these effectively absolute bounds: the
              # 0.01-step SFCLAY table's own interpolation error near
              # zeta=0 reaches ~4e-4 on psi values of ~0.05
              psim=0.5, psih=0.5)


@pytest.mark.parametrize("opts", [
    dict(isftcflx=0, iz0tlnd=0),
    dict(isftcflx=1, iz0tlnd=0),
    dict(isftcflx=2, iz0tlnd=1),
])
def test_sfclay_vs_oracle(opts):
    """SFCLAY1D against the scalar table-psi oracle across all four
    stability regimes and the AHW ocean-flux / Chen-Zhang land
    roughness option branches."""
    n = 192
    inp = _sfclay_inputs(n)
    fn = jax.jit(lambda **kw: W.sfclay(**kw, **opts))
    got = fn(**{k: F32(v) for k, v in inp.items()})
    want = {k: np.zeros(n) for k in FIELDS}
    for i in range(n):
        r = O.sfclay1d_oracle(**{k: v[i] for k, v in inp.items()},
                              **opts)
        for k in FIELDS:
            want[k][i] = r[k]

    # identical regime classification (branch flips would show here)
    np.testing.assert_array_equal(np.asarray(got["regime"]),
                                  want["regime"])
    for k in FIELDS:
        rel = _rel(np.asarray(got[k], np.float64), want[k],
                   FLOORS.get(k, 1e-5))
        assert np.max(rel) < 5e-3, (
            f"{k}: max rel {np.max(rel):.3e} at {np.argmax(rel)} "
            f"(regime {want['regime'][np.argmax(rel)]})")


def test_sfclay_chained_carry_vs_oracle():
    """SFCLAY as WRF drives it: ZNT/UST/MOL/RMOL/ZOL/QSFC/HFX/QFX/USTM
    feed back step to step (the INOUT list of :244-257).  4 chained
    steps with drifting forcing must track the scalar oracle."""
    n, nsteps = 96, 4
    inp = _sfclay_inputs(n)
    carry_keys = ["znt", "ust", "mol", "rmol", "zol", "qsfc", "hfx",
                  "qfx", "ustm"]
    # start from the same neutral-ish carries in both paths
    for k in ("mol", "rmol", "zol", "hfx", "qfx"):
        inp[k] = np.zeros(n)
    inp["qsfc"] = np.zeros(n)          # forces the sat init branch
    jcarry = {k: F32(inp[k]) for k in carry_keys}
    ocarry = [{k: float(inp[k][i]) for k in carry_keys}
              for i in range(n)]
    fn = jax.jit(W.sfclay)
    for step in range(nsteps):
        tsk = inp["tsk"] + 1.3 * step
        ux = inp["ux"] * (1.0 + 0.07 * step)
        base = dict(inp, tsk=tsk, ux=ux)
        got = fn(**{k: (F32(base[k]) if k not in carry_keys
                        else jcarry[k]) for k in base})
        jcarry = {k: got[k] for k in carry_keys}
        for i in range(n):
            r = O.sfclay1d_oracle(
                **{k: (base[k][i] if k not in carry_keys
                       else ocarry[i][k]) for k in base})
            ocarry[i] = {k: r[k] for k in carry_keys}
    for k, tol, floor in (("ust", 5e-3, 1e-3), ("znt", 5e-3, 1e-5),
                          ("mol", 1e-2, 1e-2), ("qsfc", 5e-3, 1e-5),
                          ("hfx", 2e-2, 5.0), ("qfx", 2e-2, 1e-6)):
        want = np.array([c[k] for c in ocarry])
        rel = _rel(np.asarray(jcarry[k], np.float64), want, floor)
        assert np.max(rel) < tol, (
            f"{k}: max rel {np.max(rel):.3e} at {np.argmax(rel)}")


def test_sfclay_regime3_exact_zero_br():
    """Forced-convection regime (BR == 0.0) is reachable only through
    the MOL<0 clamp (:494); both implementations must take it."""
    n = 8
    inp = _sfclay_inputs(n)
    inp["mol"] = np.full(n, -0.2)            # previously unstable
    inp["tsk"] = inp["t1d"] - 12.0           # now stable: dthvdz > 0
    inp["qsfc"] = np.zeros(n)                # recomputed from tsk
    got = W.sfclay(**{k: F32(v) for k, v in inp.items()})
    want_regime = np.zeros(n)
    for i in range(n):
        r = O.sfclay1d_oracle(**{k: v[i] for k, v in inp.items()})
        want_regime[i] = r["regime"]
    assert np.all(want_regime == 3.0)
    np.testing.assert_array_equal(np.asarray(got["regime"]), want_regime)


def test_sfclay_isfflx0_and_scm_paths():
    """ISFFLX=0 (no-flux) zeroes the flux outputs; SCM_FORCE_FLUX
    passes prescribed fluxes through untouched (:833-858)."""
    n = 16
    inp = _sfclay_inputs(n)
    j32 = {k: F32(v) for k, v in inp.items()}
    out0 = W.sfclay(**j32, isfflx=0)
    assert np.all(np.asarray(out0["hfx"]) == 0.0)
    assert np.all(np.asarray(out0["qfx"]) == 0.0)
    assert np.all(np.asarray(out0["flhc"]) == 0.0)
    out_scm = W.sfclay(**j32, scm_force_flux=True)
    np.testing.assert_allclose(np.asarray(out_scm["hfx"]), inp["hfx"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_scm["qfx"]), inp["qfx"],
                               rtol=1e-6)
