"""Drive the WRF-coupling surface-layer entry points standalone.

Shows the API a coupled-atmosphere caller uses (the offline HRLDAS
driver never calls these — it consumes the SFCDIF3/4 slices inside the
column physics): build a batch of lowest-model-level columns, carry the
MYJSFC / SFCLAY INOUT state across steps, read back fluxes and shelter
diagnostics.

Run:  python examples/wrf_coupling_demo.py
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from noahmp_tpu.physics import wrf_coupling as W


def main():
    n, nz, nsteps = 1024, 8, 6
    rng = np.random.default_rng(7)
    f32 = lambda a: jnp.asarray(a, jnp.float32)

    # -- synthetic bottom-up profiles ------------------------------
    psfc = rng.uniform(8.5e4, 1.02e5, n)
    dz = rng.uniform(30.0, 80.0, (n, nz))
    zmid = np.cumsum(dz, 1) - 0.5 * dz
    t = rng.uniform(265.0, 305.0, n)[:, None] - 6.5e-3 * zmid
    pint = np.zeros((n, nz + 1))
    pint[:, 0] = psfc
    for k in range(nz):
        pint[:, k + 1] = pint[:, k] * np.exp(
            -9.81 * dz[:, k] / (287.0 * t[:, k]))
    pmid = 0.5 * (pint[:, :-1] + pint[:, 1:])
    th = t * (1.0e5 / pmid) ** (2.0 / 7.0)
    qv = rng.uniform(5e-4, 1.2e-2, (n, nz))
    qc = np.zeros((n, nz))
    u = rng.uniform(-12.0, 12.0, (n, nz))
    v = rng.uniform(-12.0, 12.0, (n, nz))
    q2 = 0.6 * np.exp(-zmid / 400.0)          # TKE profile
    xland = np.where(np.arange(n) % 3 == 0, 2.0, 1.0)   # 1/3 water
    tsk = t[:, 0] + rng.uniform(-6.0, 6.0, n)
    mavail = np.where(xland > 1.5, 1.0, 0.3)
    z0base = np.where(xland > 1.5, 1.59e-5, 0.15)

    # -- MYJ: state carried across steps ---------------------------
    state = W.myjsfc_init(f32(z0base))
    step = {True: None, False: None}
    for s in range(nsteps):
        first = s == 0
        if step[first] is None:
            step[first] = jax.jit(
                lambda st, tsk_, _f=first: W.myjsfc(
                    st, _f, dz=f32(dz), pmid=f32(pmid), pint=f32(pint),
                    th=f32(th), t=f32(t), qv=f32(qv), qc=f32(qc),
                    u=f32(u), v=f32(v), q2=f32(q2), tsk=tsk_,
                    xland=f32(xland), mavail=f32(mavail),
                    z0base=f32(z0base)))
        state, d = step[first](state, f32(tsk + 0.5 * s))
        # over land QSFC is prognosed by the LSM between calls
        # (module_sf_myjsfc.F90:1041-1044 leaves it untouched);
        # emulate that coupling with a saturated-ground nudge
        qsat_g = 0.622 * 610.0 * np.exp(
            17.27 * (tsk - 273.15) / (tsk - 35.9)) / psfc
        lsm_qsfc = np.where(xland < 1.5, 0.5 * qsat_g,
                            np.asarray(state.qsfc))
        state = W.MYJSfcState(**{
            **{k: getattr(state, k) for k in
               ("ustar", "znt", "thz0", "qz0", "uz0", "vz0", "akhs",
                "akms", "rmol")},
            "qsfc": f32(lsm_qsfc)})
    land = xland < 1.5
    print(f"MYJSFC after {nsteps} steps over {n} columns "
          f"({int(land.sum())} land / {int((~land).sum())} water):")
    for k in ("hfx", "qfx", "u10", "t02", "pblh"):
        a = np.asarray(d[k])
        print(f"  {k:>5}: land mean {a[land].mean():10.4g}   "
              f"water mean {a[~land].mean():10.4g}")
    print(f"  ustar: land mean {np.asarray(state.ustar)[land].mean():.3f}  "
          f"water mean {np.asarray(state.ustar)[~land].mean():.3f}  "
          f"(Charnock znt over water: "
          f"{np.asarray(state.znt)[~land].mean():.2e} m)")

    # -- SFCLAY: same columns, revised-MM5 scheme ------------------
    carry = dict(znt=f32(z0base), ust=f32(np.full(n, 0.1)),
                 mol=f32(np.zeros(n)), rmol=f32(np.zeros(n)),
                 zol=f32(np.zeros(n)), qsfc=f32(np.zeros(n)),
                 hfx=f32(np.zeros(n)), qfx=f32(np.zeros(n)),
                 ustm=f32(np.full(n, 0.1)))
    sf = jax.jit(W.sfclay)
    for s in range(nsteps):
        out = sf(f32(u[:, 0]), f32(v[:, 0]), f32(t[:, 0]),
                 f32(qv[:, 0]), f32(pmid[:, 0]), f32(dz[:, 0]),
                 f32(psfc), f32(tsk + 0.5 * s), f32(xland),
                 f32(mavail), f32(np.full(n, 800.0)),
                 f32(np.full(n, 4000.0)), **carry)
        carry = {k: out[k] for k in carry}
    reg = np.asarray(out["regime"])
    print(f"\nSFCLAY after {nsteps} steps: regimes "
          + " ".join(f"{int(r)}:{int((reg == r).sum())}"
                     for r in (1.0, 2.0, 3.0, 4.0)))
    for k in ("hfx", "lh", "u10", "th2", "br"):
        a = np.asarray(out[k])
        print(f"  {k:>4}: mean {a.mean():10.4g}  "
              f"range [{a.min():.4g}, {a.max():.4g}]")


if __name__ == "__main__":
    main()
