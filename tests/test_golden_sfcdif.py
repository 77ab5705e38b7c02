"""Golden-parity sweeps: SFCDIF1 / SFCDIF2 / RAGRB iteration
trajectories vs scalar Fortran oracles (tests/oracles/sfcdif.py).

Each case drives NITER iterations with an externally-prescribed
sensible-heat (or theta) trajectory, mimicking how VEGE_FLUX/BARE_FLUX
call the schemes inside their Newton loops, and compares the carried
state and outputs after every iteration."""

import numpy as np
import jax
import jax.numpy as jnp

from noahmp_tpu.physics import sfc_exchange as SX
from noahmp_tpu.physics.sfcdif2 import sfcdif2
from noahmp_tpu.physics.common import MPE

from oracles import sfcdif as O

RNG = np.random.default_rng(20260819)
N = 128
NITER = 5


def test_sfcdif1_trajectory_vs_oracle():
    n = N
    sfctmp = RNG.uniform(250.0, 310.0, n)
    rhoair = RNG.uniform(0.9, 1.4, n)
    qair = RNG.uniform(1e-4, 2e-2, n)
    zlvl = np.full(n, 30.0)
    zpd = RNG.uniform(0.0, 15.0, n)
    z0m = RNG.uniform(0.002, 1.0, n)
    z0h = z0m * RNG.uniform(0.1, 1.0, n)
    ur = RNG.uniform(1.0, 15.0, n)
    # per-iteration H trajectory: sign flips exercise the MOZSGN latch
    h_traj = RNG.uniform(-200.0, 300.0, (NITER, n))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    jit_step = jax.jit(jax.vmap(SX.sfcdif1,
                                in_axes=(None, 0, 0, 0, 0, 0, None, 0, 0, 0, 0)))

    st = SX.Sfcdif1State(
        moz=jnp.zeros(n), mozsgn=jnp.zeros(n, jnp.int32),
        fm=jnp.zeros(n), fh=jnp.zeros(n), fm2=jnp.zeros(n),
        fh2=jnp.zeros(n), fv=jnp.full(n, 0.1, jnp.float32))
    ost = [dict(moz=0.0, mozsgn=0, fm=0.0, fh=0.0, fm2=0.0, fh2=0.0,
                fv=0.1) for _ in range(n)]

    for it in range(NITER):
        out = jit_step(it, st, f32(sfctmp), f32(rhoair), f32(h_traj[it]),
                       f32(qair), 30.0, f32(zpd), f32(z0m), f32(z0h),
                       f32(ur))
        st = out.state
        for i in range(n):
            r = O.sfcdif1(it + 1, sfctmp[i], rhoair[i], h_traj[it, i],
                          qair[i], zlvl[i], zpd[i], z0m[i], z0h[i],
                          ur[i], MPE, ost[i]["moz"], ost[i]["mozsgn"],
                          ost[i]["fm"], ost[i]["fh"], ost[i]["fm2"],
                          ost[i]["fh2"], ost[i]["fv"])
            ost[i] = r
            msg = f"iter={it+1} col={i}"
            assert int(st.mozsgn[i]) == r["mozsgn"], f"mozsgn {msg}"
            np.testing.assert_allclose(float(out.cm[i]), r["cm"],
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=f"cm {msg}")
            np.testing.assert_allclose(float(out.ch[i]), r["ch"],
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=f"ch {msg}")
            np.testing.assert_allclose(float(out.fv[i]), r["fv"],
                                       rtol=2e-3, atol=1e-5,
                                       err_msg=f"fv {msg}")
            np.testing.assert_allclose(float(out.ch2[i]), r["ch2"],
                                       rtol=2e-3, atol=1e-5,
                                       err_msg=f"ch2 {msg}")
            np.testing.assert_allclose(float(st.moz[i]), r["moz"],
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=f"moz {msg}")


def test_sfcdif2_trajectory_vs_oracle():
    n = N
    z0 = RNG.uniform(0.002, 1.0, n)
    thz0 = RNG.uniform(255.0, 305.0, n)
    czil = np.full(n, 0.1)
    zlm = np.full(n, 30.0)
    sfcspd = RNG.uniform(0.5, 15.0, n)
    th_traj = thz0[None, :] + RNG.uniform(-8.0, 8.0, (NITER, n))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    jit_step = jax.jit(jax.vmap(
        sfcdif2, in_axes=(None, 0, 0, 0, 0, 0, None, 0, 0, 0, 0, 0)))

    # caller init (VEGE_FLUX :3266-3270 / BARE_FLUX): cm/ch seeded,
    # folded with UR into AKMS/AKHS
    cm0 = RNG.uniform(0.001, 0.01, n)
    akms = f32(cm0 * sfcspd)
    akhs = f32(cm0 * sfcspd)
    rlmo = jnp.zeros(n)
    wstar2 = jnp.zeros(n)
    ustar = jnp.full(n, 0.1, jnp.float32)
    ost = [dict(akms=float(akms[i]), akhs=float(akhs[i]), rlmo=0.0,
                wstar2=0.0, ustar=0.1) for i in range(n)]

    for it in range(NITER):
        akms, akhs, rlmo, wstar2, ustar = jit_step(
            it, f32(z0), f32(thz0), f32(th_traj[it]), f32(sfcspd),
            f32(czil), 30.0, akms, akhs, rlmo, wstar2, ustar)
        for i in range(n):
            r = O.sfcdif2(it + 1, z0[i], thz0[i], th_traj[it, i],
                          sfcspd[i], czil[i], zlm[i], ost[i]["akms"],
                          ost[i]["akhs"], ost[i]["rlmo"],
                          ost[i]["wstar2"], ost[i]["ustar"])
            ost[i] = dict(zip(("akms", "akhs", "rlmo", "wstar2",
                               "ustar"), r))
            msg = f"iter={it+1} col={i}"
            np.testing.assert_allclose(float(akms[i]), r[0], rtol=3e-3,
                                       atol=1e-5, err_msg=f"akms {msg}")
            np.testing.assert_allclose(float(akhs[i]), r[1], rtol=3e-3,
                                       atol=1e-5, err_msg=f"akhs {msg}")
            np.testing.assert_allclose(float(ustar[i]), r[4], rtol=3e-3,
                                       atol=1e-5, err_msg=f"ustar {msg}")


def test_ragrb_trajectory_vs_oracle():
    n = N
    vai = RNG.uniform(0.3, 6.0, n)
    rhoair = RNG.uniform(0.9, 1.4, n)
    tah = RNG.uniform(260.0, 310.0, n)
    hcan = RNG.uniform(0.5, 20.0, n)
    zpd = 0.65 * hcan
    z0mg = RNG.uniform(0.002, 0.05, n)
    z0hg = z0mg
    z0m = 0.1 * hcan
    z0h = z0m
    uc = RNG.uniform(0.3, 8.0, n)
    fv = RNG.uniform(0.05, 1.5, n)
    cwp = RNG.uniform(0.09, 5.0, n)
    dleaf = np.full(n, 0.04)
    hg_traj = RNG.uniform(-150.0, 250.0, (NITER, n))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    jit_step = jax.jit(jax.vmap(
        SX.ragrb,
        in_axes=(None,) + (0,) * 15))

    mozg = jnp.zeros(n)
    fhg = jnp.zeros(n)
    ost = [dict(mozg=0.0, fhg=0.0) for _ in range(n)]
    for it in range(NITER):
        out = jit_step(it, f32(vai), f32(rhoair), f32(hg_traj[it]),
                       f32(tah), f32(zpd), f32(z0mg), f32(z0hg),
                       f32(hcan), f32(uc), f32(z0h), f32(fv), f32(cwp),
                       f32(dleaf), mozg, fhg)
        mozg, fhg = out.mozg, out.fhg
        for i in range(n):
            r = O.ragrb(it + 1, vai[i], rhoair[i], hg_traj[it, i],
                        tah[i], zpd[i], z0mg[i], z0hg[i], hcan[i],
                        uc[i], z0h[i], fv[i], cwp[i], dleaf[i], MPE,
                        ost[i]["mozg"], ost[i]["fhg"])
            ost[i] = r
            msg = f"iter={it+1} col={i}"
            np.testing.assert_allclose(float(out.rahg[i]), r["rahg"],
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=f"rahg {msg}")
            np.testing.assert_allclose(float(out.rb[i]), r["rb"],
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=f"rb {msg}")
            np.testing.assert_allclose(float(out.fhg[i]), r["fhg"],
                                       rtol=2e-3, atol=1e-5,
                                       err_msg=f"fhg {msg}")
