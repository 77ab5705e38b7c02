"""Pure-function unit tests per column subroutine (SURVEY §4 item 1).

Each physics helper is a deterministic given-state -> new-state map, so
these check them against independent references: numpy linear algebra
for the tridiagonal solve, closed forms for saturation vapor pressure,
and conservation/ordering invariants for the snow-layer mechanics and
the Mosaic-safe primitives in physics/common.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu import constants as C
from noahmp_tpu.physics.common import (take1, put1, add1, roll_to_front,
                                       atan_tpu, cumsum_small,
                                       first_true_idx, last_true_idx,
                                       sel, band, esat)
from noahmp_tpu.physics.soil_temp import tridiag_thomas
from noahmp_tpu.physics.phase import frh2o
from noahmp_tpu.physics.soil_water import wdfcnd1, wdfcnd2
from noahmp_tpu.physics.radiation import snow_age


# ---------------------------------------------------------------- common

def test_take_put_add_roll_match_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=7).astype(np.float32)
    for idx in (-1, 0, 3, 6):
        assert np.isclose(float(take1(jnp.asarray(a), idx)), a[idx])
        got = np.asarray(put1(jnp.asarray(a), idx, 9.5))
        want = a.copy(); want[idx] = 9.5
        np.testing.assert_allclose(got, want)
        got = np.asarray(add1(jnp.asarray(a), idx, 2.0))
        want = a.copy(); want[idx] += 2.0
        np.testing.assert_allclose(got, want, rtol=1e-6)
    for start in range(7):
        got = np.asarray(roll_to_front(jnp.asarray(a), start))
        np.testing.assert_allclose(got, np.roll(a, -start), rtol=1e-6)


def test_atan_cumsum_true_idx():
    x = np.linspace(-50, 50, 1001).astype(np.float32)
    np.testing.assert_allclose(np.asarray(atan_tpu(jnp.asarray(x))),
                               np.arctan(x), atol=2e-6)
    a = np.arange(6, dtype=np.float32).reshape(6)
    np.testing.assert_allclose(np.asarray(cumsum_small(jnp.asarray(a))),
                               np.cumsum(a))
    h = jnp.asarray(np.array([0, 0, 1, 0, 1, 0], bool))
    assert int(first_true_idx(h, -9)) == 2
    assert int(last_true_idx(h, -9)) == 4
    h0 = jnp.zeros(6, bool)
    assert int(first_true_idx(h0, -9)) == -9
    assert int(last_true_idx(h0, -9)) == -9


def test_sel_band_semantics():
    a = jnp.arange(4.0)
    np.testing.assert_allclose(np.asarray(sel(a > 1.5, a, -a)),
                               np.where(np.arange(4) > 1.5,
                                        np.arange(4.0), -np.arange(4.0)))
    # rank-expanding mask over a layer axis
    m = jnp.asarray([True, False])
    x = jnp.ones((2, 3))
    out = np.asarray(sel(m[:, None], x, 0.0))
    assert out[0].all() and not out[1].any()
    # bool-valued select stays correct through the int32 path
    out = np.asarray(sel(m, jnp.zeros(2, bool), jnp.ones(2, bool)))
    assert out.tolist() == [False, True]
    assert np.asarray(band(m, jnp.asarray([True, True]))).tolist() \
        == [True, False]


def test_esat_polynomials():
    # Lowe (1977) polynomials: known values within 1%
    esw, esi, desw, desi = esat(jnp.asarray([0.0, 20.0, -20.0]))
    esw, esi = np.asarray(esw), np.asarray(esi)
    assert abs(esw[0] - 611.0) / 611.0 < 0.01       # 0C: 611 Pa
    assert abs(esw[1] - 2339.0) / 2339.0 < 0.01     # 20C: 2.339 kPa
    assert abs(esi[2] - 103.0) / 103.0 < 0.02       # -20C ice: ~103 Pa
    # derivative ~ finite difference
    e1 = np.asarray(esat(jnp.asarray([10.001]))[0])
    e0 = np.asarray(esat(jnp.asarray([9.999]))[0])
    fd = (e1 - e0) / 0.002
    an = float(np.asarray(esat(jnp.asarray([10.0]))[2])[0])
    assert abs(fd - an) / an < 1e-3


# ----------------------------------------------------------- tridiagonal

def test_tridiag_thomas_vs_numpy():
    rng = np.random.default_rng(1)
    k = 7
    for top in range(4):  # variable NTOP via identity rows, as callers do
        a = rng.uniform(0.1, 0.5, k).astype(np.float32)
        c = rng.uniform(0.1, 0.5, k).astype(np.float32)
        b = (1.0 + a + c + rng.uniform(0.5, 1.0, k)).astype(np.float32)
        r = rng.normal(size=k).astype(np.float32)
        a[-1] = a[-1]  # free
        # neutralize rows above NTOP with identity rows (callers'
        # convention for inactive snow layers)
        a[:top + 1] = np.where(np.arange(top + 1) < top, 0.0, 0.0)
        a[top] = 0.0
        c[-1] = 0.0
        b[:top] = 1.0
        a[:top] = 0.0
        c[:top] = 0.0
        r[:top] = 0.0
        x = np.asarray(tridiag_thomas(jnp.asarray(a), jnp.asarray(b),
                                      jnp.asarray(c), jnp.asarray(r)))
        m = np.zeros((k - top, k - top))
        for i in range(k - top):
            m[i, i] = b[top + i]
            if i > 0:
                m[i, i - 1] = a[top + i]
            if i < k - top - 1:
                m[i, i + 1] = c[top + i]
        want = np.linalg.solve(m, r[top:])
        np.testing.assert_allclose(x[top:], want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(x[:top], 0.0, atol=1e-6)


# -------------------------------------------------------- phase / soil

def _params_stub():
    import types
    return types.SimpleNamespace(
        bexp=jnp.asarray(4.74), psisat=jnp.asarray(0.141),
        smcmax=jnp.asarray(0.434), dksat=jnp.asarray(5.23e-6),
        dwsat=jnp.asarray(0.805e-5), smcwlt=jnp.asarray(0.047))


def test_frh2o_supercooled_properties():
    p = _params_stub()
    smc, sh2o = jnp.asarray(0.3), jnp.asarray(0.15)
    # warm: all liquid
    assert float(frh2o(p, jnp.asarray(C.TFRZ + 1.0), smc, sh2o)) \
        == pytest.approx(0.3)
    # colder -> less supercooled liquid, always in (0, smc]
    prev = 1.0
    for t in (272.5, 271.0, 268.0, 263.0):
        free = float(frh2o(p, jnp.asarray(t), smc, sh2o))
        assert 0.0 < free <= 0.3 + 1e-6
        assert free <= prev + 1e-6
        prev = free


def test_wdfcnd_monotonic():
    p = _params_stub()
    smcs = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    wdf1, wcnd1 = wdfcnd1(p, smcs, jnp.asarray(0.0))
    wdf1, wcnd1 = np.asarray(wdf1), np.asarray(wcnd1)
    assert (np.diff(wdf1) > 0).all() and (np.diff(wcnd1) > 0).all()
    # frozen soil damps conductivity (OPT_INF=2 liquid-only form)
    _, wcnd_ice = wdfcnd2(p, smcs, jnp.asarray(0.1))
    assert (np.asarray(wcnd_ice) <= wcnd1 + 1e-12).all()


def test_snow_age_bounds():
    # BATS snow age: fage in [0,1), tauss grows under aging, resets
    # toward 0 under heavy fresh snowfall (SWEMX dilution)
    tauss, fage = snow_age(3600.0, jnp.asarray(263.0), jnp.asarray(100.0),
                           jnp.asarray(100.0), jnp.asarray(0.5))
    assert 0.0 <= float(fage) < 1.0 and float(tauss) > 0.0
    tauss2, fage2 = snow_age(3600.0, jnp.asarray(263.0),
                             jnp.asarray(100.0), jnp.asarray(101.0),
                             jnp.asarray(0.5))
    assert float(tauss2) < 0.5  # fresh snow rejuvenates the surface


def test_glacier_order_and_slice():
    """glacier_order puts land-ice columns last as a stable permutation;
    glacier_slice_start validates tail contiguity."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from noahmp_tpu.grid.driver import (GridMasks, glacier_order,
                                        glacier_slice_start)

    g = np.array([0, 1, 0, 0, 1, 0], bool)
    perm, inv = glacier_order(g)
    assert list(perm) == [0, 2, 3, 5, 1, 4]
    assert (perm[inv] == np.arange(6)).all()
    masks = GridMasks(land=jnp.ones(6, bool), glacier=jnp.asarray(g[perm]))
    assert glacier_slice_start(masks) == 4
    # interleaved glaciers must be rejected
    bad = GridMasks(land=jnp.ones(6, bool), glacier=jnp.asarray(g))
    with pytest.raises(ValueError):
        glacier_slice_start(bad)
    # no glaciers -> None
    none = GridMasks(land=jnp.ones(6, bool),
                     glacier=jnp.zeros(6, bool))
    assert glacier_slice_start(none) is None


def test_land_compaction_roundtrip():
    """LandModel._cp gathers full-grid arrays to the compacted land
    axis and _expand_tree scatters back (water cells = fill)."""
    import numpy as np
    from noahmp_tpu.driver.model import LandModel

    m = object.__new__(LandModel)  # helpers only need these attrs
    m.land_idx = np.array([1, 3, 4])
    m.domain = type("D", (), {"ny": 1, "nx": 6})()

    full = np.arange(6, dtype=np.float32) * 10.0
    comp = m._cp(full)
    assert list(comp) == [10.0, 30.0, 40.0]
    back = m._expand_tree(comp, fill=-9.0)
    assert list(back) == [-9.0, 10.0, -9.0, 30.0, 40.0, -9.0]
    # int fields expand with 0 fill; 2-D fields keep trailing axes
    iarr = np.array([1, 2, 3], np.int32)
    assert list(m._expand_tree(iarr)) == [0, 1, 0, 2, 3, 0]
    two = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = m._expand_tree(two, fill=0.0)
    assert out.shape == (6, 2) and (out[3] == two[1]).all()


def _mkpack(nsnow=3, nsoil=4, **kw):
    import jax.numpy as jnp
    from noahmp_tpu.physics.snow import SnowPack
    f = jnp.float32
    d = dict(isnow=jnp.int32(0), snice=jnp.zeros(nsnow, f),
             snliq=jnp.zeros(nsnow, f), stc_sn=jnp.full(nsnow, 270.0, f),
             dz_sn=jnp.zeros(nsnow, f), sneqv=f(0.0), snowh=f(0.0),
             sice=jnp.zeros(nsoil, f), sh2o=jnp.full(nsoil, 0.3, f),
             ponding1=f(0.0), ponding2=f(0.0))
    d.update({k: (jnp.asarray(v, f) if k != "isnow" else jnp.int32(v))
              for k, v in kw.items()})
    return SnowPack(**d)


def test_csnow_yen_conductivity():
    """CSNOW (:1957-2012): tksno = 3.2217e-6 * bulk_density^2 (Yen 65);
    heat capacity is the ice/liquid volumetric mix."""
    import numpy as np
    import jax.numpy as jnp
    from noahmp_tpu.physics.thermal import csnow
    from noahmp_tpu import constants as C

    snice = jnp.array([0.0, 20.0, 40.0], jnp.float32)   # mm
    snliq = jnp.array([0.0, 2.0, 4.0], jnp.float32)
    dz = jnp.array([0.0, 0.10, 0.20], jnp.float32)
    th = csnow(jnp.int32(-2), snice, snliq, dz, 3)
    bd1 = (20.0 + 2.0) / 0.10
    assert np.isclose(float(th.tksno[1]), 3.2217e-6 * bd1**2, rtol=1e-5)
    snicev = 20.0 / (0.10 * C.DENICE)
    snliqv = 2.0 / (0.10 * C.DENH2O)
    assert np.isclose(float(th.cvsno[1]),
                      C.CICE * snicev + C.CWAT * snliqv, rtol=1e-5)
    # inactive top layer (isnow=-2 -> only bottom 2 active) stays zero
    assert float(th.tksno[0]) == 0.0


def test_tdfcnd_johansen():
    """TDFCND (:2014-2118): dry and saturated limits of the Johansen
    conductivity, Kersten interpolation in between."""
    import numpy as np
    import jax.numpy as jnp
    from noahmp_tpu.physics.thermal import tdfcnd
    from noahmp_tpu import constants as C

    class P:
        smcmax = jnp.float32(0.45)
        quartz = jnp.float32(0.25)

    gammd = (1.0 - 0.45) * 2700.0
    thkdry = (0.135 * gammd + 64.7) / (2700.0 - 0.947 * gammd)
    # near-dry soil -> dry conductivity (satratio < 0.1 -> ake = 0)
    df_dry = float(tdfcnd(P, jnp.float32(0.02), jnp.float32(0.02)))
    assert np.isclose(df_dry, thkdry, rtol=1e-5)
    # saturated unfrozen soil -> thksat
    thks = (7.7 ** 0.25) * (2.0 ** 0.75)
    thksat = (thks ** (1 - 0.45)) * (0.57 ** 0.45)
    df_sat = float(tdfcnd(P, jnp.float32(0.45), jnp.float32(0.45)))
    assert np.isclose(df_sat, thksat, rtol=1e-4)
    # frozen soil conducts better than unfrozen at the same moisture
    df_frz = float(tdfcnd(P, jnp.float32(0.45), jnp.float32(0.1)))
    assert df_frz > df_sat * 0.9  # ice conductivity dominates


def test_snowalb_bats_and_class():
    """SNOWALB_BATS (:2599-2650): fresh snow 0.95/0.65 vis/nir diffuse,
    aging and zenith corrections; SNOWALB_CLASS (:2652-2701): e-folding
    toward 0.55 and refresh toward 0.84 by new snowfall."""
    import numpy as np
    import jax.numpy as jnp
    from noahmp_tpu.physics.radiation import snowalb_bats, snowalb_class

    albsnd, albsni = snowalb_bats(jnp.float32(1.0), jnp.float32(1.0),
                                  jnp.float32(0.0))
    assert np.allclose(np.asarray(albsni), [0.95, 0.65])
    # high sun (cosz=1): cf1 = (1+0.5)/(1+4) - 0.5 < 0 -> no zenith term
    assert np.allclose(np.asarray(albsnd), np.asarray(albsni))
    # low sun brightens the direct albedo
    albsnd_lo, _ = snowalb_bats(jnp.float32(1.0), jnp.float32(0.1),
                                jnp.float32(0.0))
    assert (np.asarray(albsnd_lo) > np.asarray(albsnd)).all()
    # aged snow is darker
    _, albsni_old = snowalb_bats(jnp.float32(1.0), jnp.float32(1.0),
                                 jnp.float32(0.5))
    assert (np.asarray(albsni_old) < np.asarray(albsni)).all()

    # CLASS: no snowfall -> decay toward 0.55
    alb, _, _ = snowalb_class(jnp.float32(0.0), 3600.0, jnp.float32(0.84))
    assert np.isclose(float(alb), 0.55 + (0.84 - 0.55) * np.exp(-0.01),
                      rtol=1e-5)
    # heavy fresh snowfall -> refresh to 0.84
    alb2, _, _ = snowalb_class(jnp.float32(1.0), 3600.0, jnp.float32(0.6))
    assert np.isclose(float(alb2), 0.84, atol=1e-3)


def test_snowfall_layer_creation():
    """SNOWFALL (:6998-7063): layer-less accumulation until SNOWH >=
    0.025 m creates the first layer with TSNO=min(273.16, SFCTMP)."""
    import numpy as np
    import jax.numpy as jnp
    from noahmp_tpu.config import NoahMPConfig
    from noahmp_tpu.physics.snow import snowfall

    cfg = NoahMPConfig()
    qsnow = jnp.float32(0.005)        # mm/s SWE
    snowhin = jnp.float32(5e-6)       # m/s depth
    # below threshold: stays layer-less
    pk = _mkpack(snowh=0.004, sneqv=4.0)
    out = snowfall(cfg, pk, qsnow, snowhin, jnp.float32(268.0))
    assert int(out.isnow) == 0
    assert np.isclose(float(out.snowh), 0.004 + 5e-6 * cfg.dt)
    # crossing 0.025 m: first layer appears at the bottom slot
    pk = _mkpack(snowh=0.024, sneqv=10.0)
    out = snowfall(cfg, pk, qsnow, snowhin, jnp.float32(268.0))
    assert int(out.isnow) == -1
    assert np.isclose(float(out.dz_sn[2]), 0.024 + 5e-6 * cfg.dt)
    assert np.isclose(float(out.snice[2]), 10.0 + 0.005 * cfg.dt)
    assert float(out.stc_sn[2]) == 268.0
    # snowfall onto an existing pack adds to the top active layer
    pk = _mkpack(isnow=-1, snowh=0.05, sneqv=20.0,
                 snice=[0.0, 0.0, 20.0], dz_sn=[0.0, 0.0, 0.05])
    out = snowfall(cfg, pk, qsnow, snowhin, jnp.float32(268.0))
    assert np.isclose(float(out.snice[2]), 20.0 + 0.005 * cfg.dt)


def test_oracle_cache_keying(tmp_path, monkeypatch):
    """tests/oracle_cache.py: round-trip, key sensitivity (any input
    change misses), and source-hash invalidation (an oracle edit busts
    every entry)."""
    import oracle_cache as oc
    monkeypatch.setattr(oc, "CACHE_DIR", tmp_path)
    key = {"kind": "t", "par": {"a": 1.0}, "fices": [[0.0, 0.5]]}
    data = {"tg": np.arange(4.0), "smc1": np.ones(4)}
    assert oc.get(key) is None
    oc.put(key, data)
    back = oc.get(key)
    np.testing.assert_array_equal(back["tg"], data["tg"])
    # any input perturbation is a different entry
    assert oc.get({**key, "fices": [[0.0, 0.5000001]]}) is None
    # an oracle-source change invalidates everything
    monkeypatch.setattr(oc, "_SRC_HASH", "deadbeefdeadbeef")
    assert oc.get(key) is None
