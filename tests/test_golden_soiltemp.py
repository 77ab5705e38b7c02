"""Golden-parity sweep: TSNOSOI/HRT/HSTEP/ROSR12 vs the scalar Fortran
oracle (tests/oracles/soiltemp.py) over opt_stc x opt_tbot."""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.physics.soil_temp import tsnosoi

from oracles import soiltemp as O

RNG = np.random.default_rng(20260819)
N = 160
NSNOW, NSOIL = 3, 4
ZSOIL = (-0.1, -0.4, -1.0, -2.0)


class _P(NamedTuple):
    zbot: jnp.ndarray


@pytest.mark.parametrize("opt_stc", [1, 2])
@pytest.mark.parametrize("opt_tbot", [1, 2])
def test_tsnosoi_vs_oracle(opt_stc, opt_tbot):
    n = N
    cfg = NoahMPConfig(opt_stc=opt_stc, opt_tbot=opt_tbot)
    dt = cfg.dt

    cols = []
    for i in range(n):
        isnow = int(RNG.integers(-NSNOW, 1))
        dz_sn = np.zeros(NSNOW)
        for k in range(NSNOW + isnow, NSNOW):
            dz_sn[k] = RNG.uniform(0.01, 0.4)
        snowh = dz_sn.sum()
        # zsnso: cumulative negative depths, snow then soil
        z = []
        cum = 0.0
        for k in range(NSNOW):
            cum += dz_sn[k]
            z.append(-cum if dz_sn[k] > 0 else 0.0)
        for k in range(NSOIL):
            z.append(ZSOIL[k] - snowh)
        stc = RNG.uniform(250.0, 290.0, NSNOW + NSOIL)
        df = RNG.uniform(0.08, 2.8, NSNOW + NSOIL)
        hcpct = RNG.uniform(0.4e6, 3.2e6, NSNOW + NSOIL)
        cols.append(dict(isnow=isnow, zsnso=np.asarray(z), stc=stc,
                         df=df, hcpct=hcpct, snowh=snowh,
                         tbot=RNG.uniform(270.0, 288.0),
                         ssoil=RNG.uniform(-120.0, 250.0),
                         tg=RNG.uniform(255.0, 295.0)))

    f32 = lambda key: jnp.asarray(np.stack([c[key] for c in cols]),
                                  jnp.float32)
    isnow = jnp.asarray([c["isnow"] for c in cols], jnp.int32)
    p = _P(zbot=jnp.full(n, -8.0, jnp.float32))
    dz_dummy = jnp.zeros((n, NSNOW + NSOIL), jnp.float32)

    fn = jax.jit(jax.vmap(lambda pp, isn, z, s, tb, ss, d, h, sh:
                          tsnosoi(cfg, pp, isn, z, dz_dummy[0], s, tb,
                                  ss, d, h, sh)))
    out = fn(p, isnow, f32("zsnso"), f32("stc"), f32("tbot"),
             f32("ssoil"), f32("df"), f32("hcpct"), f32("snowh"))

    for i, c in enumerate(cols):
        J = lambda arr: {j: float(arr[j + NSNOW - 1])
                         for j in range(-NSNOW + 1, NSOIL + 1)}
        want = O.tsnosoi(
            NSNOW, NSOIL, c["isnow"], 1, c["tbot"], J(c["zsnso"]),
            c["ssoil"], J(c["df"]), J(c["hcpct"]), -8.0, 0.0, dt,
            c["snowh"], None, c["tg"], J(c["stc"]), opt_stc, opt_tbot)
        for jf in range(c["isnow"] + 1, NSOIL + 1):
            k = jf + NSNOW - 1
            np.testing.assert_allclose(
                float(out[i, k]), want[jf], rtol=1e-5, atol=2e-3,
                err_msg=f"stc J={jf} col={i} isnow={c['isnow']} "
                        f"opt_stc={opt_stc} opt_tbot={opt_tbot}")
