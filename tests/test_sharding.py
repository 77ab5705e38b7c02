"""Distributed-execution tests (SURVEY §4 item 4 + halo correctness
item 6): single-device vs multi-device results must match, including
the lateral-flow stencil across shard boundaries — the test the
reference never had (its MPI version has a tile-seam bug, SURVEY §2.3).

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from noahmp_tpu.config import NoahMPConfig
from noahmp_tpu.driver.synthetic import synthetic_grid, synthetic_forcing
from noahmp_tpu.grid.driver import grid_step
from noahmp_tpu.grid.sharding import make_mesh, shard_columns
from noahmp_tpu.grid.lateral import lateralflow


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_column_sharding_equivalence():
    n = 128
    cfg, params, state, masks, accum, _, _ = synthetic_grid(n)
    forcing = synthetic_forcing(n, hour=12.0)

    step = jax.jit(lambda p, s, f, m, a: grid_step(cfg, p, s, f, m, a))
    s1, d1, a1 = step(params, state, forcing, masks, accum)

    mesh = make_mesh(jax.devices()[:8])
    sh = lambda t: shard_columns(t, mesh)
    s8, d8, a8 = step(sh(params), sh(state), sh(forcing), sh(masks),
                      sh(accum))

    np.testing.assert_allclose(np.asarray(s8.tg), np.asarray(s1.tg),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.smc), np.asarray(s1.smc),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(d8.fsh), np.asarray(d1.fsh),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_lateralflow_halo_across_shards():
    """The D8 stencil sharded over rows must equal the unsharded
    result — XLA inserts the halo exchange the reference's MPI path
    lacked."""
    ny, nx = 32, 16
    rng = np.random.RandomState(0)
    wtd = (-3.0 + rng.rand(ny, nx)).astype(np.float32)
    klat = np.full((ny, nx), 2.0e-5, np.float32)
    fdepth = np.full((ny, nx), 100.0, np.float32)
    topo = (100.0 + 10.0 * rng.rand(ny, nx)).astype(np.float32)
    lm = np.ones((ny, nx), np.int32)
    area = np.full((ny, nx), 1.0e6, np.float32)

    f = jax.jit(lambda w, k, fd, t, l, a:
                lateralflow(w, k, fd, t, l, a, 1800.0))
    q1 = np.asarray(f(wtd, klat, fdepth, topo, lm, area))

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:8]), ("y",))
    row_sh = NamedSharding(mesh, P("y"))
    put = lambda x: jax.device_put(x, row_sh)
    q8 = np.asarray(f(put(wtd), put(klat), put(fdepth), put(topo),
                      put(lm), put(area)))

    np.testing.assert_allclose(q8, q1, rtol=1e-6, atol=1e-12)
    assert np.abs(q1).max() > 0.0, "stencil produced no flow"


def test_compacted_glacier_path_matches_auto():
    """The compacted glacier path (glacier columns ordered last, solved
    as a static tail slice) must match the full-width masked path, and
    must also run under an 8-device column sharding."""
    import numpy as np
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from noahmp_tpu.driver.synthetic import synthetic_grid, synthetic_forcing
    from noahmp_tpu.grid.driver import (grid_step, glacier_order,
                                        glacier_slice_start, GridMasks)

    n = 192
    cfg, params, state, masks, accum, _, _ = synthetic_grid(n)
    f = synthetic_forcing(n, hour=12.0)

    perm, inv = glacier_order(masks.glacier)
    permd, invd = jnp.asarray(perm), jnp.asarray(inv)
    reorder = lambda tree, ix: jtu.tree_map(
        lambda x: x[ix] if getattr(x, "ndim", 0) >= 1
        and x.shape[0] == n else x, tree)
    pparams, pstate, paccum, pf = (reorder(params, permd),
                                   reorder(state, permd),
                                   reorder(accum, permd), reorder(f, permd))
    pmasks = GridMasks(land=masks.land[permd], glacier=masks.glacier[permd])
    gi = glacier_slice_start(pmasks)
    assert gi == n - n // 12

    s1, d1, a1 = jax.jit(
        lambda: grid_step(cfg, params, state, f, masks, accum))()
    s2p, d2p, a2p = jax.jit(
        lambda: grid_step(cfg, pparams, pstate, pf, pmasks, paccum,
                          glacier_idx=gi))()
    # un-permute the compacted results back to the original layout
    s2, d2, a2 = (reorder(s2p, invd), reorder(d2p, invd),
                  reorder(a2p, invd))
    # compaction changes the glacier batch shape, so XLA fusion order
    # differs by ulps; tolerances reflect float32 reassociation only
    for name in s1.__dataclass_fields__:
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
            rtol=2e-5, atol=1e-5, err_msg=name)
    # diag atol covers the err* closure residuals, which are machine
    # noise around zero (vs the model's own 0.01 W/m2 check tolerance)
    for name in d1._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(d1, name)), np.asarray(getattr(d2, name)),
            rtol=2e-5, atol=1e-4, err_msg=name)

    # and under a column-sharded mesh
    from noahmp_tpu.grid.sharding import make_mesh, shard_columns
    mesh = make_mesh(jax.devices()[:8])
    sp = shard_columns(pparams, mesh)
    ss = shard_columns(pstate, mesh)
    sf = shard_columns(pf, mesh)
    sm = shard_columns(pmasks, mesh)
    sa = shard_columns(paccum, mesh)
    s3, d3, a3 = jax.jit(
        lambda p, s, fo, m, a: grid_step(cfg, p, s, fo, m, a,
                                         glacier_idx=gi))(sp, ss, sf, sm, sa)
    np.testing.assert_allclose(np.asarray(s3.tg)[inv], np.asarray(s1.tg),
                               rtol=1e-6)


def test_biome_bucketing_matches_auto():
    """[veg | bare | glacier] ordering with the canopy solver statically
    skipped on the bare slice (grid_step bare_idx) must reproduce the
    full-width masked path: identical state, identical blended fluxes.
    Canopy-solver raw diagnostics (SHC/SHG/IRG/...) are compared only on
    non-bare columns — on statically-bare ones the reference never
    calls VEGE_FLUX either (module_sf_noahmplsm.F90:1704), so those
    lanes are meaningless in both designs."""
    from noahmp_tpu.grid.driver import grid_step, biome_order, GridMasks

    # same n/forcing as test_compacted_glacier_path_matches_auto so the
    # full-width baseline compile is shared through the persistent cache
    n = 192
    cfg, params, state, masks, accum, _, _ = synthetic_grid(n)
    f = synthetic_forcing(n, hour=12.0)
    vegtyp = np.asarray(params.vegtyp)

    perm, inv, bs, gs = biome_order(cfg, vegtyp, masks.glacier)
    assert bs < gs < n            # synthetic grid has bare + glacier
    permd, invd = jnp.asarray(perm), jnp.asarray(inv)
    reorder = lambda tree, ix: jtu.tree_map(
        lambda x: x[ix] if getattr(x, "ndim", 0) >= 1
        and x.shape[0] == n else x, tree)
    pparams, pstate, paccum, pf = (reorder(params, permd),
                                   reorder(state, permd),
                                   reorder(accum, permd),
                                   reorder(f, permd))
    pmasks = GridMasks(land=masks.land[permd],
                       glacier=masks.glacier[permd])

    s1, d1, a1 = jax.jit(
        lambda: grid_step(cfg, params, state, f, masks, accum))()
    s2p, d2p, a2p = jax.jit(
        lambda: grid_step(cfg, pparams, pstate, pf, pmasks, paccum,
                          glacier_idx=gs, bare_idx=bs))()
    s2, d2, a2 = (reorder(s2p, invd), reorder(d2p, invd),
                  reorder(a2p, invd))

    for name in s1.__dataclass_fields__:
        np.testing.assert_allclose(
            np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name)),
            rtol=2e-5, atol=1e-5, err_msg=name)

    bare_cols = np.zeros(n, bool)
    bare_cols[perm[bs:gs]] = True
    veg_only_diags = {"shg", "shc", "evg", "ghv", "irg", "irc", "tr",
                      "evc", "chleaf", "chuc", "chv2", "t2mv", "q2v"}
    for name in d1._fields:
        x1 = np.asarray(getattr(d1, name))
        x2 = np.asarray(getattr(d2, name))
        if name in veg_only_diags:
            x1, x2 = x1[~bare_cols], x2[~bare_cols]
        np.testing.assert_allclose(x1, x2, rtol=2e-5, atol=1e-4,
                                   err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_landmodel_sharded_production_equivalence(tmp_path):
    """VERDICT r3 next #5: the FULL production LandModel — cold-start
    init, the K-step chunked scan with on-device forcing derivation,
    the per-STEPWTD MMF groundwater update fused into the step
    (opt_run=5, stepwtd boundary on every step at dt=3600), and the
    history/restart writers — run with every column-axis array sharded
    over the 8-device mesh must reproduce the single-device run after
    48 steps: final state, accumulators, history files, restart
    files."""
    import sys
    from pathlib import Path
    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "examples"))
    import make_demo_case as demo
    from noahmp_tpu.driver.namelist import read_namelist
    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.io import netcdf_io as ncio

    ny = nx = 8
    case = tmp_path
    (case / "input").mkdir()
    demo.write_domain(str(case / "domain.nc"), ny, nx)
    demo.write_init(str(case / "init.nc"), ny, nx)
    demo.write_forcings(str(case / "input"), ny, nx, 2)
    (case / "noahmp.namelist").write_text(
        demo.NAMELIST.format(case=case.resolve(), ndays=2, opt_run=5))

    def run(tag, shard):
        cfg, rs = read_namelist(str(case / "noahmp.namelist"))
        rs.outdir = str(case / f"out_{tag}")
        rs.resdir = str(case / f"res_{tag}")
        m = LandModel.from_namelist(cfg, rs)
        if shard:
            mesh = make_mesh(jax.devices()[:8])
            m.params, m.state, m.masks, m.accum = (
                shard_columns(t, mesh)
                for t in (m.params, m.state, m.masks, m.accum))
            assert m.mmf is not None, "opt_run=5 case must carry MMF"
            m.mmf = shard_columns(m.mmf, mesh)
        m.run(nsteps=48)
        m.flush_io()
        return m

    m1 = run("one", shard=False)
    m8 = run("shard", shard=True)
    assert m1.itime == m8.itime == 48 and m1.date == m8.date

    for name in m1.state.__dataclass_fields__:
        np.testing.assert_allclose(
            np.asarray(getattr(m8.state, name)),
            np.asarray(getattr(m1.state, name)),
            rtol=1e-4, atol=5e-5, err_msg=f"state.{name}")
    for name in m1.accum._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(m8.accum, name)),
            np.asarray(getattr(m1.accum, name)),
            rtol=1e-4, atol=1e-4, err_msg=f"accum.{name}")
    for name in m1.mmf._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(m8.mmf, name)),
            np.asarray(getattr(m1.mmf, name)),
            rtol=1e-4, atol=5e-5, err_msg=f"mmf.{name}")

    outs1 = sorted((case / "out_one").glob("output.*.nc"))
    outs8 = sorted((case / "out_shard").glob("output.*.nc"))
    assert outs1 and [p.name for p in outs1] == [p.name for p in outs8]
    rst1 = sorted((case / "res_one").glob("restart.*.nc"))
    rst8 = sorted((case / "res_shard").glob("restart.*.nc"))
    assert rst1 and [p.name for p in rst1] == [p.name for p in rst8]
    with ncio.open_nc(str(outs1[-1])) as n1, \
            ncio.open_nc(str(outs8[-1])) as n2:
        for v in ("TG", "SOIL_M", "ZWT", "FSA", "SFCRNOFF", "QRF",
                  "QSLAT", "SNEQV"):
            if v in n1.variables:
                np.testing.assert_allclose(
                    np.array(n2.variables[v][:]),
                    np.array(n1.variables[v][:]),
                    rtol=1e-4, atol=1e-4, err_msg=v)
    with ncio.open_nc(str(rst1[-1])) as n1, \
            ncio.open_nc(str(rst8[-1])) as n2:
        for v in ("SOIL_T", "SMC", "ZWT", "SNEQV", "SMOISEQ"):
            if v in n1.variables:
                np.testing.assert_allclose(
                    np.array(n2.variables[v][:]),
                    np.array(n1.variables[v][:]),
                    rtol=1e-4, atol=1e-4, err_msg=v)
