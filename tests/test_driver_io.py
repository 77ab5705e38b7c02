"""End-to-end driver + NetCDF I/O tests: namelist parsing, domain read,
forcing time-interpolation, history output, and restart round-trip
equality (SURVEY §4 items 5-6)."""

import numpy as np
import pytest
from scipy.io import netcdf_file

from noahmp_tpu.driver.namelist import read_namelist
from noahmp_tpu.driver.dates import geth_newdate, calc_declin
from noahmp_tpu.io import netcdf_io as ncio


def write_domain_file(path, ny, nx):
    with netcdf_file(path, "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        nc.DX = 1000.0
        nc.ISWATER = 16
        nc.ISICE = 24
        nc.ISURBAN = 1

        def mk(name, data, typ="f"):
            v = nc.createVariable(name, typ,
                                  ("Time", "south_north", "west_east"))
            v[0] = data

        yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        mk("XLAT", (35.0 + 0.01 * yy).astype(np.float32))
        mk("XLONG", (-100.0 + 0.01 * xx).astype(np.float32))
        veg = np.full((ny, nx), 7, np.int32)
        veg[0, 0] = 16  # one water cell
        mk("IVGTYP", veg, "i")
        soil = np.full((ny, nx), 3, np.int32)
        mk("ISLTYP", soil, "i")
        mk("XLAND", np.ones((ny, nx), np.float32))
        mk("SEAICE", np.zeros((ny, nx), np.float32))
        mk("HGT", (200.0 - 1.0 * xx).astype(np.float32))
        mk("TMN", np.full((ny, nx), 285.0, np.float32))


def write_forcings(indir, start, n_files, input_timestep, ny, nx):
    date = start
    for i in range(n_files):
        compact = date.replace("-", "").replace("_", "").replace(":", "")
        f = {
            "T2D": 280.0 + 5.0 * np.sin(i), "Q2D": 0.007,
            "U2D": 2.0, "V2D": 1.0, "PSFC": 95000.0,
            "LWDOWN": 330.0, "SWDOWN": max(0.0, 600.0 * np.sin(i / 2.0)),
            "RAINRATE": 0.0002 if i == 1 else 0.0,
        }
        ncio.write_forcing_file(
            f"{indir}/{compact[:10]}.LDASIN_DOMAIN1",
            {k: np.full((ny, nx), v, np.float32) for k, v in f.items()},
            ny, nx)
        date = geth_newdate(date, input_timestep)


@pytest.fixture
def setup_run(tmp_path):
    ny, nx = 6, 8
    dom = tmp_path / "domain.nc"
    write_domain_file(str(dom), ny, nx)
    indir = tmp_path / "input"
    indir.mkdir()
    write_forcings(str(indir), "2017-05-01_00:00:00", 10, 10800, ny, nx)
    nml = tmp_path / "noahmp.namelist"
    nml.write_text(f"""
&HRLDAS_NOAHMP
 CONST_FILE = '{dom}'
 INDIR = '{indir}'
 OUTDIR = '{tmp_path}/output'
 RESDIR = '{tmp_path}/restart'
 START_YEAR = 2017
 START_MONTH = 5
 START_DAY = 1
 START_HOUR = 0
 START_MIN = 0
 START_SEC = 0
 KDAY = 1
 DYNAMIC_VEG_OPTION = 3
 CANOPY_STOMATAL_RESISTANCE_OPTION = 1
 BTR_OPTION = 1
 RUNOFF_OPTION = 3
 SURFACE_DRAG_OPTION = 1
 FROZEN_SOIL_OPTION = 1
 SUPERCOOLED_WATER_OPTION = 1
 RADIATIVE_TRANSFER_OPTION = 3
 SNOW_ALBEDO_OPTION = 2
 PRECIPITATION_PARTITION_OPTION = 1
 TBOT_OPTION = 2
 TEMP_TIME_SCHEME_OPTION = 1
 INPUT_TIMESTEP = 10800
 MODEL_TIMESTEP = 3600
 OUTPUT_TIMESTEP = 10800
 RESTART_TIMESTEP = 21600
 NSOIL = 4
 soil_layer_thickness(1) = 0.10
 soil_layer_thickness(2) = 0.30
 soil_layer_thickness(3) = 0.60
 soil_layer_thickness(4) = 1.00
 ZLVL = 30.0
/
""")
    return tmp_path, nml, ny, nx


def test_namelist_parse(setup_run):
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))
    assert cfg.opt_run == 3 and cfg.dveg == 3
    assert cfg.dzs == (0.1, 0.3, 0.6, 1.0)
    assert rs.start_date == "2017-05-01_00:00:00"
    assert rs.ntime == 24


def test_calc_declin():
    cosz, julian = calc_declin("2017-06-21_12:00:00",
                               np.array([40.0]), np.array([0.0]))
    # local solar noon at lon 0 on solstice: cosz = cos(lat - 23.44)
    assert abs(julian - 171.5) < 0.01
    assert 0.93 < float(cosz[0]) < 1.0
    cosz_n, _ = calc_declin("2017-06-21_00:00:00",
                            np.array([40.0]), np.array([0.0]))
    assert float(cosz_n[0]) < 0.0


def test_run_and_restart_roundtrip(setup_run):
    from noahmp_tpu.driver.model import LandModel
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m = LandModel.from_namelist(cfg, rs)
    m.run(nsteps=6)

    # history file written at hour 3 and 6
    outs = sorted((tmp_path / "output").glob("output.*.nc"))
    assert len(outs) == 2
    with ncio.open_nc(str(outs[-1])) as nc:
        tg = np.array(nc.variables["TG"][0])
        assert tg.shape == (ny, nx)
        # water cell masked
        assert tg[0, 0] < -1e30
        assert np.isfinite(tg[1:, 1:]).all() and (tg[1:, 1:] > 200).all()
        assert b"".join(nc.variables["Times"][0]).decode() \
            == "2017-05-01_06:00:00"

    rsts = sorted((tmp_path / "restart").glob("restart.*.nc"))
    assert len(rsts) == 1  # hour 6

    # continue 2 more steps from the live model
    m.run(nsteps=2)
    tg_live = np.asarray(m.state.tg).copy()
    smc_live = np.asarray(m.state.smc).copy()

    # restart from the hour-6 file and run the same 2 steps
    rs2 = read_namelist(str(nml))[1]
    rs2.from_restart = True
    rs2.restart_file = rsts[0].name
    m2 = LandModel.from_namelist(cfg, rs2)
    assert m2.itime == 6   # derived from the restart timestamp
    m2.run(nsteps=2)

    land = ~(np.asarray(m.masks.land) == False)  # noqa: E712
    np.testing.assert_allclose(np.asarray(m2.state.tg)[land],
                               tg_live[land], rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(m2.state.smc)[land],
                               smc_live[land], rtol=0, atol=1e-5)


def test_domain_mminlu_selects_modis(setup_run, tmp_path):
    """The domain file's MMINLU global attribute overrides the namelist
    landuse scheme (module_hrldas_netcdf_io.F90:239)."""
    _, nml, ny, nx = setup_run
    dom2 = tmp_path / "domain_modis.nc"
    write_domain_file(str(dom2), ny, nx)
    with netcdf_file(str(dom2), "a") as nc:
        nc.MMINLU = b"MODIFIED_IGBP_MODIS_NOAH"
        nc.ISWATER = 17
        nc.ISICE = 15
        nc.ISURBAN = 13
        nc.variables["IVGTYP"][0] = np.full((ny, nx), 1, np.int32)

    d = ncio.read_domain(str(dom2))
    assert d.llanduse == "MODIFIED_IGBP_MODIS_NOAH"
    assert d.iswater == 17 and d.isice == 15

    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.driver.namelist import read_namelist as rn
    cfg, rs = rn(str(nml))
    rs.const_file = str(dom2)
    m = LandModel.from_namelist(cfg, rs)
    assert m.cfg.llanduse == "MODIFIED_IGBP_MODIS_NOAH"
    # MODIS table has 20 categories; vegtyp=1 (evergreen needleleaf)
    # has LAI_JAN 1.6 in the MODIS section (USGS vegtyp=1 is urban, 0.0)
    assert np.isclose(float(np.asarray(m.params.laim)[0, 0]), 1.6)


def test_init_file_cold_start(setup_run, tmp_path):
    """hrldas_init_read (:739-808): CANWAT/SKINTEMP/WEASD/SNODEP/STEMP/
    SMOIS from the init file seed the cold start; WEASD units are
    normalized and SNOW = WEASD*1000 mm (driver :263-266)."""
    _, nml, ny, nx = setup_run
    init = tmp_path / "init.nc"
    nsoil = 4
    with netcdf_file(str(init), "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("soil_layers_stag", nsoil)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)

        def mk2(name, val, units=None):
            v = nc.createVariable(name, "f", ("Time", "south_north",
                                              "west_east"))
            v[0] = np.full((ny, nx), val, np.float32)
            if units:
                v.units = units

        mk2("CANWAT", 0.15)
        mk2("SKINTEMP", 291.5)
        mk2("WEASD", 25.0, units="kg/m2")   # 25 mm SWE
        mk2("SNODEP", 0.12)
        # reference XZY layout: (Time, south_north, layers, west_east)
        # (make_var_att_3d :1932-1935) with per-layer-distinct STEMP so
        # a transposed read would be caught
        stemp_layers = np.array([288.0, 287.0, 286.0, 285.0], np.float32)
        for name, prof in (("STEMP", stemp_layers),
                           ("SMOIS", np.full(nsoil, 0.33, np.float32))):
            v = nc.createVariable(name, "f", ("Time", "south_north",
                                              "soil_layers_stag",
                                              "west_east"))
            v[0] = np.broadcast_to(prof[None, :, None],
                                   (ny, nsoil, nx)).astype(np.float32)

    ini, fndsnowh = ncio.read_init(str(init), nsoil)
    assert fndsnowh
    assert np.allclose(ini["weasd"], 0.025)  # kg/m2 -> m
    assert ini["smois"].shape == (nsoil, ny, nx)
    assert np.allclose(ini["stemp"][:, 0, 0], stemp_layers)

    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.driver.namelist import read_namelist as rn
    cfg, rs = rn(str(nml))
    rs.init_file = str(init)
    m = LandModel.from_namelist(cfg, rs)
    s = m.state
    assert np.allclose(np.asarray(s.smc), 0.33)
    assert np.allclose(np.asarray(s.sneqv), 25.0)   # mm
    assert np.allclose(np.asarray(s.snowh), 0.12)
    assert np.allclose(np.asarray(s.canliq) + np.asarray(s.canice), 0.15)
    assert np.allclose(np.asarray(s.stc[:, 3:]), stemp_layers[None, :])


def test_mmf_runoff_file_and_groundwater_init(setup_run, tmp_path):
    """read_mmf_runoff (:326-392) + GROUNDWATER_INIT (:1286-1471):
    layers below the water table start saturated, SMCWTD is physical,
    and the MMFState carries the file's river parameters."""
    _, nml, ny, nx = setup_run
    mmf_f = tmp_path / "mmf.nc"
    with netcdf_file(str(mmf_f), "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        vals = {"ZWT": -0.55, "EQZWT": -1.0, "RIVERBED": -3.0,
                "RIVERCOND": 0.05, "PEXP": 1.0, "FDEPTH": 80.0}
        for name, val in vals.items():
            v = nc.createVariable(name, "f", ("Time", "south_north",
                                              "west_east"))
            v[0] = np.full((ny, nx), val, np.float32)

    mr = ncio.read_mmf_runoff(str(mmf_f))
    assert np.allclose(mr["fdepth"], 80.0)

    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.driver.namelist import read_namelist as rn
    import dataclasses as dc
    cfg, rs = rn(str(nml))
    cfg = dc.replace(cfg, opt_run=5)
    rs.mmf_runoff_file = str(mmf_f)
    m = LandModel.from_namelist(cfg, rs)
    land = np.asarray(m.masks.land)
    smc = np.asarray(m.state.smc)
    zwt = np.asarray(m.state.zwt)
    smcwtd = np.asarray(m.state.smcwtd)
    # WTD at -0.55 m sits inside layer 3 (zsoil -0.4..-1.0): layers
    # below the diagnosed WT are saturated (smcmax for soiltyp 3 ~0.434)
    assert (smc[land, 3] > 0.42).all()
    assert (smcwtd[land] > 0.0).all() and (smcwtd[land] <= 0.47).all()
    assert np.isfinite(zwt[land]).all()
    assert float(np.asarray(m.mmf.rivercond)[0]) == np.float32(0.05)


def test_forcing_optional_vegfra_lai(tmp_path):
    """Optional VEGFRA/LAI in forcing files (hrldas_input_read
    :1238-1255): used when present, carried over when a later file
    lacks them, never time-interpolated."""
    ny, nx = 3, 4
    ind = tmp_path / "ind"
    ind.mkdir()
    base = {"T2D": 280.0, "Q2D": 0.007, "U2D": 2.0, "V2D": 1.0,
            "PSFC": 95000.0, "LWDOWN": 330.0, "SWDOWN": 0.0,
            "RAINRATE": 0.0}
    # file 0 has VEGFRA+LAI; file 1 doesn't; file 2 has new values
    dates = ["2017-05-01_00:00:00", "2017-05-01_03:00:00",
             "2017-05-01_06:00:00", "2017-05-01_09:00:00"]
    extras = [{"VEGFRA": 0.6, "LAI": 2.5}, {}, {"VEGFRA": 0.3}, {}]
    for date, ex in zip(dates, extras):
        compact = date.replace("-", "").replace("_", "").replace(":", "")
        path = f"{ind}/{compact[:10]}.LDASIN_DOMAIN1"
        ncio.write_forcing_file(
            path, {k: np.full((ny, nx), v, np.float32)
                   for k, v in base.items()}, ny, nx)
        if ex:
            with netcdf_file(path, "a") as nc:
                for k, v in ex.items():
                    var = nc.createVariable(
                        k, "f", ("Time", "south_north", "west_east"))
                    var[0] = np.full((ny, nx), v, np.float32)

    r = ncio.ForcingReader(str(ind), 10800)
    out0 = r.read(dates[0], 0)
    assert np.allclose(out0["VEGFRA"], 0.6) and np.allclose(out0["LAI"], 2.5)
    # mid-interval: still the carried (non-interpolated) values
    out_mid = r.read("2017-05-01_01:00:00", 3600)
    assert np.allclose(out_mid["VEGFRA"], 0.6)
    # second interval: file 1 lacks them -> carried from file 0
    out1 = r.read(dates[1], 10800)
    assert np.allclose(out1["VEGFRA"], 0.6) and np.allclose(out1["LAI"], 2.5)
    # third interval: VEGFRA updates, LAI still carried
    out2 = r.read(dates[2], 21600)
    assert np.allclose(out2["VEGFRA"], 0.3) and np.allclose(out2["LAI"], 2.5)


def test_legacy_init_reader_and_vertical_interp(tmp_path):
    """hrldas_init_read_old (:811-948) + hrldas_init_interp (:951-1067):
    per-level STEMP_k/SMOIS_k with layer_top/layer_bottom attrs are
    regridded by center-point rules (shallow/deep clamp, near-match
    copy, linear interpolation)."""
    ny, nx = 2, 3
    path = tmp_path / "old_init.nc"
    # source layers: standard Noah 10/30/60/100 cm
    tops = [0.0, 0.1, 0.4, 1.0]
    bots = [0.1, 0.4, 1.0, 2.0]
    vals_t = [285.0, 286.0, 287.0, 288.0]
    vals_m = [0.20, 0.25, 0.30, 0.35]
    with netcdf_file(str(path), "w") as nc:
        nc.TITLE = b"OUTPUT FROM CONSOLIDATE_GRIB v20120720"
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)

        def mk2(name, val, units=None, top=None, bot=None):
            v = nc.createVariable(name, "f", ("Time", "south_north",
                                              "west_east"))
            v[0] = np.full((ny, nx), val, np.float32)
            if units:
                v.units = units
            if top is not None:
                v.layer_top = np.float32(top)
                v.layer_bottom = np.float32(bot)

        mk2("CANWAT", 0.1)
        mk2("SKINTEMP", 290.0)
        mk2("WEASD", 30.0, units="mm")
        for k in range(4):
            mk2(f"STEMP_{k+1}", vals_t[k], top=tops[k], bot=bots[k])
            mk2(f"SMOIS_{k+1}", vals_m[k], top=tops[k], bot=bots[k])

    # identical destination layering -> near-match copies every level
    ini, fndsnowh, version = ncio.read_init_legacy(
        str(path), 4, [0.1, 0.3, 0.6, 1.0])
    assert version == 20120720
    assert not fndsnowh
    assert np.allclose(ini["weasd"], 0.030)
    for k in range(4):
        assert np.allclose(ini["stemp"][k], vals_t[k])
        assert np.allclose(ini["smois"][k], vals_m[k])

    # a shallower/finer destination grid exercises clamp + interp
    sldpth = [0.02, 0.2, 1.0, 2.0]  # centers 0.01, 0.12, 0.72, 2.22 m
    out = ncio.init_vertical_interp(
        sldpth, np.stack([np.full((ny, nx), v, np.float32)
                          for v in vals_t]),
        np.array(bots), np.array(tops))
    assert np.allclose(out[0], vals_t[0])      # shallow clamp
    assert np.allclose(out[3], vals_t[3])      # deep clamp
    # 0.12 m lies between source centers 0.05 and 0.25: linear
    frac = (0.25 - 0.12) / (0.25 - 0.05)
    assert np.allclose(out[1], vals_t[0] * frac + vals_t[1] * (1 - frac),
                       atol=1e-5)


def test_readsnow(tmp_path):
    """hrldas_readsnow (:1479-1532): WEASD unit normalization and the
    SNODEP = 10*WEASD fallback when SNODEP is missing."""
    path = tmp_path / "snow.nc"
    ny, nx = 2, 2
    with netcdf_file(str(path), "w") as nc:
        nc.createDimension("Time", 1)
        nc.createDimension("south_north", ny)
        nc.createDimension("west_east", nx)
        v = nc.createVariable("WEASD", "f", ("Time", "south_north",
                                             "west_east"))
        v[0] = np.full((ny, nx), 40.0, np.float32)
        v.units = "kg m-2"
    weasd, snodep = ncio.read_snow(str(path))
    assert np.allclose(weasd, 0.040)
    assert np.allclose(snodep, 0.40)


def test_cli_main(setup_run, capsys):
    """python -m noahmp_tpu equivalent of main_hrldas_noahmp.F90."""
    from noahmp_tpu.__main__ import main
    tmp, nml, ny, nx = setup_run
    rc = main([str(nml), "--steps", "2", "--probe"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "***DATE=" in out
    assert "probe @" in out


def test_bvocflux():
    """BVOCFLUX (module_sf_noahmplsm.F90:9107-9200): emission scales
    with temperature activity and is zero for zero foliage."""
    import jax.numpy as jnp
    from noahmp_tpu.physics.carbon import bvocflux

    class P:
        slarea = jnp.array([0.0228, 0.0228])
        eps = jnp.ones((2, 5)) * jnp.array([41.87, 0.98, 1.82, 0.0, 0.0])

    flx_cold = bvocflux(P, jnp.array([0.8, 0.0]), jnp.full(2, 100.0),
                        jnp.full(2, 290.0))
    flx_warm = bvocflux(P, jnp.array([0.8, 0.0]), jnp.full(2, 100.0),
                        jnp.full(2, 303.0))
    assert flx_cold.shape == (2, 5)
    # vegfrac=0 -> no foliage -> no emission
    assert np.allclose(np.asarray(flx_cold)[1], 0.0)
    # warmer canopy emits more isoprene
    assert float(flx_warm[0, 0]) > float(flx_cold[0, 0])
    assert np.isfinite(np.asarray(flx_warm)).all()


def test_conservation_guard_aborts_on_leak(setup_run):
    """The driver must refuse to integrate a step that violates the
    reference's fatal conservation tolerances (ERROR,
    module_sf_noahmplsm.F90:1164-1223).  A water leak is injected by
    wrapping the jitted step to report a 1 mm water-budget residual."""
    from noahmp_tpu.driver.model import LandModel, ConservationError
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m = LandModel.from_namelist(cfg, rs)
    m.run(nsteps=2)          # clean steps pass the per-step guard

    inner = m._core

    def leaky(p, s, f, mk, a, mmf, it):
        s2, diag, a2, mmf2 = inner(p, s, f, mk, a, mmf, it)
        diag = diag._replace(errwat=diag.errwat + 1.0)
        return s2, diag, a2, mmf2

    m._core = leaky
    m._chunk_fns = {}    # drop chunk fns compiled around the old core
    with pytest.raises(ConservationError, match="water budget"):
        m.step()

    # warn mode logs instead of raising
    m.check_mode = "warn"
    m.step()

    # off mode skips the check entirely
    m.check_mode = "off"
    m.step()


def test_netcdf4_format_and_field_parity(setup_run, tmp_path):
    """History/restart format parity with the reference: NetCDF-4
    container with deflate_level=6 (module_hrldas_netcdf_io.F90:1688),
    the forcing-echo/LH/EMISS/ZSNSO_SN history fields (driver
    :696-753), and the FPAR/GVFMIN/GVFMAX/ACMELT restart fields
    (driver :645-650) carried through a round-trip."""
    from noahmp_tpu.io import nc4
    if not nc4.available():
        pytest.skip("libnetcdf not present")
    from noahmp_tpu.driver.model import LandModel
    tmp, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    # give the forcing a VEGFRA so FPAR/GVFMIN/GVFMAX become defined
    for p in sorted((tmp / "input").glob("*.LDASIN_DOMAIN1"))[:1]:
        with netcdf_file(str(p), "a") as nc:
            v = nc.createVariable("VEGFRA", "f",
                                  ("Time", "south_north", "west_east"))
            v[0] = np.full((ny, nx), 0.55, np.float32)

    m = LandModel.from_namelist(cfg, rs)
    m.run(nsteps=6)
    m.flush_io()

    out = sorted((tmp / "output").glob("output.*.nc"))[-1]
    rst = sorted((tmp / "restart").glob("restart.*.nc"))[-1]

    # HDF5 container + gzip-6 on a gridded variable
    assert nc4.is_hdf5(out) and nc4.is_hdf5(rst)
    import h5py
    with h5py.File(out) as f:
        assert f["TG"].compression == "gzip"
        assert f["TG"].compression_opts == 6

    with ncio.open_nc(str(out)) as nc:
        for name in ("SWFORC", "COSZ", "LWFORC", "RAINRATE", "EMISS",
                     "LH"):
            assert nc.variables[name][0].shape == (ny, nx), name
        # reference XZY layout: (south_north, layers, west_east)
        assert nc.variables["ZSNSO_SN"][0].shape == (ny, cfg.nsnow, nx)
        # LH = FCEV+FGEV+FCTR and the SW forcing echoes the input
        assert np.isfinite(nc.variables["LH"][0][1:, 1:]).all()

    with ncio.open_nc(str(rst)) as nc:
        for name in ("FPAR", "GVFMIN", "GVFMAX", "ACMELT", "SMOISEQ"):
            assert name in nc.variables, name
        assert np.allclose(nc.variables["FPAR"][0], 0.55)

    # extras round-trip through read_restart
    _, _, af, _, extras = ncio.read_restart(str(rst), cfg, ny, nx)
    assert np.allclose(extras["FPAR"], 0.55)
    assert np.allclose(extras["GVFMIN"], 0.55)
    assert extras["smceq"].shape == (ny * nx, cfg.nsoil)
    assert "acsnom" in af


def test_namelist_subwindow(setup_run):
    """XSTART/XEND/YSTART/YEND (1-based inclusive) crop the run to a
    window of the domain, with forcing read as the matching hyperslab;
    the windowed run must reproduce the full run on those cells."""
    from noahmp_tpu.driver.model import LandModel
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m_full = LandModel.from_namelist(cfg, rs)
    m_full.run(nsteps=3)
    tg_full = m_full._expand_tree(m_full.state).tg.reshape(ny, nx)

    rs2 = read_namelist(str(nml))[1]
    rs2.ystart, rs2.yend = 2, 5    # rows 1..4 (0-based)
    rs2.xstart, rs2.xend = 3, 7    # cols 2..6
    rs2.outdir = str(tmp_path / "out_win")
    m_win = LandModel.from_namelist(cfg, rs2)
    assert m_win.domain.ny == 4 and m_win.domain.nx == 5
    m_win.run(nsteps=3)
    tg_win = m_win._expand_tree(m_win.state).tg.reshape(4, 5)

    np.testing.assert_array_equal(tg_win, tg_full[1:5, 2:7])


def test_chunked_run_matches_per_step(setup_run):
    """The on-device multi-step scan (LandModel._run_chunk) must
    reproduce the legacy per-step dispatch path bit-for-bit: same
    prognostics, same accumulators, same history files written at the
    same cadence (VERDICT r2 item 3)."""
    from noahmp_tpu.driver.model import LandModel
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m1 = LandModel.from_namelist(cfg, rs)
    m1.run(nsteps=7, chunk=1)            # legacy per-step
    m1.flush_io()

    rs2 = read_namelist(str(nml))[1]
    rs2.outdir = str(tmp_path / "out_chunk")
    m2 = LandModel.from_namelist(cfg, rs2)
    m2.run(nsteps=7)                     # auto chunking (scan)
    m2.flush_io()

    assert m2.itime == m1.itime and m2.date == m1.date
    for name in ("tg", "smc", "sh2o", "stc", "sneqv", "snowh", "zwt",
                 "canliq", "tv", "eah", "tah", "cm", "ch", "tauss"):
        a = np.asarray(getattr(m1.state, name))
        b = np.asarray(getattr(m2.state, name))
        np.testing.assert_array_equal(a, b, err_msg=name)
    for name in m1.accum._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(m1.accum, name)),
            np.asarray(getattr(m2.accum, name)), err_msg=name)

    outs1 = sorted((tmp_path / "output").glob("output.*.nc"))
    outs2 = sorted((tmp_path / "out_chunk").glob("output.*.nc"))
    assert [p.name for p in outs1] == [p.name for p in outs2]
    with ncio.open_nc(str(outs1[-1])) as n1, \
            ncio.open_nc(str(outs2[-1])) as n2:
        for v in ("TG", "SOIL_M", "FSA", "FIRA", "UGDRNOFF", "SFCRNOFF"):
            np.testing.assert_array_equal(
                np.array(n1.variables[v][:]),
                np.array(n2.variables[v][:]), err_msg=v)


def test_history_proc_pool_matches_inline(setup_run):
    """NOAHMP_IO_PROCS: the out-of-process parallel history encode
    (io/procwriter.py — libnetcdf is thread-unsafe, so parallel encode
    must cross a process boundary) writes files identical to the
    in-process writer."""
    from noahmp_tpu.driver.model import LandModel
    tmp_path, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m1 = LandModel.from_namelist(cfg, rs)
    m1.run(nsteps=6)
    m1.flush_io()

    rs2 = read_namelist(str(nml))[1]
    rs2.outdir = str(tmp_path / "out_pool")
    m2 = LandModel.from_namelist(cfg, rs2)
    m2.io_procs = 2
    m2.run(nsteps=6)
    m2.flush_io()
    if m2._hist_pool is not None:
        m2._hist_pool.close()

    outs1 = sorted((tmp_path / "output").glob("output.*.nc"))
    outs2 = sorted((tmp_path / "out_pool").glob("output.*.nc"))
    assert outs1 and [p.name for p in outs1] == [p.name for p in outs2]
    with ncio.open_nc(str(outs1[-1])) as a, \
            ncio.open_nc(str(outs2[-1])) as b:
        assert set(a.variables) == set(b.variables)
        for v in a.variables:
            if v == "Times":
                continue
            np.testing.assert_array_equal(
                np.asarray(a.variables[v][:]),
                np.asarray(b.variables[v][:]), err_msg=v)


def test_cell_area_uses_map_factors(tmp_path):
    """Grid-cell area = (DX*DY)/(MSFTX*MSFTY) per cell
    (module_sf_noahmpdrv.F90:1109) — a projected domain's MMF water
    budget depends on it; unity when the file has no map factors."""
    ny, nx = 3, 4
    p = tmp_path / "dom.nc"
    write_domain_file(str(p), ny, nx)
    with netcdf_file(str(p), "a") as nc:
        nc.DY = 2000.0
        for name, val in (("MAPFAC_MX", 2.0), ("MAPFAC_MY", 0.5)):
            v = nc.createVariable(name, "f",
                                  ("Time", "south_north", "west_east"))
            v[0] = np.full((ny, nx), val, np.float32)
    d = ncio.read_domain(str(p))
    assert d.dy == 2000.0
    np.testing.assert_allclose(d.cell_area(),
                               1000.0 * 2000.0 / (2.0 * 0.5))

    p2 = tmp_path / "dom2.nc"
    write_domain_file(str(p2), ny, nx)
    d2 = ncio.read_domain(str(p2))
    np.testing.assert_allclose(d2.cell_area(), 1000.0 * 1000.0)


def test_orbax_checkpoint_roundtrip(setup_run, tmp_path):
    """TPU-native Orbax checkpointing (driver/checkpoint.py): device
    pytrees saved/restored bit-exact in the compacted layout, clock
    included — continuing from a restored checkpoint reproduces the
    uninterrupted run exactly (no NetCDF expand/regrid in the loop)."""
    pytest.importorskip("orbax.checkpoint")
    from noahmp_tpu.driver.model import LandModel
    from noahmp_tpu.driver import checkpoint as ckpt
    tmp, nml, ny, nx = setup_run
    cfg, rs = read_namelist(str(nml))

    m = LandModel.from_namelist(cfg, rs)
    m.run(nsteps=3)
    path = ckpt.save(m, tmp_path / "ckpts")
    assert path.endswith("step_000000003")
    m.run(nsteps=3)
    tg_a = np.asarray(m.state.tg).copy()
    smc_a = np.asarray(m.state.smc).copy()
    date_a = m.date

    m2 = LandModel.from_namelist(cfg, read_namelist(str(nml))[1])
    it = ckpt.restore(m2, tmp_path / "ckpts")
    assert it == 3 and m2.date.endswith("03:00:00")
    m2.run(nsteps=3)
    assert m2.date == date_a
    np.testing.assert_array_equal(np.asarray(m2.state.tg), tg_a)
    np.testing.assert_array_equal(np.asarray(m2.state.smc), smc_a)
