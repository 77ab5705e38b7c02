import numpy as np

from noahmp_tpu.params import tables as T
from noahmp_tpu.params.hydrate import hydrate

from noahmp_tpu.params import default_table_dir
RUN = default_table_dir()


def test_mptable_usgs():
    veg = T.load_mptable(f"{RUN}/MPTABLE.TBL", "USGS")
    assert veg.nveg == 27
    assert veg.iswater == 16 and veg.isurban == 1 and veg.isbarren == 19
    # spot values from MPTABLE.TBL USGS section
    assert np.isclose(veg.ch2op[0], 0.1)
    assert np.isclose(veg.hvt[0], 15.0)      # urban
    assert np.isclose(veg.hvt[12], 20.0)     # evergreen broadleaf
    assert np.isclose(veg.rhol[1, 0], 0.11)  # vis row
    assert np.isclose(veg.rhol[1, 1], 0.58)  # nir row
    assert veg.laim.shape == (27, 12)
    assert np.isclose(veg.eps[0, 0], 41.87)


def test_mptable_modis_reshape():
    veg = T.load_mptable(f"{RUN}/MPTABLE.TBL", "MODIFIED_IGBP_MODIS_NOAH")
    assert veg.nveg == 20
    assert np.isclose(veg.slarea[0], 0.0090)
    assert np.isclose(veg.eps[3, 0], 46.86)
    # rows beyond nveg are sentinel
    assert veg.laim[20:].max() < -1e30


def test_soilparm():
    s = T.load_soilparm(f"{RUN}/SOILPARM.TBL")
    assert s.ncat == 19
    assert np.isclose(s.bexp[0], 2.79)
    assert np.isclose(s.dksat[0], 4.66e-5)
    assert np.isclose(s.smcmax[13], 1.0)     # WATER
    assert np.isclose(s.quartz[18], 0.92)    # WHITE SAND


def test_genparm():
    g = T.load_genparm(f"{RUN}/GENPARM.TBL")
    assert len(g.slope_data) == 9
    assert np.isclose(g.slope_data[0], 0.1)
    assert np.isclose(g.csoil, 2.0e6)
    assert np.isclose(g.zbot, -8.0)
    assert np.isclose(g.czil, 0.1)
    assert np.isclose(g.refkdt, 1.0) and np.isclose(g.refdk, 2.0e-6)


def test_vegparm():
    v = T.load_vegparm(f"{RUN}/VEGPARM.TBL", "USGS")
    assert v.ncat == 27
    assert v.nroot[6] == 3            # grassland
    assert np.isclose(v.rsmin[6], 40.0)
    assert np.isclose(v.rgl[10], 30.0)
    assert np.isclose(v.topt, 298.0)
    assert np.isclose(v.rsmax, 5000.0)
    assert v.bare == 19 and v.natural == 5


def test_hydrate_redprm():
    t = T.load_tables(RUN, "USGS")
    vegtyp = np.array([7, 1, 14])     # grassland, urban, evergr. needleleaf
    soiltyp = np.array([3, 8, 12])
    p = hydrate(t, vegtyp, soiltyp)
    # REDPRM: KDT = REFKDT*DKSAT/REFDK (module_sf_noahmplsm.F90:9311)
    assert np.isclose(float(p.kdt[0]), 1.0 * 5.23e-6 / 2.0e-6, rtol=1e-5)
    # urban overrides (:9294-9300, :9333-9335)
    assert np.isclose(float(p.smcmax[1]), 0.45)
    assert np.isclose(float(p.rsmin[1]), 400.0)
    assert np.isclose(float(p.csoil[1]), 3.0e6)
    # FRZX (:9314-9317)
    smcmax, smcref = 0.434, 0.383
    assert np.isclose(float(p.frzx[0]),
                      0.15 * (smcmax / smcref) * (0.412 / 0.468), rtol=1e-5)
    assert p.nroot[0] == 3
    assert np.isclose(float(p.hvt[2]), 20.0)
