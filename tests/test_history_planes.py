"""Device-computed history planes (driver/model._get_plane_fn +
HistoryWriter.write_named): the production path derives exactly the
registry's output planes on device and ships them as ONE packed
transfer.  These tests pin (1) bit-identical files vs the legacy
full-tree host path, on both the single-interval and the scan-ys
cadences; (2) HISTORY_FIELDS subsetting; (3) HISTORY_PACK16
scale/offset quantization round-trip."""

import numpy as np
import pytest

from noahmp_tpu.driver.namelist import read_namelist
from noahmp_tpu.io import netcdf_io as ncio
from test_driver_io import write_domain_file, write_forcings

NY, NX = 6, 8


def make_case(tmp_path, sub, output_timestep, extra=""):
    d = tmp_path / sub
    d.mkdir()
    dom = d / "domain.nc"
    write_domain_file(str(dom), NY, NX)
    indir = d / "input"
    indir.mkdir()
    write_forcings(str(indir), "2017-05-01_00:00:00", 10, 10800, NY, NX)
    nml = d / "noahmp.namelist"
    nml.write_text(f"""
&HRLDAS_NOAHMP
 CONST_FILE = '{dom}'
 INDIR = '{indir}'
 OUTDIR = '{d}/output'
 RESDIR = '{d}/restart'
 START_YEAR = 2017
 START_MONTH = 5
 START_DAY = 1
 KDAY = 1
 RUNOFF_OPTION = 3
 DYNAMIC_VEG_OPTION = 3
 INPUT_TIMESTEP = 10800
 MODEL_TIMESTEP = 3600
 OUTPUT_TIMESTEP = {output_timestep}
 RESTART_TIMESTEP = 0
 NSOIL = 4
 soil_layer_thickness(1) = 0.10
 soil_layer_thickness(2) = 0.30
 soil_layer_thickness(3) = 0.60
 soil_layer_thickness(4) = 1.00
 {extra}
/
""")
    return d, nml


def run_case(nml, nsteps=6):
    from noahmp_tpu.driver.model import LandModel
    cfg, rs = read_namelist(str(nml))
    m = LandModel.from_namelist(cfg, rs)
    m.run(nsteps=nsteps)
    return m


def read_all(path):
    with ncio.open_nc(str(path)) as nc:
        return {name: np.array(v[:])
                for name, v in nc.variables.items()}


@pytest.mark.parametrize("output_timestep", [3600, 21600])
def test_device_planes_match_legacy(tmp_path, monkeypatch,
                                    output_timestep):
    """The on-device plane derivation must produce files bit-identical
    to the legacy host-side path (NOAHMP_NO_PACK=1), on both the
    scan-ys cadence (3600: n_out>0) and the single-interval cadence
    (21600: n_out=0)."""
    _, nml_a = make_case(tmp_path, "dev", output_timestep)
    run_case(nml_a)
    monkeypatch.setenv("NOAHMP_NO_PACK", "1")
    da, nml_b = make_case(tmp_path, "legacy", output_timestep)
    run_case(nml_b)
    monkeypatch.delenv("NOAHMP_NO_PACK")

    outs_a = sorted((tmp_path / "dev" / "output").glob("output.*.nc"))
    outs_b = sorted((tmp_path / "legacy" / "output").glob("output.*.nc"))
    assert len(outs_a) == len(outs_b) > 0
    for pa, pb in zip(outs_a, outs_b):
        va, vb = read_all(pa), read_all(pb)
        assert set(va) == set(vb)
        for name in va:
            a, b = va[name], vb[name]
            assert a.dtype == b.dtype and a.shape == b.shape, name
            eq = (np.array_equal(a, b, equal_nan=True)
                  if np.issubdtype(a.dtype, np.floating)
                  else np.array_equal(a, b))
            assert eq, (
                f"{pa.name}:{name} differs between device-plane and "
                f"legacy history paths")


def test_history_fields_subset(tmp_path):
    sub = "HISTORY_FIELDS = \"FSA, TRAD, SOIL_M, ISNOW\""
    _, nml = make_case(tmp_path, "sub", 10800, extra=sub)
    run_case(nml)
    outs = sorted((tmp_path / "sub" / "output").glob("output.*.nc"))
    assert outs
    with ncio.open_nc(str(outs[0])) as nc:
        names = set(nc.variables)
    assert names == {"Times", "IVGTYP", "ISLTYP",
                     "FSA", "TRAD", "SOIL_M", "ISNOW"}


def test_unknown_history_field_rejected(tmp_path):
    _, nml = make_case(tmp_path, "bad", 10800,
                       extra="HISTORY_FIELDS = \"NOT_A_FIELD\"")
    with pytest.raises(ValueError, match="NOT_A_FIELD"):
        read_namelist(str(nml))


def test_pack16_mmf_full_grid_planes(tmp_path):
    """opt_run=5 + HISTORY_PACK16: the MMF accumulator planes live on
    the FULL grid (2-D stencil layout) while everything else is on the
    compacted column axis — the quantizer must mask each with the
    right land mask (regression: shape mismatch at trace time)."""
    _, nml = make_case(tmp_path, "mmf16", 21600,
                       extra="HISTORY_PACK16 = .true.\n"
                             " RUNOFF_OPTION = 5")
    m = run_case(nml)
    assert m.cfg.opt_run == 5 and m.mmf is not None
    out = sorted((tmp_path / "mmf16" / "output").glob("output.*.nc"))[-1]
    with ncio.open_nc(str(out)) as nc:
        q = np.array(nc.variables["QRFS"][:])
        assert q.dtype == np.int16
        t = nc.variables["TRAD"]
        assert np.array(t[:]).dtype == np.int16
        assert np.isfinite(float(t.scale_factor))


def test_pack16_roundtrip(tmp_path):
    """HISTORY_PACK16 files must decode to the f32 values within the
    documented quantization error (plane range / 65000) and carry the
    CF packing attributes."""
    _, nml_f = make_case(tmp_path, "f32", 21600)
    run_case(nml_f)
    _, nml_p = make_case(tmp_path, "p16", 21600,
                         extra="HISTORY_PACK16 = .true.")
    run_case(nml_p)

    fa = sorted((tmp_path / "f32" / "output").glob("output.*.nc"))[-1]
    fp = sorted((tmp_path / "p16" / "output").glob("output.*.nc"))[-1]
    with ncio.open_nc(str(fa)) as na, ncio.open_nc(str(fp)) as npk:
        for name in ("TRAD", "SNEQV", "SOIL_M", "FSA"):
            ref = np.array(na.variables[name][:])
            vq = npk.variables[name]
            q = np.array(vq[:])
            assert q.dtype == np.int16, name
            sc = float(vq.scale_factor)
            off = float(vq.add_offset)
            assert int(vq.missing_value) == -32768
            dec = q.astype(np.float64) * sc + off
            mask = (q != -32768) & (ref > -1e32)
            assert mask.any()
            tol = max(sc, 1e-12) * 0.75 + 1e-7
            assert np.max(np.abs(dec - ref)[mask]) <= tol, (
                f"{name}: quantization error exceeds scale/2")
            # water cells carry the fill in both encodings
            assert np.array_equal(q == -32768, ref < -1e32), name
        # ISNOW is never packed (integer field)
        assert np.array(npk.variables["ISNOW"][:]).dtype == np.int32
