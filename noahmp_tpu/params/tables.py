"""Parameter table loaders.

Parses the four Noah-MP parameter files into numpy struct-of-arrays:

  MPTABLE.TBL   Fortran namelist; Noah-MP vegetation parameters
                (reference reader: module_sf_noahmplsm.F90:274-404
                `read_mp_veg_parameters`, incl. the 2-D reshape quirk when
                MVT > NVEG — namelist values fill column-major storage).
  VEGPARM.TBL   legacy land-use table, 17 columns + scalar trailers
                (module_sf_noahmpdrv.F90:1528-1646 `SOIL_VEG_GEN_PARM`).
  SOILPARM.TBL  19-category soil hydraulic/thermal properties
                (module_sf_noahmpdrv.F90:1680-1750 region).
  GENPARM.TBL   general parameters (SLOPE_DATA + scalars).

Radiation tables (soil albedo etc.) are DATA statements in the reference
(NOAHMP_RAD_PARAMETERS, module_sf_noahmplsm.F90:409-447) and are inlined
here as numpy constants.

The per-column hydration (replacing REDPRM's mutation of Fortran module
globals, module_sf_noahmplsm.F90:9202-9349) lives in
`noahmp_tpu.params.hydrate`.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

import numpy as np

MVT = 27      # max vegetation types (module_sf_noahmplsm.F90:206)
MBAND = 2     # radiation bands: vis, nir (:207)
MSC = 9       # soil color classes (:414)
NSLTYPE = 30  # max soil types (:84)
NLUS = 50     # max land-use categories (:41)

# ---------------------------------------------------------------------------
# Fortran namelist parsing (for MPTABLE.TBL)
# ---------------------------------------------------------------------------

_GROUP_RE = re.compile(r"^\s*&(\w+)")
_ASSIGN_RE = re.compile(r"^\s*(\w+(?:\(\d+\))?)\s*=\s*(.*)$", re.S)


def _strip_comment(line: str) -> str:
    """Remove a trailing ! comment (not inside quotes)."""
    out = []
    in_q = None
    for ch in line:
        if in_q:
            out.append(ch)
            if ch == in_q:
                in_q = None
        elif ch in "'\"":
            in_q = ch
            out.append(ch)
        elif ch == "!":
            break
        else:
            out.append(ch)
    return "".join(out)


def _parse_value(tok: str):
    tok = tok.strip()
    if not tok:
        return None
    if tok[0] in "'\"":
        return tok.strip(tok[0])
    low = tok.lower()
    if low in (".true.", "t", "true"):
        return True
    if low in (".false.", "f", "false"):
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok.replace("d", "e").replace("D", "E"))
    except ValueError:
        return tok


def parse_fortran_namelist(text: str):
    """Parse Fortran namelist text → {group: {name: scalar | list}}.

    Handles comments, multi-line array continuations, and quoted strings.
    Sufficient for MPTABLE.TBL and noahmp.namelist dialects.
    """
    groups = {}
    cur = None          # current group dict
    cur_name = None     # current variable collecting continuation values
    for raw in text.splitlines():
        line = _strip_comment(raw).strip()
        if not line:
            continue
        m = _GROUP_RE.match(line)
        if m:
            cur = groups.setdefault(m.group(1).lower(), {})
            cur_name = None
            continue
        if line in ("/", "&end", "&"):
            cur = None
            cur_name = None
            continue
        if cur is None:
            continue
        m = _ASSIGN_RE.match(line)
        if m and not (line.split("=")[0].strip().count(" ") > 0):
            cur_name = m.group(1).lower()
            rhs = m.group(2)
            cur[cur_name] = _split_values(rhs)
        elif cur_name is not None:
            cur[cur_name].extend(_split_values(line))
    # collapse singletons
    for g in groups.values():
        for k, v in g.items():
            if isinstance(v, list) and len(v) == 1:
                g[k] = v[0]
    return groups


def _split_values(s: str):
    vals = []
    for tok in re.findall(r"'[^']*'|\"[^\"]*\"|[^,\s]+", s):
        v = _parse_value(tok)
        if v is not None:
            vals.append(v)
    return vals


# ---------------------------------------------------------------------------
# Table dataclasses (plain numpy, host-side; converted to jnp at hydrate)
# ---------------------------------------------------------------------------

_VEG_SCALAR_NAMES = [
    "ch2op", "dleaf", "z0mvt", "hvt", "hvb", "den", "rc", "xl", "cwpvt",
    "c3psn", "kc25", "akc", "ko25", "ako", "avcmx", "aqe", "ltovrc",
    "dilefc", "dilefw", "rmf25", "sla", "fragr", "tmin", "vcmx25", "tdlef",
    "bp", "mp", "qe25", "rms25", "rmr25", "arm", "folnmx", "wdpool",
    "wrrat", "mrp", "slarea",
]
_VEG_2D_NAMES = {"rhol": MBAND, "rhos": MBAND, "taul": MBAND,
                 "taus": MBAND, "saim": 12, "laim": 12, "eps": 5}


@dataclasses.dataclass(frozen=True)
class VegTables:
    """Noah-MP vegetation parameters from MPTABLE.TBL (struct-of-arrays).

    1-D arrays have shape (MVT,); 2-D (MVT, k).  Indexed by vegtyp-1.
    """
    nveg: int
    isurban: int
    iswater: int
    isbarren: int
    issnow: int
    eblforest: int
    data: dict  # name -> np.ndarray

    def __getattr__(self, name):
        d = object.__getattribute__(self, "data")
        if name in d:
            return d[name]
        raise AttributeError(name)


@dataclasses.dataclass(frozen=True)
class SoilTables:
    """SOILPARM.TBL: (ncat,) arrays indexed by soiltyp-1."""
    ncat: int
    bexp: np.ndarray      # BB
    smcdry: np.ndarray    # DRYSMC
    f1: np.ndarray        # F11
    smcmax: np.ndarray    # MAXSMC
    smcref: np.ndarray    # REFSMC
    psisat: np.ndarray    # SATPSI
    dksat: np.ndarray     # SATDK
    dwsat: np.ndarray     # SATDW
    smcwlt: np.ndarray    # WLTSMC
    quartz: np.ndarray    # QTZ
    names: tuple


@dataclasses.dataclass(frozen=True)
class GenTables:
    """GENPARM.TBL scalars + slope array."""
    slope_data: np.ndarray
    sbeta: float
    fxexp: float
    csoil: float
    salp: float
    refdk: float
    refkdt: float
    frzk: float
    zbot: float
    czil: float
    smlow: float
    smhigh: float
    lvcoef: float


@dataclasses.dataclass(frozen=True)
class VegLegacyTables:
    """VEGPARM.TBL land-use table (17 columns + trailers)."""
    ncat: int
    shdfac: np.ndarray
    nroot: np.ndarray     # int
    rsmin: np.ndarray     # RS column
    rgl: np.ndarray
    hs: np.ndarray
    snup: np.ndarray
    maxalb: np.ndarray
    laimin: np.ndarray
    laimax: np.ndarray
    emissmin: np.ndarray
    emissmax: np.ndarray
    albedomin: np.ndarray
    albedomax: np.ndarray
    z0min: np.ndarray
    z0max: np.ndarray
    ztopv: np.ndarray
    zbotv: np.ndarray
    topt: float
    cmcmax: float
    cfactr: float
    rsmax: float
    bare: int
    natural: int
    names: tuple


# Radiation tables — NOAHMP_RAD_PARAMETERS (module_sf_noahmplsm.F90:417-445).
# Soil-color classes 9 entries; reference only initializes 8, 9th is 0.
ALBSAT = np.array([[0.15, 0.11, 0.10, 0.09, 0.08, 0.07, 0.06, 0.05, 0.0],
                   [0.30, 0.22, 0.20, 0.18, 0.16, 0.14, 0.12, 0.10, 0.0]],
                  dtype=np.float32).T  # (MSC, MBAND)
ALBDRY = np.array([[0.27, 0.22, 0.20, 0.18, 0.16, 0.14, 0.12, 0.10, 0.0],
                   [0.54, 0.44, 0.40, 0.36, 0.32, 0.28, 0.24, 0.20, 0.0]],
                  dtype=np.float32).T
ALBICE = np.array([0.80, 0.55], dtype=np.float32)
ALBLAK = np.array([0.60, 0.40], dtype=np.float32)
OMEGAS = np.array([0.8, 0.4], dtype=np.float32)
BETADS = 0.5
BETAIS = 0.5
EG = np.array([0.97, 0.98], dtype=np.float32)  # 1=soil, 2=lake


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------

def load_mptable(path, dataset: str = "USGS") -> VegTables:
    """Load MPTABLE.TBL for the given dataset identifier.

    Reproduces read_mp_veg_parameters (module_sf_noahmplsm.F90:274-404):
    namelist values fill Fortran column-major storage, so a 2-D table
    variable listed as k rows of NVEG values maps to out[:, j] = row j.
    """
    text = Path(path).read_text()
    groups = parse_fortran_namelist(text)
    if dataset == "USGS":
        cat, par = "noah_mp_usgs_veg_categories", "noah_mp_usgs_parameters"
    elif dataset == "MODIFIED_IGBP_MODIS_NOAH":
        cat, par = "noah_mp_modis_veg_categories", "noah_mp_modis_parameters"
    else:
        raise ValueError(f"unknown dataset {dataset!r}")
    nveg = int(groups[cat]["nveg"])
    g = groups[par]

    data = {}
    for name in _VEG_SCALAR_NAMES:
        vals = np.asarray(g[name], dtype=np.float32)
        arr = np.full(MVT, -1.0e36, dtype=np.float32)
        arr[: len(vals)] = vals
        data[name] = arr
    for name, k in _VEG_2D_NAMES.items():
        vals = np.asarray(g[name], dtype=np.float32)
        arr = np.full((MVT, k), -1.0e36, dtype=np.float32)
        # namelist order = column-major fill of (nveg, k)
        arr[:nveg, :] = vals[: nveg * k].reshape((nveg, k), order="F")
        data[name] = arr
    return VegTables(
        nveg=nveg,
        isurban=int(g["isurban"]), iswater=int(g["iswater"]),
        isbarren=int(g["isbarren"]), issnow=int(g["issnow"]),
        eblforest=int(g["eblforest"]),
        data=data,
    )


def _tokens(line):
    return [t for t in re.split(r"[,\s]+", line.strip()) if t]


def load_soilparm(path, section: str = "STAS") -> SoilTables:
    """Load SOILPARM.TBL (section STAS or STAS-RUC)."""
    lines = Path(path).read_text().splitlines()
    i = 0
    while i < len(lines):
        if lines[i].strip() == section:
            break
        i += 1
    else:
        raise ValueError(f"section {section} not found in {path}")
    hdr = _tokens(lines[i + 1].split("'")[0])
    ncat = int(hdr[0])
    cols = [[] for _ in range(10)]
    names = []
    for row in range(ncat):
        parts = lines[i + 2 + row].split("'")
        toks = _tokens(parts[0])
        names.append(parts[1] if len(parts) > 1 else "")
        for c in range(10):
            cols[c].append(float(toks[1 + c]))
    arr = [np.asarray(c, dtype=np.float32) for c in cols]
    return SoilTables(ncat=ncat, bexp=arr[0], smcdry=arr[1], f1=arr[2],
                      smcmax=arr[3], smcref=arr[4], psisat=arr[5],
                      dksat=arr[6], dwsat=arr[7], smcwlt=arr[8],
                      quartz=arr[9], names=tuple(names))


def load_genparm(path) -> GenTables:
    lines = [ln.strip() for ln in Path(path).read_text().splitlines()
             if ln.strip()]
    vals = {}
    i = 0
    while i < len(lines):
        key = lines[i]
        if key == "SLOPE_DATA":
            n = int(lines[i + 1])
            vals["slope_data"] = np.asarray(
                [float(lines[i + 2 + j]) for j in range(n)], dtype=np.float32)
            i += 2 + n
        elif key.endswith("_DATA"):
            vals[key[:-5].lower()] = float(lines[i + 1])
            i += 2
        else:
            i += 1
    return GenTables(slope_data=vals["slope_data"], sbeta=vals["sbeta"],
                     fxexp=vals["fxexp"], csoil=vals["csoil"],
                     salp=vals["salp"], refdk=vals["refdk"],
                     refkdt=vals["refkdt"], frzk=vals["frzk"],
                     zbot=vals["zbot"], czil=vals["czil"],
                     smlow=vals["smlow"], smhigh=vals["smhigh"],
                     lvcoef=vals["lvcoef"])


def load_vegparm(path, dataset: str = "USGS") -> VegLegacyTables:
    """Load VEGPARM.TBL for the given land-use section."""
    lines = Path(path).read_text().splitlines()
    i = 0
    while i < len(lines):
        # section layout: title line, section-name line, "ncat,1 'hdr'"
        if lines[i].strip().startswith(dataset):
            break
        i += 1
    else:
        raise ValueError(f"dataset {dataset} not found in {path}")
    ncat = int(_tokens(lines[i + 1].split("'")[0])[0])
    rows = []
    names = []
    for r in range(ncat):
        parts = lines[i + 2 + r].split("'")
        toks = _tokens(parts[0])
        names.append(parts[1].strip() if len(parts) > 1 else "")
        rows.append([float(t) for t in toks[1:18]])
    m = np.asarray(rows, dtype=np.float32)  # (ncat, 17)
    # trailers: TOPT, CMCMAX, CFACTR, RSMAX, BARE, NATURAL (label/value pairs)
    j = i + 2 + ncat
    trailer = {}
    while j + 1 < len(lines) and len(trailer) < 6:
        label = lines[j].strip()
        if label in ("TOPT_DATA", "CMCMAX_DATA", "CFACTR_DATA",
                     "RSMAX_DATA", "BARE", "NATURAL"):
            trailer[label] = float(lines[j + 1])
            j += 2
        else:
            j += 1
    return VegLegacyTables(
        ncat=ncat, shdfac=m[:, 0], nroot=m[:, 1].astype(np.int32),
        rsmin=m[:, 2], rgl=m[:, 3], hs=m[:, 4], snup=m[:, 5],
        maxalb=m[:, 6], laimin=m[:, 7], laimax=m[:, 8], emissmin=m[:, 9],
        emissmax=m[:, 10], albedomin=m[:, 11], albedomax=m[:, 12],
        z0min=m[:, 13], z0max=m[:, 14], ztopv=m[:, 15], zbotv=m[:, 16],
        topt=trailer["TOPT_DATA"], cmcmax=trailer["CMCMAX_DATA"],
        cfactr=trailer["CFACTR_DATA"], rsmax=trailer["RSMAX_DATA"],
        bare=int(trailer["BARE"]), natural=int(trailer["NATURAL"]),
        names=tuple(names))


@dataclasses.dataclass(frozen=True)
class NoahMPTables:
    veg: VegTables
    soil: SoilTables
    gen: GenTables
    veg_legacy: VegLegacyTables
    dataset: str


def load_tables(run_dir, dataset: str = "USGS",
                soil_section: str = "STAS") -> NoahMPTables:
    run_dir = Path(run_dir)
    return NoahMPTables(
        veg=load_mptable(run_dir / "MPTABLE.TBL", dataset),
        soil=load_soilparm(run_dir / "SOILPARM.TBL", soil_section),
        gen=load_genparm(run_dir / "GENPARM.TBL"),
        veg_legacy=load_vegparm(run_dir / "VEGPARM.TBL", dataset),
        dataset=dataset,
    )
