"""Frozen option-matrix regression goldens (VERDICT r1 #1, second
half): every physics-option value is exercised by at least one 48-step
mixed-biome trajectory whose full final state is pinned to
tests/goldens/option_matrix.npz.  A physics edit that changes values
anywhere in the tree trips one of these and must consciously re-freeze
(scripts/freeze_goldens.py) after validating against the scalar
oracles.

Machine portability (VERDICT r3 weak #3): the same float32 48-step
trajectory differs across host CPUs (different XLA CPU codegen — FMA
contraction / vectorization).  Measured between two hosts: every
smooth column holds ~1e-4 relative, but a column sitting on a
DISCRETE threshold (the 0.025 m SNOWFALL layer split, a DZMIN merge,
a PHASECHANGE IMELT flip at TFRZ) diverges macroscopically (2 mm SWE,
0.4 K TG) from a 1-ulp seed.  Raw cross-machine closeness is
therefore the wrong criterion.  The net is two-tier:

1. SAME-MACHINE STRICT: on first run, each config's trajectory is
   frozen to tests/goldens/local/<name>.npz (gitignored); subsequent
   runs on that machine diff against it at rtol=2e-5 — any
   code-induced drift trips at full sensitivity.
2. CROSS-MACHINE COLUMN-FRACTION: every run also diffs against the
   committed tests/goldens/option_matrix.npz at rtol=1e-3 and trips
   when MORE THAN 25% of columns violate on any field.  Codegen chaos
   hits only the threshold-sitting columns (measured: 1/12); a real
   physics change moves most of the grid (measured: a +0.5 K forcing
   perturbation violates on 7-12/12 columns — see the sensitivity
   test below, which pins that discrimination)."""

import os
from pathlib import Path

import numpy as np
import pytest

from golden_matrix import CONFIGS, N_COLS, run_config

GOLDEN = Path(__file__).parent / "goldens" / "option_matrix.npz"
LOCAL_DIR = Path(__file__).parent / "goldens" / "local"

STRICT_RTOL = float(os.environ.get("NOAHMP_GOLDEN_RTOL", "2e-5"))
STRICT_ATOL = float(os.environ.get("NOAHMP_GOLDEN_ATOL", "1e-6"))
LOOSE_RTOL, LOOSE_ATOL = 1e-3, 2e-4
MAX_CHAOS_COLS = N_COLS // 4     # tolerated threshold-chaos columns


@pytest.fixture(scope="module")
def goldens():
    if not GOLDEN.exists():
        pytest.skip("goldens not frozen yet — run "
                    "scripts/freeze_goldens.py")
    return np.load(GOLDEN)


def _violating_cols(res, goldens, name):
    """{field: violating-column indices} outside the cross-machine
    tolerance vs the committed golden."""
    out = {}
    for field, got in res.items():
        want = goldens[f"{name}/{field}"]
        bad = np.abs(got - want) > (LOOSE_ATOL
                                    + LOOSE_RTOL * np.abs(want))
        if bad.ndim > 1:
            bad = bad.any(axis=tuple(range(1, bad.ndim)))
        if bad.any():
            out[field] = np.nonzero(bad)[0]
    return out


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_option_matrix_regression(goldens, name):
    res = run_config(CONFIGS[name])

    # tier 2: committed golden, column-fraction criterion
    viol = _violating_cols(res, goldens, name)
    wide = {f: c for f, c in viol.items() if len(c) > MAX_CHAOS_COLS}
    assert not wide, (
        f"{name}: drifted from the committed golden on >"
        f"{MAX_CHAOS_COLS}/{N_COLS} columns (rtol={LOOSE_RTOL}): "
        f"{ {f: list(c) for f, c in wide.items()} } — wider than "
        f"cross-CPU threshold chaos; re-freeze "
        f"(scripts/freeze_goldens.py) only after validating the "
        f"change against the scalar oracles")

    # tier 1: machine-local golden, every field, strict tolerance
    LOCAL_DIR.mkdir(parents=True, exist_ok=True)
    local = LOCAL_DIR / f"{name}.npz"
    if not local.exists():
        np.savez_compressed(local, **res)
        print(f"\nNOTE: {name}: tier-1 machine-local baseline CREATED, "
              f"not checked — the strict tier is inactive this run "
              f"(first run on this machine / fresh checkout); only the "
              f"cross-machine column-fraction tier had teeth")
        return
    loc = np.load(local)
    if set(loc.files) != set(res):
        np.savez_compressed(local, **res)   # schema changed: re-freeze
        print(f"\nNOTE: {name}: tier-1 baseline RE-FROZEN (field schema "
              f"changed) — strict tier inactive this run")
        return
    for field, got in res.items():
        np.testing.assert_allclose(
            got, loc[field], rtol=STRICT_RTOL, atol=STRICT_ATOL,
            err_msg=f"{name}/{field} drifted from the machine-local "
                    f"golden (delete tests/goldens/local/ to re-freeze "
                    f"after validating the change)")


def test_option_matrix_sensitivity(goldens):
    """The cross-machine tier must still catch real physics changes:
    a +0.5 K air-temperature perturbation (~2e-3 relative — the scale
    of a genuine physics bug) must violate on more columns than the
    tolerated chaos fraction."""
    res = run_config(CONFIGS["base"], perturb_sfctmp=0.5)
    viol = _violating_cols(res, goldens, "base")
    wide = {f: c for f, c in viol.items() if len(c) > MAX_CHAOS_COLS}
    assert wide, (
        f"a +0.5 K forcing perturbation stayed under "
        f"{MAX_CHAOS_COLS}/{N_COLS} violating columns on every field "
        f"— the cross-machine tier cannot catch physics changes")
