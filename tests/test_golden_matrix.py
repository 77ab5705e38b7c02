"""Frozen option-matrix regression goldens (VERDICT r1 #1, second
half): every physics-option value is exercised by at least one 48-step
mixed-biome trajectory whose full final state is pinned to
tests/goldens/option_matrix.npz.  A physics edit that changes values
anywhere in the tree trips one of these and must consciously re-freeze
(scripts/freeze_goldens.py) after validating against the scalar
oracles."""

from pathlib import Path

import numpy as np
import pytest

from golden_matrix import CONFIGS, run_config

GOLDEN = Path(__file__).parent / "goldens" / "option_matrix.npz"


@pytest.fixture(scope="module")
def goldens():
    if not GOLDEN.exists():
        pytest.skip("goldens not frozen yet — run "
                    "scripts/freeze_goldens.py")
    return np.load(GOLDEN)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_option_matrix_regression(goldens, name):
    res = run_config(CONFIGS[name])
    for field, got in res.items():
        want = goldens[f"{name}/{field}"]
        np.testing.assert_allclose(
            got, want, rtol=2e-5, atol=1e-6,
            err_msg=f"{name}/{field} drifted from the frozen golden "
                    f"(re-freeze only after validating the change)")
