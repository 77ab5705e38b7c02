"""Regenerate tests/goldens/option_matrix.npz (run on CPU so the
goldens are reproducible in CI):

    JAX_PLATFORMS=cpu python scripts/freeze_goldens.py

Only re-freeze after a physics change whose trajectory differences
have been understood and accepted (e.g. validated against the scalar
oracles in tests/oracles/)."""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jax_cache"))

import numpy as np  # noqa: E402

from golden_matrix import CONFIGS, run_config  # noqa: E402


def main():
    out = {}
    for name, overrides in CONFIGS.items():
        print(f"freezing {name} ...", flush=True)
        res = run_config(overrides)
        for field, arr in res.items():
            out[f"{name}/{field}"] = arr
    dest = REPO / "tests" / "goldens" / "option_matrix.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({len(out)} arrays, "
          f"{dest.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
