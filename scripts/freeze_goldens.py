"""Regenerate tests/goldens/option_matrix.npz:

    python scripts/freeze_goldens.py

Only re-freeze after a physics change whose trajectory differences
have been understood and accepted (e.g. validated against the scalar
oracles in tests/oracles/).

The goldens must be frozen in EXACTLY the environment the tests run
in (tests/conftest.py): clean PYTHONPATH (no axon sitecustomize — its
remote-compile service builds executables on a different machine
whose FMA contraction differs measurably over a 48-step f32
trajectory), JAX_PLATFORMS=cpu, the 8-virtual-device XLA flag, and
the shared .jax_cache.  This script re-execs itself into that
environment, mirroring conftest."""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_MARK = "NOAHMP_TPU_FREEZE_REEXEC"
if os.environ.get(_MARK) != "1":
    env = dict(os.environ)
    env[_MARK] = "1"
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

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
