"""Parameter tables: parsers + per-column hydration."""

import os


def default_table_dir() -> str:
    """Directory of the vendored parameter tables (run_assets/).

    Overridable with the NOAHMP_TABLE_DIR environment variable, e.g. to
    point at a different Noah-MP distribution's run/ directory.
    """
    env = os.environ.get("NOAHMP_TABLE_DIR")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "run_assets")
