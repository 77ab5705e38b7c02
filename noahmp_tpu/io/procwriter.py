"""Out-of-process parallel NetCDF history encode.

libnetcdf is not thread-safe (its dispatch tables and handle registry
are global), so in-process parallel encode is impossible — the driver
keeps exactly ONE writer thread.  At the reference's canonical hourly
output cadence (run/noahmp.namelist:37) the deflate-6 encode of a
65k-column history file costs ~0.5-1 s and would serialize behind the
device->host transfers; this pool ships each EXPANDED numpy payload to
a worker process that owns a private libnetcdf, so N files encode
concurrently while the drain thread goes back to transferring.

Opt-in via NOAHMP_IO_PROCS=N (or LandModel.io_procs); default off —
the single-thread path has no extra moving parts and is right for
coarse output cadences.

Workers are plain numpy+ctypes processes: they are spawned with
JAX_PLATFORMS=cpu and any axon/TPU sitecustomize stripped from
PYTHONPATH so a worker can never initialize (and steal) the real
device, and payloads are sent as plain dicts so no jax module is ever
imported worker-side.
"""

from __future__ import annotations

import multiprocessing as _mp
import os

_WRITER = None


def _init_worker(writer_args):
    global _WRITER
    # worker-side guard: if anything in this process ever imports jax,
    # it must see the CPU platform, never the real device (set HERE,
    # in the child, not in the parent — see ProcHistoryPool.__init__)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = ""
    from .netcdf_io import HistoryWriter
    _WRITER = HistoryWriter(*writer_args)


def _encode(date, state, diag, accum, forc, mmf):
    from types import SimpleNamespace
    ns = lambda d: None if d is None else SimpleNamespace(**d)
    _WRITER.write(date, ns(state), ns(diag), ns(accum), ns(forc),
                  ns(mmf))


def _encode_named(date, planes, scales):
    _WRITER.write_named(date, planes, scales)


def _as_dict(tree):
    """pytree-ish -> plain {field: numpy} (picklable without jax)."""
    import numpy as np
    if tree is None:
        return None
    if isinstance(tree, dict):
        return {k: np.asarray(v) for k, v in tree.items()}
    if hasattr(tree, "_fields"):          # NamedTuple
        return {k: np.asarray(getattr(tree, k)) for k in tree._fields}
    return {k: np.asarray(getattr(tree, k))
            for k in tree.__dataclass_fields__}


class ProcHistoryPool:
    """N worker processes, each holding its own HistoryWriter."""

    def __init__(self, writer_args, nprocs):
        """MUST be constructed on the MAIN thread with no jit tracing
        in flight on any other thread (LandModel builds its pool
        eagerly at init for exactly this reason).

        The env flips below are all required at SPAWN time, in the
        parent: a spawn child re-imports the parent's __main__ (which
        may `import jax`) BEFORE any initializer runs, and the TPU
        plugin is discovered via entry points — PYTHONPATH stripping
        alone does not stop it (measured: each worker then attempts a
        libtpu/tunnel init of its own, contending with the parent's
        device session and halving hourly throughput).  Conversely,
        flipping JAX_PLATFORMS in the parent WHILE another thread is
        tracing changes the pjit cache key under the in-flight chunk
        function and forces a multi-minute re-lowering mid-run — the
        main-thread-only construction rule is what makes the flip
        safe."""
        ctx = _mp.get_context("spawn")
        saved = {k: os.environ.get(k)
                 for k in ("JAX_PLATFORMS", "PYTHONPATH", "XLA_FLAGS")}
        try:
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ["XLA_FLAGS"] = ""
            pp = [p for p in
                  os.environ.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p]
            repo = os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
            if repo not in pp:
                pp.insert(0, repo)
            os.environ["PYTHONPATH"] = os.pathsep.join(pp)
            self._pool = ctx.Pool(max(int(nprocs), 1),
                                  initializer=_init_worker,
                                  initargs=(tuple(writer_args),))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        self._pending = []

    def submit(self, date, state, diag, accum, forc, mmf):
        """state/diag/accum/forc/mmf: EXPANDED host trees (the caller
        already moved them off the device)."""
        args = (date, _as_dict(state), _as_dict(diag), _as_dict(accum),
                _as_dict(forc), _as_dict(mmf))
        self._pending.append(self._pool.apply_async(_encode, args))
        # bound memory: each pending job pins a full expanded payload
        while len(self._pending) > 2 * self._pool._processes:
            self._pending.pop(0).get()

    def submit_named(self, date, planes, scales=None):
        """planes: {name: EXPANDED full-grid numpy plane} (the
        device-computed registry planes); scales: {name:
        (add_offset, scale_factor)} for int16-packed planes."""
        import numpy as np
        args = (date, {k: np.asarray(v) for k, v in planes.items()},
                None if scales is None
                else {k: np.asarray(v) for k, v in scales.items()})
        self._pending.append(self._pool.apply_async(_encode_named, args))
        while len(self._pending) > 2 * self._pool._processes:
            self._pending.pop(0).get()

    def flush(self):
        pending, self._pending = self._pending, []
        for r in pending:
            r.get()     # re-raises worker exceptions

    def close(self):
        self.flush()
        self._pool.close()
        self._pool.join()
