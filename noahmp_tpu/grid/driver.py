"""Grid-level model driver: vmapped column physics over a flat column
axis.

Reference: noahmplsm grid sweep (module_sf_noahmpdrv.F90:11-844).  The
reference loops JLOOP/ILOOP over (i,j) cells calling scalar NOAHMP_SFLX
per cell (:397-424); here the column axis is a single vmapped axis that
XLA vectorizes onto the VPU/MXU, and the i/j->column flattening happens
once in the driver.

Cell classification (:426-441): open water is skipped entirely, sea ice
(ICE=1) is skipped by this offline driver, land ice (ICE=-1) runs the
glacier branch.  Here skipping = masked state pass-through, so water
cells cost vector lanes but no divergence.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from .. import constants as C
from ..state.state import ColumnState, Forcing
from ..physics.sflx import noahmp_sflx
from ..physics.glacier import noahmp_glacier


class GridMasks(NamedTuple):
    land: jnp.ndarray      # bool: land cells (not open water / sea ice)
    glacier: jnp.ndarray   # bool: land-ice cells (ICE = -1)


def classify(vegtyp, xland, xice, iswater: int, isice: int,
             xice_threshold: float = 0.5) -> GridMasks:
    """Cell classification (module_sf_noahmpdrv.F90:426-441 +
    driver sea-ice mask)."""
    water = (xland > 1.5) | (vegtyp == iswater)
    seaice = xice > xice_threshold
    glacier = (vegtyp == isice) & ~seaice
    land = ~water & ~seaice
    return GridMasks(land=land, glacier=glacier)


class GridAccum(NamedTuple):
    """Per-column accumulated diagnostics
    (module_sf_noahmpdrv.F90:733-752, :833-834)."""
    sfcrunoff: jnp.ndarray
    udrunoff: jnp.ndarray
    acsnow: jnp.ndarray
    acsnom: jnp.ndarray

    @classmethod
    def zeros(cls, n, dtype=jnp.float32):
        z = jnp.zeros((n,), dtype)
        return cls(z, z, z, z)


def first_step_guess(state: ColumnState, forcing: Forcing) -> ColumnState:
    """First-timestep EAH/TAH/CH/CM initialization
    (module_hrldas_noahmp_driver.F90:374-384)."""
    eair = forcing.q2 * forcing.sfcprs / (0.622 + 0.378 * forcing.q2)
    return state.__class__(**{
        **{f: getattr(state, f) for f in state.__dataclass_fields__},
        "eah": eair, "tah": forcing.sfctmp,
        "cm": jnp.full_like(state.cm, 0.1),
        "ch": jnp.full_like(state.ch, 0.1),
    })


def glacier_slice_start(masks: GridMasks):
    """Static start index of the contiguous glacier tail, or None.

    Host-side helper for the compacted glacier path: when a domain's
    land-ice columns occupy a contiguous tail of the column axis
    (arranged by ``glacier_order``), the glacier solver can run on a
    static slice — TPU-friendly, no gather/scatter (scatters serialize
    on TPU and measured ~3x slower than the full masked pass).
    Returns None when there are no glacier cells; raises if glacier
    cells exist but are not a contiguous tail.
    """
    g = np.asarray(masks.glacier)
    ngl = int(g.sum())
    if ngl == 0:
        return None
    start = g.shape[0] - ngl
    if not g[start:].all() or g[:start].any():
        raise ValueError(
            "glacier columns are not a contiguous tail; reorder with "
            "glacier_order() or use glacier_idx='auto'")
    return start


def glacier_order(glacier_mask):
    """Stable permutation putting land-ice columns last (host-side).

    Apply to every column-axis array at init, then pass
    ``glacier_slice_start(masks)`` to grid_step.  Returns (perm,
    inverse_perm) as numpy index arrays."""
    g = np.asarray(glacier_mask).astype(bool)
    perm = np.concatenate([np.nonzero(~g)[0], np.nonzero(g)[0]])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return perm, inv


def grid_step(cfg, params, state: ColumnState, forcing: Forcing,
              masks: GridMasks, accum: GridAccum, *, glacier_idx="auto"):
    """One model step over all columns.

    Returns (new_state, diag, new_accum).  Non-land columns keep their
    state; their diagnostics are UNDEFINED fill.

    glacier_idx selects how the glacier branch
    (module_sf_noahmpdrv.F90:549-629) runs:
      - "auto" (default): full-width vmap under a lax.cond, skipped at
        runtime when the domain has no land ice;
      - an int from ``glacier_slice_start`` (columns [idx:] are the
        glacier cells, arranged by ``glacier_order``): the glacier
        solver runs only on that static tail slice and the results are
        concatenated back — the TPU analogue of the reference's
        per-cell branch, saving the wasted vector lanes when glaciers
        are sparse, with no gather/scatter ops;
      - None: statically no glacier cells, branch not even traced.
    """
    step = jax.vmap(lambda p, s, f: noahmp_sflx(cfg, p, s, f))
    s_new, d = step(params, state, forcing)

    gstep = jax.vmap(lambda p, s, f: noahmp_glacier(cfg, p, s, f))
    fill = jnp.asarray(C.UNDEFINED, d.fsa.dtype)

    def merge(g_mask, s_gl, d_gl):
        def pick(land_v, glacier_v, old_v):
            g = g_mask
            land_only = masks.land & ~g
            if land_v.ndim > 1:
                g = g.reshape((-1,) + (1,) * (land_v.ndim - 1))
                land_only = land_only.reshape(g.shape)
            return jnp.where(g, glacier_v,
                             jnp.where(land_only, land_v, old_v))

        def pick_diag(land_v, glacier_v):
            g = g_mask
            land_only = masks.land & ~g
            if land_v.ndim > 1:
                g = g.reshape((-1,) + (1,) * (land_v.ndim - 1))
                land_only = land_only.reshape(g.shape)
            return jnp.where(g, glacier_v,
                             jnp.where(land_only, land_v, fill))

        return (jtu.tree_map(pick, s_new, s_gl, state),
                jtu.tree_map(pick_diag, d, d_gl))

    if glacier_idx is None:
        # statically glacier-free domain
        no_g = jnp.zeros_like(masks.land)
        s_out, d_out = merge(no_g, state, d)
    elif isinstance(glacier_idx, str) and glacier_idx == "auto":
        # run the glacier solver only if this domain has land-ice cells
        # (lax.cond on a scalar — skipped entirely when no glaciers)
        s_gl, d_gl = jax.lax.cond(
            jnp.any(masks.glacier),
            lambda _: gstep(params, state, forcing),
            lambda _: (state, d), None)
        s_out, d_out = merge(masks.glacier, s_gl, d_gl)
    else:
        # compacted path: glacier columns are the static tail slice
        # [gs:]; solve only those and concatenate back (no scatters)
        gs = int(glacier_idx)
        ntot = masks.land.shape[0]

        def tail(x):
            return (x[gs:] if getattr(x, "ndim", 0) >= 1
                    and x.shape[0] == ntot else x)

        sub_s, sub_gd = gstep(jtu.tree_map(tail, params),
                              jtu.tree_map(tail, state),
                              jtu.tree_map(tail, forcing))
        land_head = masks.land[:gs]

        def pick_head(land_v, old_v):
            lo = land_head
            if land_v.ndim > 1:
                lo = lo.reshape((-1,) + (1,) * (land_v.ndim - 1))
            return jnp.where(lo, land_v[:gs], old_v)

        s_out = jtu.tree_map(
            lambda land_v, old_v, sub: jnp.concatenate(
                [pick_head(land_v, old_v[:gs]), sub]),
            s_new, state, sub_s)
        d_out = jtu.tree_map(
            lambda land_v, sub: jnp.concatenate(
                [pick_head(land_v, jnp.broadcast_to(
                    fill, land_v[:gs].shape)), sub]),
            d, sub_gd)

    # accumulations (module_sf_noahmpdrv.F90:733-752)
    lm = masks.land
    dt = cfg.dt
    acc = GridAccum(
        sfcrunoff=accum.sfcrunoff + jnp.where(lm, d_out.runsrf * dt, 0.0),
        udrunoff=accum.udrunoff + jnp.where(lm, d_out.runsub * dt, 0.0),
        acsnow=accum.acsnow + jnp.where(lm, forcing.prcp * d_out.fpice * dt, 0.0),
        acsnom=accum.acsnom + jnp.where(
            lm, (d_out.qsnbot + d_out.ponding + d_out.ponding1
                 + d_out.ponding2) * dt, 0.0),
    )
    return s_out, d_out, acc


def scan_steps(cfg, params, state: ColumnState, forcings: Forcing,
               masks: GridMasks, accum: GridAccum):
    """Run a chunk of steps with lax.scan; forcings have a leading time
    axis.  Returns (state, accum, stacked diagnostics)."""

    def body(carry, f):
        s, a = carry
        s2, d, a2 = grid_step(cfg, params, s, f, masks, a)
        return (s2, a2), d

    (s_fin, a_fin), ds = jax.lax.scan(body, (state, accum), forcings)
    return s_fin, a_fin, ds
