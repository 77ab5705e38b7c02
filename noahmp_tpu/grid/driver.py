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


def static_bare_mask(cfg, vegtyp):
    """Columns whose vegtyp class forces ELAI+ESAI = 0 on every step,
    so the canopy solver can be statically skipped (the reference calls
    VEGE_FLUX only when VEG && FVEG>0, module_sf_noahmplsm.F90:1704;
    PHENOLOGY zeroes LAI/SAI for these classes, :1073-1078, and the
    driver forces USGS 25-27 bare, module_sf_noahmpdrv.F90:540-545).

    Host-side numpy; returns a bool mask over columns."""
    v = np.asarray(vegtyp)
    if cfg.llanduse == "USGS":
        bare = np.isin(v, (1, 16, 19, 24, 25, 26, 27))
        # USGS 1 is urban only for this scheme
    else:
        bare = np.isin(v, (13, 15, 16, 17))  # urban/snow/barren/water
    return bare


def biome_order(cfg, vegtyp, glacier_mask):
    """Stable permutation ordering columns [veg | bare | glacier]
    (host-side).  Returns (perm, inverse_perm, bare_start,
    glacier_start) so grid_step can run the canopy solver only on the
    [0:bare_start) slice and the glacier solver on [glacier_start:)."""
    g = np.asarray(glacier_mask).astype(bool)
    b = static_bare_mask(cfg, vegtyp) & ~g
    veg = ~b & ~g
    perm = np.concatenate([np.nonzero(veg)[0], np.nonzero(b)[0],
                           np.nonzero(g)[0]])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return perm, inv, int(veg.sum()), int(veg.sum() + b.sum())


class ColumnLayout(NamedTuple):
    """Device column layout: land columns ordered [veg | bare |
    glacier], each bucket padded to a multiple of ``pad_to`` with
    masked duplicates of its last column.  Unpadded segment widths
    measurably hurt TPU tiling (~10% step time on v5e for the bench
    grid); padding restores lane-aligned vmap widths at the cost of a
    few masked lanes."""
    src: np.ndarray        # (n_dev,) full-grid source index per device column
    real_pos: np.ndarray   # (n_land,) device positions of authoritative copies
    land: np.ndarray       # (n_dev,) bool; padding columns are False
    glacier: np.ndarray    # (n_dev,) bool
    bare_start: int
    glacier_start: int

    @property
    def auth_idx(self):
        """Full-grid indices of the authoritative device columns."""
        return self.src[self.real_pos]


def column_layout(cfg, vegtyp, land_mask, glacier_mask,
                  pad_to=None) -> ColumnLayout:
    """Build the padded [veg | bare | glacier] device layout over the
    land columns of a full (ny*nx,) grid (host-side).

    pad_to=None picks per backend: 1024 on TPU (the measured tiling
    sweet spot), 8 elsewhere (padding tiny CPU-test domains 64x would
    swamp them)."""
    if pad_to is None:
        pad_to = (1024 if jax.default_backend() in ("tpu", "axon")
                  else 8)
    land = np.asarray(land_mask).astype(bool)
    g = np.asarray(glacier_mask).astype(bool) & land
    b = static_bare_mask(cfg, vegtyp) & land & ~g
    v = land & ~g & ~b

    srcs, reals, lands, glcs = [], [], [], []
    starts = []
    pos = 0
    for mask, is_gl in ((v, False), (b, False), (g, True)):
        starts.append(pos)
        idx = np.nonzero(mask)[0]
        if idx.size:
            npad = (-idx.size) % max(int(pad_to), 1)
            srcs.append(np.concatenate(
                [idx, np.full(npad, idx[-1], idx.dtype)]))
            reals.append(pos + np.arange(idx.size))
            lands.append(np.concatenate(
                [np.ones(idx.size, bool), np.zeros(npad, bool)]))
            glcs.append(np.full(idx.size + npad, is_gl))
            pos += idx.size + npad
    return ColumnLayout(
        src=np.concatenate(srcs) if srcs else np.zeros(0, np.int64),
        real_pos=(np.concatenate(reals) if reals
                  else np.zeros(0, np.int64)),
        land=np.concatenate(lands) if lands else np.zeros(0, bool),
        glacier=np.concatenate(glcs) if glcs else np.zeros(0, bool),
        bare_start=starts[1], glacier_start=starts[2])


def grid_step(cfg, params, state: ColumnState, forcing: Forcing,
              masks: GridMasks, accum: GridAccum, *, glacier_idx="auto",
              bare_idx=None):
    """One model step over all columns.

    Returns (new_state, diag, new_accum).  Non-land columns keep their
    state; their diagnostics are UNDEFINED fill.

    glacier_idx selects how the glacier branch
    (module_sf_noahmpdrv.F90:549-629) runs:
      - "auto" (default): full-width vmap under a lax.cond, skipped at
        runtime when the domain has no land ice;
      - an int from ``glacier_slice_start`` (columns [idx:] are the
        glacier cells, arranged by ``glacier_order`` or
        ``biome_order``): the land solver runs only on [:idx] and the
        glacier solver only on [idx:], concatenated back — the TPU
        analogue of the reference's per-cell branch with no
        gather/scatter ops;
      - None: statically no glacier cells, branch not even traced.

    bare_idx (requires an int glacier_idx, from ``biome_order``): the
    static start of the bare-class slice.  Columns [bare_idx:
    glacier_idx) run with the canopy solver statically skipped (the
    reference only calls VEGE_FLUX when VEG && FVEG>0, :1704), saving
    the 20-iteration canopy Newton solve on lanes that can never
    converge to anything used.
    """
    fill = jnp.asarray(C.UNDEFINED, jnp.float32)
    gstep = jax.vmap(lambda p, s, f: noahmp_glacier(cfg, p, s, f))

    if glacier_idx is None or (isinstance(glacier_idx, str)
                               and glacier_idx == "auto"):
        if bare_idx is not None:
            raise ValueError("bare_idx requires a static glacier_idx "
                             "from biome_order()")
        step = jax.vmap(lambda p, s, f: noahmp_sflx(cfg, p, s, f))
        s_new, d = step(params, state, forcing)

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
        else:
            # run the glacier solver only if this domain has land-ice
            # cells (lax.cond on a scalar — skipped when no glaciers)
            s_gl, d_gl = jax.lax.cond(
                jnp.any(masks.glacier),
                lambda _: gstep(params, state, forcing),
                lambda _: (state, d), None)
            s_out, d_out = merge(masks.glacier, s_gl, d_gl)
    else:
        # static-slices path: columns arranged [veg | bare | glacier]
        # by biome_order()/glacier_order().  Each segment runs only its
        # own solver; results are concatenated back (no scatters).
        gs = int(glacier_idx)
        bs = gs if bare_idx is None else int(bare_idx)
        ntot = masks.land.shape[0]

        def sl(tree, a, b):
            return jtu.tree_map(
                lambda x: x[a:b] if (getattr(x, "ndim", 0) >= 1
                                     and x.shape[0] == ntot) else x, tree)

        def land_segment(a, b, assume_bare):
            """Run the land solver on [a:b); non-land cells (possible
            only on uncompacted layouts) keep state / get fill."""
            stepf = jax.vmap(
                lambda p, s, f: noahmp_sflx(cfg, p, s, f,
                                            assume_bare=assume_bare))
            s_old = sl(state, a, b)
            sub_s, sub_d = stepf(sl(params, a, b), s_old,
                                 sl(forcing, a, b))
            lm = masks.land[a:b]

            def pick(new_v, old_v):
                m = lm.reshape((-1,) + (1,) * (new_v.ndim - 1))
                return jnp.where(m, new_v, old_v)

            return (jtu.tree_map(pick, sub_s, s_old),
                    jtu.tree_map(
                        lambda v: pick(v, jnp.broadcast_to(
                            fill.astype(v.dtype), v.shape)), sub_d))

        seg_s, seg_d = [], []
        if bs > 0:
            s_v, d_v = land_segment(0, bs, False)
            seg_s.append(s_v)
            seg_d.append(d_v)
        if gs > bs:
            s_b, d_b = land_segment(bs, gs, True)
            seg_s.append(s_b)
            seg_d.append(d_b)
        if ntot > gs:
            s_g, d_g = gstep(sl(params, gs, ntot), sl(state, gs, ntot),
                             sl(forcing, gs, ntot))
            seg_s.append(s_g)
            seg_d.append(d_g)

        if len(seg_s) == 1:
            s_out, d_out = seg_s[0], seg_d[0]
        else:
            s_out = jtu.tree_map(
                lambda *xs: jnp.concatenate(xs), *seg_s)
            d_out = jtu.tree_map(
                lambda *xs: jnp.concatenate(xs), *seg_d)

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
