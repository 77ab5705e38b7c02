"""Fused Pallas column-step kernel.

The XLA-compiled step lowers to ~500 fusions that spill every
intermediate (Newton-iteration carries, radiation terms, snow scratch)
to HBM — ~46 GB of nominal traffic per 65k-column step.  This kernel
runs the ENTIRE column physics for a block of columns inside one
`pallas_call`: inputs are DMA'd to VMEM once, the unrolled iteration
chains live in VMEM/registers, and only final state + diagnostics go
back to HBM — the SURVEY §7 M6 "fused Pallas column step".

The existing pure column physics (`noahmp_sflx`) is reused verbatim,
vmapped over the block axis: the body is traced to a jaxpr up front so
its embedded constant arrays (soil-layer depths, albedo tables, ...)
can be passed as explicit kernel operands (Pallas forbids closure
capture of arrays), then evaluated inside the kernel with
``jax.core.eval_jaxpr`` — Mosaic vectorizes the batched ops onto the
VPU and keeps the live set in VMEM.

STATUS (v5e, 2026-08): compiles and matches XLA numerics
(max|dTG| = 6e-5 K over a step, SMC bit-identical), but the
Mosaic-compat refactor this kernel forced on the physics (sel(),
one-hot gathers, int32 carries — see physics/common.py) sped up the
plain XLA path ~10x, and the fused kernel now measures ~2x SLOWER
than XLA (10.0 vs 5.2 ms/step at 8k columns): the whole-step live set
(~114 MB VMEM stack) serializes blocks and defeats double-buffering.
Mosaic also needs ~45 min to compile the 630 KB module.  Kept as an
experimental path; `grid_step` uses the XLA pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.sflx import noahmp_sflx
from ..state.state import ColumnState, Forcing

BLOCK_SUB = 8    # sublanes
BLOCK_LANE = 128  # lanes
BLOCK = BLOCK_SUB * BLOCK_LANE  # columns per kernel instance


def sflx_step_pallas(cfg, params, state: ColumnState, forcing: Forcing):
    """One Noah-MP step for all columns via the fused kernel.

    Columns are tiled (8, 128) so every per-column quantity is a native
    TPU vreg tile inside the kernel (Mosaic mishandles 1-D bool
    vectors).  Same semantics as ``vmap(noahmp_sflx)``; the column
    count must be a multiple of 1024 (pad upstream).
    """
    n = state.tg.shape[0]
    assert n % BLOCK == 0, f"{n} not a multiple of {BLOCK}"
    grid = (n // BLOCK,)
    rows = n // BLOCK_LANE

    in_tree_val = (params, state, forcing)
    in_leaves, in_tree = jtu.tree_flatten(in_tree_val)

    # Mosaic stores bools as i8 and cannot truncate them back to i1 on
    # load; ship bool leaves as int32 and compare inside the kernel.
    bool_idx = {i for i, x in enumerate(in_leaves)
                if x.dtype == jnp.bool_}
    in_cast = [x.astype(jnp.int32) if i in bool_idx else x
               for i, x in enumerate(in_leaves)]

    def to2d(x):
        return x.reshape((rows, BLOCK_LANE) + x.shape[1:])

    in2d = [to2d(x) for x in in_cast]

    col2 = jax.vmap(jax.vmap(
        lambda pp, ss, ff: noahmp_sflx(cfg, pp, ss, ff)))

    def flat_fn(*leaves):
        leaves = [l != 0 if i in bool_idx else l
                  for i, l in enumerate(leaves)]
        p, s, f = jtu.tree_unflatten(in_tree, leaves)
        s_new, diag = col2(p, s, f)
        outs = jtu.tree_leaves((s_new, diag))
        return [o.astype(jnp.int32) if o.dtype == jnp.bool_ else o
                for o in outs]

    blk_avals = [jax.ShapeDtypeStruct(
        (BLOCK_SUB, BLOCK_LANE) + x.shape[1:], x.dtype)
        for x in in_cast]
    closed = jax.make_jaxpr(flat_fn)(*blk_avals)
    consts = [jnp.asarray(c) for c in closed.consts]
    out_avals = [jax.ShapeDtypeStruct(v.aval.shape, v.aval.dtype)
                 for v in closed.jaxpr.outvars]
    n_consts = len(consts)
    n_in = len(in_leaves)

    def kernel(*refs):
        cvals = [refs[i][...] for i in range(n_consts)]
        avals = [refs[n_consts + i][...] for i in range(n_in)]
        outs = jax.core.eval_jaxpr(closed.jaxpr, cvals, *avals)
        for r, v in zip(refs[n_consts + n_in:], outs):
            r[...] = v

    def spec2d(tail, blocked=True):
        if not blocked:  # replicated small constant
            nd = len(tail)
            return pl.BlockSpec(tail, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)
        nt = len(tail)
        return pl.BlockSpec((BLOCK_SUB, BLOCK_LANE) + tail,
                            lambda i, _n=nt: (i, 0) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    in_specs = ([spec2d(c.shape, blocked=False) for c in consts]
                + [spec2d(x.shape[1:]) for x in in_leaves])
    out_specs = [spec2d(a.shape[2:]) for a in out_avals]
    out_shape = [jax.ShapeDtypeStruct((rows, BLOCK_LANE) + a.shape[2:],
                                      a.dtype) for a in out_avals]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*(consts + in2d))

    out_flat = [x.reshape((n,) + x.shape[2:]) for x in out]

    # rebuild (state, diag) pytrees from flat outputs: eval_shape of the
    # structured function gives the treedef (+ restore bool dtypes)
    def struct_fn(*l):
        l = [x != 0 if i in bool_idx else x for i, x in enumerate(l)]
        return col2(*jtu.tree_unflatten(in_tree, l))

    struct = jax.eval_shape(struct_fn, *blk_avals)
    s_leaves, out_tree = jtu.tree_flatten(struct)
    out_flat = [x.astype(jnp.bool_) if sd.dtype == jnp.bool_ else x
                for x, sd in zip(out_flat, s_leaves)]
    return jtu.tree_unflatten(out_tree, out_flat)
