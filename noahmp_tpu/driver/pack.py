"""One-transfer device->host readback for history/restart pytrees.

Through the remote-TPU tunnel every device->host transfer pays a
per-message round trip (~27 ms measured) on top of its bytes; reading
a ~150-leaf history/restart tree back leaf-by-leaf therefore costs
seconds per chunk even with async copies overlapping the bytes — this
was the measured gap between the r4 driver (52% of the link ceiling)
and the link itself.

``TreePacker`` closes it: all leaves of a pytree are raveled and
concatenated ON DEVICE into one flat int32 buffer (float32 leaves are
bitcast, so the transfer is a pure memcpy — bit-exact for every value
including NaN payloads, which a float-typed transfer could in
principle canonicalize), the buffer crosses the link as ONE message,
and the host splits it back into the original tree by a static offset
table.  The reference's analogue is its io-rank gather-then-write
(module_hrldas_netcdf_io.F90:1773-1884): one aggregated payload per
output, not one message per field.

Supported leaf dtypes: float32/int32 (the model's entire on-device
state) and int16 (the optional scale/offset-packed history planes —
pairs of int16 are bitcast into one int32 lane, with odd-length
leaves padded by one element).  ``pack`` returns None for anything
else so callers can fall back to the per-leaf path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
from jax import lax


class TreePacker:
    """Caches one jitted pack function per (treedef, shapes, dtypes)."""

    def __init__(self):
        self._fns = {}

    def pack(self, tree):
        """-> (flat int32 device buffer, meta) or None if any leaf has
        an unsupported dtype / the tree is empty.  ``meta`` is opaque;
        pass it to :func:`unpack`."""
        leaves, treedef = jtu.tree_flatten(tree)
        if not leaves:
            return None
        sig = []
        for l in leaves:
            dt = np.dtype(getattr(l, "dtype", None) or np.asarray(l).dtype)
            if dt not in (np.dtype(np.float32), np.dtype(np.int32),
                          np.dtype(np.int16)):
                return None
            sig.append((tuple(np.shape(l)), dt.name))
        sig = tuple(sig)
        key = (treedef, sig)
        fn = self._fns.get(key)
        if fn is None:
            def _pack(ls):
                parts = []
                for x in jtu.tree_leaves(ls):
                    x = jnp.ravel(x)
                    if x.dtype == jnp.float32:
                        x = lax.bitcast_convert_type(x, jnp.int32)
                    elif x.dtype == jnp.int16:
                        if x.shape[0] % 2:
                            x = jnp.concatenate(
                                [x, jnp.zeros(1, jnp.int16)])
                        x = lax.bitcast_convert_type(
                            x.reshape(-1, 2), jnp.int32)
                    parts.append(x)
                return jnp.concatenate(parts)

            fn = jax.jit(_pack)
            self._fns[key] = fn
        return fn(leaves), (treedef, sig)


def unpack(buf, meta):
    """Split a packed buffer back into the original pytree (host numpy
    leaves).  ``np.asarray(buf)`` here is the ONE device->host transfer
    when ``buf`` is still a device array."""
    treedef, sig = meta
    buf = np.asarray(buf)
    out = []
    off = 0
    for shape, dtype in sig:
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if dtype == "int16":
            n32 = (size + 1) // 2            # padded pair count
            v = buf[off:off + n32].view(np.int16)[:size]
            off += n32
        else:
            v = buf[off:off + size]
            if dtype == "float32":
                v = v.view(np.float32)
            off += size
        out.append(v.reshape(shape))
    return jtu.tree_unflatten(treedef, out)
