"""One-transfer readback packer (driver/pack.py): bit-exact round
trips for the mixed f32/i32 pytrees the driver ships to the writer
thread, including NaN payloads (the reason the buffer is int32-typed:
a float-typed transfer could canonicalize them)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from noahmp_tpu.driver.pack import TreePacker, unpack


@dataclasses.dataclass
class _Tree:
    a: object
    b: object
    c: object


import jax.tree_util as jtu
jtu.register_pytree_node(
    _Tree, lambda t: ((t.a, t.b, t.c), None),
    lambda _, ch: _Tree(*ch))


def test_roundtrip_bit_exact():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((7, 3)).astype(np.float32)
    # adversarial payloads: -0.0, inf, a non-canonical NaN bit pattern
    f[0, 0] = -0.0
    f[0, 1] = np.inf
    f[0, 2] = np.float32(np.nan)
    weird_nan = np.array([0x7FC01234], np.uint32).view(np.float32)[0]
    f[1, 0] = weird_nan
    i = rng.integers(-2**31, 2**31 - 1, size=(5,), dtype=np.int32)
    scalar = np.float32(3.5)
    tree = {"x": _Tree(jnp.asarray(f), jnp.asarray(i),
                       jnp.asarray(scalar)),
            "none": None,
            "lst": [jnp.zeros((0,), jnp.float32),
                    jnp.asarray([[2]], jnp.int32)]}
    buf, meta = TreePacker().pack(tree)
    assert buf.dtype == jnp.int32 and buf.ndim == 1
    out = unpack(buf, meta)
    got = out["x"]
    assert got.a.dtype == np.float32 and got.a.shape == f.shape
    assert np.array_equal(got.a.view(np.uint32), f.view(np.uint32)), \
        "float payload not bit-exact through the packed transfer"
    assert np.array_equal(got.b, i)
    assert got.c.shape == () and got.c == scalar
    assert out["none"] is None
    assert out["lst"][0].shape == (0,)
    assert np.array_equal(out["lst"][1], [[2]])


def test_int16_roundtrip_odd_and_even():
    """int16 leaves ride as bitcast pairs with odd-length padding."""
    rng = np.random.default_rng(1)
    odd = rng.integers(-32768, 32767, size=(5,), dtype=np.int16)
    even = rng.integers(-32768, 32767, size=(3, 4), dtype=np.int16)
    f = rng.standard_normal(3).astype(np.float32)
    tree = {"odd": jnp.asarray(odd), "even": jnp.asarray(even),
            "f": jnp.asarray(f)}
    buf, meta = TreePacker().pack(tree)
    out = unpack(buf, meta)
    assert out["odd"].dtype == np.int16
    assert np.array_equal(out["odd"], odd)
    assert np.array_equal(out["even"], even)
    assert np.array_equal(out["f"].view(np.uint32), f.view(np.uint32))


def test_unsupported_dtype_falls_back():
    p = TreePacker()
    assert p.pack({"a": jnp.zeros(3, jnp.float32),
                   "b": np.zeros(3, np.float64)}) is None
    assert p.pack({}) is None


def test_fn_cache_reuse_and_distinct_structures():
    p = TreePacker()
    t1 = {"a": jnp.arange(4, dtype=jnp.float32)}
    p.pack(t1)
    assert len(p._fns) == 1
    p.pack({"a": jnp.arange(4, dtype=jnp.float32) * 2})
    assert len(p._fns) == 1            # same structure: cached fn
    p.pack({"a": jnp.arange(5, dtype=jnp.float32)})
    assert len(p._fns) == 2            # new shape: new fn
    buf, meta = p.pack({"a": jnp.arange(4, dtype=jnp.int32)})
    assert np.array_equal(unpack(buf, meta)["a"], np.arange(4))
