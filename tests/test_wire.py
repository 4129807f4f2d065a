"""RLE wire-format tests: exact roundtrip, frame-boundary breaks, the
raw fallback for pathological streams, and rgb pixel packing."""

import numpy as np

import jax.numpy as jnp

from mmdyn_tpu.utils.wire import RunLengthWire, pack_rgb, unpack_rgb


def test_roundtrip_structured():
    rng = np.random.default_rng(0)
    # blocky frames (run-friendly) with distinct rows per frame
    f, n = 5, 4096
    x = np.repeat(rng.integers(0, 7, size=(f, n // 64), dtype=np.uint32),
                  64, axis=1)
    w = RunLengthWire()
    h = w.encode([jnp.asarray(x)], row_len=n)
    (out,) = w.get(h)
    np.testing.assert_array_equal(out, x)


def test_multiple_streams_and_boundaries():
    w = RunLengthWire()
    n = 256
    # constant frames: runs must still break at every frame boundary so the
    # host can split frames without scanning values
    a = np.zeros((3, n), np.uint32)
    b = np.full((2, n), 9, np.uint32)
    h = w.encode([jnp.asarray(a), jnp.asarray(b)], row_len=n)
    oa, ob = w.get(h)
    np.testing.assert_array_equal(oa, a)
    np.testing.assert_array_equal(ob, b)
    assert int(np.asarray(h["n_runs"])) == 5  # one run per frame


def test_raw_fallback_on_noise():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**24, size=(2, 2048), dtype=np.uint32)
    w = RunLengthWire()
    h = w.encode([jnp.asarray(x)], row_len=2048)
    (out,) = w.get(h)   # falls back to the raw transfer internally
    np.testing.assert_array_equal(out, x)


def test_four_plane_roundtrip_and_bounds():
    """planes=4 (a payload folded into the spare value byte) roundtrips
    exactly, and run_bounds splits streams on exact boundaries."""
    rng = np.random.default_rng(3)
    n = 4096
    a = np.repeat(rng.integers(0, 2**32 - 1, size=(4, n // 64),
                               dtype=np.uint32), 64, axis=1)
    c = np.full((2, n), 7, np.uint32)
    w = RunLengthWire()
    h = w.encode([jnp.asarray(a), jnp.asarray(c)], row_len=n, planes=4)
    raw = w.get_raw(h)
    oa, oc = RunLengthWire.decode(raw)
    np.testing.assert_array_equal(oa, a)
    np.testing.assert_array_equal(oc, c)
    (s0, e0), (s1, e1) = RunLengthWire.run_bounds(raw)
    assert s0 == 0 and e0 == s1 and e1 == len(raw["lengths"])
    assert raw["lengths"][s0:e0].sum() == a.size
    assert raw["lengths"][s1:e1].sum() == c.size


def test_pack_unpack_rgb():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(3, 8, 16, 3), dtype=np.uint8)
    pix = pack_rgb(jnp.asarray(img))
    assert pix.shape == (3, 8 * 16)
    np.testing.assert_array_equal(unpack_rgb(np.asarray(pix), 8, 16), img)
