"""Device-side merand48 init vs the NumPy oracle (hashing.py)."""

import numpy as np

import jax.numpy as jnp

from fwumious_wabbit_tpu.hashing import merand48_array
from fwumious_wabbit_tpu.ops.init import ffm_init_band, ffm_init_default, merand48


def test_merand48_matches_numpy():
    idx = np.concatenate([
        np.arange(0, 1000), np.arange(2**29 - 10, 2**29 + 10),
        np.arange(2**30 - 5, 2**30 + 5),
    ]).astype(np.uint32)
    want = merand48_array(idx.astype(np.uint64))
    got = np.asarray(merand48(jnp.asarray(idx)))
    np.testing.assert_array_equal(got, want)


def test_ffm_init_default_matches_host_formula():
    n, k, padded = 1000, 4, 1024
    got = np.asarray(ffm_init_default(n, k, padded))
    idx = np.arange(n, dtype=np.uint64)
    scale = np.float32(1.0 / np.sqrt(k) / 50.0)
    want = (merand48_array(idx + np.uint64(n)) - np.float32(0.5)) * scale
    np.testing.assert_array_equal(got[:n], want)
    assert np.all(got[n:] == 0.0)


def test_ffm_init_band_matches_host_formula():
    n, padded = 500, 512
    got = np.asarray(ffm_init_band(n, padded, 0.8, 0.25, 0.1))
    idx = np.arange(n, dtype=np.uint64)
    zero_half_band = np.float32(0.8 * 0.25 * 0.5)
    band_width = np.float32(0.8 * (1.0 - 0.25))
    w = merand48_array(idx) * band_width - band_width * np.float32(0.5)
    w = np.where(w > 0.0, w + zero_half_band, w - zero_half_band)
    w = (w + np.float32(0.1)).astype(np.float32)
    np.testing.assert_allclose(got[:n], w, rtol=1e-6, atol=1e-7)
