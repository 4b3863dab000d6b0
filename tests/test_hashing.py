"""Hash-core golden tests.

Golden values come from the reference's parser tests
(reference: src/parser.rs:474-760) — these are real murmur3 values the whole
framework's parity rests on."""

import numpy as np

from fwumious_wabbit_tpu.hashing import (
    MASK31,
    fnv_combine,
    feature_hash,
    merand48,
    merand48_array,
    murmur3_32,
    murmur3_32_batch,
    namespace_seed,
)


def test_feature_hash_goldens():
    sA = namespace_seed("A")
    sB = namespace_seed("B")
    assert feature_hash("a", sA) == 2988156968 & MASK31
    assert feature_hash("b", sA) == 3529656005 & MASK31
    assert feature_hash("c", sA) == 906509 & MASK31
    assert feature_hash("b", sB) == 2422381320 & MASK31


def test_murmur3_empty_and_long():
    # reference murmur3 x86_32 standard test vectors
    assert murmur3_32(b"", 0) == 0
    assert murmur3_32(b"", 1) == 0x514E28B7
    assert murmur3_32(b"hello", 0) == 0x248BFA47
    assert murmur3_32(b"hello, world", 0) == 0x149BBB7F
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog", 0x9747B28C) == 0x2FA826CD


def test_murmur3_batch_matches_scalar():
    rng = np.random.default_rng(0)
    keys = [bytes(rng.integers(0, 256, size=rng.integers(0, 24), dtype=np.uint8)) for _ in range(200)]
    seeds = rng.integers(0, 2**32, size=200, dtype=np.uint64).astype(np.uint32)
    wmax = max((len(k) for k in keys), default=1) or 1
    data = np.zeros((len(keys), wmax), np.uint8)
    lens = np.zeros(len(keys), np.int64)
    for i, k in enumerate(keys):
        data[i, : len(k)] = np.frombuffer(k, np.uint8)
        lens[i] = len(k)
    batch = murmur3_32_batch(data, lens, seeds)
    for i, k in enumerate(keys):
        assert batch[i] == murmur3_32(k, int(seeds[i])), i


def test_fnv_combine_scalar_vs_vector():
    h = fnv_combine(2988156968, 2422381320)
    arr = fnv_combine(np.array([2988156968], dtype=np.uint32), np.array([2422381320], dtype=np.uint32))
    assert h == int(arr[0])


def test_merand48_range_and_vectorization():
    idx = np.arange(1000, dtype=np.uint64)
    vals = merand48_array(idx)
    assert np.all(vals >= 0.0) and np.all(vals < 1.0)
    for i in (0, 1, 5, 999):
        assert abs(merand48(i) - float(vals[i])) < 1e-9
    # distribution sanity: mean of U[0,1) over 1000 draws
    assert 0.4 < float(vals.mean()) < 0.6
