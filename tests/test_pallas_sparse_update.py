"""The Pallas table-sweep sparse update (ops/pallas/sparse_update.py) vs the
XLA scatter path — semantics must be identical (same Σg/Σg² per weight, rate
from the fully-bumped accumulator) up to f32 summation order.

Runs through the Pallas interpreter on the CPU test backend; the compiled
kernel is exercised and measured on the real chip by
scripts/sparse_update_bench.py (results in
fwumious_wabbit_tpu/ops/pallas/SPARSE_UPDATE_NOTES.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fwumious_wabbit_tpu.ops import tables
from fwumious_wabbit_tpu.ops.adagrad import (
    OPT_ADAGRAD_FLEX,
    OPT_ADAGRAD_LUT,
    OPT_SGD,
    ScopedOptimizer,
)
from fwumious_wabbit_tpu.ops.pallas import sparse_update


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(sparse_update, "_INTERPRET", True)


def _case(R=512, K=300, seed=0, dup_heavy=False):
    rng = np.random.default_rng(seed)
    hi = 8 if dup_heavy else R
    rid = jnp.asarray(rng.integers(0, hi, K).astype(np.int32))
    g = jnp.asarray((rng.normal(size=(K, tables.LANE)) * 0.1).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(R, tables.LANE)).astype(np.float32))
    acc = jnp.asarray(rng.uniform(0, 2, size=(R, tables.LANE)).astype(np.float32))
    return rid, g, w, acc


@pytest.mark.parametrize("kind", [OPT_ADAGRAD_LUT, OPT_ADAGRAD_FLEX, OPT_SGD])
@pytest.mark.parametrize("dup_heavy", [False, True])
def test_matches_apply_rows(kind, dup_heavy):
    rid, g, w, acc = _case(dup_heavy=dup_heavy)
    opt = ScopedOptimizer(kind, 0.1, 0.5, 0.0)
    w1, a1 = opt.apply_rows(w, acc, rid, g)
    # the kernel donates its table arguments — hand it copies
    w2, a2 = sparse_update.sparse_adagrad_update(
        jnp.array(w), jnp.array(acc) if kind != OPT_SGD else None,
        rid, g, 0.1, 0.5, 0.0, kind=kind)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    if kind != OPT_SGD:
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-6)


def test_power_t_variants():
    """rsqrt/constant fast paths in the kernel rate vs the XLA rate."""
    rid, g, w, acc = _case(seed=3)
    for power_t in (0.0, 0.5, 0.35):
        opt = ScopedOptimizer(OPT_ADAGRAD_LUT, 0.1, power_t, 0.5)
        w1, a1 = opt.apply_rows(w, acc, rid, g)
        w2, a2 = sparse_update.sparse_adagrad_update(
            jnp.array(w), jnp.array(acc), rid, g, 0.1, power_t, 0.5,
            kind=OPT_ADAGRAD_LUT)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                                   rtol=1e-5, atol=1e-6, err_msg=str(power_t))
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-6)


def test_empty_chunks_copy_through():
    """Rows far from any update must come back bit-identical (the untouched
    chunk copy-through path)."""
    rng = np.random.default_rng(5)
    R, K = 2048, 64
    rid = jnp.asarray(rng.integers(0, 128, K).astype(np.int32))  # chunk 0 only
    g = jnp.asarray((rng.normal(size=(K, tables.LANE)) * 0.1).astype(np.float32))
    w = rng.normal(size=(R, tables.LANE)).astype(np.float32)
    acc = rng.uniform(0, 2, size=(R, tables.LANE)).astype(np.float32)
    w2, a2 = sparse_update.sparse_adagrad_update(
        jnp.asarray(w), jnp.asarray(acc), rid, g, 0.1, 0.5, 0.0,
        kind=OPT_ADAGRAD_LUT)
    # chunk granularity is min(2048, R) = 1024 here → rows ≥ 1024 untouched
    assert np.array_equal(w[1024:], np.asarray(w2)[1024:])
    assert np.array_equal(acc[1024:], np.asarray(a2)[1024:])
    assert not np.array_equal(w[:1024], np.asarray(w2)[:1024])


def test_empty_chunks_between_occupied_ones():
    """Regression: real CTR id distributions leave EMPTY chunks between
    occupied ones with misaligned update ranges (lo == hi, lo % tile ≠ 0).
    The tile-count expression used to evaluate to 1 there, making the
    phantom tile wait on a semaphore no predecessor signalled — a device
    hang/crash on hardware (found via the 2^26 CLI run; ids clustered on
    ~900 distinct rows). The pattern here: a big run in chunk 0 ending off
    tile alignment, nothing in chunks 1–2, updates again in chunk 3."""
    R = 4 * 1024  # 4 chunks of 1024 (chunk = min(2048, pow2 divisor) = 1024)
    rid = np.concatenate([
        np.zeros(333, np.int32),              # chunk 0, lo=0..333 (misaligned)
        np.full(77, 3 * 1024 + 5, np.int32),  # chunk 3
    ])
    rng = np.random.default_rng(9)
    g = (rng.normal(size=(len(rid), tables.LANE)) * 0.1).astype(np.float32)
    w = rng.normal(size=(R, tables.LANE)).astype(np.float32)
    acc = rng.uniform(0, 2, size=(R, tables.LANE)).astype(np.float32)
    opt = ScopedOptimizer(OPT_ADAGRAD_LUT, 0.1, 0.5, 0.0, pallas_mode="off")
    w1, a1 = opt.apply_rows(jnp.asarray(w), jnp.asarray(acc),
                            jnp.asarray(rid), jnp.asarray(g))
    w2, a2 = sparse_update.sparse_adagrad_update(
        jnp.asarray(w), jnp.asarray(acc), jnp.asarray(rid), jnp.asarray(g),
        0.1, 0.5, 0.0, kind=OPT_ADAGRAD_LUT)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=1e-5, atol=1e-6)
    # the empty chunks 1–2 are untouched bit-for-bit
    assert np.array_equal(w[1024:3072], np.asarray(w2)[1024:3072])


def test_worth_it_rule():
    # 2^25 at large K: measured tie vs XLA-fast but dodges the bimodal
    # slow mode — sweep engages at K >= 2^17, stays off below
    assert sparse_update.worth_it(1 << 18, 200_000)
    assert not sparse_update.worth_it(1 << 18, 100_000)
    assert not sparse_update.worth_it(1 << 17, 200_000)       # 2^24: off
    assert sparse_update.worth_it((1 << 26) // 128, 32_768)   # 2^26: 11×
    assert sparse_update.worth_it((1 << 29) // 128, 65_536)   # 2^29: 1.4×
    # very low density: the sweep's table-bound cost is not worth it
    assert not sparse_update.worth_it((1 << 29) // 128, 1000)


def test_auto_dispatch_is_off_on_cpu():
    """On the CPU test backend the optimizer never routes to the kernel."""
    opt = ScopedOptimizer(OPT_ADAGRAD_LUT, 0.1, 0.5, 0.0, pallas_mode="auto")
    assert opt._use_pallas((1 << 29) // 128, 200_000) is False
