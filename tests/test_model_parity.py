"""Exact-parity tests at batch size 1 against the reference's golden learn
sequences (reference: src/regressor.rs:555-812, src/optimizer.rs:169-226).

assert_epsilon tolerance is 5e-6, same as the reference's harness
(reference: src/block_helpers.rs:30-40)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import ModelInstance, Optimizer
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.ops.adagrad import (
    OPT_ADAGRAD_FLEX,
    OPT_ADAGRAD_LUT,
    ScopedOptimizer,
    build_lut,
    lut_rate,
)
from fwumious_wabbit_tpu.train.step import make_predict_step, make_train_step

EPS = 5e-6


def assert_eps(x, y):
    assert abs(float(x) - float(y)) < EPS, f"Expectation: {y}, Got: {x}"


def lr_batch(feats, label=0.0, importance=1.0):
    """Build a B=1 batch from (hash, value, combo) triples — the analogue of
    the reference's lr_vec test helper (reference: src/regressor.rs:545-553)."""
    L = max(len(feats), 1)
    ids = np.zeros((1, L), np.int32)
    vals = np.zeros((1, L), np.float32)
    combos = np.zeros((1, L), np.int32)
    for i, (h, v, c) in enumerate(feats):
        ids[0, i], vals[0, i], combos[0, i] = h, v, c
    return {
        "label": np.array([label], np.float32),
        "importance": np.array([importance], np.float32),
        "lr_ids": ids,
        "lr_vals": vals,
        "lr_combos": combos,
        "ffm_ids": np.zeros((1, 0), np.int32),
        "ffm_vals": np.zeros((1, 0), np.float32),
        "ffm_fields": np.zeros((1, 0), np.int32),
    }


def mi_empty(optimizer, learning_rate, power_t, init_acc_gradient=1.0):
    mi = ModelInstance()
    mi.optimizer = optimizer
    mi.learning_rate = learning_rate
    mi.power_t = power_t
    mi.init_acc_gradient = init_acc_gradient
    mi.ffm_k = 0
    return mi


def run_sequence(mi, batches):
    model = FwModel(mi)
    params = model.init_params()
    step = make_train_step(model)
    preds = []
    for b in batches:
        params, p = step(params, b)
        preds.append(float(p[0]))
    return preds


# ---------------------------------------------------------------------------
# optimizer unit goldens (reference: src/optimizer.rs:180-226)
# ---------------------------------------------------------------------------


def test_adagrad_flex_unit():
    opt = ScopedOptimizer(OPT_ADAGRAD_FLEX, 0.15, 0.4, 0.0)
    # acc 0.9, g 0.1 -> update 0.015576674
    from fwumious_wabbit_tpu.ops.adagrad import flex_update

    upd = flex_update(jnp.float32(0.1), jnp.float32(0.9 + 0.01), 0.15, 0.4)
    assert_eps(upd, 0.015576674)
    upd = flex_update(jnp.float32(0.1), jnp.float32(0.01), 0.15, 0.4)
    assert_eps(upd, 0.09464361)
    # 0-gradient, 0 acc -> NaN -> 0
    upd = flex_update(jnp.float32(0.0), jnp.float32(0.0), 0.15, 0.4)
    assert float(upd) == 0.0


def test_adagrad_lut_unit():
    lut = build_lut(0.15, 0.4, 0.0)
    upd = 0.1 * float(lut_rate(jnp.float32(0.9 + 0.01), jnp.asarray(lut)))
    assert_eps(upd, 0.015607622)
    upd = 0.1 * float(lut_rate(jnp.float32(0.01), jnp.asarray(lut)))
    assert_eps(upd, 0.09375872)
    upd = 0.0 * float(lut_rate(jnp.float32(0.0), jnp.asarray(lut)))
    assert upd == 0.0


def test_lut_rate_compute_bit_identical_to_table():
    """lut_rate_compute (the hot-path arithmetic recomputation) must be
    BIT-identical to build_lut + lut_rate over every one of the 2048 buckets
    (edge and mid-bucket bit patterns) for several (lr, power_t, init_acc)
    combos — it replaces the golden-tested table in the train step."""
    from fwumious_wabbit_tpu.ops.adagrad import (
        FASTMATH_LR_LUT_BITS,
        lut_rate_compute,
    )

    shift = 31 - FASTMATH_LR_LUT_BITS
    keys = np.arange(1 << FASTMATH_LR_LUT_BITS, dtype=np.uint32)
    edge = (keys << shift).view(np.float32)
    mid = ((keys << shift) | np.uint32(1 << (shift - 1))).view(np.float32)
    accs = jnp.asarray(np.concatenate([edge, mid]))
    for lr, pt, iag in [(0.15, 0.4, 0.0), (0.1, 0.5, 0.0), (0.1, 0.5, 1.0),
                        (0.5, 0.25, 0.1), (1.0, 0.0, 0.0)]:
        lut = jnp.asarray(build_lut(lr, pt, iag))
        want = np.asarray(lut_rate(accs, lut))
        got = np.asarray(lut_rate_compute(accs, lr, pt, iag))
        mismatch = want.view(np.uint32) != got.view(np.uint32)
        assert not mismatch.any(), (
            lr, pt, iag, np.flatnonzero(mismatch)[:8],
            want[mismatch][:4], got[mismatch][:4],
        )


def test_lut_vs_flex_relative_error():
    """LUT vs exact AdaGrad relative error < 5% over the reference's grid
    (reference: src/optimizer.rs:229-269)."""
    from fwumious_wabbit_tpu.ops.adagrad import flex_update

    lut = jnp.asarray(build_lut(0.15, 0.4, 0.0))
    for g in [-1.0, -0.9, -0.1, -0.00001, 0.0, 0.00001, 0.1, 0.5, 0.9, 1.0]:
        for acc in [1e-10, 1e-5, 0.1, 0.5, 1.1, 2.0, 20.0, 200.0, 2000.0, 2e5, 2e6]:
            acc_new = jnp.float32(acc) + jnp.float32(g) * jnp.float32(g)
            p_flex = float(flex_update(jnp.float32(g), acc_new, 0.15, 0.4))
            p_lut = float(jnp.float32(g) * lut_rate(acc_new, lut))
            err = abs(p_flex - p_lut)
            rel = err / abs(p_flex) if p_flex != 0.0 else err
            assert rel < 0.05, (g, acc)


# ---------------------------------------------------------------------------
# regressor learn-sequence goldens (reference: src/regressor.rs:555-812)
# ---------------------------------------------------------------------------


def test_learning_turned_off():
    mi = mi_empty(Optimizer.ADAGRAD_LUT, 0.5, 0.5)
    model = FwModel(mi)
    params = model.init_params()
    predict = make_predict_step(model)
    assert float(predict(params, lr_batch([]))[0]) == 0.5
    assert float(predict(params, lr_batch([(1, 1.0, 0)]))[0]) == 0.5
    assert float(predict(params, lr_batch([(1, 1.0, 0), (2, 1.0, 0)]))[0]) == 0.5


def test_power_t_zero():
    # (reference: src/regressor.rs:596-626)
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.0)
    b = lr_batch([(1, 1.0, 0)])
    preds = run_sequence(mi, [b, b, b])
    assert_eps(preds[0], 0.5)
    assert_eps(preds[1], 0.48750263)
    assert_eps(preds[2], 0.47533244)


def test_power_t_half():
    # (reference: src/regressor.rs:658-704)
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.5, init_acc_gradient=0.0)
    b = lr_batch([(1, 1.0, 0)])
    preds = run_sequence(mi, [b, b, b])
    assert_eps(preds[0], 0.5)
    assert_eps(preds[1], 0.4750208)
    assert_eps(preds[2], 0.45788094)


def test_power_t_half_fastmath():
    # (reference: src/regressor.rs:706-748, FASTMATH_LR_LUT_BITS == 11)
    mi = mi_empty(Optimizer.ADAGRAD_LUT, 0.1, 0.5, init_acc_gradient=0.0)
    b = lr_batch([(1, 1.0, 0)])
    preds = run_sequence(mi, [b, b])
    assert_eps(preds[0], 0.5)
    assert_eps(preds[1], 0.475734)


def test_power_t_half_two_features():
    # (reference: src/regressor.rs:750-812)
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.5, init_acc_gradient=0.0)
    b2 = lr_batch([(1, 1.0, 0), (2, 1.0, 0)])
    b1 = lr_batch([(1, 1.0, 0)])
    preds = run_sequence(mi, [b2, b2, b1])
    assert_eps(preds[0], 0.5)
    assert_eps(preds[1], 0.45016602)
    assert_eps(preds[2], 0.45836908)


def test_non_one_weight():
    # (reference: src/regressor.rs:814-860 test_non_one_weight — value 2.0)
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.0)
    b = lr_batch([(1, 2.0, 0)])
    preds = run_sequence(mi, [b, b, b])
    assert_eps(preds[0], 0.5)
    # manual: g=(0.5-0)*2=1.0 -> w -= 0.1 -> logit=-0.2
    assert_eps(preds[1], 1.0 / (1.0 + np.exp(0.2)))


def test_importance_zero_no_update():
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.0)
    b0 = lr_batch([(1, 1.0, 0)], importance=0.0)
    b = lr_batch([(1, 1.0, 0)])
    preds = run_sequence(mi, [b0, b0, b])
    assert preds == [0.5, 0.5, 0.5]


def test_example_importance_halved():
    # importance 0.5 halves the gradient
    mi = mi_empty(Optimizer.ADAGRAD_FLEX, 0.1, 0.0)
    bh = lr_batch([(1, 1.0, 0)], importance=0.5)
    preds = run_sequence(mi, [bh, bh])
    assert_eps(preds[0], 0.5)
    # g = 0.5*0.5 = 0.25, w -= 0.025
    assert_eps(preds[1], 1.0 / (1.0 + np.exp(0.025)))
