"""FFM parity tests.

1. Golden sequences from the reference's FFM tests with all-ones weight init
   (reference: src/block_ffm.rs:1238-1323; those tests are #[ignore]d upstream
   but the expected values verify against the FFM math by hand).
2. A brute-force NumPy re-implementation of the reference's double-loop
   forward (reference: src/block_ffm.rs:153-261) cross-checked against the
   batched contra-tensor formulation on random inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import ModelInstance, Optimizer
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.train.step import make_predict_step, make_train_step

EPS = 5e-6


def assert_eps(x, y):
    assert abs(float(x) - float(y)) < EPS, f"Expectation: {y}, Got: {x}"


def ffm_batch(feats, L=1, label=0.0, importance=1.0):
    """B=1 batch with only FFM features (the reference's ffm_vec helper,
    src/block_ffm.rs:1219-1227). feats = [(hash, value, field)]."""
    N = len(feats)
    return {
        "label": np.array([label], np.float32),
        "importance": np.array([importance], np.float32),
        "lr_ids": np.zeros((1, L), np.int32),
        "lr_vals": np.zeros((1, L), np.float32),
        "lr_combos": np.zeros((1, L), np.int32),
        "ffm_ids": np.array([[h for h, _, _ in feats]], np.int32),
        "ffm_vals": np.array([[v for _, v, _ in feats]], np.float32),
        "ffm_fields": np.array([[f for _, _, f in feats]], np.int32),
    }


def make_ffm_mi(optimizer, k, num_fields=2):
    mi = ModelInstance()
    mi.learning_rate = 0.1
    mi.ffm_learning_rate = 0.1
    mi.power_t = 0.0
    mi.ffm_power_t = 0.0
    mi.bit_precision = 18
    mi.ffm_k = k
    mi.ffm_bit_precision = 18
    mi.ffm_fields = [[] for _ in range(num_fields)]
    mi.optimizer = optimizer
    mi.add_constant_feature = False  # pure-FFM graph like the reference test
    mi.init_acc_gradient = 0.0
    mi.ffm_init_acc_gradient = 0.0
    return mi


def ones_ffm(model, params):
    params = dict(params)
    params["ffm_w"] = jnp.ones_like(params["ffm_w"])
    return params


def test_ffm_k1_single_field():
    # one feature in one field: only a (zeroed) self-interaction → 0.5
    mi = make_ffm_mi(Optimizer.ADAGRAD_LUT, k=1)
    model = FwModel(mi)
    params = ones_ffm(model, model.init_params())
    step = make_train_step(model)
    b = ffm_batch([(1, 1.0, 0)])
    params, p = step(params, b)
    assert_eps(p[0], 0.5)
    params, p = step(params, b)
    assert_eps(p[0], 0.5)


def test_ffm_k1_two_fields_flex():
    # (reference: src/block_ffm.rs:1268-1296)
    mi = make_ffm_mi(Optimizer.ADAGRAD_FLEX, k=1)
    model = FwModel(mi)
    params = ones_ffm(model, model.init_params())
    step = make_train_step(model)
    b = ffm_batch([(1, 1.0, 0), (100, 1.0, 1)])
    params, p = step(params, b)
    assert_eps(p[0], 0.7310586)
    params, p = step(params, b)
    assert_eps(p[0], 0.7024794)


def test_ffm_k1_two_fields_values_lut():
    # (reference: src/block_ffm.rs:1298-1322)
    mi = make_ffm_mi(Optimizer.ADAGRAD_LUT, k=1)
    model = FwModel(mi)
    params = ones_ffm(model, model.init_params())
    step = make_train_step(model)
    b = ffm_batch([(1, 2.0, 0), (100, 2.0, 1)])
    params, p = step(params, b)
    assert_eps(p[0], 0.98201376)
    params, p = step(params, b)
    assert_eps(p[0], 0.81377685)


# ---------------------------------------------------------------------------
# brute-force cross-check of the forward math
# ---------------------------------------------------------------------------


def reference_ffm_forward(weights, feats, F, k):
    """Direct NumPy transcription of the reference's per-example math
    (contra fields + per-feature field dots with diagonal self-subtraction,
    reference: src/block_ffm.rs:153-261). Returns the F×F output matrix."""
    out = np.zeros((F, F), np.float64)
    # contra[t, f, kk] = sum over features a in field f of v_a * w[a_hash + t*k + kk]
    contra = np.zeros((F, F, k), np.float64)
    for h, v, f in feats:
        for t in range(F):
            contra[t, f, :] += v * weights[h + t * k : h + t * k + k]
    for h, v, fi in feats:
        for z in range(F):
            w_feat_z = weights[h + z * k : h + z * k + k]
            cw = contra[fi, z, :].copy()
            if z == fi:
                cw -= w_feat_z * v
            gradient = v * cw
            correction = np.dot(w_feat_z, gradient)
            out[fi, z] += correction * 0.5
    return out


@pytest.mark.parametrize("F,k,n_feats,seed", [(2, 1, 2, 0), (3, 4, 7, 1), (5, 8, 12, 2)])
def test_ffm_forward_matches_bruteforce(F, k, n_feats, seed):
    rng = np.random.default_rng(seed)
    mi = make_ffm_mi(Optimizer.ADAGRAD_FLEX, k=k, num_fields=F)
    mi.ffm_bit_precision = 10
    model = FwModel(mi)
    params = model.init_params()
    weights = np.asarray(params["ffm_w"], np.float64).reshape(-1)

    # random features with slab-aligned hashes (our addressing quantizes the
    # hash to the slab alignment — aligned hashes make the flat-window math
    # below identical to the reference's h..h+F·k window)
    align = model.ffm_spec.align
    feats = []
    for _ in range(n_feats):
        h = int(rng.integers(0, (1 << 10) // align)) * align
        v = float(rng.uniform(-2, 2))
        f = int(rng.integers(0, F))
        feats.append((h, v, f))
    feats.sort(key=lambda x: x[2])  # reference buffers are field-ordered

    ref_out = reference_ffm_forward(weights, feats, F, k)

    batch = ffm_batch(feats)
    emb = model.gather_ffm(params, batch)[0]
    inter = np.asarray(model.ffm_outputs(emb, batch))[0]
    np.testing.assert_allclose(inter, ref_out, rtol=2e-4, atol=1e-6)

    # triangle: row-major lower triangle, off-diag ×2
    tri = np.asarray(model.triangle(jnp.asarray(inter[None])))[0]
    expected = []
    for i in range(F):
        for j in range(i):
            expected.append(ref_out[i, j] * 2.0)
        expected.append(ref_out[i, i])
    np.testing.assert_allclose(tri, np.asarray(expected), rtol=2e-4, atol=1e-6)


def test_ffm_padding_is_inert():
    """Padded entries (id 0, value 0, field 0) must not change outputs."""
    mi = make_ffm_mi(Optimizer.ADAGRAD_FLEX, k=2, num_fields=2)
    model = FwModel(mi)
    params = model.init_params()
    predict = make_predict_step(model)
    feats = [(4, 1.5, 0), (8, -0.5, 1)]
    p1 = float(predict(params, ffm_batch(feats))[0])
    p2 = float(predict(params, ffm_batch(feats + [(0, 0.0, 0), (0, 0.0, 0)]))[0])
    assert_eps(p1, p2)


def test_ffm_update_batch_consistency():
    """Two identical examples in one batch must produce the same forward
    predictions and a single fused update (gsum doubled, gsq doubled)."""
    mi = make_ffm_mi(Optimizer.ADAGRAD_FLEX, k=2, num_fields=2)
    model = FwModel(mi)
    step = make_train_step(model)
    feats = [(4, 1.0, 0), (8, 1.0, 1)]
    b1 = ffm_batch(feats)
    b2 = {
        k: np.concatenate([v, v], axis=0) if hasattr(v, "shape") else v
        for k, v in b1.items()
    }
    params = model.init_params()
    params2, p2 = step(model.init_params(), b2)
    assert_eps(p2[0], p2[1])


def test_ffm_missing_field():
    """Three fields where only the middle one has features: the collapsed
    (contra) embeddings of empty fields must act as zeros, and training on
    such examples must not corrupt them (reference: src/block_ffm.rs:1882 —
    guards against uninitialized contra sums for featureless fields)."""
    mi = make_ffm_mi(Optimizer.ADAGRAD_FLEX, k=1, num_fields=3)
    model = FwModel(mi)
    params = ones_ffm(model, model.init_params())
    predict = make_predict_step(model)
    train = make_train_step(model)

    # single feature in field 1 only: no pair both-present → logit 0 → 0.5
    feats = [(5, 1.0, 1)]
    assert_eps(predict(params, ffm_batch(feats))[0], 0.5)

    # train a step on it: empty fields own no touched rows, so a feature
    # later appearing in field 0 must still see the pristine (ones) weights.
    # (p_ref first: the train step donates its params buffers)
    p_ref = float(predict(params, ffm_batch([(64, 1.0, 0), (128, 1.0, 2)]))[0])
    params2, _ = train(params, ffm_batch(feats, label=1.0))
    p_pair = float(predict(params2, ffm_batch([(64, 1.0, 0), (128, 1.0, 2)]))[0])
    assert_eps(p_pair, p_ref)
