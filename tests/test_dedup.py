"""Duplicate-id update semantics: the reference sums all of an example's
contributions to a weight and updates it once per example ("We sum all
changes to each feature weight ... and do the final update of each feature
weight only once per example", reference: SPEED.md:74-75,
src/block_ffm.rs:265-288) — so the AdaGrad accumulator receives (Σg)² per
(example, weight), not the per-occurrence Σg². These tests pin that
semantic exactly at batch size 1 (duplicated feature in one example) and
verify the dedup kernel itself against a numpy oracle.
"""

import numpy as np

import jax
import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import ModelInstance, Optimizer
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.ops import tables
from fwumious_wabbit_tpu.ops.adagrad import OPT_ADAGRAD_FLEX, ScopedOptimizer
from fwumious_wabbit_tpu.train.step import make_train_step

EPS = 5e-6


def lr_batch(feats, label=0.0):
    L = len(feats)
    ids = np.zeros((1, L), np.int32)
    vals = np.zeros((1, L), np.float32)
    combos = np.zeros((1, L), np.int32)
    for i, (h, v, c) in enumerate(feats):
        ids[0, i], vals[0, i], combos[0, i] = h, v, c
    return {
        "label": np.array([label], np.float32),
        "importance": np.array([1.0], np.float32),
        "lr_ids": ids,
        "lr_vals": vals,
        "lr_combos": combos,
        "ffm_ids": np.zeros((1, 0), np.int32),
        "ffm_vals": np.zeros((1, 0), np.float32),
        "ffm_fields": np.zeros((1, 0), np.int32),
    }


def reference_lr_sequence(feats, lr, power_t, steps):
    """Numpy oracle of the reference's per-example LR learn with summed
    per-weight gradients and ONE update per weight per example
    (SPEED.md:74-75): logit = Σ w[h]·v; gg = p − label; per weight
    gsum = Σ_occurrences gg·v; acc += gsum²; w -= lr·gsum·acc^(−power_t)."""
    w = {}
    acc = {}
    preds = []
    for _ in range(steps):
        logit = np.float32(sum(w.get(h, 0.0) * v for h, v, _ in feats))
        p = np.float32(1.0 / (1.0 + np.exp(-logit, dtype=np.float32)))
        preds.append(float(p))
        gg = p  # label 0, importance 1
        gsums = {}
        for h, v, _ in feats:
            gsums[h] = np.float32(gsums.get(h, np.float32(0.0)) + gg * np.float32(v))
        for h, gsum in gsums.items():
            a = np.float32(acc.get(h, 0.0) + gsum * gsum)
            acc[h] = a
            upd = np.float32(lr) * gsum * np.float32(a) ** np.float32(-power_t)
            if not np.isfinite(upd):
                upd = np.float32(0.0)
            w[h] = np.float32(w.get(h, 0.0) - upd)
    return preds


def run_model_sequence(feats, lr, power_t, steps):
    mi = ModelInstance()
    mi.optimizer = Optimizer.ADAGRAD_FLEX
    mi.learning_rate = lr
    mi.power_t = power_t
    mi.init_acc_gradient = 0.0
    mi.ffm_k = 0
    model = FwModel(mi)
    params = model.init_params()
    step = make_train_step(model)
    b = lr_batch(feats)
    preds = []
    for _ in range(steps):
        params, p = step(params, b)
        preds.append(float(p[0]))
    return preds, params


def test_duplicated_feature_matches_reference_sequence():
    """Same feature twice in one example: acc must get (Σg)² = (2g)², not
    2g² — three steps against the numpy oracle."""
    feats = [(1, 1.0, 0), (1, 1.0, 0)]
    got, _ = run_model_sequence(feats, 0.1, 0.5, 3)
    want = reference_lr_sequence(feats, 0.1, 0.5, 3)
    for g, w in zip(got, want):
        assert abs(g - w) < EPS, (got, want)


def test_duplicated_feature_acc_value():
    """Direct accumulator check after one step: acc[h] == (2·0.5)² = 1.0."""
    feats = [(1, 1.0, 0), (1, 1.0, 0)]
    _, params = run_model_sequence(feats, 0.1, 0.5, 1)
    acc = np.asarray(params["lr_acc"]).reshape(-1)
    # hash 1 → row 0, lane 1
    assert abs(acc[1] - 1.0) < EPS, acc[1]
    # the naive per-occurrence semantics would have given 0.5² + 0.5² = 0.5
    assert abs(acc[1] - 0.5) > 0.4


def test_triplicated_mixed_values():
    """Same feature three times with different values + a disjoint feature."""
    feats = [(5, 1.0, 0), (5, 2.0, 0), (5, 0.5, 0), (9, 1.0, 0)]
    got, _ = run_model_sequence(feats, 0.1, 0.5, 3)
    want = reference_lr_sequence(feats, 0.1, 0.5, 3)
    for g, w in zip(got, want):
        assert abs(g - w) < EPS, (got, want)


def test_duplicates_across_examples_not_merged():
    """Dedup is per example: the same id in two different examples of a batch
    must contribute two separate (Σg)² bumps (acc += g₁² + g₂²), matching
    sequential per-example updates in expectation."""
    opt = ScopedOptimizer(OPT_ADAGRAD_FLEX, 0.1, 0.5, 0.0)
    w = jnp.zeros((4, tables.LANE), jnp.float32)
    acc = jnp.zeros((4, tables.LANE), jnp.float32)
    # batch of 2 examples, width 2: example 0 has rid 1 twice (dedup),
    # example 1 has rid 1 once (+ rid 2)
    rid = jnp.asarray([1, 1, 1, 2], jnp.int32)
    g0 = np.zeros((4, tables.LANE), np.float32)
    g0[0, 3] = 0.5
    g0[1, 3] = 0.25
    g0[2, 3] = 0.125
    g0[3, 7] = 1.0
    grows = jnp.asarray(g0)
    rid_d, grows_d = tables.dedup_rows(rid, grows, batch=2)
    _, acc_new = opt.apply_rows(w, acc, rid_d, grows_d)
    a = np.asarray(acc_new)
    # example 0: (0.5+0.25)² = 0.5625; example 1: 0.125² = 0.015625
    assert abs(a[1, 3] - (0.5625 + 0.015625)) < 1e-6, a[1, 3]
    assert abs(a[2, 7] - 1.0) < 1e-6


def test_dedup_rows_oracle():
    """dedup_rows vs a numpy loop: per example, one summed row per unique id,
    zeros elsewhere; scatter-add equivalence preserved."""
    rng = np.random.default_rng(7)
    B, W = 5, 9
    rid = rng.integers(0, 4, size=(B, W)).astype(np.int32)
    grows = rng.normal(size=(B, W, tables.LANE)).astype(np.float32)
    rid_d, grows_d = tables.dedup_rows(
        jnp.asarray(rid.reshape(-1)), jnp.asarray(grows.reshape(-1, tables.LANE)), B
    )
    rid_d = np.asarray(rid_d).reshape(B, W)
    grows_d = np.asarray(grows_d).reshape(B, W, tables.LANE)
    for b in range(B):
        # scatter-equivalence: per-rid sums unchanged
        for r in np.unique(rid[b]):
            want = grows[b][rid[b] == r].sum(axis=0)
            got = grows_d[b][rid_d[b] == r].sum(axis=0)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # at most one nonzero row per rid (the "update once" shape)
        for r in np.unique(rid_d[b]):
            nz = np.any(grows_d[b][rid_d[b] == r] != 0.0, axis=1).sum()
            assert nz <= 1, (b, r, nz)


def test_dedup_noop_without_duplicates():
    """No duplicates → pure permutation; apply_rows result identical."""
    rng = np.random.default_rng(3)
    B, W = 3, 4
    rid = np.stack([rng.permutation(16)[:W] for _ in range(B)]).astype(np.int32)
    grows = rng.normal(size=(B * W, tables.LANE)).astype(np.float32)
    opt = ScopedOptimizer(OPT_ADAGRAD_FLEX, 0.1, 0.5, 0.0)
    w = jnp.zeros((16, tables.LANE), jnp.float32)
    acc = jnp.zeros((16, tables.LANE), jnp.float32)
    rid_d, grows_d = tables.dedup_rows(
        jnp.asarray(rid.reshape(-1)), jnp.asarray(grows), B
    )
    w1, a1 = opt.apply_rows(w, acc, jnp.asarray(rid.reshape(-1)), jnp.asarray(grows))
    w2, a2 = opt.apply_rows(w, acc, rid_d, grows_d)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6, atol=1e-7)


def test_expand_dedup_fast_paths_match_row_dedup():
    """expand_scalar_grads_dedup / expand_grads_dedup must produce update
    streams whose net scatter effect is identical to expand + dedup_rows
    (same per-(example,weight) summed gradients)."""
    import numpy as np

    rng = np.random.default_rng(7)
    B, W = 16, 8
    nrows = 64

    # LR: ids with deliberate duplicates inside an example
    ids = jnp.asarray(rng.integers(0, nrows * tables.LANE, (B, W)), jnp.int32)
    ids = ids.at[:, 1].set(ids[:, 0])  # guaranteed dup
    g = jnp.asarray(rng.normal(size=(B, W)).astype(np.float32))

    table = jnp.zeros((nrows, tables.LANE), jnp.float32)
    _, aux = tables.gather_scalars(table, ids)
    rid_a, grows_a = tables.expand_scalar_grads(aux, g)
    rid_a, grows_a = tables.dedup_rows(rid_a, grows_a, B)
    rid_b, grows_b = tables.expand_scalar_grads_dedup(ids, g)

    def net(rid, grows):
        out = np.zeros((nrows, tables.LANE), np.float32)
        np.add.at(out, np.asarray(rid), np.asarray(grows))
        return out

    np.testing.assert_allclose(net(rid_b, grows_b), net(rid_a, grows_a),
                               rtol=1e-6, atol=1e-6)
    # (Σg)² dedup semantics: squared contributions must also match, since
    # each (example, weight) appears at most once in both streams
    np.testing.assert_allclose(net(rid_b, grows_b**2), net(rid_a, grows_a**2),
                               rtol=1e-6, atol=1e-6)

    # FFM slabs: k=4, two fields → slab 8, align 8 (16 windows per row)
    spec = tables.make_spec(nrows * tables.LANE, 8)
    N = 6
    fids = jnp.asarray(rng.integers(0, spec.logical_size, (B, N)), jnp.int32)
    fids = fids.at[:, 1].set(fids[:, 0])
    gs = jnp.asarray(rng.normal(size=(B, N, 8)).astype(np.float32))

    ftable = jnp.zeros((spec.num_rows, tables.LANE), jnp.float32)
    _, faux = tables.gather(ftable, fids, spec)
    rid_a, grows_a = tables.expand_grads(faux, gs, spec)
    rid_a, grows_a = tables.dedup_rows(rid_a, grows_a, B)
    rid_b, grows_b = tables.expand_grads_dedup(fids, gs, spec)

    def fnet(rid, grows, sq=False):
        out = np.zeros((spec.num_rows, tables.LANE), np.float32)
        np.add.at(out, np.asarray(rid),
                  np.asarray(grows) ** 2 if sq else np.asarray(grows))
        return out

    np.testing.assert_allclose(fnet(rid_b, grows_b), fnet(rid_a, grows_a),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(fnet(rid_b, grows_b, sq=True),
                               fnet(rid_a, grows_a, sq=True),
                               rtol=1e-6, atol=1e-6)
