"""Explicit-collectives sharded step vs the single-device step.

Runs on the 8-virtual-CPU-device mesh (conftest). The shard_map step with
row-sharded tables and data-sharded batches must produce the same parameters
and predictions as train/step.py on one device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import (
    FeatureComboDesc,
    ModelInstance,
    Optimizer,
)
from fwumious_wabbit_tpu.config.vwmap import NamespaceDescriptor
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.parallel import mesh as pmesh
from fwumious_wabbit_tpu.parallel.sharded import make_sharded_train_step
from fwumious_wabbit_tpu.train.step import make_train_step


def build_model(optimizer, nn=False, k=4, fields=3, bits=12):
    mi = ModelInstance()
    mi.optimizer = optimizer
    mi.learning_rate = 0.1
    mi.power_t = 0.5
    mi.ffm_learning_rate = 0.1
    mi.ffm_power_t = 0.5
    mi.nn_learning_rate = 0.1
    mi.nn_power_t = 0.5
    mi.bit_precision = bits
    mi.ffm_bit_precision = bits
    mi.ffm_k = k
    mi.init_acc_gradient = 0.0
    mi.ffm_init_acc_gradient = 0.0
    mi.nn_init_acc_gradient = 0.0
    descs = [NamespaceDescriptor(i) for i in range(fields)]
    mi.feature_combo_descs = [
        FeatureComboDesc(namespace_descriptors=[d]) for d in descs
    ]
    mi.ffm_fields = [[d] for d in descs]
    if nn:
        mi.nn_config.layers = [{"width": "8", "activation": "relu"}]
        mi.nn_config.topology = "one"
    return FwModel(mi)


def make_batch(model, B=32, L=6, N=6, seed=3):
    rng = np.random.default_rng(seed)
    mi = model.mi
    return {
        "label": rng.integers(0, 2, B).astype(np.float32),
        "importance": np.ones(B, np.float32),
        "lr_ids": (rng.integers(0, 1 << 30, (B, L)) & mi.lr_hash_mask).astype(np.int32),
        "lr_vals": np.ones((B, L), np.float32),
        "lr_combos": rng.integers(0, model.num_combos, (B, L)).astype(np.int32),
        "ffm_ids": (rng.integers(0, 1 << 30, (B, N)) & mi.ffm_hash_mask).astype(np.int32),
        "ffm_vals": np.ones((B, N), np.float32),
        "ffm_fields": rng.integers(0, model.num_fields, (B, N)).astype(np.int32),
    }


@pytest.mark.parametrize("opt,nn", [
    (Optimizer.ADAGRAD_FLEX, False),
    (Optimizer.ADAGRAD_LUT, False),
    (Optimizer.SGD, False),
    (Optimizer.ADAGRAD_LUT, True),
])
def test_sharded_step_matches_single_device(opt, nn):
    model = build_model(opt, nn=nn)
    batch = make_batch(model)

    # single-device reference trajectory
    ref_params = model.init_params()
    ref_step = make_train_step(model)
    ref1, ref_preds = ref_step(ref_params, batch)

    # 4 data x 2 table mesh
    mesh = pmesh.make_mesh(n_data=4, n_table=2, devices=jax.devices()[:8])
    params = pmesh.pad_params_for_mesh(model, model.init_params(), mesh)
    shardings = pmesh.param_sharding(mesh, params)
    params = pmesh.shard_params(params, shardings)
    sbatch = pmesh.shard_batch(batch, mesh)

    step = make_sharded_train_step(model, mesh)
    new_params, preds = step(params, sbatch)

    np.testing.assert_allclose(np.asarray(preds), np.asarray(ref_preds),
                               rtol=1e-6, atol=1e-7)
    for key in ("lr_w", "ffm_w"):
        got = np.asarray(new_params[key])
        want = np.asarray(ref1[key])
        np.testing.assert_allclose(got[: want.shape[0]], want, rtol=1e-5, atol=1e-7)
        # padded rows stay zero
        assert np.all(got[want.shape[0]:] == 0.0)
    if opt != Optimizer.SGD:
        np.testing.assert_allclose(
            np.asarray(new_params["lr_acc"])[: np.asarray(ref1["lr_acc"]).shape[0]],
            np.asarray(ref1["lr_acc"]), rtol=1e-5, atol=1e-7)
    if nn:
        for la, lb in zip(new_params["nn"], ref1["nn"]):
            np.testing.assert_allclose(np.asarray(la["w"]), np.asarray(lb["w"]),
                                       rtol=1e-5, atol=1e-7)


def test_sharded_multi_step_trajectory():
    model = build_model(Optimizer.ADAGRAD_LUT)
    mesh = pmesh.make_mesh(n_data=4, n_table=2, devices=jax.devices()[:8])
    params = pmesh.pad_params_for_mesh(model, model.init_params(), mesh)
    params = pmesh.shard_params(params, pmesh.param_sharding(mesh, params))
    ref_params = model.init_params()
    ref_step = make_train_step(model)
    step = make_sharded_train_step(model, mesh)
    for s in range(4):
        batch = make_batch(model, seed=s)
        sbatch = pmesh.shard_batch(batch, mesh)
        params, preds = step(params, sbatch)
        ref_params, ref_preds = ref_step(ref_params, batch)
        np.testing.assert_allclose(np.asarray(preds), np.asarray(ref_preds),
                                   rtol=1e-6, atol=1e-7)
