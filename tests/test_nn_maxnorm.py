"""NN max-norm reprojection (reference: src/block_neural.rs:307-320)."""

import numpy as np

import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import ModelInstance, Optimizer
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.train.step import apply_maxnorm, make_train_step


def test_apply_maxnorm_scales_only_violations():
    w = jnp.asarray(np.array([[3.0, 0.1], [4.0, 0.1]], np.float32))  # norms 5, ~0.14
    out = np.asarray(apply_maxnorm(w, 1.0))
    np.testing.assert_allclose(np.linalg.norm(out[:, 0]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(out[:, 1], [0.1, 0.1], rtol=1e-5)


def test_train_step_enforces_maxnorm():
    mi = ModelInstance()
    mi.optimizer = Optimizer.ADAGRAD_FLEX
    mi.learning_rate = 5.0  # huge LR to blow up norms without the constraint
    mi.power_t = 0.0
    mi.nn_learning_rate = 5.0
    mi.nn_power_t = 0.0
    mi.bit_precision = 12
    mi.ffm_k = 0
    mi.init_acc_gradient = 0.0
    mi.nn_init_acc_gradient = 0.0
    mi.nn_config.layers = [{"width": "4", "activation": "relu", "maxnorm": "0.5"}]
    mi.nn_config.topology = "one"
    model = FwModel(mi)
    params = model.init_params()
    step = make_train_step(model)
    batch = {
        "label": np.ones(8, np.float32),
        "importance": np.ones(8, np.float32),
        "lr_ids": np.arange(16, dtype=np.int32).reshape(8, 2),
        "lr_vals": np.ones((8, 2), np.float32),
        "lr_combos": np.zeros((8, 2), np.int32),
        "ffm_ids": np.zeros((8, 0), np.int32),
        "ffm_vals": np.zeros((8, 0), np.float32),
        "ffm_fields": np.zeros((8, 0), np.int32),
    }
    for _ in range(5):
        params, _ = step(params, batch)
    w = np.asarray(params["nn"][0]["w"])
    norms = np.linalg.norm(w, axis=0)
    assert np.all(norms <= 0.5 + 1e-4), norms
