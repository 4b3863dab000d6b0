"""Benchmark: device-step training throughput on the benchmark FFM config.

Measures the jitted train step (forward + backward + AdaGrad-LUT sparse
updates) for the BASELINE.json config-2 shape: FFM k=8 over the two declared
fields (A, B) plus LR keeps A, B and the AB interaction, 2^25 LR weights,
2^25 FFM weights — the Eat-Rate benchmark schema
(reference: BENCHMARK.md:34-60).

Prints ONE JSON line: examples/s/chip for the FFM train step vs the
reference's published single-core train throughput (500k ex/s for the LR
config, BENCHMARK.md:18 — the reference publishes no FFM timing, its FFM
benchmark is disabled, so the LR number is the conservative yardstick).

Run on the real TPU (default platform); pass --cpu to sanity-check locally.
"""

import json
import sys
import time

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from fwumious_wabbit_tpu.config.model_instance import (
        FeatureComboDesc,
        ModelInstance,
        Optimizer,
    )
    from fwumious_wabbit_tpu.config.vwmap import NamespaceDescriptor
    from fwumious_wabbit_tpu.models.model import FwModel
    from fwumious_wabbit_tpu.train.step import make_train_step

    B = 32768
    L = 4  # keep A, keep B, interaction AB, constant
    N = 2  # one feature in each of the two FFM fields

    mi = ModelInstance()
    mi.optimizer = Optimizer.ADAGRAD_LUT
    mi.learning_rate = 0.1
    mi.power_t = 0.5
    mi.ffm_learning_rate = 0.1
    mi.ffm_power_t = 0.5
    mi.bit_precision = 25
    mi.ffm_bit_precision = 25
    mi.ffm_k = 8
    mi.init_acc_gradient = 0.0
    mi.ffm_init_acc_gradient = 0.0
    A, Bn = NamespaceDescriptor(0), NamespaceDescriptor(1)
    mi.feature_combo_descs = [
        FeatureComboDesc(namespace_descriptors=[A]),
        FeatureComboDesc(namespace_descriptors=[Bn]),
        FeatureComboDesc(namespace_descriptors=[A, Bn]),
    ]
    mi.ffm_fields = [[A], [Bn]]

    model = FwModel(mi, precision="default")
    params = model.init_params()
    step = make_train_step(model)

    rng = np.random.default_rng(0)
    lr_mask, ffm_mask = mi.lr_hash_mask, mi.ffm_hash_mask

    def make_batch(seed):
        r = np.random.default_rng(seed)
        return {
            "label": r.integers(0, 2, B).astype(np.float32),
            "importance": np.ones(B, np.float32),
            "lr_ids": (r.integers(0, 1 << 31, (B, L)) & lr_mask).astype(np.int32),
            "lr_vals": np.ones((B, L), np.float32),
            "lr_combos": np.tile(np.array([0, 1, 2, 3], np.int32), (B, 1)),
            "ffm_ids": (r.integers(0, 1 << 31, (B, N)) & ffm_mask).astype(np.int32),
            "ffm_vals": np.ones((B, N), np.float32),
            "ffm_fields": np.tile(np.array([0, 1], np.int32), (B, 1)),
        }

    batches = [
        {k: jax.device_put(v) for k, v in make_batch(s).items()} for s in range(4)
    ]

    # warmup / compile — completion forced by fetching data, not
    # block_until_ready (the latter does not track real device completion
    # on tunneled platforms)
    params, p = step(params, batches[0])
    _ = float(p[0])

    steps = 50
    t0 = time.perf_counter()
    for i in range(steps):
        params, p = step(params, batches[i % len(batches)])
    _ = float(p[0]) + float(params["lr_w"][0, 0]) + float(params["ffm_w"][0, 0])
    elapsed = time.perf_counter() - t0

    ex_per_s = steps * B / elapsed
    baseline = 500_000.0  # reference train throughput, BENCHMARK.md:18
    print(
        json.dumps(
            {
                "metric": "examples/s/chip (FFM k=8 train step, Eat-Rate schema, B=32768)",
                "value": round(ex_per_s, 1),
                "unit": "examples/s",
                "vs_baseline": round(ex_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
