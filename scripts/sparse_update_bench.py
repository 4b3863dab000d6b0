#!/usr/bin/env python3
"""Sparse AdaGrad row-update microbenchmark on the real chip (VERDICT r1 #5).

Times, per table size (2^25 / 2^29 flat floats in row layout):
  gather      — jnp.take of K rows (the forward lookup, lower bound)
  xla_rmw     — ops/adagrad.apply_rows: scatter-add g² → gather bumped acc →
                rate → scatter-sub (the production path)
  pallas_rmw  — the fused Pallas read-modify-write kernel (ops/pallas/
                sparse_update.py), when it compiles on this backend

Each timing forces completion by fetching a scalar (block_until_ready does
not track completion on the tunneled axon platform — see CLAUDE.md).
Results inform which path ships; the decision + numbers are recorded in
ops/pallas/SPARSE_UPDATE_NOTES.md.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from fwumious_wabbit_tpu.ops import tables
    from fwumious_wabbit_tpu.ops.adagrad import OPT_ADAGRAD_LUT, ScopedOptimizer

    K = 32768 * 6  # a large batch's touched rows (B=32k, ~6 rows/example)
    reps = 20
    print(f"# backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    for bits in (25, 29):
        R = (1 << bits) // tables.LANE
        w = jnp.zeros((R, tables.LANE), jnp.float32)
        acc = jnp.zeros((R, tables.LANE), jnp.float32)
        rng = np.random.default_rng(3)
        rid = jnp.asarray(rng.integers(0, R, K).astype(np.int32))
        grows = jnp.asarray(rng.normal(size=(K, tables.LANE)).astype(np.float32) * 0.01)
        opt = ScopedOptimizer(OPT_ADAGRAD_LUT, 0.1, 0.5, 0.0)

        @jax.jit
        def gather_only(w, rid):
            return jnp.take(w, rid, axis=0).sum()

        @jax.jit
        def xla_rmw(w, acc, rid, grows):
            return opt.apply_rows(w, acc, rid, grows)

        # warm + time gather
        _ = float(gather_only(w, rid))
        t0 = time.perf_counter()
        for _ in range(reps):
            s = gather_only(w, rid)
        _ = float(s)
        t_gather = (time.perf_counter() - t0) / reps

        # warm + time full RMW (donation would free w/acc; keep refs by
        # rebinding)
        w2, acc2 = xla_rmw(w, acc, rid, grows)
        _ = float(w2[0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            w2, acc2 = xla_rmw(w2, acc2, rid, grows)
        _ = float(w2[0, 0])
        t_rmw = (time.perf_counter() - t0) / reps

        row = {
            "bits": bits,
            "rows_touched": K,
            "gather_ms": round(t_gather * 1e3, 3),
            "xla_rmw_ms": round(t_rmw * 1e3, 3),
            "rmw_over_gather": round(t_rmw / t_gather, 2),
            "rmw_gb_s": round(K * tables.LANE * 4 * 5 / t_rmw / 1e9, 1),
        }

        try:
            from fwumious_wabbit_tpu.ops.pallas.sparse_update import (
                sparse_adagrad_update,
            )

            w3, acc3 = sparse_adagrad_update(
                w, acc, rid, grows, opt.learning_rate, opt.power_t,
                opt.initial_acc_gradient)
            _ = float(w3[0, 0])
            t0 = time.perf_counter()
            for _ in range(reps):
                w3, acc3 = sparse_adagrad_update(
                    w3, acc3, rid, grows, opt.learning_rate, opt.power_t,
                    opt.initial_acc_gradient)
            _ = float(w3[0, 0])
            row["pallas_rmw_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            row["pallas_rmw_error"] = str(e)[:200]

        print(json.dumps(row))


if __name__ == "__main__":
    main()
