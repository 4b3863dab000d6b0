"""Device mesh + shardings — the distributed layer of the framework.

The reference is single-machine: its only parallelism is hogwild
shared-memory data parallelism (reference: src/hogwild.rs:24-104) and a
serving thread pool. On TPU those capabilities map to (SURVEY.md §2.4):

* **data axis** — synchronous large-batch data parallelism replaces hogwild:
  the batch dimension of every input array is sharded over ``data``;
  gradients for dense (NN) parameters meet in ``psum`` (inserted by XLA from
  the sharding annotations).
* **table axis** — the hashed weight tables (LR ``2^b``, FFM
  ``2^ffm_bit + F·k``) are **row-sharded** over ``table``; lookups of
  replicated-id batches lower to local masked gathers + cross-shard
  reduction, and scatter-updates keep each row's update on its owner shard
  (GSPMD inserts the collectives — the explicit all-to-all id-exchange
  kernel is the optimized path for very large tables).

Tables are padded to a multiple of the table-axis size so shards are equal.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TABLE_AXIS = "table"


def make_mesh(n_data: int | None = None, n_table: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'table') mesh. Defaults to all devices on data."""
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_data is None:
        n_data = n_dev // n_table
    if n_data * n_table != n_dev:
        raise ValueError(
            f"mesh {n_data}x{n_table} does not cover {n_dev} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_table)
    return Mesh(dev_array, (DATA_AXIS, TABLE_AXIS))


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def param_sharding(mesh: Mesh, params: dict) -> dict:
    """PartitionSpecs per parameter: tables row-sharded, dense replicated."""

    def spec_for(key, leaf):
        if key in ("lr_w", "lr_acc", "ffm_w", "ffm_acc"):
            # row tables [R, 128]: shard rows, lanes stay whole
            return NamedSharding(mesh, P(TABLE_AXIS, None))
        return NamedSharding(mesh, P())  # NN params replicated

    out = {}
    for k, v in params.items():
        if k == "nn":
            out[k] = [
                {kk: NamedSharding(mesh, P()) for kk in layer} for layer in v
            ]
        elif isinstance(v, dict):
            out[k] = {kk: NamedSharding(mesh, P()) for kk in v}
        else:
            out[k] = spec_for(k, v)
    return out


def batch_sharding(mesh: Mesh, batch: dict, both_axes: bool = False) -> dict:
    """Batch arrays shard on axis 0 — over ``data`` (psum exchange) or over
    ``('data','table')`` (a2a exchange: every device owns distinct
    examples)."""
    axes = (DATA_AXIS, TABLE_AXIS) if both_axes else DATA_AXIS
    return {k: NamedSharding(mesh, P(axes)) for k in batch}


def pad_params_for_mesh(model, params: dict, mesh: Mesh) -> dict:
    """Pad table *row* counts to a multiple of the table-axis size (rows
    beyond the hash range are never addressed — masked hashes are < 2^bits).
    Large tables pad so each SHARD is also a multiple of the Pallas
    sparse-update sweep chunk (2048 rows), keeping the kernel eligible
    per shard (ops/pallas/sparse_update.py)."""
    n_table = mesh.shape[TABLE_AXIS]
    if n_table == 1:
        return params
    import jax.numpy as jnp

    out = dict(params)
    for key in ("lr_w", "lr_acc", "ffm_w", "ffm_acc"):
        if key in out:
            rows = out[key].shape[0]
            unit = n_table * 2048 if rows >= n_table * 2048 else n_table
            target = round_up(rows, unit)
            if target != rows:
                out[key] = jnp.concatenate(
                    [out[key],
                     jnp.zeros((target - rows, out[key].shape[1]), out[key].dtype)]
                )
    return out


def shard_params(params: dict, shardings: dict):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), params, shardings,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def shard_batch(batch: dict, mesh: Mesh, both_axes: bool = False) -> dict:
    sh = batch_sharding(mesh, batch, both_axes)
    return {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
