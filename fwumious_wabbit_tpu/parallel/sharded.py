"""Explicit-collectives distributed train step (shard_map).

The plain jitted step + sharding annotations (parallel/mesh.py) lets GSPMD
choose the collectives. This module is the hand-scheduled variant for large
row-sharded tables — the distributed communication backend called for in
SURVEY.md §2.4 (the reference has no distributed layer at all; its hogwild
shared-memory loop maps to the 'data' axis here). Two exchange strategies:

**psum** (small table-axis counts; batch sharded over ``data`` only,
replicated along ``table``):

* **lookup**: each table shard gathers the rows it owns (masked local take),
  then one ``psum`` over ``table`` assembles full rows on every shard.
* **update**: occurrence gradient rows are ``all_gather``-ed over ``data``
  (every table shard replays the whole batch), scatter-applied owner-side.
* Per-shard communication grows with the mesh — simple and exactly
  equivalent to the single-device step, but the wrong shape for a pod.

**a2a** (the scalable path — the all-to-all ID exchange of SURVEY §2.4;
batch sharded over BOTH axes, so each device owns ``B/(n_d·n_t)`` examples):

* **lookup**: each device buckets its ids by owner shard →
  ``all_to_all`` over ``table`` carries each owner the id list it must
  serve → owner-local row gather → ``all_to_all`` carries the rows back.
* **update**: ids + gradient rows travel to their owner column the same
  way; one ``all_gather`` over ``data`` then merges the *owner-bucketed*
  rows from the other data replicas before the local scatter. Per-shard
  traffic is ≈ ``touched_rows·516B/n_table`` — it SHRINKS as the table
  axis grows (the psum path's grows), see ``estimate_comm_bytes``.
* all-to-all sends use a fixed per-destination capacity
  ``slack·K/n_table`` (static shapes). murmur3-uniform ids overflow a 2×
  slack with vanishing probability; overflowed occurrences contribute zero
  weight on lookup and drop their update that step (masked, tested).

Semantics are identical to train/step.py's single-device step (asserted for
both exchanges in tests on the 8-virtual-device CPU mesh) — including the
per-example duplicate-id dedup (ops/tables.dedup_rows).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models.model import FwModel, predict_prob
from ..ops import tables
from ..train.step import _tower_backward, _tower_forward
from .mesh import DATA_AXIS, TABLE_AXIS


def _sharded_take(local: jnp.ndarray, rid: jnp.ndarray) -> jnp.ndarray:
    """Gather global rows from a table row-sharded over TABLE_AXIS.

    Masked local take + psum: each shard contributes the rows it owns."""
    t = jax.lax.axis_index(TABLE_AXIS)
    rl = local.shape[0]
    lrid = rid - t * rl
    ok = (lrid >= 0) & (lrid < rl)
    rows = jnp.take(local, jnp.clip(lrid, 0, rl - 1), axis=0)
    rows = jnp.where(ok.reshape(*ok.shape, 1), rows, 0.0)
    return jax.lax.psum(rows, TABLE_AXIS)


def _apply_local_rows(opt, w_local, acc_local, lrid, g):
    """The owner-side optimizer tail shared by both exchanges: bump acc with
    g², rate from the bumped acc, scatter-subtract. ``lrid`` must be in
    range; masked-out occurrences carry g == 0 (zero adds are no-ops and
    rate·0 == 0, flex_update zeroes the 0·inf corner)."""
    if opt.batch_mean:
        # capped per-weight multiplicity across the (gathered, global)
        # batch — the same counts the single-device step sees, so
        # trajectories stay equal
        from ..ops.adagrad import batch_mean_grads

        g = batch_mean_grads(w_local.shape[0], lrid, g, opt.batch_cap)
    if opt._use_pallas(w_local.shape[0], lrid.shape[0]):
        # per-shard table-sweep kernel (ops/pallas/sparse_update.py) —
        # masked-out occurrences carry g == 0 and in-range clipped ids, so
        # they are inert in the kernel exactly as in the scatter path
        from ..ops.pallas.sparse_update import sparse_adagrad_update

        w2, acc2 = sparse_adagrad_update(
            w_local, acc_local if opt.has_state else None, lrid, g,
            opt.learning_rate, opt.power_t, opt.initial_acc_gradient,
            kind=opt.kind,
        )
        return w2, (acc2 if opt.has_state else acc_local)
    if not opt.has_state:  # SGD
        return w_local.at[lrid].add(-opt.learning_rate * g), acc_local
    acc_new = acc_local.at[lrid].add(g * g)
    acc_rows = jnp.take(acc_new, lrid, axis=0)
    from ..ops.adagrad import OPT_ADAGRAD_LUT, flex_update, lut_rate_compute

    if opt.kind == OPT_ADAGRAD_LUT:
        upd = g * lut_rate_compute(acc_rows, opt.learning_rate, opt.power_t,
                                   opt.initial_acc_gradient)
    else:
        upd = flex_update(g, acc_rows, opt.learning_rate, opt.power_t)
    return w_local.at[lrid].add(-upd), acc_new


def _sharded_row_update(opt, w_local, acc_local, rid, grows):
    """Owner-side AdaGrad row update for a row-sharded table (psum exchange).

    ``rid``/``grows`` are this data-shard's occurrences; they are gathered
    across DATA_AXIS so each table shard applies the entire batch."""
    rid_all = jax.lax.all_gather(rid, DATA_AXIS).reshape(-1)
    grows_all = jax.lax.all_gather(grows, DATA_AXIS).reshape(-1, grows.shape[-1])

    t = jax.lax.axis_index(TABLE_AXIS)
    rl = w_local.shape[0]
    lrid = rid_all - t * rl
    ok = (lrid >= 0) & (lrid < rl)
    lrid_safe = jnp.clip(lrid, 0, rl - 1)
    g = jnp.where(ok[:, None], grows_all, 0.0)
    return _apply_local_rows(opt, w_local, acc_local, lrid_safe, g)


# ---------------------------------------------------------------------------
# all-to-all ID exchange (the scalable path, SURVEY §2.4)
# ---------------------------------------------------------------------------


def _bucket_slots(owner, n_t: int, capacity: int):
    """Per-destination slot assignment for an all-to-all send buffer.

    ``owner [K]`` destination shard per occurrence. Returns ``(slot, valid)``
    where ``slot[k]`` is k's position inside its owner's bucket (== the
    number of earlier occurrences with the same owner, via an exclusive
    one-hot cumsum — no sort needed) and ``valid`` marks slots < capacity.
    Overflowed occurrences get slot == capacity, which is out of bounds and
    dropped by the scatter (``mode='drop'``)."""
    oh = (owner[:, None] == jnp.arange(n_t, dtype=owner.dtype)[None, :]).astype(
        jnp.int32
    )  # [K, n_t]
    excl = jnp.cumsum(oh, axis=0) - oh
    rank = jnp.sum(excl * oh, axis=1)
    valid = rank < capacity
    slot = jnp.where(valid, rank, capacity)
    return slot, valid


def _a2a_take(local: jnp.ndarray, rid: jnp.ndarray, n_t: int, capacity: int):
    """Gather global rows from a TABLE_AXIS-row-sharded table by all-to-all
    id exchange: bucket ids by owner → a2a the id lists → owner-local gather
    → a2a the rows back. Overflowed ids (> capacity requests to one owner)
    return zero rows. Traffic per device ≈ 2·K·(516 B)/1 — independent of
    n_table for the rows, vs the psum path's n_table-growing reduction."""
    t = jax.lax.axis_index(TABLE_AXIS)
    rl, lane = local.shape
    shape = rid.shape
    rid = rid.reshape(-1)
    owner = rid // rl  # tables are padded to n_t equal shards
    slot, valid = _bucket_slots(owner, n_t, capacity)
    send_ids = jnp.zeros((n_t, capacity), rid.dtype).at[owner, slot].set(
        rid, mode="drop"
    )
    recv_ids = jax.lax.all_to_all(send_ids, TABLE_AXIS, 0, 0)  # requests to me
    lrid = jnp.clip(recv_ids.reshape(-1) - t * rl, 0, rl - 1)
    served = jnp.take(local, lrid, axis=0).reshape(n_t, capacity, lane)
    recv_rows = jax.lax.all_to_all(served, TABLE_AXIS, 0, 0)  # replies to me
    flat = recv_rows.reshape(n_t * capacity, lane)
    rows = jnp.take(flat, jnp.where(valid, owner * capacity + slot, 0), axis=0)
    rows = jnp.where(valid[:, None], rows, 0.0)
    return rows.reshape(*shape, lane)


def _a2a_row_update(opt, w_local, acc_local, rid, grows, n_t: int, capacity: int):
    """Owner-side row update via all-to-all: ids + gradient rows travel to
    their owner column over TABLE_AXIS, then one all_gather over DATA_AXIS
    merges the owner-bucketed rows from the other data replicas — per-shard
    traffic ≈ batch_rows·516B/n_table (shrinks with the table axis), unlike
    the psum path's whole-batch all_gather. Overflowed occurrences drop
    their update for the step (murmur3-uniform ids at 2× slack make this
    vanishingly rare; see estimate_comm_bytes)."""
    t = jax.lax.axis_index(TABLE_AXIS)
    rl, lane = w_local.shape
    rid = rid.reshape(-1)
    owner = rid // rl
    slot, valid = _bucket_slots(owner, n_t, capacity)
    send_ids = jnp.zeros((n_t, capacity), rid.dtype).at[owner, slot].set(
        rid, mode="drop"
    )
    send_g = jnp.zeros((n_t, capacity, lane), grows.dtype).at[owner, slot].set(
        grows, mode="drop"
    )
    recv_ids = jax.lax.all_to_all(send_ids, TABLE_AXIS, 0, 0)
    recv_g = jax.lax.all_to_all(send_g, TABLE_AXIS, 0, 0)
    all_ids = jax.lax.all_gather(recv_ids, DATA_AXIS).reshape(-1)
    all_g = jax.lax.all_gather(recv_g, DATA_AXIS).reshape(-1, lane)
    lrid = all_ids - t * rl
    # unfilled send slots carry id 0 with zero gradient — harmless adds
    ok = (lrid >= 0) & (lrid < rl)
    g = jnp.where(ok[:, None], all_g, 0.0)
    lrid_safe = jnp.clip(lrid, 0, rl - 1)
    w, acc = _apply_local_rows(opt, w_local, acc_local, lrid_safe, g)
    # dropped = overflowed occurrences that actually carried gradient:
    # padding slots (id 0, zero rows) bucket to owner 0 and can overflow a
    # tight capacity, but losing them loses nothing — counting them would
    # fire spurious 'raise --fwt_a2a_capacity' warnings on every partial
    # tail batch. Counted ONCE per occurrence (here, not in the lookup:
    # the same occurrence overflows both legs).
    real = jnp.any(grows != 0.0, axis=1)
    dropped = jnp.sum((~valid) & real).astype(jnp.int32)
    return w, acc, dropped


def a2a_capacity(n_occurrences: int, n_t: int, capacity_factor: float) -> int:
    """Static per-destination all-to-all capacity: ``slack·K/n_t`` slots."""
    return max(1, math.ceil(capacity_factor * n_occurrences / n_t))


def estimate_comm_bytes(batch_global: int, width: int, mesh_shape: tuple[int, int],
                        exchange: str, capacity_factor: float = 2.0) -> int:
    """Per-device collective traffic (bytes received) per table per step —
    the analytical model behind the exchange choice, asserted against the
    compiled HLO in tests/test_sharded.py.

    psum: lookup psums full [K_loc,128] rows over the table axis
    (ring ≈ array size per device) and the update all_gathers EVERY
    occurrence row over the data axis — O(B·width·516) per shard regardless
    of n_table. a2a: ids+rows travel owner-bucketed, so the data-axis gather
    only carries ~1/n_table of the rows — per-shard traffic shrinks as the
    table axis grows."""
    n_d, n_t = mesh_shape
    row_b = tables.LANE * 4
    id_b = 4
    if exchange == "psum":
        k_loc = (batch_global // n_d) * width
        lookup = k_loc * row_b * (n_t - 1) // max(n_t, 1)  # ring psum recv
        update = (n_d - 1) * k_loc * (row_b + id_b)  # data all_gather
        return lookup + update
    k_dev = (batch_global // (n_d * n_t)) * width
    cap = a2a_capacity(k_dev, n_t, capacity_factor)
    a2a = 2 * (n_t - 1) * cap * (row_b + id_b)  # fwd + bwd exchanges
    gather = (n_d - 1) * n_t * cap * (row_b + id_b)  # owner-bucketed rows
    return a2a + gather


def make_sharded_train_step(model: FwModel, mesh, exchange: str = "auto",
                            capacity_factor: float = 2.0,
                            with_stats: bool = False):
    """(params, batch) → (params, preds) with explicit collectives.

    ``params`` tables must be sharded P(table, None) and padded to the mesh
    (parallel/mesh.py). ``exchange``:

    * ``"psum"`` — batch sharded P(data); lookups psum over the table axis,
      updates all_gather over the data axis. Simple; per-shard comms grow
      with the mesh.
    * ``"a2a"`` — batch sharded P(('data','table')) (use
      ``shard_batch(batch, mesh, both_axes=True)``); all-to-all id exchange
      both directions, per-shard comms shrink with the table axis.
    * ``"auto"`` — a2a when the table axis is > 1.
    """
    n_t = mesh.shape[TABLE_AXIS]
    if exchange == "auto":
        exchange = "a2a" if n_t > 1 else "psum"
    if exchange not in ("psum", "a2a"):
        raise ValueError(f"unknown exchange: {exchange!r}")
    a2a = exchange == "a2a"

    has_ffm = model.has_ffm
    has_nn = model.has_nn
    # dense grads: in a2a mode the batch is split along BOTH axes
    dense_axes = (DATA_AXIS, TABLE_AXIS) if a2a else DATA_AXIS

    # a2a overflow observability: occurrences beyond a destination's static
    # capacity contribute zero on lookup and drop their update — silently
    # degrading learning if --fwt_a2a_capacity is mis-sized for a skewed id
    # distribution. Each step counts them (psum'd over the whole mesh) and
    # the loop surfaces the total (train/loop.py logs it; tests assert the
    # counter fires on a deliberately undersized capacity).
    drops: list = []

    def take(local, rid):
        if a2a:
            cap = a2a_capacity(rid.size, n_t, capacity_factor)
            return _a2a_take(local, rid, n_t, cap)
        return _sharded_take(local, rid)

    def row_update(opt, w_local, acc_local, rid, grows):
        if a2a:
            cap = a2a_capacity(rid.size, n_t, capacity_factor)
            w, acc, d = _a2a_row_update(opt, w_local, acc_local, rid, grows,
                                        n_t, cap)
            drops.append(d)
            return w, acc
        return _sharded_row_update(opt, w_local, acc_local, rid, grows)

    def local_step(params, batch):
        drops.clear()
        # -- sharded gathers ------------------------------------------------
        lr_ids, _ = model.lr_ids_combos(batch)
        rid_lr = jax.lax.shift_right_logical(lr_ids, tables.LANE_BITS)
        lane = lr_ids & (tables.LANE - 1)
        lr_rows = take(params["lr_w"], rid_lr)
        lane_oh = jax.nn.one_hot(lane, tables.LANE, dtype=lr_rows.dtype)
        lr_wg = jnp.einsum("...l,...l->...", lr_rows, lane_oh)
        lr_aux = (rid_lr, lane_oh)

        if has_ffm:
            spec = model.ffm_spec
            ids = batch["ffm_ids"]
            if spec.rows_per_slab == 1:
                rid_ffm = jax.lax.shift_right_logical(ids, tables.LANE_BITS)
                rows = take(params["ffm_w"], rid_ffm)
                p_cnt = spec.positions
                if p_cnt == 1:
                    emb = rows[..., : spec.slab]
                    ffm_aux = (rid_ffm, None)
                else:
                    pos_bits = (spec.align - 1).bit_length()
                    pos = jax.lax.shift_right_logical(
                        ids & (tables.LANE - 1), pos_bits)
                    oh = jax.nn.one_hot(pos, p_cnt, dtype=rows.dtype)
                    seg = rows.reshape(*rows.shape[:-1], p_cnt, spec.align)
                    emb = jnp.einsum("...p,...pa->...a", oh, seg)[..., : spec.slab]
                    ffm_aux = (rid_ffm, oh)
            else:
                g_cnt = spec.rows_per_slab
                rid0 = jax.lax.shift_right_logical(ids, tables.LANE_BITS)
                rid_ffm = rid0[..., None] + jnp.arange(g_cnt, dtype=ids.dtype)
                rows = take(params["ffm_w"], rid_ffm)
                emb = rows.reshape(*rows.shape[:-2], g_cnt * tables.LANE)[
                    ..., : spec.slab]
                ffm_aux = (rid_ffm, None)
        else:
            emb, ffm_aux = None, None

        # -- forward + backward (identical math to train/step.py) -----------
        def sparse_to_x(lr_wg, emb):
            parts = [model.lr_outputs(lr_wg, batch)]
            if has_ffm:
                parts.append(model.triangle(model.ffm_outputs(emb, batch)))
            return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        if has_ffm:
            x, sparse_vjp = jax.vjp(sparse_to_x, lr_wg, emb)
        else:
            x, sparse_vjp = jax.vjp(lambda lw: sparse_to_x(lw, None), lr_wg)

        if has_nn:
            logit, residuals = _tower_forward(model, params, x, train=True)
        else:
            logit = jnp.sum(x, axis=-1)

        p = predict_prob(logit)
        # label may arrive as uint8; importance may be elided (all ones)
        gg = p - batch["label"].astype(jnp.float32)
        imp = batch.get("importance")
        if imp is not None:
            gg = gg * imp
        inside = (logit >= -50.0) & (logit <= 50.0) & ~jnp.isnan(logit)
        dlogit = jnp.where(inside, gg, 0.0)

        new_params = dict(params)

        if has_nn:
            g_x, nn_grads, nn_gsqs = _tower_backward(model, params, residuals, dlogit)
            # dense grads meet across all batch shards
            nn_grads = jax.lax.psum(nn_grads, dense_axes)
            nn_gsqs = jax.lax.psum(nn_gsqs, dense_axes)
            new_nn = []
            for spec, layer, g, q in zip(
                model.nn_layers, params["nn"], nn_grads["nn"], nn_gsqs["nn"]
            ):
                nl = dict(layer)
                nl["w"], w_acc = model.opt_nn.apply_dense(
                    layer["w"], layer.get("w_acc"), g["w"], q["w"])
                nl["b"], b_acc = model.opt_nn.apply_dense(
                    layer["b"], layer.get("b_acc"), g["b"], q["b"])
                if spec.maxnorm > 0.0:
                    from ..train.step import apply_maxnorm

                    nl["w"] = apply_maxnorm(nl["w"], spec.maxnorm)
                if w_acc is not None:
                    nl["w_acc"], nl["b_acc"] = w_acc, b_acc
                new_nn.append(nl)
            new_params["nn"] = new_nn
            fl = dict(params["final"])
            fl["w"], fw_acc = model.opt_nn.apply_dense(
                params["final"]["w"], params["final"].get("w_acc"),
                nn_grads["final"]["w"], nn_gsqs["final"]["w"])
            fl["b"], fb_acc = model.opt_nn.apply_dense(
                params["final"]["b"], params["final"].get("b_acc"),
                nn_grads["final"]["b"], nn_gsqs["final"]["b"])
            if fw_acc is not None:
                fl["w_acc"], fl["b_acc"] = fw_acc, fb_acc
            new_params["final"] = fl
        else:
            g_x = dlogit[:, None] * jnp.ones_like(x)

        if has_ffm:
            g_lr, g_emb = sparse_vjp(g_x)
        else:
            (g_lr,) = sparse_vjp(g_x)

        # -- sharded row updates --------------------------------------------
        B = dlogit.shape[0]  # local batch
        # per-example dedup before any collective: the reference updates
        # each weight once per example with the summed gradient. The
        # pre-expansion dedup (ops/tables.py) is used when batch_mean is
        # off, mirroring train/step.py.
        if model.opt_lr.has_state and not model.opt_lr.batch_mean:
            lr_ids, _ = model.lr_ids_combos(batch)
            rid_flat, grows_lr = tables.expand_scalar_grads_dedup(lr_ids, g_lr)
        else:
            rid_flat, grows_lr = tables.expand_scalar_grads(lr_aux, g_lr)
            if model.opt_lr.has_state:
                rid_flat, grows_lr = tables.dedup_rows(rid_flat, grows_lr, B)
        new_params["lr_w"], lr_acc = row_update(
            model.opt_lr, params["lr_w"], params.get("lr_acc"), rid_flat, grows_lr)
        if lr_acc is not None:
            new_params["lr_acc"] = lr_acc

        if has_ffm:
            if (model.opt_ffm.has_state and not model.opt_ffm.batch_mean
                    and model.ffm_spec.rows_per_slab == 1):
                rid_flat, grows_ffm = tables.expand_grads_dedup(
                    batch["ffm_ids"], g_emb, model.ffm_spec)
            else:
                rid_flat, grows_ffm = tables.expand_grads(ffm_aux, g_emb, model.ffm_spec)
                if model.opt_ffm.has_state:
                    rid_flat, grows_ffm = tables.dedup_rows(rid_flat, grows_ffm, B)
            new_params["ffm_w"], ffm_acc = row_update(
                model.opt_ffm, params["ffm_w"], params.get("ffm_acc"),
                rid_flat, grows_ffm)
            if ffm_acc is not None:
                new_params["ffm_acc"] = ffm_acc

        if a2a:
            total = sum(drops, jnp.int32(0))
            dropped = jax.lax.psum(total, (DATA_AXIS, TABLE_AXIS))
        else:
            dropped = jnp.int32(0)
        return new_params, p, dropped

    batch_axes = (DATA_AXIS, TABLE_AXIS) if a2a else DATA_AXIS

    def table_spec(key):
        return P(TABLE_AXIS, None) if key in ("lr_w", "lr_acc", "ffm_w", "ffm_acc") else P()

    def params_specs(params):
        out = {}
        for k, v in params.items():
            if k == "nn":
                out[k] = [{kk: P() for kk in layer} for layer in v]
            elif isinstance(v, dict):
                out[k] = {kk: P() for kk in v}
            else:
                out[k] = table_spec(k)
        return out

    def batch_specs(batch):
        return {k: P(batch_axes, *([None] * (v.ndim - 1))) for k, v in batch.items()}

    def step(params, batch):
        mapped = shard_map(
            local_step, mesh=mesh,
            in_specs=(params_specs(params), batch_specs(batch)),
            out_specs=(params_specs(params), P(batch_axes), P()),
            # Table updates are replicated across 'data' by construction
            # (update inputs are all_gather'd / a2a'd over 'data' first), but
            # jax 0.9's static vma checker has no invariance-assertion
            # primitive, so check_vma=True cannot hold for these out_specs.
            # The replication is proven at RUNTIME instead:
            # tests/test_sharded.py::test_table_shards_replicated_across_data_axis
            # compares per-device shard bytes across the data axis.
            check_vma=False,
        )
        new_params, p, dropped = mapped(params, batch)
        if with_stats:
            return new_params, p, {"a2a_dropped": dropped}
        return new_params, p

    return jax.jit(step, donate_argnums=(0,))
