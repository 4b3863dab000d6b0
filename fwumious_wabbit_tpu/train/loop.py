"""The driver loop — the reference's ``main_fw_loop`` re-shaped for batched
TPU execution (reference: src/main.rs:96-292).

Semantics preserved:

* records come from the VW text stream or the input cache (``-c``); when a
  cache is being built, every parsed record is appended to it;
* predictions are the *training-path* forward values, written ``{:.6f}`` per
  example to ``-p`` and/or stdout, starting after ``--predictions_after``;
* ``--holdout_after N``: examples ≥ N are predicted but not trained
  (the reference's ``example_num < holdout_after`` check — example numbers
  are 1-based);
* ``--prediction_model_delay D``: each example is predicted with the model
  trained only through example ``i − D`` (training lags a queue of length D);
* ``--testonly``: no updates at all.

Batched mapping: examples are grouped into fixed-size padded batches; a batch
is flushed early when the train/holdout boundary crosses it. Predictions come
out in input order. ``--fwt_batch_size 1`` (or ``--fwt_exact``) reproduces
the reference's per-example trajectory exactly.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

from ..config.model_instance import ModelInstance
from ..config.vwmap import VwNamespaceMap
from ..ingest import cache as fwcache
from ..ingest.parser import FlushCommand, HogwildLoadCommand, VowpalParser
from ..ingest.reader import create_buffered_input
from ..ingest.translator import Batcher, FeatureTranslator
from ..utils.logging import get_logger

# NOTE: models.model / train.step / persistence.model_file import jax and
# are imported lazily at their use sites — the embedded-engine predict
# path (run_native_predict) and --help must not pay the jax import
# (~1-2 s of a cold CLI predict's wall clock; the reference's binary
# starts in milliseconds)

log = get_logger(__name__)


def record_stream(args, vw: VwNamespaceMap):
    """Yield packed u32 records from cache (if valid) or text (writing the
    cache when ``-c``), mirroring the reference's RecordCache drive
    (reference: src/cache.rs:53-131, src/main.rs:213-228)."""
    input_filename = args.data
    use_cache = bool(getattr(args, "cache", False))
    cpath = fwcache.cache_path_for(input_filename)

    if use_cache and Path(cpath).exists():
        try:
            reader = fwcache.RecordCacheReader(cpath, vw)
            log.info("using cache file %s", cpath)
            yield from reader
            return
        except (fwcache.StaleCacheError, ValueError) as e:
            log.warning("cache rejected (%s); reparsing", e)

    writer = fwcache.RecordCacheWriter(cpath, vw) if use_cache else None
    parser = VowpalParser(vw)
    stream = create_buffered_input(input_filename)
    try:
        while True:
            # in-band commands in a training FILE abort the run, exactly
            # like the reference (src/main.rs:218-221 propagates the
            # parser's command "error" and exits); they are only
            # meaningful on the serving socket
            rec = parser.next_vowpal(stream)
            if rec.size == 0:
                break
            if writer is not None:
                writer.push_record(rec)
            yield rec
    except BaseException:
        # never publish a truncated cache (the reference only renames the
        # .writing temp on clean completion, src/cache.rs:147-153)
        if writer is not None:
            writer.abort()
        raise
    else:
        if writer is not None:
            writer.write_finish()


def build_cache_without_training(args, vw: VwNamespaceMap) -> int:
    """--build_cache_without_training (reference: src/main.rs:50-94)."""
    n = 0
    for _ in record_stream(args, vw):
        n += 1
    log.info("cache built: %d records", n)
    return n


class PredictionWriter:
    """Writes '{:.6f}' lines to a file and/or stdout
    (reference: src/main.rs:260-269). The file is written in binary so the
    C-formatted byte blocks go straight through (a str round-trip measured
    ~0.3 s per 10⁶ predictions — on the predict-mode critical path)."""

    def __init__(self, path: str | None, to_stdout: bool):
        self._fh = open(path, "wb") if path else None
        self._stdout = to_stdout

    @property
    def active(self) -> bool:
        return self._fh is not None or self._stdout

    def write(self, p: float) -> None:
        line = f"{p:.6f}\n".encode()
        if self._fh:
            self._fh.write(line)
        if self._stdout:
            sys.stdout.buffer.write(line)

    def write_block(self, preds: np.ndarray) -> None:
        """Vectorized block write (C-side %.6f formatting)."""
        if not self.active or preds.size == 0:
            return
        from .. import native as fw_native

        raw = fw_native.format_preds(preds)
        if raw is None:
            raw = ("\n".join(np.char.mod("%.6f", preds)) + "\n").encode()
        if self._fh:
            self._fh.write(raw)
        if self._stdout:
            sys.stdout.buffer.write(raw)
            sys.stdout.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()


def _batch_dict(batch) -> dict:
    return {
        "label": batch.label,
        "importance": batch.importance,
        "lr_ids": batch.lr_ids,
        "lr_vals": batch.lr_vals,
        "lr_combos": batch.lr_combos,
        "ffm_ids": batch.ffm_ids,
        "ffm_vals": batch.ffm_vals,
        "ffm_fields": batch.ffm_fields,
    }


def native_batch_stream(args, mi: ModelInstance, vw: VwNamespaceMap,
                        batch_size: int, cut_at: int | None = None,
                        count_keys: dict | None = None):
    """Yield (batch_dict, n_examples) using the C++ ingest engine
    (fwumious_wabbit_tpu/native): text or cache records are translated in
    parallel and scattered straight into padded arrays. Behaviourally
    identical to the Python path (cross-checked in tests); padded widths are
    exact with a high-water mark, so a stable schema compiles one shape.

    ``cut_at``: an absolute example number a block must not cross (the
    train/holdout boundary). Line blocks are cut conservatively by line
    count — in-band command lines only shrink a block, never push an
    example past the boundary."""
    from .. import native as fw_native

    ni = fw_native.NativeIngest(mi, vw)
    input_filename = args.data
    # high-water exact batch widths: padded width only ever grows (one jit
    # re-specialization per growth, usually none — schemas have a fixed
    # entry count). Power-of-two bucketing cost 18% pure padding on the
    # 13-wide Eat-Rate schema, straight into the transfer and scatter
    # streams. Floor of 4 avoids degenerate sub-lane widths.
    hw = {"L": 4, "N": 4 if mi.ffm_k > 0 else 0}

    def widths():
        lmax, nmax = ni.widths()
        hw["L"] = max(hw["L"], lmax)
        if mi.ffm_k > 0:
            hw["N"] = max(hw["N"], nmax)
        return hw["L"], hw["N"]
    use_cache = bool(getattr(args, "cache", False))
    cpath = fwcache.cache_path_for(input_filename)
    emitted = 0

    # pack combo+1 into the id bits above bit_precision when it fits —
    # drops the combos array from the transfer (padding packs as 0 → −1)
    pack_shift = (
        mi.bit_precision
        if mi.bit_precision + (mi.num_combos + 1).bit_length() <= 31
        else None
    )

    def slim(bd, n):
        """Shrink the batch payload: drop all-ones value arrays (padding is
        inert via combo/field −1 one-hots), pack combos into id bits, u8
        labels, and drop all-ones importance for full (padding-free)
        batches."""
        if count_keys is not None:
            # host-side multiplicity counts for the batch-mean cap: a
            # ~14 ms radix pass on the producer thread replaces a ~32 ms
            # device-side sort per step (ops/adagrad.batch_mean_grads;
            # measured step 72 -> 31.5 ms at B=32k). Computed on the
            # pre-pack masked ids with the padding marks still present.
            flags0 = ni.all_ones_flags()
            if "lr" in count_keys:
                bd["lr_counts"] = ni.batch_counts(
                    bd["lr_ids"], bd["lr_combos"], count_keys["lr"],
                    vals=None if flags0 & 1 else bd["lr_vals"])
            if "ffm" in count_keys and mi.ffm_k > 0:
                bd["ffm_counts"] = ni.batch_counts(
                    bd["ffm_ids"], bd["ffm_fields"], count_keys["ffm"],
                    vals=None if flags0 & 2 else bd["ffm_vals"])
        flags = ni.all_ones_flags()
        if flags & 1:
            del bd["lr_vals"]
        if flags & 2 and mi.ffm_k > 0:
            del bd["ffm_vals"]
        if pack_shift is not None:
            # in-place: one i32 temp for the widened combos, then
            # add/shift/or reuse it (4 fresh [B, W] temporaries measured
            # ~2 ms/batch on the producer's critical path)
            c32 = bd["lr_combos"].astype(np.int32)
            np.add(c32, 1, out=c32)
            np.left_shift(c32, pack_shift, out=c32)
            np.bitwise_or(bd["lr_ids"], c32, out=bd["lr_ids"])
            del bd["lr_combos"]
        bd["label"] = bd["label"].astype(np.uint8)
        if flags & 4 and n == batch_size:
            del bd["importance"]
        return bd

    def block_cap() -> int:
        if cut_at is None or emitted >= cut_at:
            return batch_size
        return min(batch_size, cut_at - emitted)

    if use_cache and Path(cpath).exists():
        try:
            reader = fwcache.RecordCacheReader(cpath, vw)
            log.info("using cache file %s", cpath)
            tail = b""
            while True:
                chunk = reader.read_chunk()
                if not chunk and not tail:
                    break
                buf = tail + chunk
                words = len(buf) // 4
                if words == 0:
                    if not chunk:
                        raise ValueError("truncated cache file")
                    tail = buf
                    continue
                arr = np.frombuffer(buf[: words * 4], np.uint32)
                n = ni.translate_records(arr)
                consumed = ni.records_consumed()
                if not chunk and consumed < words:
                    raise ValueError("truncated cache file")
                tail = buf[consumed * 4:]
                if n == 0:
                    continue
                L, N = widths()
                s = 0
                while s < n:
                    cap = min(block_cap(), n - s)
                    yield slim(ni.fill_range(s, cap, batch_size, L, N), cap), cap
                    emitted += cap
                    s += cap
            return
        except (fwcache.StaleCacheError, ValueError) as e:
            log.warning("cache rejected (%s); reparsing", e)

    writer = fwcache.RecordCacheWriter(cpath, vw) if use_cache else None
    if writer is None:
        ni.set_build_records(False)
    stream = create_buffered_input(input_filename)
    CHUNK_BYTES = 64 << 20  # big chunks: at most one padded partial batch per chunk
    try:
        tail = b""
        at_eof = False
        while not at_eof:
            raw = stream.read(CHUNK_BYTES)
            if not raw:
                at_eof = True
                raw = tail
                tail = b""
            else:
                raw = tail + raw
                # carry the trailing partial line to the next chunk
                nl = raw.rfind(b"\n")
                if nl < 0:
                    tail, raw = raw, b""
                else:
                    tail, raw = raw[nl + 1 :], raw[: nl + 1]
            if not raw:
                continue
            n = ni.translate_block(raw)
            # empty line = end of stream, mirroring the reference's size-0
            # record (src/main.rs:215-222) — detected during the C parse
            # walk itself (anything after it, including in-band commands,
            # is never seen); the former per-chunk Python "\n\n"/"\n\r\n"
            # pre-scans cost ~9% of ingest CPU
            if ni.stop_offset() >= 0:
                at_eof = True
                tail = b""
            if not n:
                continue
            if writer is not None:
                writer.push_record(ni.records())
            L, N = widths()
            s = 0
            while s < n:
                cap = min(block_cap(), n - s)
                yield slim(ni.fill_range(s, cap, batch_size, L, N), cap), cap
                emitted += cap
                s += cap
    except BaseException:
        if writer is not None:
            writer.abort()  # never publish a truncated cache
        raise
    else:
        if writer is not None:
            writer.write_finish()


def native_predict_eligible(args) -> bool:
    """True when --testonly should run on the embedded C++ engine: the
    reference's predict mode is a host-side per-line forward loop
    (reference: src/main.rs:213-270 with update=false, ~592k lines/s,
    BENCHMARK.md:22); the embedded engine does the identical forward at
    ~1M lines/s with zero device-link round-trips. Requires a model FILE
    (-i) — the engine loads weights itself. Falls back to the device path
    for: cache-driven runs (-c keeps the reference's cache read/write
    semantics), multi-device meshes, --fwt_serve_engine device, or
    --fwt_no_native."""
    return bool(
        getattr(args, "testonly", False)
        and getattr(args, "initial_regressor", None)
        and getattr(args, "data", None)
        and not getattr(args, "cache", False)
        and not getattr(args, "final_regressor", None)
        and not getattr(args, "fwt_no_native", False)
        and (getattr(args, "fwt_serve_engine", "auto") or "auto") != "device"
        and int(getattr(args, "fwt_table_axis", 1) or 1) <= 1
        and (getattr(args, "fwt_data_axis", None) in (None, 1))
        and not getattr(args, "prediction_model_delay", None)
    )


def run_native_predict(args, pred=None) -> dict:
    """--testonly via the embedded C++ engine (see native_predict_eligible).

    Streams the input file in chunks through fw_predict_block; behavior
    matches the device loop: predictions '{:.6f}' after --predictions_after,
    empty line ends the stream, in-band commands abort the run like the
    reference (src/main.rs:218-221). Runs with --final_regressor are NOT
    eligible (main()'s device path writes the model file after the loop;
    this path returns before that tail)."""
    from .. import native as fw_native

    if pred is None:
        pred = fw_native.EmbeddedPredictor(f"-i {args.initial_regressor}")
    writer = PredictionWriter(
        getattr(args, "predictions", None),
        bool(getattr(args, "predictions_stdout", False)),
    )
    predictions_after = int(getattr(args, "predictions_after", None) or 0)
    stream = create_buffered_input(args.data)
    t0 = time.time()
    n_done = 0
    CHUNK = 16 << 20
    tail = b""
    try:
        while True:
            raw = stream.read(CHUNK)
            if not raw:
                if not tail:
                    break
                # un-terminated final line
                buf, at_eof = tail + b"\n", True
            else:
                buf, at_eof = tail + raw, False
            preds, consumed, status = pred.predict_block_mt(buf)
            tail = buf[consumed:]
            if preds.size:
                first_num = n_done + 1
                n_done += preds.size
                skip = max(0, predictions_after - first_num + 1)
                writer.write_block(preds[skip:])
            if status == fw_native.EmbeddedPredictor.BLOCK_EOF:
                break
            if status == fw_native.EmbeddedPredictor.BLOCK_FLUSH:
                raise FlushCommand("flush")
            if status == fw_native.EmbeddedPredictor.BLOCK_HOGWILD:
                raise HogwildLoadCommand("hogwild_load")
            if status == fw_native.EmbeddedPredictor.BLOCK_ERROR:
                raise ValueError(pred.last_error())
            if at_eof:
                break
    finally:
        writer.close()
        pred.close()
    elapsed = time.time() - t0
    log.info("Elapsed: %.2fs rows: %d (%.0f ex/s) [native predict engine]",
             elapsed, n_done, n_done / max(elapsed, 1e-9))
    return {"params": None, "examples": n_done, "elapsed": elapsed}


def _use_native(args, mi) -> bool:
    if getattr(args, "fwt_no_native", False):
        return False
    from .. import native as fw_native

    return fw_native.load() is not None


def run_train_loop(args, mi: ModelInstance, vw: VwNamespaceMap, model: FwModel,
                   params=None) -> dict:
    """The main train/predict loop. Returns {'params', 'examples', 'elapsed'}."""
    from ..train.step import make_predict_step, make_train_step

    testonly = bool(getattr(args, "testonly", False))
    batch_size = max(1, int(getattr(args, "fwt_batch_size", 1024) or 1024))
    if getattr(args, "fwt_exact", False):
        batch_size = 1

    predictions_after = int(getattr(args, "predictions_after", None) or 0)
    holdout_after = getattr(args, "holdout_after", None)
    holdout_after = int(holdout_after) if holdout_after is not None else None
    delay = int(getattr(args, "prediction_model_delay", None) or 0)

    translator = FeatureTranslator(mi)
    batcher = Batcher(batch_size)
    writer = PredictionWriter(
        getattr(args, "predictions", None), bool(getattr(args, "predictions_stdout", False))
    )

    # multi-device: --fwt_data_axis / --fwt_table_axis select a
    # ('data','table') mesh; tables are row-sharded and the
    # explicit-collectives step (parallel/sharded.py) trains, with the
    # exchange strategy from --fwt_exchange (a2a shards the batch over BOTH
    # axes so every device owns distinct examples)
    n_table = int(getattr(args, "fwt_table_axis", 1) or 1)
    n_data = getattr(args, "fwt_data_axis", None)
    exchange = getattr(args, "fwt_exchange", "auto") or "auto"
    mesh = None
    shard_batch_fn = None
    if n_table > 1 or (n_data is not None and int(n_data) > 1):
        import jax

        from ..parallel import mesh as pmesh

        mesh = pmesh.make_mesh(
            n_data=int(n_data) if n_data is not None else None, n_table=n_table
        )
        if exchange == "auto":
            exchange = "a2a" if n_table > 1 else "psum"
        nshard = mesh.shape[pmesh.DATA_AXIS] * (
            n_table if exchange == "a2a" else 1
        )
        if batch_size % nshard:
            batch_size = ((batch_size + nshard - 1) // nshard) * nshard
        log.info("mesh: %s exchange=%s (batch %d)",
                 dict(mesh.shape), exchange, batch_size)

    if params is None:
        params = model.init_params()

    if mesh is not None:
        from ..parallel import mesh as pmesh
        from ..parallel.sharded import make_sharded_train_step

        params = pmesh.pad_params_for_mesh(model, params, mesh)
        params = pmesh.shard_params(params, pmesh.param_sharding(mesh, params))
        a2a_stats = exchange == "a2a"
        train_step = (
            make_sharded_train_step(
                model, mesh, exchange=exchange,
                capacity_factor=float(getattr(args, "fwt_a2a_capacity", 2.0) or 2.0),
                with_stats=a2a_stats,
            )
            if not testonly else None
        )
        predict_step = make_predict_step(model)  # GSPMD handles sharded params
        both = exchange == "a2a"
        shard_batch_fn = lambda bd: pmesh.shard_batch(bd, mesh, both_axes=both)  # noqa: E731
    else:
        train_step = make_train_step(model) if not testonly else None
        predict_step = make_predict_step(model)

    if mesh is None:
        a2a_stats = False

    # a2a overflow accumulator: a device scalar summed lazily per step (no
    # per-step host sync); fetched once at the end of the run
    a2a_dropped = None

    def call_train(params, bd):
        nonlocal a2a_dropped
        if a2a_stats:
            params, preds, stats = train_step(params, bd)
            d = stats["a2a_dropped"]
            a2a_dropped = d if a2a_dropped is None else a2a_dropped + d
            return params, preds
        return train_step(params, bd)

    example_num = 0
    t0 = time.time()
    t0_cpu = time.process_time()

    # in-run pipeline counters: busy/stall seconds accumulated INSIDE the
    # timed window by each stage's own thread, so stage rates and
    # pipeline efficiency are self-consistent with the end-to-end rate
    # (probing stages in separate windows on a link that swings 10x made
    # the old efficiency number incoherent — see bench.py). Identities:
    #   producer span  ≈ producer_busy_s + producer_stall_s
    #   transferrer    ≈ xfer_starve_s + xfer_busy_s + xfer_stall_s
    #   consumer       ≈ consumer_starve_s + dispatch_s + writer_stall_s
    #   writer         ≈ (queue wait) + fetch_force_s + write_s
    # fetch_force_s is the device+downlink wait observed by the writer —
    # on this platform only a host fetch forces step completion, so it is
    # the in-run proxy for device busy time.
    ctr = {
        "producer_busy_s": 0.0, "producer_stall_s": 0.0,
        "xfer_starve_s": 0.0, "xfer_busy_s": 0.0, "xfer_stall_s": 0.0,
        "xfer_bytes": 0, "xfer_puts": 0,
        "consumer_starve_s": 0.0, "dispatch_s": 0.0, "writer_stall_s": 0.0,
        "fetch_force_s": 0.0, "fetch_count": 0, "fetch_bytes": 0,
        "write_s": 0.0,
    }

    def finish_run(params):
        """Drain the delay queue + prediction pipeline, log, and build the
        result dict — shared by the single-host and multi-host tails."""
        if delay > 0 and not testonly and train_step is not None:
            for bd, _n in delayed:
                params, _ = call_train(params, bd)
        _finish_writes()
        writer.close()
        dropped = int(a2a_dropped) if a2a_dropped is not None else 0
        if dropped > 0:
            log.warning(
                "a2a exchange dropped %d occurrence(s) past the static "
                "per-destination capacity this run (their lookups read zero "
                "and their updates were skipped) — raise --fwt_a2a_capacity "
                "if the id distribution is skewed", dropped)
        elapsed = time.time() - t0
        log.info("Elapsed: %.2fs rows: %d (%.0f ex/s)", elapsed, example_num,
                 example_num / max(elapsed, 1e-9))
        return {"params": params, "examples": example_num,
                "elapsed": elapsed, "a2a_dropped": dropped,
                "counters": dict(ctr, elapsed_s=elapsed,
                                 process_cpu_s=time.process_time() - t0_cpu)}

    # delayed-learning queue of (batch_dict, n) when --prediction_model_delay
    delayed: list = []
    delayed_examples = 0

    # device/host overlap: prediction fetches happen on a dedicated writer
    # thread so the D2H round-trip (~35 ms per fetch on the axon tunnel)
    # never blocks step dispatch; a bounded queue keeps at most
    # FWT_PIPELINE_DEPTH batches of predictions in flight.
    import queue as _queue
    import threading as _threading

    PIPELINE_DEPTH = int(os.environ.get("FWT_PIPELINE_DEPTH", "3"))
    _wq: _queue.Queue = _queue.Queue(maxsize=PIPELINE_DEPTH)
    _werr: list = []

    # last prediction-fetch force duration, written by the writer thread,
    # read by the packed consumer's adaptive ring engagement (below)
    _fetch_stats = {"last_ms": 0.0}

    def _pred_writer():
        try:
            while (item := _wq.get()) is not None:
                preds, metas = item
                # ONE host fetch per item: [B] from a single step, [K, B]
                # from a packed one, or [M, K, B] from a fetch-stack — the
                # metas list maps leading rows back to example segments.
                _t0 = time.perf_counter()
                arr = np.asarray(preds)
                _dt = time.perf_counter() - _t0
                _fetch_stats["last_ms"] = _dt * 1e3
                ctr["fetch_force_s"] += _dt
                ctr["fetch_count"] += 1
                ctr["fetch_bytes"] += arr.nbytes
                _t0 = time.perf_counter()
                if len(metas) > 1:
                    arr = arr.reshape(arr.shape[0], -1)
                    for i, (first_num, n) in enumerate(metas):
                        skip = max(0, predictions_after - first_num + 1)
                        writer.write_block(arr[i, :n][skip:])
                else:
                    first_num, n = metas[0]
                    seg = arr.reshape(-1)[:n]
                    skip = max(0, predictions_after - first_num + 1)
                    writer.write_block(seg[skip:])
                ctr["write_s"] += time.perf_counter() - _t0
        except BaseException as e:  # noqa: BLE001 — re-raised on the main thread
            _werr.append(e)
            while _wq.get() is not None:  # unblock the producer
                pass

    _wt = _threading.Thread(target=_pred_writer, daemon=True)
    _wt.start()

    def _finish_writes() -> None:
        _wq.put(None)
        _wt.join()
        if _werr:
            raise _werr[0]

    def process(params, bd, n, placed=False):
        """One padded batch: train-or-predict, write predictions.

        Batches never span the train/holdout boundary (the producers cut
        there), so the update flag is uniform per batch. ``placed`` means the
        batch is already device-resident (the transfer pipeline stage did
        it) and must not be re-sharded."""
        nonlocal delayed_examples, example_num
        first_num = example_num + 1
        example_num += n
        update = not testonly and (holdout_after is None or first_num < holdout_after)
        if shard_batch_fn is not None and not placed:
            bd = shard_batch_fn(bd)

        _t1 = time.perf_counter()
        if delay == 0:
            if update and train_step is not None:
                params, preds = call_train(params, bd)
            else:
                preds = predict_step(params, bd)
            ctr["dispatch_s"] += time.perf_counter() - _t1
        else:
            # predict with the lagging model, then train queued batches.
            # NOTE: the reference's delay path trains every delayed example
            # (holdout_after is not consulted there) — only --testonly gates
            # (reference: src/main.rs:249-258)
            preds = predict_step(params, bd)
            delayed.append((bd, n))
            delayed_examples += n
            while delayed and delayed_examples - delayed[0][1] >= delay:
                old_bd, old_n = delayed.pop(0)
                delayed_examples -= old_n
                if train_step is not None:
                    params, _ = call_train(params, old_bd)

        if writer.active:
            if not getattr(preds, "is_fully_addressable", True):
                # multi-host: shards live on other processes' devices.
                # Gather ON THIS (main) thread — collectives must be issued
                # in one global order, so the writer thread cannot do it —
                # then every process writes the full prediction stream.
                from jax.experimental import multihost_utils

                preds = multihost_utils.process_allgather(preds, tiled=True)
            elif hasattr(preds, "copy_to_host_async"):
                preds.copy_to_host_async()  # overlap D2H with host work
            _t1 = time.perf_counter()
            _wq.put((preds, [(first_num, n)]))  # blocks when pipeline is full
            ctr["writer_stall_s"] += time.perf_counter() - _t1
        if _werr:
            raise _werr[0]
        return params

    # blocks must end at the train/holdout boundary
    cut_at = holdout_after - 1 if holdout_after is not None else None

    # host-side multiplicity counts for scopes with the batch-mean cap
    # (per-weight for LR: key = id; per-window for FFM: key = id >> log2 align)
    count_keys: dict | None = {}
    if model.opt_lr.batch_mean:
        count_keys["lr"] = 0
    if (model.has_ffm and model.opt_ffm.batch_mean
            and model.ffm_spec.rows_per_slab == 1):
        count_keys["ffm"] = (model.ffm_spec.align - 1).bit_length()
    if not count_keys:
        count_keys = None

    if _use_native(args, mi):
        import queue
        import threading

        import jax

        from . import packed as packed_mod

        if jax.process_count() > 1:
            # multi-host: feed the stream synchronously on the main thread.
            # Every process must enqueue the same cross-process executions
            # in the same order; the run-ahead transfer thread interleaves
            # device_put/execute differently per process and wedges the
            # CPU collective client (measured: 8 steps never complete,
            # while this path finishes in seconds). Multi-host throughput
            # comes from scale-out, not single-host pipelining.
            for bd, n in native_batch_stream(args, mi, vw, batch_size,
                                             cut_at, count_keys):
                params = process(params, bd, n)
            return finish_run(params)

        # three-stage pipeline: C++ ingest, host→device transfer, and step
        # dispatch each on their own thread. Both ingest and device_put
        # release the GIL, and on a high-latency link (the axon tunnel:
        # 25-270 MB/s, ~34 ms RPC) the transfer otherwise serializes with
        # dispatch+drain on the consumer — measured 202k → ~330k ex/s
        # end-to-end from overlapping it (bench.py decomposition).
        #
        # Superbatching (train/packed.py): K consecutive full train batches
        # pack into ONE u32 buffer = one device_put RPC (each leaf of a
        # batch dict otherwise pays the link's ~35 ms per-call latency),
        # one scanned dispatch, one [K, B] prediction fetch. Trajectory is
        # identical to K separate steps. Groups never span the
        # train/holdout boundary; partial/tail batches go unpacked.
        K = int(getattr(args, "fwt_superbatch", 0) or 0)
        if K <= 0:
            K = 8
        can_pack = (K > 1 and shard_batch_fn is None and delay == 0
                    and not testonly and train_step is not None)

        q: queue.Queue = queue.Queue(maxsize=3)
        q2: queue.Queue = queue.Queue(maxsize=3)

        bitpack_on = (getattr(args, "fwt_bitpack", "auto") or "auto") != "off"
        # vocabulary-encoded transfer (packed.py encode_vocab_ids): the
        # producer owns the persistent per-column dictionaries; a full
        # device snapshot rides the queue ahead of any group that grew them
        vocab_state = (
            packed_mod.VocabTransferState()
            if bitpack_on
            and (getattr(args, "fwt_vocab", "auto") or "auto") != "off"
            else None)

        # pack cache (train/pack_cache.py): record the producer's queue
        # stream on the first pass, replay it on re-runs over the same
        # input+config — multipass/epoch re-reads skip parse, translate,
        # fill, counts, vocab encoding, and packing. auto = engage with -c
        # (the sibling record cache's own trigger).
        pc_mode = (getattr(args, "fwt_pack_cache", "auto") or "auto")
        pack_iter = None
        pack_writer = None
        if can_pack and pc_mode != "off" and os.path.isfile(args.data) and (
                pc_mode == "on" or bool(getattr(args, "cache", False))):
            from . import pack_cache as pcache

            ppath = pcache.pack_cache_path_for(args.data)
            psig = pcache.stream_signature(
                mi, vw, batch_size=batch_size, K=K, bitpack_on=bitpack_on,
                vocab_on=vocab_state is not None, count_keys=count_keys,
                cut_at=cut_at, data_path=args.data)
            pack_iter = pcache.open_pack_cache(ppath, psig)
            if pack_iter is not None:
                log.info("using pack cache %s", ppath)
            else:
                try:
                    pack_writer = pcache.PackCacheWriter(ppath, psig)
                except OSError as e:
                    log.warning("pack cache disabled (%s)", e)

        # --- adaptive vocab (only --fwt_vocab auto): the dictionary encode
        # costs producer CPU (~0.24 µs/ex measured) to shrink the uplink
        # payload ~1.55×. Which side wins depends on the live tunnel
        # window: producer-bound runs on fast links should drop the encode,
        # transfer-bound runs must keep it. The transferrer publishes
        # starvation + bandwidth; the producer flips the encoder off
        # ONE-WAY when (a) the transferrer mostly starves waiting on the
        # producer AND (b) the predicted no-vocab floor min(producer,
        # transfer) clears the current floor with 1.2× hysteresis. A flip
        # re-signatures the layout (one extra compile, usually served by
        # the persistent compile cache).
        _xfer_stats = {"starve_s": 0.0, "xfer_s": 0.0, "put_s": 0.0,
                       "bytes": 0}
        _vflip_env = os.environ.get("FWT_VOCAB_FLIP", "auto")
        _vocab_adaptive = (vocab_state is not None and _vflip_env != "off"
                           and (getattr(args, "fwt_vocab", "auto") or "auto")
                           == "auto")

        def producer():
            _pq = q
            if pack_writer is not None:
                from . import pack_cache as pcache

                _pq = pcache.RecordingQueue(q, pack_writer)

            class _TimedQ:  # count queue backpressure as producer stall
                def put(self, item):
                    _t = time.perf_counter()
                    _pq.put(item)
                    ctr["producer_stall_s"] += time.perf_counter() - _t

            pq = _TimedQ()
            _span0 = time.perf_counter()
            try:
                if pack_iter is not None:
                    for item in pack_iter:
                        pq.put(item)
                    pq.put(None)
                    return
                group: list = []
                group_n = 0
                glay = None
                seen = 0
                # adaptive-vocab accounting (full superbatches only)
                vstat = {"probe": None, "t_work": 0.0, "t_put": 0.0,
                         "ex": 0, "groups": 0, "t_mark": time.perf_counter()}

                def _maybe_flip_vocab():
                    """One-way: disable the dictionary encode when the
                    producer is the certified pipeline floor and the fatter
                    plain payload would not become a worse one."""
                    if not _vocab_adaptive or vocab_state.disabled:
                        return
                    if _vflip_env == "force":
                        vocab_state.disabled = True
                        log.info("adaptive vocab: encode disabled (forced)")
                        return
                    if vstat["probe"] is None or vstat["groups"] < 3:
                        return  # 3 full groups/window: a 1M-row run only
                        # produces 3 (the old floor of 8 needed 2.1M rows
                        # and the flip could never fire inside the
                        # benchmark's timed runs)
                    dt_prep, s_off = vstat["probe"]
                    t_work = vstat["t_work"] - vstat["t_put"]
                    if t_work <= 0 or vstat["ex"] == 0:
                        return
                    p_on = vstat["ex"] / t_work
                    # dt_prep is PER EXAMPLE (the probe divides by
                    # batch_size) — the old `* groups * K` undercounted by
                    # batch_size, so the predicted no-vocab rate always
                    # equaled the current one and the flip never fired
                    t_off = t_work - dt_prep * vstat["ex"]
                    p_off = vstat["ex"] / max(t_off, 1e-9)
                    st = _xfer_stats
                    busy = st["starve_s"] + st["xfer_s"] + st["put_s"]
                    if busy <= 0 or st["xfer_s"] <= 0 or st["bytes"] == 0:
                        return
                    starve_frac = st["starve_s"] / busy
                    bw = st["bytes"] / st["xfer_s"]  # payload B/s over the link
                    s_on = st["bytes"] / vstat["ex"]
                    r_on = bw / s_on
                    r_off = bw / max(s_off, 1.0)
                    if os.environ.get("FWT_VOCAB_DEBUG"):
                        log.info(
                            "vocab-flip eval: starve %.2f, p_on %.0fk, "
                            "p_off %.0fk, r_on %.0fk, r_off %.0fk, "
                            "dt_prep %.3fus, s_on %.1f s_off %.1f",
                            starve_frac, p_on / 1e3, p_off / 1e3,
                            r_on / 1e3, r_off / 1e3, dt_prep * 1e6,
                            s_on, s_off)
                    if starve_frac > 0.6 and \
                            min(p_off, r_off) > 1.05 * min(p_on, r_on):
                        # hysteresis 1.05 (was 1.2): a flip costs one
                        # re-signature compile, now served by the
                        # persistent compile cache — the old margin
                        # blocked measured ~8% producer wins
                        vocab_state.disabled = True
                        log.info(
                            "adaptive vocab: encode disabled (producer-bound:"
                            " starve %.0f%%, producer %.0fk→%.0fk ex/s,"
                            " transfer %.0fk→%.0fk ex/s at %.1f MB/s)",
                            100 * starve_frac, p_on / 1e3, p_off / 1e3,
                            r_on / 1e3, r_off / 1e3, bw / 1e6)
                    # reset the window either way: decisions use fresh data
                    vstat.update(t_work=0.0, t_put=0.0, ex=0, groups=0)
                    st.update(starve_s=0.0, xfer_s=0.0, put_s=0.0, bytes=0)

                def flush_group():
                    nonlocal group, glay, group_n
                    if not group:
                        return
                    # short groups pack too: a K'-sized scan program is one
                    # extra compile, served by the persistent compile cache
                    # on re-runs, vs K' batches down the slow per-array
                    # device_put path (on a 1M-row run the tail held ~20%
                    # of the examples; measured in-run counters r4)
                    if glay.vocabs and vocab_state.venc is not None \
                            and vocab_state.venc.dirty:
                        snap = packed_mod.export_vocab(
                            vocab_state.venc, glay.vocabs[0])
                        # clear the growth flag ONLY if this snapshot fully
                        # covers the dictionaries: the batch that ENDED this
                        # group (already encoded, different signature,
                        # flushed next) may have grown a column past this
                        # layout's region — its own flush must re-export
                        # with its wider layout. (r4 bug: unconditional
                        # clear shipped that group against a stale
                        # snapshot → garbage id resolution.)
                        _key0, _w0, _b0, _n0 = glay.vocabs[0]
                        if all(b < 0
                               or vocab_state.venc.col_size(j) <= (1 << w)
                               for j, (w, b) in enumerate(zip(_w0, _b0))):
                            vocab_state.venc.clear_dirty()
                        pq.put(("v", snap))
                    if len(group) in (1, K):
                        buf = packed_mod.pack(glay, group)
                        _tp = time.perf_counter()
                        pq.put(("p", buf, glay, group_n))
                    else:
                        # split short tails into CANONICAL scan lengths
                        # (K, then descending powers of two): every K'
                        # would otherwise compile its own program, and
                        # early-run vocab re-signatures times arbitrary
                        # K' measured ~150 s of extra first-compiles in
                        # one warm pass
                        sizes = [K] + [p for p in (8, 4, 2, 1) if p < K]
                        i = 0
                        _tp = time.perf_counter()
                        while i < len(group):
                            kk = next(s for s in sizes
                                      if s <= len(group) - i)
                            buf = packed_mod.pack(glay, group[i:i + kk])
                            pq.put(("p", buf, glay, kk * batch_size))
                            i += kk
                    if len(group) == K:
                        # adaptive-vocab accounting: full groups only (the
                        # flip arithmetic normalizes per-group)
                        _now = time.perf_counter()
                        vstat["t_put"] += _now - _tp
                        vstat["t_work"] += _now - vstat["t_mark"]
                        vstat["t_mark"] = _now
                        vstat["ex"] += K * batch_size
                        vstat["groups"] += 1
                        if glay.vocabs:
                            _maybe_flip_vocab()
                    else:
                        vstat["t_mark"] = time.perf_counter()
                    group, glay, group_n = [], None, 0

                for bd, n in native_batch_stream(args, mi, vw, batch_size,
                                                 cut_at, count_keys):
                    lay = None
                    slim = bd
                    # partial (padded) batches pack too, as their own solo
                    # group: the arrays are already [batch_size, W] with
                    # inert padding rows, so one packed buffer beats the
                    # per-array device_put path (the 1M bench's 17k-row
                    # tail measured ~5% of the wall clock on that path)
                    if (can_pack
                            and (holdout_after is None or seen < cut_at)):
                        # constant-feature column elision + id bit-packing
                        # + vocab indexing: pure transfer savings, undone
                        # device-side (packed.py unpack_row)
                        _t0 = time.perf_counter()
                        # partial (padded) batches stay OFF the vocab
                        # encoder: their constant column is not stripped
                        # (padding rows break the constancy test), so
                        # column j is a different logical column than in
                        # full batches — feeding them would pollute the
                        # persistent dictionaries with misaligned ids and
                        # padding garbage
                        slim, *spec = packed_mod.prepare_for_transfer(
                            bd, mi, bitpack=bitpack_on,
                            vocab_state=vocab_state if n == batch_size
                            else None)
                        _t_on = time.perf_counter() - _t0
                        lay = packed_mod.layout_of(slim, *spec)
                        if _vocab_adaptive and vstat["probe"] is None \
                                and vstat["groups"] >= 1 \
                                and lay is not None and lay.vocabs:
                            # one-time probe: the plain (no-vocab) prepare's
                            # cost and payload, for the flip arithmetic
                            _t0 = time.perf_counter()
                            plain, *pspec = packed_mod.prepare_for_transfer(
                                bd, mi, bitpack=bitpack_on, vocab_state=None)
                            _t_off = time.perf_counter() - _t0
                            _play = packed_mod.layout_of(plain, *pspec)
                            if _play is not None:
                                vstat["probe"] = (
                                    max(_t_on - _t_off, 0.0) / batch_size,
                                    _play.words * 4 / batch_size)
                    if lay is not None and n == batch_size and (
                            glay is None or lay.signature == glay.signature):
                        # only the slimmed dict is retained: keeping the
                        # original too held up to K full [32768, W] batch
                        # dicts alive per pending group (tens of MB) for
                        # nothing since the unpacked-tail path was removed
                        group.append(slim)
                        group_n += n
                        glay = lay
                        if len(group) == K:
                            flush_group()
                    else:
                        flush_group()
                        if lay is not None:
                            group, glay, group_n = [slim], lay, n
                            if n != batch_size:
                                flush_group()  # solo: padded partial batch
                        else:
                            pq.put(("s", bd, n))
                    seen += n
                flush_group()
                pq.put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised downstream
                pq.put(e)
            finally:
                ctr["producer_busy_s"] = (time.perf_counter() - _span0
                                          - ctr["producer_stall_s"])

        def transferrer():
            try:
                while True:
                    _t0 = time.perf_counter()
                    item = q.get()
                    _dt = time.perf_counter() - _t0
                    _xfer_stats["starve_s"] += _dt
                    ctr["xfer_starve_s"] += _dt
                    if item is None or isinstance(item, BaseException):
                        q2.put(item)
                        return
                    if item[0] == "p":
                        _, buf, lay, gn = item
                        _t0 = time.perf_counter()
                        dbuf = jax.device_put(buf)
                        _dt = time.perf_counter() - _t0
                        _xfer_stats["xfer_s"] += _dt
                        _xfer_stats["bytes"] += buf.nbytes
                        ctr["xfer_busy_s"] += _dt
                        ctr["xfer_bytes"] += buf.nbytes
                        ctr["xfer_puts"] += 1
                        _t0 = time.perf_counter()
                        q2.put(("p", dbuf, lay, gn))
                        _dt = time.perf_counter() - _t0
                        _xfer_stats["put_s"] += _dt
                        ctr["xfer_stall_s"] += _dt
                    elif item[0] == "v":
                        _t0 = time.perf_counter()
                        dv = jax.device_put(item[1])
                        ctr["xfer_busy_s"] += time.perf_counter() - _t0
                        ctr["xfer_bytes"] += item[1].nbytes
                        ctr["xfer_puts"] += 1
                        q2.put(("v", dv))
                    else:
                        _, bd, n = item
                        _t0 = time.perf_counter()
                        bd = shard_batch_fn(bd) if shard_batch_fn is not None \
                            else jax.device_put(bd)
                        ctr["xfer_busy_s"] += time.perf_counter() - _t0
                        ctr["xfer_bytes"] += sum(
                            getattr(v, "nbytes", 0) for v in bd.values())
                        ctr["xfer_puts"] += 1
                        q2.put(("s", bd, n))
            except BaseException as e:  # noqa: BLE001 — re-raised on consumer
                q2.put(e)

        _prod_t = threading.Thread(target=producer, daemon=True)
        _xfer_t = threading.Thread(target=transferrer, daemon=True)
        _prod_t.start()
        _xfer_t.start()

        # fetch-ring (EXPERIMENTAL, default OFF): each packed step writes
        # its [K, B] predictions into row `slot` of a device-resident
        # [M, K, B] ring INSIDE the step program (packed.py
        # make_packed_train_step_ring) and the ring is fetched once per M
        # superbatches — M× fewer D2H fetch RPCs with zero extra
        # dispatches. (The earlier jnp.stack flush variant added a
        # dispatch RPC per flush and measured ~4% SLOWER than per-step
        # async fetching in a good tunnel window; the ring form targets
        # BAD windows, where fetch RPCs head-of-line-block the uplink —
        # measured with-`-p` collapses to 75–151k ex/s while no-`-p` runs
        # 399–506k.)
        M = int(getattr(args, "fwt_fetch_stack", 0) or 0)
        auto_ring = M == 0 and writer.active
        if M <= 0:
            M = 4 if auto_ring else 1
        use_ring = M > 1 and writer.active and not auto_ring
        # auto (the default): start with per-step async fetches (they
        # overlap fine in good tunnel windows) and engage the ring when a
        # prediction fetch measures slow — the bad-window signature, where
        # fetch RPCs head-of-line-block the uplink and throughput
        # collapses 3-5x (per-item stalls of 2-3 s). The writer's force
        # also waits on STEP COMPLETION (only a fetch forces completion
        # on this platform), so the threshold must clear the heaviest
        # known per-superbatch compute (~400 ms at a 2^29 table) or a
        # compute-bound config would spuriously engage; a false engage
        # costs only one extra compile + <~4%, a missed engage costs
        # 3-5x, hence one-way and generous. One-way switch.
        ring_auto_ms = float(os.environ.get("FWT_RING_AUTO_MS", "1000"))
        _ring = None          # device [M, K, B] f32
        _ring_metas: list = []  # (first_num, n) per written slot

        def _flush_ring():
            if not _ring_metas:
                return
            if hasattr(_ring, "copy_to_host_async"):
                _ring.copy_to_host_async()
            _t0 = time.perf_counter()
            _wq.put((_ring, list(_ring_metas)))
            ctr["writer_stall_s"] += time.perf_counter() - _t0
            _ring_metas.clear()

        _vocab = None  # device [n_rows, 128] i32 dictionary snapshot

        while True:
            _t0 = time.perf_counter()
            item = q2.get()
            ctr["consumer_starve_s"] += time.perf_counter() - _t0
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            if item[0] == "v":
                _vocab = item[1]
                continue
            if item[0] == "p":
                _, buf, lay, gn = item
                first_num = example_num + 1
                example_num += gn
                kk = int(buf.shape[0])  # K' — short/partial tails pack too
                vargs = (_vocab,) if lay.vocabs else ()
                if auto_ring and not use_ring \
                        and _fetch_stats["last_ms"] > ring_auto_ms:
                    use_ring = True
                    log.info(
                        "prediction fetch measured %.0f ms (> %.0f): "
                        "engaging the device fetch ring (M=%d, one D2H "
                        "per %d superbatches)",
                        _fetch_stats["last_ms"], ring_auto_ms, M, M)
                if use_ring and kk != K:
                    _flush_ring()  # tail: ring slots are [K, B]-shaped
                if use_ring and kk == K:
                    ring_fn = packed_mod.make_packed_train_step_ring(
                        model, lay, K, M)
                    if _ring is None:
                        _ring = jax.device_put(
                            np.zeros((M, K, batch_size), np.float32))
                    _t0 = time.perf_counter()
                    params, _ring = ring_fn(
                        params, buf, _ring, np.int32(len(_ring_metas)),
                        *vargs)
                    ctr["dispatch_s"] += time.perf_counter() - _t0
                    _ring_metas.append((first_num, gn))
                    if len(_ring_metas) == M:
                        _flush_ring()
                else:
                    step_fn = packed_mod.make_packed_train_step(model, lay,
                                                                kk)
                    _t0 = time.perf_counter()
                    params, preds = step_fn(params, buf, *vargs)  # [kk, B]
                    ctr["dispatch_s"] += time.perf_counter() - _t0
                    if writer.active:
                        if hasattr(preds, "copy_to_host_async"):
                            preds.copy_to_host_async()
                        _t0 = time.perf_counter()
                        _wq.put((preds, [(first_num, gn)]))
                        ctr["writer_stall_s"] += time.perf_counter() - _t0
                if _werr:
                    raise _werr[0]
            else:
                _, bd, n = item
                _flush_ring()  # keep the prediction stream in order
                params = process(params, bd, n, placed=True)
        _flush_ring()
        # the producer writes ctr['producer_busy_s'] in its finally block,
        # which can race finish_run's counter snapshot (the consumer can
        # drain the final None before the producer's finally runs) — join
        # both stage threads first
        _prod_t.join(timeout=10.0)
        _xfer_t.join(timeout=10.0)
        if vocab_state is not None:
            vocab_state.close()
    else:
        pending: list = []

        def np_counts(ids, vals, shift):
            """NumPy multiplicity counts for the Python-ingest path, coded
            identically to the native engine's (ops/adagrad.encode_counts).
            Entries with value 0 (incl. padding) are excluded — their
            gradient is 0, matching the device path's touched-only counts."""
            from ..ops.adagrad import encode_counts

            keys = ids.astype(np.uint32) >> shift
            real = (vals != 0.0).reshape(-1)
            flat = keys.reshape(-1)
            c = np.zeros(flat.shape, np.int64)
            if real.any():
                u, inv, cnt = np.unique(flat[real], return_inverse=True,
                                        return_counts=True)
                c[real] = cnt[inv]
            return encode_counts(c).reshape(ids.shape)

        def flush(params):
            if not pending:
                return params
            batch = batcher.make_batch(pending)
            bd = _batch_dict(batch)
            if count_keys is not None:
                if "lr" in count_keys:
                    bd["lr_counts"] = np_counts(
                        batch.lr_ids, batch.lr_vals, count_keys["lr"])
                if "ffm" in count_keys and batch.ffm_ids.size:
                    bd["ffm_counts"] = np_counts(
                        batch.ffm_ids, batch.ffm_vals, count_keys["ffm"])
            params = process(params, bd, batch.num_examples)
            pending.clear()
            return params

        seen = 0
        for rec in record_stream(args, vw):
            seen += 1
            pending.append(translator.translate(rec))
            if len(pending) >= batch_size or (cut_at is not None and seen == cut_at):
                params = flush(params)
        params = flush(params)

    # drain the delay queue and the prediction pipeline
    return finish_run(params)


def _daemonize() -> None:
    """Classic double-fork daemonization (the reference daemonizes unless
    --foreground, src/serving.rs:215-225): detach from the controlling
    terminal and session; stdio to /dev/null. Must run before any JAX
    backend initialization."""
    if os.fork() > 0:
        os._exit(0)  # first parent exits; the CLI caller returns
    os.setsid()
    if os.fork() > 0:
        os._exit(0)  # session leader exits; grandchild serves
    devnull = os.open(os.devnull, os.O_RDWR)
    for fd in (0, 1, 2):
        try:
            os.dup2(devnull, fd)
        except OSError:
            pass
    os.close(devnull)


def configure_compile_cache(args=None) -> None:
    """Enable JAX's persistent XLA compilation cache on non-CPU platforms.

    Skips the 20-40 s first-compile on every process (the step program is
    stable across runs of one schema) and pins ONE compiled program where
    the compiler is run-to-run nondeterministic — the whole-step timing on
    this TPU measures bimodal between processes (CLAUDE.md); a shared
    cache freezes whichever compilation was cached first. `--fwt_compile_cache
    off` (or FWT_COMPILE_CACHE=off) disables; CPU runs (tests) never cache.
    The platform must be KNOWN non-CPU before backend init (an init here
    would defeat bench.py's host-only-first wedge ordering), so pure-auto
    environments with no JAX_PLATFORMS hint skip the default — pass
    --fwt_compile_cache DIR explicitly there. jax itself is only imported
    when the cache actually engages (the native predict path must stay
    jax-free, see the lazy-import note at the top of this module)."""
    cache_dir = getattr(args, "fwt_compile_cache", None) if args else None
    if cache_dir is None:
        cache_dir = os.environ.get("FWT_COMPILE_CACHE")
    if cache_dir == "off":
        return
    explicit = cache_dir is not None
    platform = getattr(args, "fwt_platform", None) if args else None
    if platform is None:
        platform = ""
        if "jax" in sys.modules:  # in-process config (tests) wins over env
            platform = sys.modules["jax"].config.jax_platforms or ""
        platform = platform or os.environ.get("JAX_PLATFORMS") or ""
    # the platform string can be a priority list ("axon,cpu" from the site
    # hook: cpu is only the FALLBACK) — judge by the first entry, not by
    # substring ("cpu" in "axon,cpu" kept the cache off on every device
    # run until r4)
    plats = [p.strip() for p in str(platform).split(",") if p.strip()]
    if (plats and plats[0] == "cpu") or (not plats and not explicit):
        return
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "fwt_xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError) as e:  # pragma: no cover
        log.warning("compilation cache disabled: %s", e)


def main(argv=None) -> int:
    import logging

    from ..config.cmdline import build_parser

    args = build_parser().parse_args(argv)

    if getattr(args, "quiet", False):
        logging.getLogger().setLevel(logging.WARNING)

    if getattr(args, "hogwild_training", False):
        log.info(
            "--hogwild_training: asynchronous shared-memory updates map to "
            "synchronous batched data parallelism on TPU (SURVEY.md §2.4); "
            "scale throughput with --fwt_batch_size / --fwt_data_axis"
        )

    if getattr(args, "fwt_platform", None):
        import jax

        jax.config.update("jax_platforms", args.fwt_platform)

    configure_compile_cache(args)

    # multi-host: must run before any JAX backend initialization
    from ..parallel.distributed import initialize_multihost

    initialize_multihost(
        getattr(args, "fwt_coordinator", None),
        getattr(args, "fwt_hosts", None),
        getattr(args, "fwt_host_id", None),
    )

    if args.final_regressor and not args.save_resume:
        log.error(
            "You need to use --save_resume with --final_regressor,"
            " for vowpal wabbit compatibility"
        )
        return 1

    # -- daemon mode --------------------------------------------------------
    if args.daemon:
        if not args.initial_regressor:
            log.error("Daemon mode only supports serving from --initial_regressor")
            return 1
        if not getattr(args, "foreground", False):
            # detach BEFORE loading the model: forking after a JAX backend
            # (or its client threads) initializes is unsafe
            # (reference daemonizes the same way, src/serving.rs:215-225)
            _daemonize()
        from ..persistence import model_file
        from ..serve.server import Serving

        engine = getattr(args, "fwt_serve_engine", "auto") or "auto"
        if engine in ("auto", "native"):
            # native-engine-first startup: the C++ engine loads the model
            # itself; jax and the device model are never touched (about
            # half the memory, reference persistence.rs:159-173, and no
            # backend init in the daemon). Only STARTUP failures fall back
            # to the device engine — serve() runs outside the try so a
            # runtime error (e.g. port already bound) propagates instead
            # of being misread as "native unavailable".
            serving = None
            try:
                mi, vw = model_file.read_header(args.initial_regressor)
                serving = Serving(args, mi, vw, None, None,
                                  model_path=args.initial_regressor)
            except Exception as e:  # noqa: BLE001
                if engine == "native":
                    log.error("native serving engine failed: %s", e)
                    return 1
                log.warning("native serving unavailable (%s); "
                            "loading the device model", e)
            if serving is not None:
                serving.serve()
                return 0
        mi, vw, model, params = model_file.load_model(
            args.initial_regressor, immutable=True, args=args
        )
        Serving(args, mi, vw, model, params,
                model_path=args.initial_regressor).serve()
        return 0

    # -- convert to inference regressor --------------------------------------
    if args.convert_inference_regressor:
        if not args.initial_regressor:
            log.error("Convert mode requires --initial_regressor")
            return 1
        from ..persistence import model_file

        mi, vw, model, params = model_file.load_model(
            args.initial_regressor, immutable=True, args=args
        )
        if args.weight_quantization:
            mi.dequantize_weights = True
        model_file.save_model(
            args.convert_inference_regressor, mi, vw, model, params,
            quantize_weights=args.weight_quantization,
        )
        return 0

    # -- predict mode on the embedded C++ engine -----------------------------
    if native_predict_eligible(args):
        from .. import native as fw_native

        if fw_native.load() is not None:
            try:
                pred = fw_native.EmbeddedPredictor(
                    f"-i {args.initial_regressor}")
            except RuntimeError as e:
                log.warning("native predict engine unavailable (%s); "
                            "using the device path", e)
            else:
                try:
                    run_native_predict(args, pred)
                    return 0
                except (FlushCommand, HogwildLoadCommand) as e:
                    log.error("Global error: %s", e)
                    return 1

    # -- vwmap + model config -------------------------------------------------
    from ..models.model import FwModel
    from ..persistence import model_file

    if args.initial_regressor:
        mi, vw, model, params = model_file.load_model(
            args.initial_regressor, immutable=args.testonly, args=args
        )
    else:
        if not args.data:
            log.error("--data expected")
            return 1
        vw = VwNamespaceMap.from_dataset_dir(args.data)
        mi = ModelInstance.from_cmdline(args, vw)
        model = FwModel(
            mi,
            batch_mean_mode=getattr(args, "fwt_batch_mean", "auto") or "auto",
            batch_cap=float(getattr(args, "fwt_batch_cap", 8.0) or 8.0),
            pallas_update=getattr(args, "fwt_pallas_update", "auto") or "auto",
        )
        params = None

    if args.build_cache_without_training:
        build_cache_without_training(args, vw)
        return 0

    profile_dir = getattr(args, "fwt_profile", None)
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    try:
        result = run_train_loop(args, mi, vw, model, params)
    except (FlushCommand, HogwildLoadCommand) as e:
        # reference: "Global error: Not really an error: a \"flush\"
        # command from client" → exit(1) (src/main.rs:44-47)
        log.error("Global error: %s", e)
        return 1
    finally:
        if profile_dir:
            import jax

            jax.profiler.stop_trace()
            log.info("profiler trace written to %s", profile_dir)

    if args.final_regressor:
        model_file.save_model(
            args.final_regressor, mi, vw, model, result["params"],
            quantize_weights=bool(args.weight_quantization),
        )
    return 0
