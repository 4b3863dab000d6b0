"""Unit tests for the extracted producer pipeline (train/producer.py):
the vocab-flip policy (pure decision logic), the superbatch grouping, and
the per-thread CPU counter contract — none of which were testable except
through the CLI before r5 (VERDICT r4 hygiene item)."""

import queue

import numpy as np
import pytest

from fwumious_wabbit_tpu.train.producer import (
    SuperbatchProducer,
    VocabFlipPolicy,
    native_batch_stream,
)


def _window(groups=3, ex=3 * 8 * 32768, t_work=2.0, t_put=0.1):
    return {"probe": (0.24e-6, 62.0), "t_work": t_work, "t_put": t_put,
            "ex": ex, "groups": groups, "t_mark": 0.0}


def _xfer(starve_s=3.0, xfer_s=1.0, put_s=0.0, bytes_=None, ex=3 * 8 * 32768):
    # default: 38 B/ex on-wire payload at high bandwidth → transfer clears
    # the producer easily, starve dominated
    if bytes_ is None:
        bytes_ = int(38 * ex)
    return {"starve_s": starve_s, "xfer_s": xfer_s, "put_s": put_s,
            "bytes": bytes_}


class TestVocabFlipPolicy:
    def test_incomplete_window_keeps_accumulating(self):
        pol = VocabFlipPolicy()
        verdict, _ = pol.evaluate(None, _window(), _xfer())
        assert verdict == "incomplete"
        verdict, _ = pol.evaluate((0.24e-6, 62.0), _window(groups=2), _xfer())
        assert verdict == "incomplete"

    def test_two_consecutive_windows_required(self):
        """ADVICE r4: one noisy window must not permanently disable the
        encode — the flip needs two consecutive complete windows voting
        yes."""
        pol = VocabFlipPolicy()
        # a strongly producer-bound window: starve 75%, off-rate well above
        # on-rate (probe says the encode costs 0.24 us/ex of 2.0 s work)
        w = _window(t_work=2.0)
        x = _xfer(starve_s=3.0, xfer_s=0.2)
        v1, _ = pol.evaluate(w["probe"], w, x)
        assert v1 == "keep"  # first vote recorded, not yet flipped
        assert pol.votes == 1
        v2, detail = pol.evaluate(w["probe"], w, x)
        assert v2 == "flip"
        assert "2 windows" in detail

    def test_noisy_window_resets_votes(self):
        pol = VocabFlipPolicy()
        w = _window(t_work=2.0)
        x_hot = _xfer(starve_s=3.0, xfer_s=0.2)
        v1, _ = pol.evaluate(w["probe"], w, x_hot)
        assert v1 == "keep" and pol.votes == 1
        # next window: transfer-bound (no starve) — vote resets
        x_cold = _xfer(starve_s=0.1, xfer_s=4.0)
        v2, _ = pol.evaluate(w["probe"], w, x_cold)
        assert v2 == "keep" and pol.votes == 0
        # a later hot window starts the count over (no flip yet)
        v3, _ = pol.evaluate(w["probe"], w, x_hot)
        assert v3 == "keep" and pol.votes == 1

    def test_transfer_bound_window_never_flips(self):
        pol = VocabFlipPolicy()
        w = _window()
        # starve below threshold: the transferrer is busy, producer is fine
        x = _xfer(starve_s=0.5, xfer_s=3.5)
        for _ in range(5):
            verdict, _ = pol.evaluate(w["probe"], w, x)
            assert verdict == "keep"
        assert pol.votes == 0

    def test_force_mode(self):
        pol = VocabFlipPolicy(env_mode="force")
        verdict, detail = pol.evaluate(None, _window(groups=0), _xfer())
        assert verdict == "flip" and detail == "forced"


def test_fused_engagement_vetoes_flip(tmp_path, monkeypatch):
    """A window in which the fused emit engaged must never disable the
    vocab encode (r5): with the fused sweep, encoding IS the cheap
    producer mode — the flip's probe measures the GENERAL path's encode
    overhead, which fused batches never pay. Forced-flip conditions plus
    fused engagement ⇒ the encode stays on for the whole run."""
    pytest.importorskip("fwumious_wabbit_tpu.native")
    from fwumious_wabbit_tpu import native as fw_native
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
    from fwumious_wabbit_tpu.train import packed as packed_mod

    if fw_native.load() is None:
        pytest.skip("native engine unavailable")
    # tiny vocabularies (A:5, B:4, AB:20) saturate within the first couple
    # of batches, so the fused path engages for the rest of the run
    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\n")
    rng = np.random.default_rng(23)
    data = tmp_path / "d.vw"
    with open(data, "w") as f:
        for _ in range(2000):
            label = 1 if rng.integers(0, 2) else -1
            f.write(f"{label} |A a{rng.integers(0, 5)} "
                    f"|B b{rng.integers(0, 4)}\n")
    argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
            "--power_t", "0.0", "--interactions", "AB",
            "--keep", "A", "--keep", "B"]
    args = build_parser().parse_args(argv)
    vw = VwNamespaceMap.from_dataset_dir(args.data)
    mi = ModelInstance.from_cmdline(args, vw)
    monkeypatch.setenv("FWT_FUSED", "on")
    vstate = packed_mod.VocabTransferState()

    def run_once(force):
        prod = SuperbatchProducer(
            args, mi, vw, batch_size=64, K=2, can_pack=True,
            count_keys=None, cut_at=None, holdout_after=None,
            out_queue=_ListSink(), ctr=_fresh_ctr(),
            xfer_stats={"starve_s": 50.0, "xfer_s": 0.01, "put_s": 0.0,
                        "bytes": 10_000_000},
            vocab_state=vstate)
        if force:
            prod.flip_policy = VocabFlipPolicy("force")  # any evaluated
            # window flips — unless the fused veto intercepts it
        prod.run()

    run_once(force=False)  # warm pass: dictionaries saturate (mints keep
    # those early batches on the general path)
    assert not vstate.disabled
    run_once(force=True)   # every full batch now fuses → veto everywhere
    disabled = vstate.disabled
    vstate.close()
    assert not disabled, "fused engagement must veto the vocab flip"


@pytest.fixture(scope="module")
def eat_rate_setup(tmp_path_factory):
    """A small Eat-Rate-schema dataset + config, for stream-level tests."""
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap

    d = tmp_path_factory.mktemp("producer")
    with open(d / "vw_namespace_map.csv", "w") as f:
        f.write("A,animal\nB,food\n")
    rng = np.random.default_rng(7)
    data = d / "train.vw"
    with open(data, "w") as f:
        for i in range(3000):
            label = 1 if rng.integers(0, 2) else -1
            f.write(f"{label} |A a{rng.integers(0, 50)} "
                    f"|B b{rng.integers(0, 30)}\n")
    argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
            "--power_t", "0.0", "--interactions", "AB",
            "--keep", "A", "--keep", "B"]
    args = build_parser().parse_args(argv)
    vw = VwNamespaceMap.from_dataset_dir(args.data)
    mi = ModelInstance.from_cmdline(args, vw)
    return args, mi, vw


def _fresh_ctr():
    return {
        "producer_busy_s": 0.0, "producer_stall_s": 0.0,
        "xfer_starve_s": 0.0, "xfer_busy_s": 0.0, "xfer_stall_s": 0.0,
        "xfer_bytes": 0, "xfer_puts": 0,
        "consumer_starve_s": 0.0, "dispatch_s": 0.0, "writer_stall_s": 0.0,
        "fetch_force_s": 0.0, "fetch_count": 0, "fetch_bytes": 0,
        "write_s": 0.0,
    }


class _ListSink:
    """Queue stand-in that records every put — drives SuperbatchProducer
    synchronously, no threads."""

    def __init__(self):
        self.items = []

    def put(self, item):
        self.items.append(item)


class TestSuperbatchProducer:
    def test_groups_and_counters(self, eat_rate_setup):
        pytest.importorskip("fwumious_wabbit_tpu.native")
        from fwumious_wabbit_tpu import native as fw_native
        from fwumious_wabbit_tpu.train import packed as packed_mod

        if fw_native.load() is None:
            pytest.skip("native engine unavailable")
        args, mi, vw = eat_rate_setup
        sink = _ListSink()
        ctr = _fresh_ctr()
        vstate = packed_mod.VocabTransferState()
        prod = SuperbatchProducer(
            args, mi, vw, batch_size=512, K=2, can_pack=True,
            count_keys={"lr": 0}, cut_at=None, holdout_after=None,
            out_queue=sink, ctr=ctr,
            xfer_stats={"starve_s": 0.0, "xfer_s": 0.0, "put_s": 0.0,
                        "bytes": 0},
            vocab_state=vstate)
        prod.run()
        vstate.close()
        assert sink.items[-1] is None
        packed = [it for it in sink.items[:-1] if it[0] == "p"]
        assert packed, "no packed groups emitted"
        # 3000 rows at B=512: 5 full batches → two K=2 groups + one solo
        # full batch + one padded partial, all packed
        total = sum(it[3] for it in packed)
        assert total == 3000
        # per-thread CPU attribution exists and decomposes
        cpu = ctr["cpu_s_by_thread"]
        assert cpu["producer"] >= 0.0
        assert set(cpu) >= {"producer", "producer_ingest",
                            "producer_prepare", "producer_pack"}
        assert ctr["producer_busy_s"] > 0.0

    def test_exceptions_propagate_to_queue(self, eat_rate_setup):
        pytest.importorskip("fwumious_wabbit_tpu.native")
        from fwumious_wabbit_tpu import native as fw_native

        if fw_native.load() is None:
            pytest.skip("native engine unavailable")
        args, mi, vw = eat_rate_setup
        import copy

        bad = copy.copy(args)
        bad.data = args.data + ".does-not-exist"
        sink = _ListSink()
        prod = SuperbatchProducer(
            bad, mi, vw, batch_size=512, K=2, can_pack=True,
            count_keys=None, cut_at=None, holdout_after=None,
            out_queue=sink, ctr=_fresh_ctr(),
            xfer_stats={"starve_s": 0.0, "xfer_s": 0.0, "put_s": 0.0,
                        "bytes": 0})
        prod.run()
        assert isinstance(sink.items[-1], BaseException)

    def test_stream_reexport(self, eat_rate_setup):
        """bench.py and the probe scripts import native_batch_stream from
        train.loop — the re-export must stay."""
        from fwumious_wabbit_tpu.train.loop import (
            native_batch_stream as from_loop,
        )

        assert from_loop is native_batch_stream

    def test_transferrer_counters(self, eat_rate_setup):
        pytest.importorskip("fwumious_wabbit_tpu.native")
        from fwumious_wabbit_tpu import native as fw_native
        from fwumious_wabbit_tpu.train.producer import run_transferrer

        if fw_native.load() is None:
            pytest.skip("native engine unavailable")
        args, mi, vw = eat_rate_setup
        bd, n = next(iter(native_batch_stream(args, mi, vw, 256)))
        qin: queue.Queue = queue.Queue()
        qout: queue.Queue = queue.Queue()
        ctr = _fresh_ctr()
        xs = {"starve_s": 0.0, "xfer_s": 0.0, "put_s": 0.0, "bytes": 0}
        qin.put(("s", bd, n))
        qin.put(None)
        run_transferrer(qin, qout, ctr, xs)
        kind, placed, m = qout.get()
        assert kind == "s" and m == n
        assert qout.get() is None
        assert ctr["xfer_puts"] == 1 and ctr["xfer_bytes"] > 0
        assert "transfer" in ctr["cpu_s_by_thread"]
