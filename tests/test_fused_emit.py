"""Parity tests for the fused single-sweep batch emit (fw_native.cpp
fwn_emit_fused / packed.try_fused_emit): the steady state of a packed LR
run goes translated-SoA → wire arrays in one native sweep. The contract is
BYTE IDENTITY with the general chain (fill_range → slim → batch_counts →
encode_vocab_ids → table_counts → bitpack_labels → pack), so the whole
producer is run twice — FWT_FUSED=off vs on — and every emitted queue item
(packed buffers, layouts, vocab snapshots, unpacked tails) is compared."""

import numpy as np
import pytest

from fwumious_wabbit_tpu.train.producer import SuperbatchProducer


@pytest.fixture(scope="module")
def fused_setup(tmp_path_factory):
    """An Eat-Rate-shaped dataset whose vocabularies saturate in the first
    batch (A: 20 values, B: 15, AB: 300 pairs), so later batches hit the
    fused path's steady state; B=2048 keeps the count table smaller than
    per-entry codes so table_counts engages."""
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap

    d = tmp_path_factory.mktemp("fused")
    with open(d / "vw_namespace_map.csv", "w") as f:
        f.write("A,animal\nB,food\n")
    rng = np.random.default_rng(11)
    data = d / "train.vw"
    with open(data, "w") as f:
        for _ in range(10000):
            label = 1 if rng.integers(0, 2) else -1
            f.write(f"{label} |A a{rng.integers(0, 20)} "
                    f"|B b{rng.integers(0, 15)}\n")
    argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
            "--power_t", "0.0", "--interactions", "AB",
            "--keep", "A", "--keep", "B"]
    args = build_parser().parse_args(argv)
    vw = VwNamespaceMap.from_dataset_dir(args.data)
    mi = ModelInstance.from_cmdline(args, vw)
    return args, mi, vw


class _ListSink:
    def __init__(self):
        self.items = []

    def put(self, item):
        self.items.append(item)


def _fresh_ctr():
    return {"producer_busy_s": 0.0, "producer_stall_s": 0.0,
            "xfer_starve_s": 0.0, "xfer_busy_s": 0.0, "xfer_stall_s": 0.0,
            "xfer_bytes": 0, "xfer_puts": 0, "consumer_starve_s": 0.0,
            "dispatch_s": 0.0, "writer_stall_s": 0.0, "fetch_force_s": 0.0,
            "fetch_count": 0, "fetch_bytes": 0, "write_s": 0.0}


def _run_producer(args, mi, vw, *, B, K, count_keys, monkeypatch, fused,
                  cut_at=None, holdout_after=None, max_cap=1 << 14):
    from fwumious_wabbit_tpu.train import packed as packed_mod

    monkeypatch.setenv("FWT_FUSED", "on" if fused else "off")
    sink = _ListSink()
    vstate = packed_mod.VocabTransferState(max_cap=max_cap)
    engaged = [0]
    if fused:
        real = packed_mod.try_fused_emit

        def counting(*a, **kw):
            res = real(*a, **kw)
            if res is not None:
                engaged[0] += 1
            return res

        monkeypatch.setattr(packed_mod, "try_fused_emit", counting)
    prod = SuperbatchProducer(
        args, mi, vw, batch_size=B, K=K, can_pack=True,
        count_keys=count_keys, cut_at=cut_at, holdout_after=holdout_after,
        out_queue=sink, ctr=_fresh_ctr(),
        xfer_stats={"starve_s": 0.0, "xfer_s": 0.0, "put_s": 0.0,
                    "bytes": 0},
        vocab_state=vstate)
    prod.run()
    vstate.close()
    if fused:
        monkeypatch.setattr(packed_mod, "try_fused_emit", real)
    return sink.items, engaged[0]


def _assert_streams_identical(ref_items, fused_items):
    assert len(ref_items) == len(fused_items)
    for a, b in zip(ref_items, fused_items):
        if a is None:
            assert b is None
            continue
        assert a[0] == b[0]
        if a[0] == "p":
            _, buf_a, lay_a, gn_a = a
            _, buf_b, lay_b, gn_b = b
            assert gn_a == gn_b
            assert lay_a.signature == lay_b.signature
            assert buf_a.shape == buf_b.shape
            assert np.array_equal(buf_a, buf_b)
        elif a[0] == "v":
            assert np.array_equal(a[1], b[1])
        else:  # unpacked batch dict
            assert a[2] == b[2]
            assert sorted(a[1]) == sorted(b[1])
            for k in a[1]:
                assert np.array_equal(a[1][k], b[1][k]), k


def _requires_native():
    from fwumious_wabbit_tpu import native as fw_native

    if fw_native.load() is None:
        pytest.skip("native engine unavailable")


class TestFusedEmitParity:
    def test_stream_byte_identical_with_counts(self, fused_setup,
                                               monkeypatch):
        """The production config (batch-mean counts on): every queue item
        byte-identical, and the fused path actually engaged."""
        _requires_native()
        args, mi, vw = fused_setup
        ref, _ = _run_producer(args, mi, vw, B=2048, K=2,
                               count_keys={"lr": 0},
                               monkeypatch=monkeypatch, fused=False)
        got, engaged = _run_producer(args, mi, vw, B=2048, K=2,
                                     count_keys={"lr": 0},
                                     monkeypatch=monkeypatch, fused=True)
        assert engaged >= 1, "fused path never engaged — test is vacuous"
        _assert_streams_identical(ref, got)

    def test_stream_byte_identical_no_counts(self, fused_setup,
                                             monkeypatch):
        """Without the batch-mean cap the wire layout is label+ids only."""
        _requires_native()
        args, mi, vw = fused_setup
        ref, _ = _run_producer(args, mi, vw, B=2048, K=2, count_keys=None,
                               monkeypatch=monkeypatch, fused=False)
        got, engaged = _run_producer(args, mi, vw, B=2048, K=2,
                                     count_keys=None,
                                     monkeypatch=monkeypatch, fused=True)
        assert engaged >= 1
        _assert_streams_identical(ref, got)

    def test_holdout_region_stays_general(self, fused_setup, monkeypatch):
        """Batches past the train/holdout boundary must not pack (the
        general path ships them unpacked); the fused hook must decline
        them identically."""
        _requires_native()
        args, mi, vw = fused_setup
        kw = dict(B=2048, K=2, count_keys={"lr": 0},
                  cut_at=6000, holdout_after=6001)
        ref, _ = _run_producer(args, mi, vw, monkeypatch=monkeypatch,
                               fused=False, **kw)
        got, _ = _run_producer(args, mi, vw, monkeypatch=monkeypatch,
                               fused=True, **kw)
        _assert_streams_identical(ref, got)

    def test_importance_weights_bail(self, tmp_path, monkeypatch):
        """Non-unit importances break the all-ones precondition: the hook
        declines, outputs match the general path."""
        _requires_native()
        from fwumious_wabbit_tpu.config.cmdline import build_parser
        from fwumious_wabbit_tpu.config.model_instance import ModelInstance
        from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap

        with open(tmp_path / "vw_namespace_map.csv", "w") as f:
            f.write("A,animal\nB,food\n")
        rng = np.random.default_rng(3)
        data = tmp_path / "train.vw"
        with open(data, "w") as f:
            for _ in range(300):
                label = 1 if rng.integers(0, 2) else -1
                f.write(f"{label} 2.0 |A a{rng.integers(0, 5)} "
                        f"|B b{rng.integers(0, 5)}\n")
        argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
                "--power_t", "0.0", "--interactions", "AB",
                "--keep", "A", "--keep", "B"]
        args = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(args.data)
        mi = ModelInstance.from_cmdline(args, vw)
        ref, _ = _run_producer(args, mi, vw, B=64, K=2,
                               count_keys={"lr": 0},
                               monkeypatch=monkeypatch, fused=False)
        got, engaged = _run_producer(args, mi, vw, B=64, K=2,
                                     count_keys={"lr": 0},
                                     monkeypatch=monkeypatch, fused=True)
        assert engaged == 0
        _assert_streams_identical(ref, got)

    def test_cross_column_collisions_and_direct_overflow(self, tmp_path,
                                                         monkeypatch):
        """Engineered cross-column id collisions + a dictionary column
        overflowing to direct mid-stream: the fused path's per-slot
        counting must aggregate multiplicities ACROSS columns (the count
        key is the raw id) exactly like the general radix — including
        direct-vs-dictionary collisions (ab_extra) and multi-column
        dictionary ids (the Vocab id index)."""
        _requires_native()
        from fwumious_wabbit_tpu.config.cmdline import build_parser
        from fwumious_wabbit_tpu.config.model_instance import ModelInstance
        from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap

        (tmp_path / "vw_namespace_map.csv").write_text(
            "A,a\nB,b\nC,c\nD,d\nE,e\n")
        rng = np.random.default_rng(5)
        data = tmp_path / "train.vw"
        with open(data, "w") as f:
            for _ in range(30000):
                label = 1 if rng.integers(0, 2) else -1
                f.write(f"{label} |A a{rng.integers(0, 200)} "
                        f"|B b{rng.integers(0, 120)} "
                        f"|C c{rng.integers(0, 30)} "
                        f"|D d{rng.integers(0, 30)} "
                        f"|E e{rng.integers(0, 30)}\n")
        # b=18: the AB interaction (~24k uniques) overflows a 512-entry
        # dictionary cap to direct DURING batch 0, and its raw ids collide
        # with the dictionary columns' ids in the 2^18 hash space
        # (birthday: dozens of cross pairs per batch)
        argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
                "--power_t", "0.0", "--interactions", "AB",
                "--keep", "A", "--keep", "B", "--keep", "C",
                "--keep", "D", "--keep", "E"]
        args = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(args.data)
        mi = ModelInstance.from_cmdline(args, vw)
        ref, _ = _run_producer(args, mi, vw, B=2048, K=2,
                               count_keys={"lr": 0}, max_cap=512,
                               monkeypatch=monkeypatch, fused=False)
        got, engaged = _run_producer(args, mi, vw, B=2048, K=2,
                                     count_keys={"lr": 0}, max_cap=512,
                                     monkeypatch=monkeypatch, fused=True)
        assert engaged >= 1, "fused path never engaged — test is vacuous"
        _assert_streams_identical(ref, got)

    def test_ffm_schema_byte_identical(self, tmp_path, monkeypatch):
        """FFM columns through the fused sweep: padded-width ids (raw i32
        at the 4×25-bit no-saving width), uniform field-row broadcast,
        per-entry FFM multiplicity codes in their own key space — byte
        parity with the general path on the production FFM config."""
        _requires_native()
        from fwumious_wabbit_tpu.config.cmdline import build_parser
        from fwumious_wabbit_tpu.config.model_instance import ModelInstance
        from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap

        with open(tmp_path / "vw_namespace_map.csv", "w") as f:
            f.write("A,animal\nB,food\n")
        rng = np.random.default_rng(17)
        data = tmp_path / "train.vw"
        with open(data, "w") as f:
            for _ in range(10000):
                label = 1 if rng.integers(0, 2) else -1
                f.write(f"{label} |A a{rng.integers(0, 20)} "
                        f"|B b{rng.integers(0, 15)}\n")
        argv = ["--data", str(data), "-l", "0.1", "-b", "18", "--adaptive",
                "--power_t", "0.0", "--interactions", "AB",
                "--keep", "A", "--keep", "B",
                "--ffm_k", "4", "--ffm_bit_precision", "18",
                "--ffm_field", "A", "--ffm_field", "B"]
        args = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(args.data)
        mi = ModelInstance.from_cmdline(args, vw)
        for ck in ({"lr": 0, "ffm": 3}, {"ffm": 3}, None):
            ref, _ = _run_producer(args, mi, vw, B=2048, K=2,
                                   count_keys=ck,
                                   monkeypatch=monkeypatch, fused=False)
            got, engaged = _run_producer(args, mi, vw, B=2048, K=2,
                                         count_keys=ck,
                                         monkeypatch=monkeypatch, fused=True)
            assert engaged >= 1, f"fused never engaged for {ck}"
            _assert_streams_identical(ref, got)

    def test_chunk_size_invariance(self, fused_setup, monkeypatch):
        """Sub-batch remainders carry across translate blocks
        (fwn_carry_tail), so the emitted stream must be byte-identical
        whatever the input chunking — here 100 KB chunks (12+ blocks)
        versus one block for the whole file."""
        _requires_native()
        args, mi, vw = fused_setup
        monkeypatch.setenv("FWT_CHUNK_MB", "64")
        ref, _ = _run_producer(args, mi, vw, B=512, K=2,
                               count_keys={"lr": 0},
                               monkeypatch=monkeypatch, fused=True)
        monkeypatch.setenv("FWT_CHUNK_MB", "0.1")
        got, _ = _run_producer(args, mi, vw, B=512, K=2,
                               count_keys={"lr": 0},
                               monkeypatch=monkeypatch, fused=True)
        _assert_streams_identical(ref, got)
        # and the general path agrees under tiny chunks too
        got2, _ = _run_producer(args, mi, vw, B=512, K=2,
                                count_keys={"lr": 0},
                                monkeypatch=monkeypatch, fused=False)
        _assert_streams_identical(ref, got2)
