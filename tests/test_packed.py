"""Superbatch packing (train/packed.py): the packed path must be
trajectory-identical to per-batch stepping — same predictions, same final
weights — since it runs the same step body over the same batches, only
batched into one transfer + one scanned dispatch."""

import numpy as np
import pytest

import jax

from tests.test_end_to_end import FLAGS, gen_dataset, run_cli


def test_pack_unpack_roundtrip():
    from fwumious_wabbit_tpu.train import packed

    rng = np.random.default_rng(0)
    bd = {
        "label": rng.integers(0, 2, 64).astype(np.uint8),
        "lr_ids": rng.integers(0, 1 << 25, (64, 5)).astype(np.int32),
        "lr_vals": rng.normal(size=(64, 5)).astype(np.float32),
        "lr_combos": rng.integers(-1, 4, (64, 5)).astype(np.int8),
        "idx16": rng.integers(0, 1 << 16, (64, 2)).astype(np.uint16),
    }
    lay = packed.layout_of(bd)
    assert lay is not None
    bd2 = {k: (v + 1 if v.dtype != np.uint8 else v) for k, v in bd.items()}
    buf = packed.pack(lay, [bd, bd2])
    assert buf.shape == (2, lay.words)

    out0 = jax.jit(lambda r: packed.unpack_row(r, lay))(buf[0])
    for k, v in bd.items():
        got = np.asarray(out0[k])
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got, v, err_msg=k)
    out1 = jax.jit(lambda r: packed.unpack_row(r, lay))(buf[1])
    for k, v in bd2.items():
        np.testing.assert_array_equal(np.asarray(out1[k]), v, err_msg=k)


def test_layout_rejects_unpackable():
    from fwumious_wabbit_tpu.train import packed

    assert packed.layout_of({"a": np.zeros(3, np.uint8)}) is None  # 3 bytes
    assert packed.layout_of({"a": np.zeros(4, np.float64)}) is None


@pytest.mark.parametrize("extra", [[], ["--holdout_after", "2900"]])
def test_packed_equals_unpacked_end_to_end(tmp_path, extra):
    """--fwt_superbatch 3 vs 1 on the same data: byte-identical predictions
    and final model files (including across a train/holdout boundary, where
    groups must not span the cut)."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=4000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume"]
    p1, m1 = tmp_path / "a.preds", tmp_path / "a.model"
    p3, m3 = tmp_path / "b.preds", tmp_path / "b.model"
    run_cli(base + extra + ["-p", str(p1), "-f", str(m1),
                            "--fwt_superbatch", "1"])
    run_cli(base + extra + ["-p", str(p3), "-f", str(m3),
                            "--fwt_superbatch", "3"])
    assert p1.read_text() == p3.read_text()
    assert p1.stat().st_size > 0
    assert m1.read_bytes() == m3.read_bytes()


def test_strip_constant_columns_roundtrip():
    """Elided constant columns must be re-synthesized exactly on unpack."""
    from fwumious_wabbit_tpu.train import packed

    B, L = 64, 5
    rng = np.random.default_rng(0)
    const_id = (packed.CONSTANT_HASH & ((1 << 18) - 1)) | (3 << 18)
    bd = {
        "label": rng.integers(0, 2, B).astype(np.uint8),
        "lr_ids": np.concatenate(
            [rng.integers(0, 1 << 18, (B, L - 1)).astype(np.int32),
             np.full((B, 1), const_id, np.int32)], axis=1),
        "lr_counts": np.concatenate(
            [rng.integers(1, 5, (B, L - 1)).astype(np.uint8),
             np.full((B, 1), 64, np.uint8)], axis=1),
    }
    slim, appends = packed.strip_constant_columns(bd, (1 << 18) - 1)
    assert appends == (("lr_ids", const_id), ("lr_counts", 64))
    assert slim["lr_ids"].shape == (B, L - 1)
    lay = packed.layout_of(slim, appends)
    buf = packed.pack(lay, [slim])
    out = jax.jit(lambda r: packed.unpack_row(r, lay))(buf[0])
    np.testing.assert_array_equal(np.asarray(out["lr_ids"]), bd["lr_ids"])
    np.testing.assert_array_equal(np.asarray(out["lr_counts"]), bd["lr_counts"])

    # non-uniform last column: must ship unchanged
    bd2 = dict(bd)
    bd2["lr_ids"] = bd["lr_ids"].copy()
    bd2["lr_ids"][3, -1] ^= 1
    same, ap2 = packed.strip_constant_columns(bd2, (1 << 18) - 1)
    assert ap2 == () and same["lr_ids"].shape == (B, L)


def test_packed_equals_unpacked_with_constant_feature(tmp_path):
    """Same trajectory check but WITH the constant feature (the elision
    path engages; --noconstant is absent)."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=3000, n_eval=10)
    flags = [f for f in FLAGS if f != "--noconstant"]
    base = flags + ["--data", str(tmp_path / "train.vw"), "--save_resume"]
    p1, m1 = tmp_path / "a.preds", tmp_path / "a.model"
    p3, m3 = tmp_path / "b.preds", tmp_path / "b.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1), "--fwt_superbatch", "1"])
    run_cli(base + ["-p", str(p3), "-f", str(m3), "--fwt_superbatch", "3"])
    assert p1.read_text() == p3.read_text()
    assert m1.read_bytes() == m3.read_bytes()

@pytest.mark.parametrize("mflag", ["1", "2", "4", "7"])
def test_fetch_stack_identical_predictions(tmp_path, mflag):
    """--fwt_fetch_stack M (device prediction ring) vs the per-step fetch
    path: byte-identical predictions, including a short tail flush where
    only the written ring slots are consumed — the ring only changes D2H
    plumbing, never the written stream."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=5000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "3"]
    p1, m1 = tmp_path / "a.preds", tmp_path / "a.model"
    p2, m2 = tmp_path / "b.preds", tmp_path / "b.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1), "--fwt_fetch_stack", "1"])
    run_cli(base + ["-p", str(p2), "-f", str(m2),
                    "--fwt_fetch_stack", mflag])
    assert p1.read_text() == p2.read_text()
    assert p1.stat().st_size > 0
    assert m1.read_bytes() == m2.read_bytes()


def test_fetch_stack_auto_engages_identical(tmp_path, monkeypatch):
    """auto mode (--fwt_fetch_stack 0): a slow fetch flips the consumer to
    the ring MID-RUN. Forced here via FWT_RING_AUTO_MS=-1 (every fetch
    counts as slow); the written predictions and model must be identical
    to the never-ring run."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=5000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "3"]
    p1, m1 = tmp_path / "a.preds", tmp_path / "a.model"
    p2, m2 = tmp_path / "b.preds", tmp_path / "b.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1), "--fwt_fetch_stack", "1"])
    monkeypatch.setenv("FWT_RING_AUTO_MS", "-1")
    run_cli(base + ["-p", str(p2), "-f", str(m2)])  # default 0 = auto
    assert p1.read_text() == p2.read_text()
    assert m1.read_bytes() == m2.read_bytes()


def test_fetch_stack_with_predictions_after(tmp_path):
    """predictions_after slicing applies per stacked segment, not per fetch."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=4000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"),
                    "--predictions_after", "1500", "--fwt_superbatch", "3"]
    p1 = tmp_path / "a.preds"
    p2 = tmp_path / "b.preds"
    run_cli(base + ["-p", str(p1), "--fwt_fetch_stack", "1"])
    run_cli(base + ["-p", str(p2), "--fwt_fetch_stack", "4"])
    assert p1.read_text() == p2.read_text()
    assert len(p1.read_text().splitlines()) == 4000 - 1500


def test_bitpack_roundtrip_unit():
    """bitpack_ids → pack → unpack_row restores the exact id column for
    widths that straddle word boundaries, including 0-padding entries."""
    import jax
    import numpy as np
    from fwumious_wabbit_tpu.train import packed as packed_mod

    rng = np.random.default_rng(0)
    for bits, W, B in [(27, 13, 64), (22, 4, 32), (25, 5, 16), (31, 33, 8)]:
        ids = rng.integers(0, 1 << bits, (B, W)).astype(np.int32)
        ids[rng.random((B, W)) < 0.2] = 0  # padding entries
        bd = {"lr_ids": ids.copy(),
              "label": rng.integers(0, 2, B).astype(np.uint8)}
        nb, bitpacks = packed_mod.bitpack_ids(bd, "lr_ids", bits)
        assert bitpacks == (("lr_ids", bits, W),)
        assert nb["lr_ids"].shape[1] < W  # it actually shrank
        lay = packed_mod.layout_of(nb, (), bitpacks)
        buf = packed_mod.pack(lay, [nb])
        out = jax.jit(lambda r: packed_mod.unpack_row(r, lay))(buf[0])
        assert np.array_equal(np.asarray(out["lr_ids"]), ids), (bits, W)
        assert np.array_equal(np.asarray(out["label"]), bd["label"])


def test_bitpack_guards():
    """Overflowing ids, non-shrinking widths, and negative values ship
    unpacked instead of corrupting."""
    import numpy as np
    from fwumious_wabbit_tpu.train import packed as packed_mod

    ids = np.full((4, 3), 1 << 20, np.int32)
    _, bp = packed_mod.bitpack_ids({"lr_ids": ids}, "lr_ids", 20)
    assert bp == ()  # 2^20 needs 21 bits
    _, bp = packed_mod.bitpack_ids({"lr_ids": -ids}, "lr_ids", 27)
    assert bp == ()  # negative
    _, bp = packed_mod.bitpack_ids(
        {"lr_ids": np.ones((4, 1), np.int32)}, "lr_ids", 27)
    assert bp == ()  # 1 column cannot shrink


def test_bitpack_on_off_identical_with_ffm(tmp_path):
    """--fwt_bitpack on vs off over an FFM config (both lr and ffm id
    columns packed): byte-identical predictions and models."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=5000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "3"]
    p1, m1 = tmp_path / "on.preds", tmp_path / "on.model"
    p2, m2 = tmp_path / "off.preds", tmp_path / "off.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1), "--fwt_bitpack", "on"])
    run_cli(base + ["-p", str(p2), "-f", str(m2), "--fwt_bitpack", "off"])
    assert p1.read_text() == p2.read_text()
    assert p1.stat().st_size > 0
    assert m1.read_bytes() == m2.read_bytes()


def test_strip_uniform_rows_roundtrip():
    """Row-identical columns (fixed-width schema field/combo indices) are
    elided and re-broadcast device-side; non-uniform columns ship as-is."""
    import jax
    import numpy as np
    from fwumious_wabbit_tpu.train import packed as packed_mod

    rng = np.random.default_rng(3)
    B = 32
    fields = np.tile(np.array([0, 0, 1, 1, -1], np.int8), (B, 1))
    bd = {"ffm_fields": fields.copy(),
          "ffm_ids": rng.integers(0, 1 << 20, (B, 5)).astype(np.int32)}
    nb, rb = packed_mod.strip_uniform_rows(bd, "ffm_fields")
    assert "ffm_fields" not in nb
    assert rb == (("ffm_fields", "|i1", (0, 0, 1, 1, -1), B),)
    lay = packed_mod.layout_of(nb, (), (), rb)
    buf = packed_mod.pack(lay, [nb])
    out = jax.jit(lambda r: packed_mod.unpack_row(r, lay))(buf[0])
    assert np.array_equal(np.asarray(out["ffm_fields"]), fields)
    assert np.array_equal(np.asarray(out["ffm_ids"]), bd["ffm_ids"])

    # non-uniform: ships unchanged
    fields[3, 1] = 2
    bd2 = {"ffm_fields": fields}
    nb2, rb2 = packed_mod.strip_uniform_rows(bd2, "ffm_fields")
    assert rb2 == () and "ffm_fields" in nb2

def test_unpack_uniform_combos_roundtrip():
    """Fixed-width schemas: combo bits leave the ids for a zero-byte row
    broadcast (ids bit-pack at bit_precision, not bit_precision+combo), the
    multiplicity-count column elides as a uniform row, and unpack_row
    restores everything exactly — including the constant feature's combo
    joining the broadcast row and its re-appended id shedding combo bits."""
    import jax
    import numpy as np
    from fwumious_wabbit_tpu.train import packed as packed_mod

    class MI:
        bit_precision = 25
        lr_hash_mask = (1 << 25) - 1
        num_combos = 13
        ffm_k = 0

    B, W = 64, 14
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 1 << 25, (B, W)).astype(np.int32)
    combos = np.broadcast_to(np.arange(W, dtype=np.int32), (B, W))
    ids = (raw | ((combos + 1) << 25)).astype(np.int32)
    const_id = (packed_mod.CONSTANT_HASH & MI.lr_hash_mask) | (W << 25)
    ids[:, -1] = const_id
    counts = np.full((B, W), 120, np.uint8)
    bd = {"label": rng.integers(0, 2, B).astype(np.uint8),
          "lr_ids": ids, "lr_counts": counts}
    slim, ap, bp, rb, vc, _ct, _bc = packed_mod.prepare_for_transfer(bd, MI)
    assert vc == ()
    assert bp == (("lr_ids", 25, W - 1),)  # constant elided, 25-bit pack
    assert dict((r[0], r) for r in rb).keys() == {"lr_combos", "lr_counts"}
    assert ap == (("lr_ids", packed_mod.CONSTANT_HASH & MI.lr_hash_mask),
                  ("lr_counts", 120))
    payload = sum(v.nbytes for v in slim.values()) / B
    assert payload == 44.125  # 11 u32 id words + 1 label BIT
    assert _bc == (("label", B),)

    lay = packed_mod.layout_of(slim, ap, bp, rb, bit_cols=_bc)
    out = jax.jit(lambda r: packed_mod.unpack_row(r, lay))(
        packed_mod.pack(lay, [slim])[0])
    np.testing.assert_array_equal(np.asarray(out["lr_ids"]),
                                  ids & MI.lr_hash_mask)
    np.testing.assert_array_equal(np.asarray(out["lr_combos"]), combos)
    np.testing.assert_array_equal(np.asarray(out["lr_counts"]), counts)
    np.testing.assert_array_equal(np.asarray(out["label"]), bd["label"])

    # one example with a different combo layout: ids stay combo-packed
    ids2 = ids.copy()
    ids2[3, 0] = (ids2[3, 0] & MI.lr_hash_mask) | (6 << 25)
    slim2, ap2, bp2, rb2, _vc2, _ct2b, _bc2b = packed_mod.prepare_for_transfer(
        {"label": bd["label"], "lr_ids": ids2, "lr_counts": counts}, MI)
    assert bp2 == (("lr_ids", 29, W - 1),)
    assert "lr_combos" not in dict((r[0], r) for r in rb2)
    lay2 = packed_mod.layout_of(slim2, ap2, bp2, rb2, bit_cols=_bc2b)
    out2 = jax.jit(lambda r: packed_mod.unpack_row(r, lay2))(
        packed_mod.pack(lay2, [slim2])[0])
    assert "lr_combos" not in out2
    np.testing.assert_array_equal(np.asarray(out2["lr_ids"]), ids2)

    # non-uniform counts ship unchanged
    counts3 = counts.copy()
    counts3[5, 2] = 64
    slim3, _ap3, _bp3, rb3, _vc3, _ct3, _bc3 = packed_mod.prepare_for_transfer(
        {"label": bd["label"], "lr_ids": ids, "lr_counts": counts3}, MI)
    assert "lr_counts" in slim3
    assert "lr_counts" not in dict((r[0], r) for r in rb3)


def test_vocab_encoded_transfer_roundtrip():
    """Dictionary-encoded ids: low-cardinality columns ship narrow
    dictionary indices resolved on device against the vocabulary snapshot;
    a column overflowing max_cap degrades to direct raw ids; unpack_row
    restores the exact original ids. Persistent across batches: the second
    batch reuses indices with no new snapshot needed."""
    import jax
    import numpy as np
    from fwumious_wabbit_tpu import native
    from fwumious_wabbit_tpu.train import packed as packed_mod

    if native.load() is None:
        pytest.skip("no native toolchain")

    class MI:
        bit_precision = 25
        lr_hash_mask = (1 << 25) - 1
        num_combos = 3
        ffm_k = 0

    B, W = 512, 4
    rng = np.random.default_rng(11)
    vocab_a = rng.integers(0, 1 << 25, 40).astype(np.int32)   # 40 uniques
    vocab_b = rng.integers(0, 1 << 25, 1000).astype(np.int32)
    state = packed_mod.VocabTransferState(max_cap=256)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        ids = np.stack([
            vocab_a[r.integers(0, 40, B)],
            vocab_b[r.integers(0, 1000, B)],        # overflows cap 256
            r.integers(0, 1 << 25, B).astype(np.int32),  # high-cardinality
            np.full(B, 12345, np.int32),
        ], axis=1)
        combos = np.broadcast_to(np.arange(W, dtype=np.int32), (B, W))
        packed_ids = (ids | ((combos + 1) << 25)).astype(np.int32)
        return ids, {"label": r.integers(0, 2, B).astype(np.uint8),
                     "lr_ids": packed_ids}

    ids1, bd1 = make_batch(1)
    slim, ap, bp, rb, vc, _ct, _bc = packed_mod.prepare_for_transfer(
        bd1, MI, vocab_state=state)
    assert len(vc) == 1
    _key, widths, bases, n_rows = vc[0]
    assert bases[1] == -1 and bases[2] == -1  # overflowed / high-card → direct
    assert bases[0] >= 0 and bases[3] >= 0
    assert widths[1] == widths[2] == 25
    assert widths[0] == 6  # 40 uniques → 6 bits (even-rounded)
    assert widths[3] == 4  # 1 unique → floor width
    assert state.venc.dirty
    snap = packed_mod.export_vocab(state.venc, vc[0])
    state.venc.clear_dirty()
    assert snap.shape == (n_rows, 128) and snap.dtype == np.int32

    lay = packed_mod.layout_of(slim, ap, bp, rb, vc, bit_cols=_bc)
    vocab_dev = jax.device_put(snap)
    out = jax.jit(lambda r, v: packed_mod.unpack_row(r, lay, v))(
        packed_mod.pack(lay, [slim])[0], vocab_dev)
    np.testing.assert_array_equal(np.asarray(out["lr_ids"]), ids1)
    np.testing.assert_array_equal(
        np.asarray(out["lr_combos"]),
        np.broadcast_to(np.arange(W, dtype=np.int32), (B, W)))

    # second batch: same dictionaries, indices resolve against the SAME
    # snapshot (only genuinely new entries re-dirty the state)
    ids2, bd2 = make_batch(2)
    slim2, ap2, bp2, rb2, vc2, _ct2, _bc2 = packed_mod.prepare_for_transfer(
        bd2, MI, vocab_state=state)
    assert vc2 == vc  # stable signature
    assert not state.venc.dirty  # col0 fully seen, others direct
    lay2 = packed_mod.layout_of(slim2, ap2, bp2, rb2, vc2, bit_cols=_bc2)
    out2 = jax.jit(lambda r, v: packed_mod.unpack_row(r, lay2, v))(
        packed_mod.pack(lay2, [slim2])[0], vocab_dev)
    np.testing.assert_array_equal(np.asarray(out2["lr_ids"]), ids2)
    state.close()


def test_count_table_roundtrip():
    """Shadow-table counts: for dictionary columns the per-entry
    multiplicity code is a function of (column, index) within a batch, so
    it ships once per vocab slot as a u8 table; direct columns keep a
    narrowed per-entry array. unpack_row restores exact [B, W] counts.
    Uniform-count batches bail out (broadcast elision is cheaper)."""
    import jax
    import numpy as np
    from fwumious_wabbit_tpu import native
    from fwumious_wabbit_tpu.train import packed as packed_mod

    if native.load() is None:
        pytest.skip("no native toolchain")

    class MI:
        bit_precision = 25
        lr_hash_mask = (1 << 25) - 1
        num_combos = 3
        ffm_k = 0

    B, W = 512, 4
    rng = np.random.default_rng(7)
    vocab_a = rng.integers(0, 1 << 25, 40).astype(np.int32)
    vocab_b = rng.integers(0, 1 << 25, 90).astype(np.int32)

    def code_of(ids):  # deterministic id→multiplicity stand-in
        return ((ids % 200) + 1).astype(np.uint8)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        ids = np.stack([
            vocab_a[r.integers(0, 40, B)],
            vocab_b[r.integers(0, 90, B)],
            r.integers(0, 1 << 25, B).astype(np.int32),  # direct
            np.full(B, 999, np.int32),
        ], axis=1)
        combos = np.broadcast_to(np.arange(W, dtype=np.int32), (B, W))
        packed_ids = (ids | ((combos + 1) << 25)).astype(np.int32)
        return ids, {"label": r.integers(0, 2, B).astype(np.uint8),
                     "lr_ids": packed_ids, "lr_counts": code_of(ids)}

    state = packed_mod.VocabTransferState(max_cap=256)
    ids1, bd1 = make_batch(1)
    counts1 = bd1["lr_counts"].copy()
    slim, ap, bp, rb, vc, ct, _bc = packed_mod.prepare_for_transfer(
        bd1, MI, vocab_state=state)
    _key, widths, bases, n_rows = vc[0]
    assert ct[0][:2] == ("lr_counts", "lr_ids")
    # small vocabs: packed tab bases coincide with the snapshot bases
    assert ct[0][2] == bases
    n_direct = sum(1 for b in bases if b < 0)
    assert n_direct == 1  # only the high-cardinality column is direct
    assert slim["lr_counts"].shape == (B, n_direct)
    assert slim["lr_counts_tab"].shape == (n_rows * 128,)
    snap = packed_mod.export_vocab(state.venc, vc[0])
    lay = packed_mod.layout_of(slim, ap, bp, rb, vc, ct, _bc)
    out = jax.jit(lambda r, v: packed_mod.unpack_row(r, lay, v))(
        packed_mod.pack(lay, [slim])[0], jax.device_put(snap))
    np.testing.assert_array_equal(np.asarray(out["lr_ids"]), ids1)
    np.testing.assert_array_equal(np.asarray(out["lr_counts"]), counts1)
    assert np.asarray(out["lr_counts"]).dtype == np.uint8

    # tab bytes beat per-entry bytes on this shape
    assert slim["lr_counts_tab"].size + B * n_direct < B * W

    # uniform counts: table path declines, broadcast elision takes over
    _ids_u, bd_u = make_batch(3)
    bd_u["lr_counts"] = np.full((B, W), 5, np.uint8)
    slim_u, _ap, _bp, rb_u, _vc, ct_u, _bcu = packed_mod.prepare_for_transfer(
        bd_u, MI, vocab_state=state)
    assert ct_u == ()
    assert "lr_counts" not in slim_u
    assert any(r[0] == "lr_counts" for r in rb_u)

    # a value column blocks the encoding (zero-valued entries carry code
    # 0 regardless of id)
    _ids_v, bd_v = make_batch(4)
    bd_v["lr_vals"] = np.ones((B, W), np.float32)
    slim_v, *_rest_v, ct_v, _bc_v = packed_mod.prepare_for_transfer(
        bd_v, MI, vocab_state=state)
    assert ct_v == ()
    assert slim_v["lr_counts"].shape == (B, W)
    state.close()


def test_vocab_on_off_identical(tmp_path):
    """--fwt_vocab on vs off over the superbatch path: byte-identical
    predictions and models (the dictionary encoding is pure transfer
    plumbing — ids decode exactly on device)."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=5000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "3"]
    p1, m1 = tmp_path / "on.preds", tmp_path / "on.model"
    p2, m2 = tmp_path / "off.preds", tmp_path / "off.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1), "--fwt_vocab", "on"])
    run_cli(base + ["-p", str(p2), "-f", str(m2), "--fwt_vocab", "off"])
    assert p1.read_text() == p2.read_text()
    assert p1.stat().st_size > 0
    assert m1.read_bytes() == m2.read_bytes()


def test_bitpack_labels_unit():
    """1-bit label packing: exact roundtrip through pack/unpack_row, and
    the guards (non-binary values, 255 NO_LABEL sentinel, odd sizes) all
    refuse."""
    from fwumious_wabbit_tpu.train import packed as packed_mod

    rng = np.random.default_rng(3)
    lab = rng.integers(0, 2, 96).astype(np.uint8)
    slim, bc = packed_mod.bitpack_labels({"label": lab})
    assert bc == (("label", 96),)
    assert slim["label"].dtype == np.uint32 and slim["label"].size == 3
    lay = packed_mod.layout_of(slim, bit_cols=bc)
    out = jax.jit(lambda r: packed_mod.unpack_row(r, lay))(
        packed_mod.pack(lay, [slim])[0])
    got = np.asarray(out["label"])
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, lab)

    # guards
    sent = lab.copy()
    sent[5] = 255  # NO_LABEL sentinel: must ship unpacked
    assert packed_mod.bitpack_labels({"label": sent})[1] == ()
    assert packed_mod.bitpack_labels(
        {"label": lab[:33]})[1] == ()  # not 32-divisible
    assert packed_mod.bitpack_labels(
        {"label": lab.astype(np.int32)})[1] == ()  # wrong dtype
    assert packed_mod.bitpack_labels({})[1] == ()


def test_adaptive_vocab_flip_identical(tmp_path, monkeypatch):
    """Adaptive vocab (--fwt_vocab auto): the producer may disable the
    dictionary encode mid-run when it is the pipeline floor. Forced here
    via FWT_VOCAB_FLIP=force (flip at the first full superbatch); the
    written predictions and model must be byte-identical to both the
    never-flip and the never-vocab runs (the encode is pure transfer
    compression)."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")

    gen_dataset(tmp_path, n_train=6000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "2", "--fwt_batch_size", "512",
                    "--fwt_pack_cache", "off"]
    outs = {}
    for name, extra, env in [
        ("vocab", ["--fwt_vocab", "on"], None),
        ("plain", ["--fwt_vocab", "off"], None),
        ("flip", [], "force"),
    ]:
        if env is not None:
            monkeypatch.setenv("FWT_VOCAB_FLIP", env)
        else:
            monkeypatch.delenv("FWT_VOCAB_FLIP", raising=False)
        p, m = tmp_path / f"{name}.preds", tmp_path / f"{name}.model"
        run_cli(base + extra + ["-p", str(p), "-f", str(m)])
        outs[name] = (p.read_text(), m.read_bytes())
    assert outs["vocab"][0] == outs["plain"][0] == outs["flip"][0]
    assert outs["vocab"][1] == outs["plain"][1] == outs["flip"][1]
    assert len(outs["flip"][0]) > 0


def test_export_col_capped_after_growth():
    """The dictionary may grow past a layout's snapshot region between
    layout and export (the producer encodes batch N+1 before flushing
    group N). export_col must clamp its WRITE to cap — r4 regression:
    an uncapped memcpy overflowed the numpy buffer and corrupted the
    heap when a padded partial batch polluted the dictionaries ahead of
    the pending group's snapshot export."""
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")
    venc = native.VocabEncoder(4, 1 << 14)
    ids = np.arange(100, dtype=np.int32).reshape(-1, 1) * 7 + 3
    res = venc.encode2(ids, 0, (1 << 25) - 1)
    assert res is not None
    cap = 16  # a region sized well below the dictionary's 100 entries
    col = venc.export_col(0, cap)
    assert len(col) == cap
    np.testing.assert_array_equal(col, ids.reshape(-1)[:cap])
    venc.close()
