"""Pack cache (train/pack_cache.py): the recorded superbatch stream must
replay byte-identically, reject stale/truncated files, and never publish
from an aborted run — mirroring the record cache's guarantees
(ingest/cache.py) one pipeline level up."""
import logging
from pathlib import Path

import numpy as np
import pytest

from tests.test_end_to_end import FLAGS, gen_dataset, run_cli


def _native_or_skip():
    from fwumious_wabbit_tpu import native

    if native.load() is None:
        pytest.skip("no native toolchain")


def _base(tmp_path):
    return FLAGS + ["--data", str(tmp_path / "train.vw"), "--save_resume",
                    "--fwt_superbatch", "3", "-c"]


def test_pack_cache_record_replay_identity(tmp_path, caplog):
    """-c run 1 records <input>.fwpack; run 2 replays it with byte-identical
    predictions and final model."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=5000, n_eval=10)
    base = _base(tmp_path)
    p1, m1 = tmp_path / "a.preds", tmp_path / "a.model"
    p2, m2 = tmp_path / "b.preds", tmp_path / "b.model"
    run_cli(base + ["-p", str(p1), "-f", str(m1)])
    fwpack = Path(str(tmp_path / "train.vw") + ".fwpack")
    assert fwpack.exists() and fwpack.stat().st_size > 0
    with caplog.at_level(logging.INFO):
        run_cli(base + ["-p", str(p2), "-f", str(m2)])
    assert any("using pack cache" in r.message for r in caplog.records)
    assert p1.read_bytes() == p2.read_bytes()
    assert m1.read_bytes() == m2.read_bytes()
    assert p1.stat().st_size > 0


def test_pack_cache_stale_signature_falls_back(tmp_path, caplog):
    """A config that shapes the stream differently (batch size) rejects the
    cache, falls back to the live producer, and re-records."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=4000, n_eval=10)
    base = _base(tmp_path)
    run_cli(base + ["-p", str(tmp_path / "a.preds")])
    fwpack = Path(str(tmp_path / "train.vw") + ".fwpack")
    mtime = fwpack.stat().st_mtime_ns
    other = [x if x != "256" else "512" for x in base]
    with caplog.at_level(logging.INFO):
        run_cli(other + ["-p", str(tmp_path / "b.preds")])
    assert not any("using pack cache" in r.message for r in caplog.records)
    assert fwpack.stat().st_mtime_ns != mtime  # re-recorded under new sig
    # and the original config now misses too (file carries the new sig)
    with caplog.at_level(logging.INFO):
        run_cli(base + ["-p", str(tmp_path / "c.preds")])
    assert (tmp_path / "a.preds").read_bytes() == \
        (tmp_path / "c.preds").read_bytes()


def test_pack_cache_source_change_invalidates(tmp_path, caplog):
    """Regenerating the dataset in place must invalidate the replay even
    when the config is unchanged (source identity rides the signature)."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=3000, n_eval=10)
    base = _base(tmp_path)
    run_cli(base + ["-p", str(tmp_path / "a.preds")])
    # different data, same path/config (and remove the record cache so the
    # new text actually gets parsed)
    gen_dataset(tmp_path, n_train=3000, n_eval=10, seed=9)
    Path(str(tmp_path / "train.vw") + ".fwcache").unlink()
    with caplog.at_level(logging.INFO):
        run_cli(base + ["-p", str(tmp_path / "b.preds")])
    assert not any("using pack cache" in r.message for r in caplog.records)
    assert (tmp_path / "a.preds").read_bytes() != \
        (tmp_path / "b.preds").read_bytes()


def test_pack_cache_truncated_rejected(tmp_path, caplog):
    """A file without the end marker (crashed writer) is rejected before
    anything is replayed."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=3000, n_eval=10)
    base = _base(tmp_path)
    run_cli(base + ["-p", str(tmp_path / "a.preds")])
    fwpack = Path(str(tmp_path / "train.vw") + ".fwpack")
    raw = fwpack.read_bytes()
    fwpack.write_bytes(raw[:-1])  # drop the end marker
    with caplog.at_level(logging.INFO):
        run_cli(base + ["-p", str(tmp_path / "b.preds")])
    assert not any("using pack cache" in r.message for r in caplog.records)
    assert (tmp_path / "a.preds").read_bytes() == \
        (tmp_path / "b.preds").read_bytes()
    from fwumious_wabbit_tpu.train.pack_cache import PACK_TRAILER

    assert fwpack.read_bytes().endswith(PACK_TRAILER)  # re-recorded cleanly


def test_pack_cache_abort_never_publishes(tmp_path):
    """An in-band command aborts the run (reference src/main.rs:218-221);
    the aborted stream must not publish a pack cache."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=2000, n_eval=10)
    train = tmp_path / "train.vw"
    lines = train.read_text().splitlines(keepends=True)
    lines.insert(len(lines) // 2, "flush\n")
    bad = tmp_path / "bad.vw"
    bad.write_text("".join(lines))
    from fwumious_wabbit_tpu.train.loop import main

    rc = main(FLAGS + ["--data", str(bad), "-c", "--fwt_superbatch", "3",
                       "-p", str(tmp_path / "a.preds")])
    assert rc != 0
    assert not Path(str(bad) + ".fwpack").exists()
    assert not Path(str(bad) + ".fwpack.writing").exists()


def test_pack_cache_on_without_dash_c(tmp_path, caplog):
    """--fwt_pack_cache on engages without -c (no record cache involved)."""
    _native_or_skip()
    gen_dataset(tmp_path, n_train=3000, n_eval=10)
    base = FLAGS + ["--data", str(tmp_path / "train.vw"),
                    "--fwt_superbatch", "3", "--fwt_pack_cache", "on"]
    run_cli(base + ["-p", str(tmp_path / "a.preds")])
    assert Path(str(tmp_path / "train.vw") + ".fwpack").exists()
    with caplog.at_level(logging.INFO):
        run_cli(base + ["-p", str(tmp_path / "b.preds")])
    assert any("using pack cache" in r.message for r in caplog.records)
    assert (tmp_path / "a.preds").read_bytes() == \
        (tmp_path / "b.preds").read_bytes()
    # default auto without -c: neither records nor replays
    (Path(str(tmp_path / "train.vw") + ".fwpack")).unlink()
    run_cli(FLAGS + ["--data", str(tmp_path / "train.vw"),
                     "--fwt_superbatch", "3",
                     "-p", str(tmp_path / "c.preds")])
    assert not Path(str(tmp_path / "train.vw") + ".fwpack").exists()


def test_pack_cache_layout_roundtrip():
    """PackedLayout JSON round-trip preserves the signature exactly —
    replayed groups must hit the memoized compiled step."""
    from fwumious_wabbit_tpu.train import pack_cache as pc
    from fwumious_wabbit_tpu.train import packed as packed_mod

    bd = {"label": np.zeros(8, np.uint8),
          "lr_ids": np.zeros((8, 3), np.int32)}
    lay = packed_mod.layout_of(
        bd, appends=(("lr_vals", 1.0),),
        bitpacks=(("lr_ids", 25, 2),),
        row_broadcasts=(("lr_combos", "|i1", (0, 1, -1), 8),),
        vocabs=(("lr_ids", (6, 25, 4), (0, -1, 64), 2),),
        count_tabs=(("lr_counts", "lr_ids"),))
    lay2 = pc._layout_from_json(pc._layout_to_json(lay))
    assert lay2.signature == lay.signature
    assert lay2 == lay
