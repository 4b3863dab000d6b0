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
