"""C++ ingest engine vs the Python reference pipeline.

The native engine (fwumious_wabbit_tpu/native) must produce byte-identical
hashes, records and batch arrays to the Python parser+translator (which are
themselves golden-tested against the reference's src/parser.rs values)."""

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.hashing import murmur3_32 as py_murmur3
from fwumious_wabbit_tpu.ingest.parser import VowpalParser
from fwumious_wabbit_tpu.ingest.translator import Batcher, FeatureTranslator
from fwumious_wabbit_tpu import native

pytestmark = pytest.mark.skipif(native.load() is None, reason="no native toolchain")

VW_CSV = "A,animal\nB,food\nC,extra\nD,fval,f32\n"


def make_vw(tmp_path):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    return VwNamespaceMap.from_dataset_dir(str(tmp_path / "data.vw"))


def make_mi(vw, extra=()):
    args = build_parser().parse_args(
        ["--keep", "A", "--keep", "B", "--interactions", "AB",
         "--ffm_k", "4", "--ffm_field", "A", "--ffm_field", "BC",
         "-b", "22", "--adaptive", "--data", "x", *extra]
    )
    return ModelInstance.from_cmdline(args, vw)


LINES = [
    b"1 |A cat |B milk\n",
    b"-1 |A dog |B bone |C x1 x2 x3\n",
    b"1 0.5 |A horse |B hay:2.5\n",
    b"-1 |B stone\n",
    b"1 |A cow mouse |B grass:0.5 water\n",
    b"-1 2.0 |A:3 wolf |B meat\n",
    b"1 |D 1.25\n",
    b"-1 |A a |B b |C c |D 0.5\n",
    b"|A unlabeled |B thing\n",
]


def test_murmur3_matches():
    for s in [b"", b"a", b"ab", b"abc", b"abcd", b"abcde", b"namespace-value-123"]:
        for seed in (0, 1, 0xDEADBEEF, 2**31):
            assert native.murmur3_32(s, seed) == py_murmur3(s, seed)


def test_block_matches_python(tmp_path):
    vw = make_vw(tmp_path)
    mi = make_mi(vw)
    parser = VowpalParser(vw)
    ft = FeatureTranslator(mi)
    ni = native.NativeIngest(mi, vw, num_threads=3)

    n = ni.translate_block(b"".join(LINES))
    assert n == len(LINES)
    L, N = ni.widths()
    nb = ni.fill(n, n, L, N)

    tes = [ft.translate(parser.parse_line(line)) for line in LINES]
    pb = Batcher(n, lr_width_min=L, ffm_width_min=max(N, 1)).make_batch(
        tes, pad_to_batch=False
    )
    np.testing.assert_array_equal(nb["label"], pb.label)
    np.testing.assert_array_equal(nb["importance"], pb.importance)
    np.testing.assert_array_equal(nb["lr_ids"][:, : pb.lr_ids.shape[1]], pb.lr_ids)
    np.testing.assert_array_equal(nb["lr_vals"][:, : pb.lr_vals.shape[1]], pb.lr_vals)
    # combo/field padding: native uses -1 (one_hot-inert), python uses 0
    # with value 0 — compare only real slots
    real = pb.lr_vals != 0
    np.testing.assert_array_equal(
        np.where(real, nb["lr_combos"][:, : pb.lr_combos.shape[1]], 0),
        np.where(real, pb.lr_combos, 0))
    assert np.all(nb["lr_combos"][:, : pb.lr_combos.shape[1]][~real] == -1)
    np.testing.assert_array_equal(nb["ffm_ids"][:, : pb.ffm_ids.shape[1]], pb.ffm_ids)
    np.testing.assert_array_equal(nb["ffm_vals"][:, : pb.ffm_vals.shape[1]], pb.ffm_vals)
    realf = pb.ffm_vals != 0
    np.testing.assert_array_equal(
        np.where(realf, nb["ffm_fields"][:, : pb.ffm_fields.shape[1]], 0),
        np.where(realf, pb.ffm_fields, 0))


def test_records_match_python_parser(tmp_path):
    vw = make_vw(tmp_path)
    mi = make_mi(vw)
    parser = VowpalParser(vw)
    ni = native.NativeIngest(mi, vw, num_threads=1)
    ni.translate_block(b"".join(LINES))
    native_records = ni.records()
    python_records = np.concatenate([parser.parse_line(line) for line in LINES])
    np.testing.assert_array_equal(native_records, python_records)


def test_records_roundtrip(tmp_path):
    vw = make_vw(tmp_path)
    mi = make_mi(vw)
    ni = native.NativeIngest(mi, vw, num_threads=2)
    n = ni.translate_block(b"".join(LINES))
    recs = ni.records()
    L1, N1 = ni.widths()
    b1 = ni.fill(n, n, L1, N1)
    n2 = ni.translate_records(recs)
    assert n2 == n
    L2, N2 = ni.widths()
    assert (L1, N1) == (L2, N2)
    b2 = ni.fill(n2, n2, L2, N2)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])


def test_commands_abort_and_errors_raised(tmp_path):
    """In-band commands in file mode ABORT, matching the reference
    (src/main.rs:218-221); malformed lines raise their parse errors."""
    from fwumious_wabbit_tpu.ingest.parser import FlushCommand, HogwildLoadCommand

    vw = make_vw(tmp_path)
    mi = make_mi(vw)
    ni = native.NativeIngest(mi, vw, num_threads=1)
    with pytest.raises(FlushCommand):
        ni.translate_block(b"1 |A cat\nflush\n-1 |B milk\n")
    with pytest.raises(HogwildLoadCommand):
        ni.translate_block(b"hogwild_load /tmp/x.fwt\n")
    with pytest.raises(ValueError, match="not predeclared"):
        ni.translate_block(b"1 |Z nope\n")
    with pytest.raises(ValueError, match="Cannot parse"):
        ni.translate_block(b"garbage line\n")


def test_fuzz_against_python(tmp_path):
    rng = np.random.default_rng(7)
    vw = make_vw(tmp_path)
    mi = make_mi(vw)
    parser = VowpalParser(vw)
    ft = FeatureTranslator(mi)
    ni = native.NativeIngest(mi, vw, num_threads=4)

    words = ["cat", "dog", "a", "xy", "longfeaturename123", "Z-9"]
    lines = []
    for _ in range(500):
        parts = ["1" if rng.random() < 0.5 else "-1"]
        if rng.random() < 0.3:
            parts.append(f"{rng.uniform(0.1, 3.0):.2f}")
        for ns in "ABC":
            if rng.random() < 0.8:
                decl = f"|{ns}"
                if rng.random() < 0.2:
                    decl += f":{rng.uniform(0.5, 2.0):.2f}"
                parts.append(decl)
                for _ in range(rng.integers(1, 4)):
                    w = words[rng.integers(0, len(words))]
                    if rng.random() < 0.3:
                        w += f":{rng.uniform(0.1, 2.0):.2f}"
                    parts.append(w)
        if rng.random() < 0.5:
            parts.append("|D")
            parts.append(f"{rng.uniform(0.0, 9.0):.3f}")
        lines.append((" ".join(parts) + "\n").encode())

    n = ni.translate_block(b"".join(lines))
    assert n == len(lines)
    L, N = ni.widths()
    nb = ni.fill(n, n, L, N)
    tes = [ft.translate(parser.parse_line(line)) for line in lines]
    pb = Batcher(n, lr_width_min=L, ffm_width_min=max(N, 1)).make_batch(
        tes, pad_to_batch=False
    )
    np.testing.assert_array_equal(nb["lr_ids"][:, : pb.lr_ids.shape[1]], pb.lr_ids)
    np.testing.assert_allclose(nb["lr_vals"][:, : pb.lr_vals.shape[1]], pb.lr_vals, rtol=1e-6)
    np.testing.assert_array_equal(nb["ffm_ids"][:, : pb.ffm_ids.shape[1]], pb.ffm_ids)
    np.testing.assert_allclose(nb["ffm_vals"][:, : pb.ffm_vals.shape[1]], pb.ffm_vals, rtol=1e-6)


def test_native_multibyte_namespaces(tmp_path):
    """C++ parser must produce the Python parser's records for multi-char
    vw namespace names (reference golden: src/parser.rs:1018-1062)."""
    (tmp_path / "vw_namespace_map.csv").write_text(
        "AA,featureA\nBB,featureB\nCC,featureC\n")
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / "data.vw"))
    args = build_parser().parse_args(
        ["--linear", "featureA", "--linear", "featureB",
         "-b", "18", "--adaptive", "--data", "x"])
    mi = ModelInstance.from_cmdline(args, vw)
    lines = [b"1 |AA a\n", b"1 |AA:3 a:2.0\n", b"-1 |BB b |CC c:0.5\n",
             b"|AA a b c\n"]
    parser = VowpalParser(vw)
    ni = native.NativeIngest(mi, vw, num_threads=1)
    ni.translate_block(b"".join(lines))
    np.testing.assert_array_equal(
        ni.records(),
        np.concatenate([parser.parse_line(l) for l in lines]))
