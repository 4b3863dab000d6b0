"""Native (C++) transform execution vs the Python transform pipeline.

All four families (Binner*, LogRatio, Weight, Combine), nested transforms,
and transformed namespaces in combos and FFM fields must produce identical
batches on both pipelines (the Python side carries the reference goldens,
reference: src/feature_transform_implementations.rs)."""

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.ingest.parser import VowpalParser
from fwumious_wabbit_tpu.ingest.translator import Batcher, FeatureTranslator
from fwumious_wabbit_tpu import native

pytestmark = pytest.mark.skipif(native.load() is None, reason="no native toolchain")

VW_CSV = "A,views,f32\nB,clicks,f32\nC,cat\nD,dog\n"


def setup(tmp_path, transforms, keeps, interactions=(), ffm=()):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / "d.vw"))
    argv = ["-b", "22", "--adaptive", "--data", "x"]
    for t in transforms:
        argv += ["--transform", t]
    for k in keeps:
        # one-char names use --keep; verbose (incl. transformed) use --linear
        argv += ["--keep" if len(k) == 1 else "--linear", k]
    for i in interactions:
        argv += ["--interactions", i]
    if ffm:
        argv += ["--ffm_k", "4"]
        for f in ffm:
            argv += ["--ffm_field_verbose", f]
    args = build_parser().parse_args(argv)
    mi = ModelInstance.from_cmdline(args, vw)
    return vw, mi


LINES = [
    b"1 |A 154 |B 3 |C red |D dox\n",
    b"-1 |A 5 |B 0 |C blue green |D doy\n",
    b"1 |A 0 |B 17.5 |C red\n",
    b"-1 |A 1000.25 |B 2 |D doz\n",
    b"1 |A NONE |B 1 |C c1 c2 c3 |D d1\n",
    b"-1 |A 7.3 |B 7.3 |C x\n",
]


def compare(vw, mi, lines):
    parser = VowpalParser(vw)
    ft = FeatureTranslator(mi)
    ni = native.NativeIngest(mi, vw, num_threads=2)
    n = ni.translate_block(b"".join(lines))
    assert n == len(lines)
    L, N = ni.widths()
    nb = ni.fill(n, n, max(L, 1), max(N, 1) if mi.ffm_k else 0)
    tes = [ft.translate(parser.parse_line(l)) for l in lines]
    pb = Batcher(n, lr_width_min=max(L, 1), ffm_width_min=max(N, 1)).make_batch(
        tes, pad_to_batch=False
    )
    np.testing.assert_array_equal(nb["lr_ids"][:, : pb.lr_ids.shape[1]], pb.lr_ids)
    np.testing.assert_allclose(
        nb["lr_vals"][:, : pb.lr_vals.shape[1]], pb.lr_vals, rtol=1e-6, atol=1e-7
    )
    if mi.ffm_k:
        np.testing.assert_array_equal(nb["ffm_ids"][:, : pb.ffm_ids.shape[1]], pb.ffm_ids)
        np.testing.assert_allclose(
            nb["ffm_vals"][:, : pb.ffm_vals.shape[1]], pb.ffm_vals, rtol=1e-6, atol=1e-7
        )


@pytest.mark.parametrize(
    "statement",
    [
        "vb=BinnerSqrt(views)(10.0,2.0)",
        "vb=BinnerSqrtPlain(views)(10.0,2.0)",
        "vb=BinnerLog(views)(1.0,3.0)",
        "vb=BinnerLogPlain(views)()",
        "vb=BinnerLogRatio(views,clicks)(1.0,40.0)",
        "vb=BinnerLogRatioPlain(views,clicks)()",
        "vb=Weight(cat)(0.5)",
        "vb=Combine(cat,dog)()",
    ],
)
def test_each_family_matches_python(tmp_path, statement):
    vw, mi = setup(tmp_path, [statement], keeps=["vb"])
    compare(vw, mi, LINES)


def test_nested_transforms_in_combo_and_ffm(tmp_path):
    vw, mi = setup(
        tmp_path,
        [
            "vb=BinnerSqrt(views)(10.0,2.0)",
            "w2=Weight(vb)(2.0)",
            "cmb=Combine(cat,vb)()",
        ],
        keeps=["w2", "cat"],
        interactions=(),
        ffm=["cmb", "dog"],
    )
    compare(vw, mi, LINES)


def test_transform_end_to_end_cli(tmp_path):
    """Full CLI run with --transform on both pipelines, identical output."""
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    data = tmp_path / "d.vw"
    data.write_bytes(b"".join(LINES * 30))
    from fwumious_wabbit_tpu.models.model import FwModel
    from fwumious_wabbit_tpu.train.loop import run_train_loop

    outs = []
    for extra, name in (([], "n.out"), (["--fwt_no_native"], "p.out")):
        argv = ["--transform", "vb=BinnerSqrt(views)(1.0,2.0)",
                "--linear", "vb", "--keep", "C", "-b", "20", "--adaptive",
                "-l", "0.1", "--data", str(data), "-p", str(tmp_path / name),
                "--fwt_batch_size", "32", *extra]
        args = build_parser().parse_args(argv)
        vw = VwNamespaceMap.from_dataset_dir(str(data))
        mi = ModelInstance.from_cmdline(args, vw)
        run_train_loop(args, mi, vw, FwModel(mi))
        outs.append((tmp_path / name).read_text())
    assert outs[0] == outs[1]
