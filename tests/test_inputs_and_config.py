"""Compressed inputs, hyperparameter override on load, vwcompat validation."""

import gzip

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.persistence import model_file
from fwumious_wabbit_tpu.train.loop import run_train_loop

VW_CSV = "A,animal\nB,food\n"
LINES = b"".join(
    f"{1 if i % 2 else -1} |A a{i % 7} |B b{i % 5}\n".encode() for i in range(200)
)


def run_cli(tmp_path, data_name, pred_name, extra=()):
    argv = ["--keep", "A", "--keep", "B", "-b", "18", "--adaptive", "-l", "0.1",
            "--data", str(tmp_path / data_name), "-p", str(tmp_path / pred_name),
            "--fwt_batch_size", "64", *extra]
    args = build_parser().parse_args(argv)
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / data_name))
    mi = ModelInstance.from_cmdline(args, vw)
    model = FwModel(mi)
    run_train_loop(args, mi, vw, model)
    return (tmp_path / pred_name).read_text()


def test_gz_and_zst_inputs_match_plain(tmp_path):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    (tmp_path / "d.vw").write_bytes(LINES)
    with gzip.open(tmp_path / "d.vw.gz", "wb") as f:
        f.write(LINES)
    import zstandard

    (tmp_path / "d.vw.zst").write_bytes(zstandard.ZstdCompressor().compress(LINES))

    plain = run_cli(tmp_path, "d.vw", "plain.out")
    gz = run_cli(tmp_path, "d.vw.gz", "gz.out")
    zst = run_cli(tmp_path, "d.vw.zst", "zst.out")
    assert plain == gz == zst
    assert len(plain.splitlines()) == 200


def test_hyperparameter_override_on_load(tmp_path):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / "d.vw"))
    args = build_parser().parse_args(
        ["--keep", "A", "-b", "18", "--adaptive", "-l", "0.3", "--power_t", "0.4",
         "--data", "x"]
    )
    mi = ModelInstance.from_cmdline(args, vw)
    model = FwModel(mi)
    model_file.save_model(tmp_path / "m.fwt", mi, vw, model, model.init_params())

    # load with overrides (the whitelist: learning rates + power_t pairs)
    args2 = build_parser().parse_args(
        ["-l", "0.9", "--power_t", "0.1", "--data", "x", "-i", str(tmp_path / "m.fwt")]
    )
    mi2, _, _, _ = model_file.load_model(tmp_path / "m.fwt", args=args2)
    assert mi2.learning_rate == pytest.approx(0.9)
    assert mi2.power_t == pytest.approx(0.1)

    # load without flags keeps the stored values
    args3 = build_parser().parse_args(["--data", "x", "-i", str(tmp_path / "m.fwt")])
    mi3, _, _, _ = model_file.load_model(tmp_path / "m.fwt", args=args3)
    assert mi3.learning_rate == pytest.approx(0.3)
    assert mi3.power_t == pytest.approx(0.4)


def test_vwcompat_validation(tmp_path):
    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    vw = VwNamespaceMap.from_dataset_dir(str(tmp_path / "d.vw"))
    # missing --keep
    args = build_parser().parse_args(
        ["--vwcompat", "--hash", "all", "--sgd", "--adaptive", "--link", "logistic",
         "--loss_function", "logistic", "--noconstant", "--data", "x"])
    with pytest.raises(ValueError, match="keep"):
        ModelInstance.from_cmdline(args, vw)
    # missing --hash all
    args = build_parser().parse_args(
        ["--vwcompat", "--keep", "A", "--sgd", "--adaptive", "--data", "x"])
    with pytest.raises(ValueError, match="hash all"):
        ModelInstance.from_cmdline(args, vw)


def test_quantized_convert_cli_roundtrip(tmp_path):
    """--convert_inference_regressor --weight_quantization through the CLI
    main(), then serve predictions from the quantized model (close to full)."""
    from fwumious_wabbit_tpu.train.loop import main as cli_main

    (tmp_path / "vw_namespace_map.csv").write_text(VW_CSV)
    data = tmp_path / "d.vw"
    data.write_bytes(LINES)
    common = ["--keep", "A", "--keep", "B", "--ffm_k", "4",
              "--ffm_field", "A", "--ffm_field", "B",
              "-b", "18", "--adaptive", "-l", "0.1", "--fwt_batch_size", "64"]
    assert cli_main(common + ["--data", str(data), "-f", str(tmp_path / "full.fwt"),
                              "--save_resume"]) == 0
    assert cli_main(common + ["-i", str(tmp_path / "full.fwt"),
                              "--convert_inference_regressor", str(tmp_path / "q.fwt"),
                              "--weight_quantization"]) == 0
    assert (tmp_path / "q.fwt").stat().st_size < (tmp_path / "full.fwt").stat().st_size
    assert cli_main(common + ["-i", str(tmp_path / "full.fwt"), "-t",
                              "--data", str(data), "-p", str(tmp_path / "pf.out")]) == 0
    assert cli_main(common + ["-i", str(tmp_path / "q.fwt"), "-t",
                              "--data", str(data), "-p", str(tmp_path / "pq.out")]) == 0
    pf = np.array([float(x) for x in (tmp_path / "pf.out").read_text().split()])
    pq = np.array([float(x) for x in (tmp_path / "pq.out").read_text().split()])
    assert len(pf) == 200
    np.testing.assert_allclose(pq, pf, atol=5e-3)


def test_fwt_profile_writes_trace(tmp_path):
    """--fwt_profile wraps the run in a jax.profiler trace and leaves the
    artifact on disk (the aux tracing subsystem, SURVEY §5)."""
    from fwumious_wabbit_tpu.train.loop import main as cli_main

    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\n")
    lines = "".join(
        f"{1 if i % 2 else -1} |A a{i % 5} |B b{i % 3}\n" for i in range(64)
    )
    (tmp_path / "d.vw").write_text(lines)
    prof = tmp_path / "prof"
    rc = cli_main([
        "--data", str(tmp_path / "d.vw"), "--keep", "A", "--keep", "B",
        "-b", "18", "--adaptive", "-l", "0.1",
        "--fwt_platform", "cpu", "--fwt_batch_size", "32",
        "--fwt_profile", str(prof),
        "-p", str(tmp_path / "p.out"),
    ])
    assert rc == 0
    # a plugins/profile/<ts>/ tree with at least one trace artifact
    artifacts = list(prof.rglob("*"))
    assert any(p.is_file() for p in artifacts), artifacts


def test_long_flag_aliases_and_stored_only_knobs(tmp_path):
    """Long aliases (--learning_rate/--bit_precision/...) resolve like the
    short forms, and the accepted-but-unused knobs the reference also only
    stores (--minimum_learning_rate; reference: src/model_instance.rs:51,
    447-448 — no compute-path consumer) survive a JSON round-trip.
    --ffm_k_threshold is accepted but NEVER read from the CLI in the
    reference (declared src/cmdline.rs:202 with no value_of() consumer) —
    we replicate that quirk: the field stays at its default."""
    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\n")
    vw = VwNamespaceMap.from_csv_file(str(tmp_path / "vw_namespace_map.csv"))

    argv = ["--data", "x.vw", "--keep", "A", "--interactions", "AB",
            "--learning_rate", "0.3", "--bit_precision", "21",
            "--power_t", "0.4", "--adaptive",
            "--init_acc_gradient", "2.5",
            "--minimum_learning_rate", "0.001",
            "--ffm_k", "4", "--ffm_field", "A", "--ffm_field", "B",
            "--ffm_k_threshold", "7.0",
            "--ffm_learning_rate", "0.2", "--ffm_power_t", "0.25",
            "--ffm_init_acc_gradient", "1.5",
            "--nn_init_acc_gradient", "0.75"]
    args = build_parser().parse_args(argv)
    mi = ModelInstance.from_cmdline(args, vw)

    assert mi.learning_rate == pytest.approx(0.3)
    assert mi.bit_precision == 21
    assert mi.power_t == pytest.approx(0.4)
    assert mi.init_acc_gradient == pytest.approx(2.5)
    assert mi.minimum_learning_rate == pytest.approx(0.001)
    assert mi.ffm_k_threshold == 0.0  # CLI value intentionally ignored
    # cascade: ffm_* explicit here, nn_* falls back to ffm_* except the
    # explicitly-set nn_init_acc_gradient
    assert mi.ffm_learning_rate == pytest.approx(0.2)
    assert mi.nn_learning_rate == pytest.approx(0.2)
    assert mi.nn_power_t == pytest.approx(0.25)
    assert mi.nn_init_acc_gradient == pytest.approx(0.75)

    mi2 = ModelInstance.from_json(mi.to_json())
    assert mi2.minimum_learning_rate == pytest.approx(0.001)
    assert mi2.nn_init_acc_gradient == pytest.approx(0.75)


def test_remaining_long_aliases_parse(tmp_path):
    """--cache/--final_regressor/--predictions long forms and the FFM band
    init flags wire through argparse into ModelInstance."""
    (tmp_path / "vw_namespace_map.csv").write_text("A,a\n")
    vw = VwNamespaceMap.from_csv_file(str(tmp_path / "vw_namespace_map.csv"))
    args = build_parser().parse_args(
        ["--data", "x.vw", "--cache", "--final_regressor", "m.fwt",
         "--predictions", "p.out", "--keep", "A",
         "--ffm_k", "2", "--ffm_field", "A",
         "--ffm_initialization_type", "default",
         "--ffm_init_center", "0.1", "--ffm_init_width", "0.2",
         "--ffm_init_zero_band", "0.3"])
    assert args.cache and args.final_regressor == "m.fwt"
    assert args.predictions == "p.out"
    mi = ModelInstance.from_cmdline(args, vw)
    assert mi.ffm_initialization_type == "default"
    assert mi.ffm_init_center == pytest.approx(0.1)
    assert mi.ffm_init_width == pytest.approx(0.2)
    assert mi.ffm_init_zero_band == pytest.approx(0.3)
