"""CLI predict mode on the embedded C++ engine (run_native_predict):
the -t -i fast path must preserve the reference main-loop semantics —
%.6f lines, --predictions_after, empty-line end-of-stream, in-band
commands aborting the run — and agree with the device engine's
predictions (reference: src/main.rs:213-270 with update=false)."""

import re

import numpy as np
import pytest

from fwumious_wabbit_tpu import native
from tests.test_end_to_end import FLAGS, gen_dataset, run_cli

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no native toolchain")


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nat_pred")
    gen_dataset(d, n_train=4000, n_eval=400)
    model = d / "m.fw"
    run_cli(FLAGS + ["--data", str(d / "train.vw"), "-f", str(model),
                     "--save_resume"])
    return d, model


def _cli(args):
    from fwumious_wabbit_tpu.train.loop import main

    return main(args)


def test_native_predict_runs_and_formats(model_dir):
    d, model = model_dir
    p = d / "t1.preds"
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(p)]) == 0
    lines = p.read_text().splitlines()
    assert len(lines) == 400
    assert all(re.fullmatch(r"\d\.\d{6}", l) for l in lines)
    assert len(set(lines)) > 1


def test_native_predict_matches_device_engine(model_dir):
    d, model = model_dir
    pn, pd_ = d / "nat.preds", d / "dev.preds"
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(pn)]) == 0
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(pd_),
                         "--fwt_serve_engine", "device"]) == 0
    a = np.array([float(x) for x in pn.read_text().split()])
    b = np.array([float(x) for x in pd_.read_text().split()])
    assert a.shape == b.shape == (400,)
    # different engines, same math: agree to the last printed digit ±1ulp
    np.testing.assert_allclose(a, b, atol=2.1e-6, rtol=0)


def test_predict_block_mt_identical(model_dir):
    """fw_predict_block_mt: thread-sharded block prediction must match the
    serial walk exactly — same predictions in order, same consumed/status —
    including a mid-buffer end-of-stream (empty line), where the earliest
    special line wins and later ranges are discarded."""
    import numpy as np

    d, model = model_dir
    pred = native.EmbeddedPredictor(f"-i {model}")
    try:
        # replicate the small train file into a >1 MB block so the MT
        # path engages (it falls back to serial below 1 MB)
        base_buf = (d / "train.vw").read_bytes()
        buf = base_buf * (((1 << 20) // len(base_buf)) + 2)
        p1, c1, s1 = pred.predict_block(buf)
        assert p1.size > 4000
        for T in (2, 5):
            p2, c2, s2 = pred.predict_block_mt(buf, threads=T)
            assert (c1, s1) == (c2, s2)
            np.testing.assert_array_equal(p1, p2)
        # earliest special line wins: empty line spliced mid-buffer
        cut = buf.rfind(b"\n", 0, len(buf) // 2) + 1
        ebuf = buf[:cut] + b"\n" + buf[cut:]
        p1, c1, s1 = pred.predict_block(ebuf)
        p2, c2, s2 = pred.predict_block_mt(ebuf, threads=4)
        assert s1 == s2 == native.EmbeddedPredictor.BLOCK_EOF
        assert c1 == c2
        np.testing.assert_array_equal(p1, p2)
    finally:
        pred.close()


def test_native_predict_gz_input_identical(model_dir, tmp_path):
    """Compressed inputs stream through the same chunked predict path
    (ingest/reader.py create_buffered_input) with identical predictions."""
    import gzip

    d, model = model_dir
    gz = tmp_path / "test-hard.vw.gz"
    gz.write_bytes(gzip.compress((d / "test-hard.vw").read_bytes()))
    p1, p2 = d / "plain.preds", tmp_path / "gz.preds"
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(p1)]) == 0
    assert _cli(FLAGS + ["--data", str(gz), "-t",
                         "-i", str(model), "-p", str(p2)]) == 0
    assert p1.read_bytes() == p2.read_bytes()


def test_native_predict_predictions_after(model_dir):
    d, model = model_dir
    pa, pf = d / "after.preds", d / "full.preds"
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(pf)]) == 0
    assert _cli(FLAGS + ["--data", str(d / "test-hard.vw"), "-t",
                         "-i", str(model), "-p", str(pa),
                         "--predictions_after", "100"]) == 0
    full = pf.read_text().splitlines()
    after = pa.read_text().splitlines()
    assert after == full[100:]


def test_native_predict_empty_line_ends_stream(model_dir, tmp_path):
    d, model = model_dir
    lines = (d / "test-hard.vw").read_text().splitlines()
    cut = tmp_path / "cut.vw"
    cut.write_text("\n".join(lines[:7]) + "\n\n" + "\n".join(lines[7:]) + "\n")
    p = tmp_path / "cut.preds"
    assert _cli(FLAGS + ["--data", str(cut), "-t", "-i", str(model),
                         "-p", str(p)]) == 0
    assert len(p.read_text().splitlines()) == 7


@pytest.mark.parametrize("cmd", ["flush", "hogwild_load /tmp/x.fw"])
def test_native_predict_inband_command_aborts(model_dir, tmp_path, cmd):
    """Commands inside a prediction FILE abort with exit 1, exactly like
    the reference's main loop (src/main.rs:218-221)."""
    d, model = model_dir
    lines = (d / "test-hard.vw").read_text().splitlines()
    bad = tmp_path / "bad.vw"
    bad.write_text("\n".join(lines[:5]) + f"\n{cmd}\n" + "\n".join(lines[5:]) + "\n")
    p = tmp_path / "bad.preds"
    assert _cli(FLAGS + ["--data", str(bad), "-t", "-i", str(model),
                         "-p", str(p)]) == 1
    # predictions up to the command were already written
    assert len(p.read_text().splitlines()) == 5


def test_native_predict_parse_error_raises(model_dir, tmp_path):
    d, model = model_dir
    bad = tmp_path / "garbage.vw"
    bad.write_text("this is not a vw line\n")
    with pytest.raises(ValueError):
        _cli(FLAGS + ["--data", str(bad), "-t", "-i", str(model),
                      "-p", str(tmp_path / "g.preds")])


def test_device_engine_forced_for_unsupported_flags(model_dir):
    """--fwt_serve_engine device must bypass the native path (covered by
    the engine-match test); -c (cache) runs must also fall back."""
    from fwumious_wabbit_tpu.train.loop import native_predict_eligible
    from fwumious_wabbit_tpu.config.cmdline import build_parser

    d, model = model_dir
    base = FLAGS + ["--data", str(d / "test-hard.vw"), "-t", "-i", str(model)]
    assert native_predict_eligible(build_parser().parse_args(base))
    assert not native_predict_eligible(
        build_parser().parse_args(base + ["-c"]))
    assert not native_predict_eligible(
        build_parser().parse_args(base + ["--fwt_serve_engine", "device"]))
    assert not native_predict_eligible(
        build_parser().parse_args(base + ["--fwt_no_native"]))


def test_final_regressor_not_eligible_and_still_written(model_dir, tmp_path):
    """-t -i -f must still WRITE the output model (the native fast path
    returns before main()'s save tail, so it must not be eligible)."""
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.train.loop import native_predict_eligible

    d, model = model_dir
    out = tmp_path / "copy.fw"
    argv = FLAGS + ["--data", str(d / "test-hard.vw"), "-t", "-i", str(model),
                    "-f", str(out), "--save_resume"]
    assert not native_predict_eligible(build_parser().parse_args(argv))
    assert _cli(argv) == 0
    assert out.exists() and out.stat().st_size > 1000
