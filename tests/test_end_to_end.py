"""End-to-end learning-quality tests, mirroring the reference's CI gate
(reference: examples/ffm/run_fw_with_prediction_tests.sh):

(a) inference-weights predictions identical to full-weights predictions,
(b) predictions not degenerate,
(c) balanced accuracy on the *hard* (unseen-combination) test set > 0.80 —
    i.e. the FFM actually learned latent factors.
"""

import random
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def render(a, b):
    score = 1 if (a[0] == "Herbivore" and b[0] == "Plant") or (
        a[0] == "Carnivore" and b[0] == "Meat"
    ) else -1
    return f"{score} |A {a[0]}-{a[1]} |B {b[0]}-{b[1]}\n"


def gen_dataset(dirpath: Path, n_train=20000, n_eval=2000, n_animals=5, n_foods=5,
                block_beyond=3, seed=1):
    """Synthetic herbivore/carnivore data in the shape of the reference's
    examples/ffm/generate.py: the 'hard' set contains only entity ids never
    seen in training combinations."""
    rng = random.Random(seed)
    dirpath.mkdir(exist_ok=True)
    (dirpath / "vw_namespace_map.csv").write_text("A,animal\nB,food\n")

    def sample_easy():
        at = rng.choice(["Herbivore", "Carnivore"])
        ft = rng.choice(["Plant", "Meat"])
        if rng.randint(0, 1):
            person, movie = rng.randint(0, n_animals), rng.randint(0, block_beyond)
        else:
            person, movie = rng.randint(0, block_beyond), rng.randint(0, n_foods)
        return (at, person), (ft, movie)

    with open(dirpath / "train.vw", "w") as f:
        for _ in range(n_train):
            a, b = sample_easy()
            f.write(render(a, b))
    with open(dirpath / "test-hard.vw", "w") as f:
        for _ in range(n_eval):
            at = rng.choice(["Herbivore", "Carnivore"])
            ft = rng.choice(["Plant", "Meat"])
            a = (at, rng.randint(block_beyond + 1, n_animals))
            b = (ft, rng.randint(block_beyond + 1, n_foods))
            f.write(render(a, b))


FLAGS = [
    "--fwt_platform", "cpu", "--fwt_batch_size", "256",
    "--keep", "A", "--keep", "B", "--interactions", "AB",
    "--ffm_k", "10", "--ffm_field", "A", "--ffm_field", "B",
    "-l", "0.1", "-b", "22", "--adaptive", "--sgd", "--loss_function", "logistic",
    "--link", "logistic", "--power_t", "0.0", "--hash", "all", "--noconstant",
]


def run_cli(args):
    from fwumious_wabbit_tpu.train.loop import main

    rc = main(args)
    assert rc == 0


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("ffm_e2e")
    gen_dataset(d)
    model = d / "model.fw"
    run_cli(FLAGS + ["--data", str(d / "train.vw"),
                     "-p", str(d / "train.preds"), "-f", str(model), "--save_resume"])
    return d, model


def test_ffm_learns_latent_factors(trained):
    d, model = trained
    run_cli(FLAGS + ["--data", str(d / "test-hard.vw"),
                     "-p", str(d / "hard.preds"), "-i", str(model), "-t"])
    preds = np.loadtxt(d / "hard.preds")
    labels = np.array(
        [1 if l.split()[0] == "1" else 0 for l in open(d / "test-hard.vw")]
    )
    pred_bin = preds > 0.5
    tp = ((pred_bin == 1) & (labels == 1)).sum()
    tn = ((pred_bin == 0) & (labels == 0)).sum()
    fp = ((pred_bin == 1) & (labels == 0)).sum()
    fn = ((pred_bin == 0) & (labels == 1)).sum()
    ba = 0.5 * (tp / max(tp + fn, 1) + tn / max(tn + fp, 1))
    assert ba > 0.80, f"hard-set balanced accuracy {ba:.4f} <= 0.80"
    # (b) not degenerate
    assert len(np.unique(np.round(preds, 4))) > 2


def test_inference_conversion_identical_predictions(trained):
    """(a) converted inference model must predict byte-identically."""
    d, model = trained
    inf_model = d / "model.inf"
    run_cli(["--initial_regressor", str(model),
             "--convert_inference_regressor", str(inf_model)])
    run_cli(FLAGS + ["--data", str(d / "test-hard.vw"),
                     "-p", str(d / "hard_full.preds"), "-i", str(model), "-t"])
    run_cli(FLAGS + ["--data", str(d / "test-hard.vw"),
                     "-p", str(d / "hard_inf.preds"), "-i", str(inf_model), "-t"])
    assert (d / "hard_full.preds").read_text() == (d / "hard_inf.preds").read_text()


def test_save_resume_roundtrip(trained):
    """Mutable reload: saved optimizer state lets training resume exactly —
    the model file is the checkpoint (reference: SPEED.md, --save_resume)."""
    d, model = trained
    from fwumious_wabbit_tpu.persistence.model_file import load_model, save_model

    mi, vw, fwmodel, params = load_model(model, immutable=False)
    assert "lr_acc" in params and "ffm_acc" in params
    # save again, reload, byte-compare the core arrays
    model2 = d / "model2.fw"
    save_model(model2, mi, vw, fwmodel, params)
    _, _, _, params2 = load_model(model2, immutable=False)
    np.testing.assert_array_equal(np.asarray(params["ffm_w"]), np.asarray(params2["ffm_w"]))
    np.testing.assert_array_equal(np.asarray(params["ffm_acc"]), np.asarray(params2["ffm_acc"]))
    np.testing.assert_array_equal(np.asarray(params["lr_w"]), np.asarray(params2["lr_w"]))


def test_cache_run_produces_identical_predictions(trained):
    d, _model = trained
    p1, p2 = d / "c1.preds", d / "c2.preds"
    run_cli(FLAGS + ["--data", str(d / "train.vw"), "-c", "-p", str(p1)])
    assert (d / "train.vw.fwcache").exists()
    run_cli(FLAGS + ["--data", str(d / "train.vw"), "-c", "-p", str(p2)])
    assert p1.read_text() == p2.read_text()


def test_quantized_export_close_predictions(trained):
    d, model = trained
    qmodel = d / "model.quant"
    run_cli(["--initial_regressor", str(model), "--weight_quantization",
             "--convert_inference_regressor", str(qmodel)])
    run_cli(FLAGS + ["--data", str(d / "test-hard.vw"),
                     "-p", str(d / "hard_q.preds"), "-i", str(qmodel), "-t"])
    full = np.loadtxt(d / "hard_full.preds") if (d / "hard_full.preds").exists() else None
    if full is None:
        run_cli(FLAGS + ["--data", str(d / "test-hard.vw"),
                         "-p", str(d / "hard_full.preds"), "-i", str(model), "-t"])
        full = np.loadtxt(d / "hard_full.preds")
    quant = np.loadtxt(d / "hard_q.preds")
    np.testing.assert_allclose(quant, full, atol=5e-3)
