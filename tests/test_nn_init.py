"""Reference-exact NN init: Xoshiro256++ seeding from emulated tape offsets
(reference: src/block_neural.rs:382-418, src/graph.rs:250-285).

The RNG pipeline is anchored to published vectors (xoshiro256++ canonical
output, rand_distr's ziggurat table head); the offset emulation to a
hand-derived walk of the reference's finalize pass; and the end product to
golden values so any drift in the pipeline is caught.
"""

import numpy as np
import pytest

from fwumious_wabbit_tpu.models import ref_offsets
from fwumious_wabbit_tpu.ops import xoshiro


def test_xoshiro_canonical_vector():
    """xoshiro256++ with state {1,2,3,4}: first output is
    rotl(1+4, 23) + 1 = 41943041 (Blackman & Vigna's reference code)."""
    r = xoshiro.Xoshiro256PlusPlus(0)
    r.s = [1, 2, 3, 4]
    assert r.next_u64() == 41943041
    assert r.next_u64() == 58720359


def test_splitmix_seeding_golden():
    """seed_from_u64 fills the state via SplitMix64 (rand_xoshiro 0.6)."""
    r = xoshiro.Xoshiro256PlusPlus(0)
    # SplitMix64(0) first output is the well-known 0xE220A8397B1DCDAF
    assert r.s[0] == 0xE220A8397B1DCDAF
    assert r.s[1] == 0x6E789E6AA1B965F4


def test_ziggurat_table_anchors():
    """The regenerated tables must match rand_distr's checked-in constants
    (ziggurat_tables.rs): X[0], R, and the monotone/terminal structure."""
    assert abs(xoshiro.ZIG_NORM_X[0] - 3.910757959537090045) < 1e-14
    assert xoshiro.ZIG_NORM_X[1] == xoshiro.ZIG_NORM_R
    assert xoshiro.ZIG_NORM_X[256] == 0.0
    assert xoshiro.ZIG_NORM_F[256] == 1.0
    x = np.array(xoshiro.ZIG_NORM_X)
    assert (np.diff(x) < 0).all()  # strictly decreasing


def test_normal_statistics():
    rng = xoshiro.Xoshiro256PlusPlus(123)
    xs = np.array([xoshiro.standard_normal(rng) for _ in range(100_000)])
    assert abs(xs.mean()) < 0.02
    assert abs(xs.std() - 1.0) < 0.02


def test_reference_offsets_topology_one_with_ffm():
    """Hand-derived walk for: LR(C) ⊕ triangle(F) → copy → NL(W) → relu →
    join → final(1) → sigmoid. Offsets: FFM matrix at 0, LR at F², triangle
    at F²+C; NL input aliases the join (F²), its output lands after the
    join block (F²+C+T); the final layer reads the second join's zero-copy
    region starting at the relu output."""
    C, F, W = 4, 2, 5
    T = F * (F + 1) // 2
    offs = ref_offsets.reference_nn_offsets(C, F, "one", [(W, "none", "relu")])
    D = C + T
    (nl_in, nl_out, nl_ni, nl_w), (f_in, f_out, f_ni, f_w) = offs
    assert (nl_in, nl_out, nl_ni, nl_w) == (F * F, F * F + C + T, D, W)
    # relu output at F²+C+T+W, copy slot 1 at F²+C+T+2W (the join reads
    # them contiguously); final output allocated after copy slot 1's D
    assert (f_in, f_out) == (F * F + C + T + W, F * F + C + T + 2 * W + D)
    assert (f_ni, f_w) == (W + D, 1)


def test_reference_offsets_topology_two_no_ffm():
    """topology two, LR only: no copy/join — NL reads LR's region."""
    C, W = 3, 4
    offs = ref_offsets.reference_nn_offsets(C, 0, "two", [(W, "none", "none")])
    (nl_in, nl_out, nl_ni, nl_w), (f_in, f_out, f_ni, f_w) = offs
    assert (nl_in, nl_out, nl_ni, nl_w) == (0, C, C, W)
    assert (f_in, f_out, f_ni, f_w) == (C, C + W, W, 1)


def test_reference_offsets_topology_four_normalize_shift():
    """topology four inserts a normalize block whose output claims tape
    space between the copy and the first NL."""
    C, W = 3, 4
    offs = ref_offsets.reference_nn_offsets(C, 0, "four", [(W, "none", "none")])
    (nl_in, nl_out, _, _), _ = offs
    # copy.slot0 aliases LR's region (0); normalize output claims C;
    # NL reads it and outputs at 2C
    assert (nl_in, nl_out) == (C, 2 * C)


def test_layer_seed_formula():
    assert ref_offsets.layer_seed(4, 12, 7, 5) == 4 * 12 + 7 + (7 * 5 + 5)


def test_xavier_golden_sequence():
    """End-product golden: first Xavier weights for a known seed — locks
    the uniform float derivation (bits>>12 into [1,2), scale+offset)."""
    rng = xoshiro.Xoshiro256PlusPlus(100)
    bound = float(np.sqrt(6.0)) / float(np.sqrt(12))
    got = np.array([rng.uniform(-bound, bound) for _ in range(4)], np.float32)
    # independently derived: u = next_u64()>>12; v = u·2⁻⁵²·(2b) − b
    r2 = xoshiro.Xoshiro256PlusPlus(100)
    exp = np.array(
        [(r2.next_u64() >> 12) * 2.0**-52 * (2 * bound) - bound
         for _ in range(4)], np.float32)
    np.testing.assert_array_equal(got, exp)
    assert (np.abs(got) < bound).all()


def test_model_init_matches_reference_pipeline():
    """FwModel.init_params must produce exactly the weights the reference
    pipeline yields: per-layer seed from emulated offsets, neuron-major
    draw order, f64→f32 rounding, zero biases."""
    from fwumious_wabbit_tpu.config.model_instance import (
        FeatureComboDesc, ModelInstance, Optimizer,
    )
    from fwumious_wabbit_tpu.config.vwmap import NamespaceDescriptor
    from fwumious_wabbit_tpu.models.model import FwModel

    mi = ModelInstance()
    mi.optimizer = Optimizer.ADAGRAD_LUT
    mi.bit_precision = 18
    mi.learning_rate = 0.1
    mi.nn_learning_rate = 0.1
    mi.power_t = 0.5
    A = NamespaceDescriptor(0)
    mi.feature_combo_descs = [FeatureComboDesc(namespace_descriptors=[A])]
    mi.nn_config.topology = "one"
    mi.nn_config.layers = [
        {"width": "6", "activation": "relu", "init": "xavier"},
        {"width": "3", "activation": "relu", "init": "hu"},
    ]
    model = FwModel(mi)
    params = model.init_params()

    C = model.num_combos
    offs = ref_offsets.reference_nn_offsets(
        C, 0, "one",
        [(6, "none", "relu"), (3, "none", "relu")])

    # layer 0: xavier
    in_off, out_off, ni, w = offs[0]
    rng = xoshiro.Xoshiro256PlusPlus(ref_offsets.layer_seed(in_off, out_off, ni, w))
    bound = float(np.sqrt(6.0)) / float(np.sqrt(ni * w))
    seq = np.array([rng.uniform(-bound, bound) for _ in range(ni * w)],
                   np.float32)
    want0 = seq.reshape(w, ni).T
    np.testing.assert_array_equal(np.asarray(params["nn"][0]["w"]), want0)

    # layer 1: hu via ziggurat
    in_off, out_off, ni, w = offs[1]
    rng = xoshiro.Xoshiro256PlusPlus(ref_offsets.layer_seed(in_off, out_off, ni, w))
    std = float(np.sqrt(2.0 / ni))
    seq = np.array([xoshiro.normal(rng, 0.0, std) for _ in range(ni * w)],
                   np.float32)
    want1 = seq.reshape(w, ni).T
    np.testing.assert_array_equal(np.asarray(params["nn"][1]["w"]), want1)

    # final: ones weights, zero bias (InitType::One + forced-zero bias)
    np.testing.assert_array_equal(
        np.asarray(params["final"]["w"]), np.ones((3 + C, 1), np.float32))
    np.testing.assert_array_equal(
        np.asarray(params["final"]["b"]), np.zeros(1, np.float32))
    for layer in params["nn"]:
        np.testing.assert_array_equal(
            np.asarray(layer["b"]), np.zeros(layer["b"].shape, np.float32))


def test_init_deterministic_and_offset_sensitive():
    """Same config → identical weights; a different topology changes the
    seeds (offset-derived) and therefore the weights."""
    from fwumious_wabbit_tpu.config.model_instance import (
        FeatureComboDesc, ModelInstance, Optimizer,
    )
    from fwumious_wabbit_tpu.config.vwmap import NamespaceDescriptor
    from fwumious_wabbit_tpu.models.model import FwModel

    def build(topology):
        mi = ModelInstance()
        mi.optimizer = Optimizer.ADAGRAD_LUT
        mi.bit_precision = 18
        A = NamespaceDescriptor(0)
        mi.feature_combo_descs = [FeatureComboDesc(namespace_descriptors=[A])]
        mi.nn_config.topology = topology
        mi.nn_config.layers = [{"width": "4", "init": "hu"}]
        return FwModel(mi).init_params()

    a = np.asarray(build("one")["nn"][0]["w"])
    b = np.asarray(build("one")["nn"][0]["w"])
    # "four" inserts a normalize block, shifting the layer's tape offsets
    # (hence its seed); "one" and "two" happen to share seeds — the layer
    # reads offset 0/C in both, exactly as in the reference
    c = np.asarray(build("four")["nn"][0]["w"])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fwt_exact_nn_config_cross_engine(tmp_path):
    """--fwt_exact (B=1 online) on an NN config: with reference-exact
    Xoshiro init the two ingest engines (C++ and the Python oracle) must
    produce byte-identical prediction trajectories — the NN leg of the
    exact-parity mode (LR and FFM legs are covered elsewhere)."""
    from fwumious_wabbit_tpu.train.loop import main as cli_main

    (tmp_path / "vw_namespace_map.csv").write_text("A,a\nB,b\n")
    data = tmp_path / "d.vw"
    data.write_text("".join(
        f"{1 if i % 2 else -1} |A a{i % 6} |B b{i % 4}\n" for i in range(60)
    ))
    common = ["--data", str(data), "--keep", "A", "--keep", "B",
              "-b", "18", "--adaptive", "-l", "0.1", "--fwt_platform", "cpu",
              "--nn_layers", "2", "--nn_topology", "one",
              "--nn", "0:width:4", "--nn", "0:activation:relu",
              "--nn", "0:init:xavier",
              "--nn", "1:width:3", "--nn", "1:init:hu",
              "--fwt_exact"]
    assert cli_main(common + ["-p", str(tmp_path / "native.out")]) == 0
    assert cli_main(common + ["--fwt_no_native",
                              "-p", str(tmp_path / "python.out")]) == 0
    a = (tmp_path / "native.out").read_text()
    assert a == (tmp_path / "python.out").read_text()
    lines = a.splitlines()
    assert len(lines) == 60
    # the tower actually moves predictions off 0.5 while training
    assert any(abs(float(x) - 0.5) > 1e-3 for x in lines)
