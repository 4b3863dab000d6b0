"""Translator tests: LR combo hashing, constant feature, FFM entries, and the
padded Batcher output (semantics from reference: src/feature_buffer.rs)."""

import numpy as np

import argparse

from fwumious_wabbit_tpu.config.cmdline import build_parser
from fwumious_wabbit_tpu.config.model_instance import ModelInstance
from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.hashing import (
    CONSTANT_HASH,
    MASK32,
    VOWPAL_FNV_PRIME,
    feature_hash,
    namespace_seed,
)
from fwumious_wabbit_tpu.ingest.parser import VowpalParser
from fwumious_wabbit_tpu.ingest.translator import Batcher, FeatureTranslator

VW_MAP = "A,featureA\nB,featureB\nC,featureC\n"


def make_mi(argv):
    vw = VwNamespaceMap.from_string(VW_MAP)
    args = build_parser().parse_args(argv)
    return ModelInstance.from_cmdline(args, vw), vw


def test_lr_keep_and_interaction():
    mi, vw = make_mi(["--keep", "A", "--interactions", "AB", "-b", "18"])
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    rec = parser.parse_line(b"1 |A a |B b\n")
    te = t.translate(rec)

    mask = (1 << 18) - 1
    ha = feature_hash("a", namespace_seed("A"))
    hb = feature_hash("b", namespace_seed("B"))
    h_ab = (hb ^ ((ha * VOWPAL_FNV_PRIME) & MASK32)) & mask

    assert te.label == 1.0 and te.importance == 1.0
    # keep A, interaction AB, constant
    assert te.lr_hashes == [ha & mask, h_ab, CONSTANT_HASH & mask]
    assert te.lr_values == [1.0, 1.0, 1.0]
    assert te.lr_combos == [0, 1, 2]


def test_combo_weight_and_noconstant():
    mi, vw = make_mi(["--interactions", "AB:1.5", "--noconstant"])
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    te = t.translate(parser.parse_line(b"-1 |A a |B b\n"))
    assert te.label == 0.0
    assert te.lr_values == [1.5]
    assert te.lr_combos == [0]


def test_multi_feature_namespace_product():
    mi, vw = make_mi(["--interactions", "AB", "--noconstant"])
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    te = t.translate(parser.parse_line(b"1 |A a b |B c:2.0\n"))
    # 2 features in A x 1 in B = 2 interaction features, value 2.0 each
    assert len(te.lr_hashes) == 2
    assert te.lr_values == [2.0, 2.0]


def test_ffm_entries():
    mi, vw = make_mi(
        ["--keep", "A", "--ffm_k", "4", "--ffm_field", "A", "--ffm_field", "BC",
         "--ffm_bit_precision", "20", "--noconstant"]
    )
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    te = t.translate(parser.parse_line(b"1 |A a |B b |C c\n"))

    # ffm mask frees low 2 bits (k=4)
    assert mi.ffm_bits_for_dimensions == 2
    mask = ((1 << 20) - 1) ^ 0b11
    ha = feature_hash("a", namespace_seed("A")) & mask
    hb = feature_hash("b", namespace_seed("B")) & mask
    hc = feature_hash("c", namespace_seed("C")) & mask
    assert te.ffm_hashes == [ha, hb, hc]
    assert all(h & 0b11 == 0 for h in te.ffm_hashes)
    assert te.ffm_fields == [0, 1, 1]
    assert te.ffm_values == [1.0, 1.0, 1.0]


def test_ffm_k1_mask_is_full():
    mi, vw = make_mi(["--ffm_k", "1", "--ffm_field", "A", "--ffm_bit_precision", "10"])
    assert mi.ffm_bits_for_dimensions == 0
    assert mi.ffm_hash_mask == (1 << 10) - 1


def test_batcher_shapes_and_padding():
    mi, vw = make_mi(
        ["--keep", "A", "--ffm_k", "2", "--ffm_field", "A", "--ffm_field", "B"]
    )
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    exs = [
        t.translate(parser.parse_line(b"1 |A a |B b\n")),
        t.translate(parser.parse_line(b"-1 0.5 |A a b c |B b\n")),
    ]
    batch = Batcher(batch_size=4, lr_width_min=2, ffm_width_min=2).make_batch(exs)
    assert batch.label.shape == (4,)
    assert batch.num_examples == 2
    assert batch.label[0] == 1.0 and batch.label[1] == 0.0
    assert batch.importance[1] == np.float32(0.5)
    assert batch.importance[2] == 0.0  # padding rows have importance 0
    # widths bucketed to powers of two
    assert batch.lr_ids.shape[1] in (2, 4, 8)
    assert batch.ffm_ids.shape[1] in (2, 4, 8)
    # padding entries are zeros
    assert batch.lr_vals[2].sum() == 0.0
    assert batch.ffm_vals[3].sum() == 0.0
