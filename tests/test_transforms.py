"""Transform tests, incl. the interpolation golden from the reference
(reference: src/feature_transform_executor.rs:259-287)."""

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.hashing import MASK31, murmur3_32
from fwumious_wabbit_tpu.ingest.parser import VowpalParser
from fwumious_wabbit_tpu.ingest.transforms import (
    SEED_DEFAULT,
    NamespaceTransformsParser,
    TransformExecutors,
    _Emitter,
    _i32_le_bytes,
    default_seeds,
    parse_namespace_statement,
)


def test_parse_namespace_statement():
    to, func, frm, params = parse_namespace_statement("out=BinnerSqrt(A)(10.0,2.0)")
    assert (to, func, frm, params) == ("out", "BinnerSqrt", ["A"], [10.0, 2.0])
    to, func, frm, params = parse_namespace_statement("c=Combine(x,y)()")
    assert (to, func, frm, params) == ("c", "Combine", ["x", "y"], [])


def test_interpolated_emit_golden():
    """emit_f32(5.4, 20.0, interpolated) emits (bin 6, 20*0.4), (bin 5, 20*0.6)
    with hashes seeded per the reference's scheme."""
    seeds = default_seeds(1)
    em = _Emitter(seeds)
    em.emit_f32(SEED_DEFAULT, 5.4, 20.0, True)
    h6 = murmur3_32(_i32_le_bytes(6), seeds[SEED_DEFAULT]) & MASK31
    h5 = murmur3_32(_i32_le_bytes(5), seeds[SEED_DEFAULT]) & MASK31
    assert len(em.out) == 2
    assert em.out[0][0] == h6
    assert em.out[1][0] == h5
    np.testing.assert_allclose(em.out[0][1], 20.0 * (5.4 - 5.0), rtol=1e-6)
    np.testing.assert_allclose(em.out[1][1], 20.0 * (6.0 - 5.4), rtol=1e-6)


def test_binner_sqrt_pipeline():
    vw = VwNamespaceMap.from_string("A,pageviews,f32\n")
    p = NamespaceTransformsParser()
    p.add_transform_namespace(vw, "pv_binned=BinnerSqrtPlain(pageviews)(10.0,1.0)")
    nst = p.resolve(vw)
    ex = TransformExecutors(nst)

    parser = VowpalParser(vw)
    # value below greater_than -> plain int bin with default seed
    rec = parser.parse_line(b"1 |A 5\n")
    out = ex.execute(0, rec)
    seeds = default_seeds(0)
    assert out == [(murmur3_32(_i32_le_bytes(5), seeds[0]) & MASK31, 1.0)]
    # value above greater_than -> sqrt(x - 10) with seed One
    rec = parser.parse_line(b"1 |A 154\n")
    out = ex.execute(0, rec)
    expected_bin = int(np.float32(np.sqrt(np.float32(144.0))))  # 12
    assert out == [(murmur3_32(_i32_le_bytes(expected_bin), seeds[1]) & MASK31, 1.0)]


def test_combine_and_dependency_order():
    vw = VwNamespaceMap.from_string("A,fa\nB,fb\n")
    p = NamespaceTransformsParser()
    # defined out of order: combined depends on weighted
    p.add_transform_namespace(vw, "combined=Combine(weighted,fb)()")
    p.add_transform_namespace(vw, "weighted=Weight(fa)(2.0)")
    nst = p.resolve(vw)
    names = [t.to_verbose for t in nst.v]
    assert names.index("weighted") < names.index("combined")

    ex = TransformExecutors(nst)
    parser = VowpalParser(vw)
    rec = parser.parse_line(b"1 |A a |B b\n")
    widx = names.index("weighted")
    wout = ex.execute(widx, rec)
    assert len(wout) == 1 and wout[0][1] == 2.0
    cout = ex.execute(names.index("combined"), rec)
    assert len(cout) == 1 and cout[0][1] == 2.0


def test_cycle_detection():
    vw = VwNamespaceMap.from_string("A,fa\n")
    p = NamespaceTransformsParser()
    p.add_transform_namespace(vw, "x=Weight(y)(2.0)")
    p.add_transform_namespace(vw, "y=Weight(x)(2.0)")
    with pytest.raises(ValueError, match="Cyclic dependency"):
        p.resolve(vw)


def test_clash_with_primitive():
    vw = VwNamespaceMap.from_string("A,fa\n")
    p = NamespaceTransformsParser()
    with pytest.raises(ValueError, match="already exists as primitive"):
        p.add_transform_namespace(vw, "fa=Weight(fa)(2.0)")


def test_transformed_namespace_in_linear_combo():
    """End-to-end: --linear with a transformed namespace flows through the
    translator."""
    from fwumious_wabbit_tpu.config.cmdline import build_parser
    from fwumious_wabbit_tpu.config.model_instance import ModelInstance
    from fwumious_wabbit_tpu.ingest.translator import FeatureTranslator

    vw = VwNamespaceMap.from_string("A,fa\nB,fb\n")
    args = build_parser().parse_args(
        ["--transform", "w2=Weight(fa)(3.0)", "--linear", "w2", "--noconstant"]
    )
    mi = ModelInstance.from_cmdline(args, vw)
    parser = VowpalParser(vw)
    t = FeatureTranslator(mi)
    te = t.translate(parser.parse_line(b"1 |A a\n"))
    assert te.lr_values == [3.0]
    assert te.lr_combos == [0]
