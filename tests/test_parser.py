"""Parser golden tests — packed u32 buffers must match the reference parser
bit-for-bit (goldens ported from reference: src/parser.rs:474-1182)."""

import io

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.ingest.parser import (
    FLOAT32_ONE,
    IS_NOT_SINGLE_MASK,
    MASK31,
    NO_FEATURES,
    NO_LABEL,
    FlushCommand,
    HogwildLoadCommand,
    ParseError,
    VowpalParser,
)

VW_MAP_ABC = "A,featureA\nB,featureB\nC,featureC\n"


def nd(start, end):
    return (start << 16) + end


def f32bits(x):
    return int(np.float32(x).view(np.uint32))


@pytest.fixture
def parser():
    return VowpalParser(VwNamespaceMap.from_string(VW_MAP_ABC))


def check(parser, line, expected):
    got = parser.parse_line(line.encode() if isinstance(line, str) else line)
    assert got.tolist() == [x & 0xFFFFFFFF for x in expected], line


def test_single_namespace(parser):
    a = 2988156968 & MASK31
    b = 3529656005 & MASK31
    c = 906509 & MASK31
    bB = 2422381320 & MASK31
    check(parser, "1 |A a\n", [6, 1, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    check(parser, "1 |A a \n", [6, 1, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    check(parser, "1  |A a\n", [6, 1, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    check(parser, "1 |A  a\n", [6, 1, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    check(parser, "-1 |B b\n", [6, 0, FLOAT32_ONE, NO_FEATURES, bB, NO_FEATURES])
    # two features in one namespace -> spill to tail
    check(
        parser,
        "1 |A a b\n",
        [10, 1, FLOAT32_ONE, nd(6, 10) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES,
         a, FLOAT32_ONE, b, FLOAT32_ONE],
    )
    check(parser, "-1 |A a |B b\n", [6, 0, FLOAT32_ONE, a, bB, NO_FEATURES])
    check(parser, "-1 |A a  |B b\n", [6, 0, FLOAT32_ONE, a, bB, NO_FEATURES])


def test_undeclared_namespace(parser):
    with pytest.raises(ParseError, match="was not predeclared"):
        parser.parse_line(b"1 |UNDECLARED_NAMESPACE a\n")


def test_weights(parser):
    a = 2988156968 & MASK31
    b = 3529656005 & MASK31
    c = 906509 & MASK31
    # namespace weight 1.0 -> still in place
    check(parser, "1 |A:1.0 a\n", [6, 1, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    with pytest.raises(ParseError, match="Failed parsing namespace weight: not_a_parsable_number"):
        parser.parse_line(b"1 |A:not_a_parsable_number a\n")
    with pytest.raises(ParseError, match="Failed parsing namespace weight: 1:1"):
        parser.parse_line(b"1 |A:1:1 a\n")
    check(
        parser, "1 |A:2.0 a\n",
        [8, 1, FLOAT32_ONE, nd(6, 8) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES, a, f32bits(2.0)],
    )
    check(
        parser, "1 |A a:2.0\n",
        [8, 1, FLOAT32_ONE, nd(6, 8) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES, a, f32bits(2.0)],
    )
    check(
        parser, "1 |A a:2.0 b:3.0\n",
        [10, 1, FLOAT32_ONE, nd(6, 10) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES,
         a, f32bits(2.0), b, f32bits(3.0)],
    )
    # feature weight * namespace weight
    check(
        parser, "1 |A:3 a:2.0\n",
        [8, 1, FLOAT32_ONE, nd(6, 8) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES, a, f32bits(6.0)],
    )
    with pytest.raises(ParseError, match="Failed parsing feature weight: 2x0"):
        parser.parse_line(b"1 |A a:2x0\n")
    # first unweighted (promoted), then two weighted
    check(
        parser, "1 |A a b:2.0 c:3.0\n",
        [12, 1, FLOAT32_ONE, nd(6, 12) | IS_NOT_SINGLE_MASK, NO_FEATURES, NO_FEATURES,
         a, FLOAT32_ONE, b, f32bits(2.0), c, f32bits(3.0)],
    )


def test_labels_and_commands(parser):
    a = 2988156968 & MASK31
    check(parser, "|A a\n", [6, NO_LABEL, FLOAT32_ONE, a, NO_FEATURES, NO_FEATURES])
    # EOF
    assert parser.next_vowpal(io.BytesIO(b"")).size == 0
    with pytest.raises(FlushCommand):
        parser.parse_line(b"flush")
    with pytest.raises(HogwildLoadCommand) as exc:
        parser.parse_line(b"hogwild_load /some/path.model\n")
    assert exc.value.filename == "/some/path.model"
    with pytest.raises(ParseError):
        parser.parse_line(b"$1")


def test_example_importance(parser):
    a = 2988156968 & MASK31
    check(parser, "1 0.25 |A a\n", [6, 1, f32bits(0.25), a, NO_FEATURES, NO_FEATURES])
    with pytest.raises(ParseError, match="cannot be negative"):
        parser.parse_line(b"1 -0.25 |A a\n")


def test_f32_namespace():
    vw = VwNamespaceMap.from_string("A,featureA,f32\nB,featureB\n")
    parser = VowpalParser(vw)
    a = int(np.uint32(parser.parse_line(b"1 |A 3.5\n")[5]).view(np.uint32))
    rec = parser.parse_line(b"1 |A 3.5\n")
    # slot is spilled; value is the parsed float
    assert rec[3] & IS_NOT_SINGLE_MASK
    assert np.uint32(rec[6]).view(np.float32) == np.float32(3.5)
    # NONE -> NaN
    rec = parser.parse_line(b"1 |A NONE\n")
    assert np.isnan(np.uint32(rec[6]).view(np.float32))
    # weighted f32 is an error
    with pytest.raises(ParseError, match="can not have weight"):
        parser.parse_line(b"1 |A 3.5:2.0\n")


def test_f32_skip_prefix():
    vw = VwNamespaceMap.from_string("A,featureA,f32\n_namespace_skip_prefix,1\n")
    parser = VowpalParser(vw)
    rec = parser.parse_line(b"1 |A X3.5\n")
    # single namespace: header(3) + 1 slot, tail at [4]=hash, [5]=value
    assert np.uint32(rec[5]).view(np.float32) == np.float32(3.5)


def test_record_roundtrip_through_stream(parser):
    data = io.BytesIO(b"1 |A a\n-1 |B b\n")
    r1 = parser.next_vowpal(data)
    assert r1[1] == 1
    r2 = parser.next_vowpal(data)
    assert r2[1] == 0
    assert parser.next_vowpal(data).size == 0


def test_multibyte_namespaces():
    """Multi-char vw namespace names hash with the namespace-name seed
    (golden from reference: src/parser.rs:1018-1062)."""
    vw = VwNamespaceMap.from_string("AA,featureA\nBB,featureB\nCC,featureC\n")
    parser = VowpalParser(vw)
    aa = 292540976 & MASK31
    check(parser, "1 |AA a\n", [6, 1, FLOAT32_ONE, aa, NO_FEATURES, NO_FEATURES])
    check(
        parser, "1 |AA:3 a:2.0\n",
        [8, 1, FLOAT32_ONE, nd(6, 8) | IS_NOT_SINGLE_MASK, NO_FEATURES,
         NO_FEATURES, aa, f32bits(6.0)],
    )
