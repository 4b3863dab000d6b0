"""Record cache round-trip + staleness tests (semantics from reference:
src/cache.rs:53-232)."""

import numpy as np
import pytest

from fwumious_wabbit_tpu.config.vwmap import VwNamespaceMap
from fwumious_wabbit_tpu.ingest.cache import (
    RecordCacheReader,
    RecordCacheWriter,
    StaleCacheError,
    cache_path_for,
)
from fwumious_wabbit_tpu.ingest.parser import VowpalParser

VW_MAP = "A,featureA\nB,featureB\n"


def test_roundtrip(tmp_path):
    vw = VwNamespaceMap.from_string(VW_MAP)
    parser = VowpalParser(vw)
    records = [
        parser.parse_line(b"1 |A a |B b\n").copy(),
        parser.parse_line(b"-1 |A a b c\n").copy(),
        parser.parse_line(b"|B x:3.5\n").copy(),
    ]
    path = tmp_path / "train.vw.fwcache"
    w = RecordCacheWriter(path, vw)
    for r in records:
        w.push_record(r)
    w.write_finish()

    got = list(RecordCacheReader(path, vw))
    assert len(got) == len(records)
    for a, b in zip(got, records):
        np.testing.assert_array_equal(a, b)


def test_atomic_write(tmp_path):
    vw = VwNamespaceMap.from_string(VW_MAP)
    path = tmp_path / "x.fwcache"
    w = RecordCacheWriter(path, vw)
    w.push_record(np.array([4, 1, 0, 5], np.uint32))
    # before finish, final path doesn't exist
    assert not path.exists()
    w.write_finish()
    assert path.exists()


def test_stale_on_vwmap_change(tmp_path):
    vw1 = VwNamespaceMap.from_string(VW_MAP)
    vw2 = VwNamespaceMap.from_string("A,featureA\nC,featureC\n")
    path = tmp_path / "y.fwcache"
    w = RecordCacheWriter(path, vw1)
    w.push_record(np.array([4, 1, 0, 5], np.uint32))
    w.write_finish()
    with pytest.raises(StaleCacheError):
        RecordCacheReader(path, vw2)


def test_cache_path_for():
    assert cache_path_for("/x/train.vw") == "/x/train.vw.fwcache"
