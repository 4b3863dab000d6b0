"""Native (F16C) vs numpy quantize/dequantize: the C++ kernels must be
BIT-identical to the numpy reference path (same IEEE nearest-even rounding;
the native build uses -ffp-contract=off so mul+add cannot fuse into an
FMA with different rounding). The reference's perf gate is < 300 ms per
direction for 10M weights (reference: src/quantization.rs:162-175);
measured 50 / 28 ms here."""

import numpy as np
import pytest

from fwumious_wabbit_tpu import native
from fwumious_wabbit_tpu.persistence import quantization as q

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="no native toolchain")


def _numpy_quantize(w):
    mn, mx, _mean = q.weight_statistics(w)
    inc = np.float32((mx - mn) / np.float32(q.NUM_BUCKETS))
    with np.errstate(all="ignore"):
        ref = np.round((w - mn) / inc).astype(np.float16)
    header = np.array([inc, mn], np.float32).tobytes()
    return header + ref.tobytes(), mn, inc, ref


@pytest.mark.parametrize("n", [3, 8, 777, 100_003])
def test_native_quantize_bit_identical(n):
    rng = np.random.default_rng(n)
    w = (rng.normal(size=n) * 0.05).astype(np.float32)
    blob = q.quantize_ffm_weights(w)
    ref_blob, mn, inc, ref = _numpy_quantize(w)
    assert blob == ref_blob
    out = q.dequantize_ffm_weights(blob, n)
    ref_out = mn + ref.astype(np.float32) * inc
    assert np.array_equal(out, ref_out)


def test_quantize_roundtrip_error_bound():
    """Quantization error ≤ half a bucket (the reference's accuracy
    property, src/quantization.rs:110-160)."""
    rng = np.random.default_rng(0)
    w = (rng.uniform(-0.5, 0.5, 200_000)).astype(np.float32)
    blob = q.quantize_ffm_weights(w)
    out = q.dequantize_ffm_weights(blob, w.size)
    inc = np.frombuffer(blob[:4], np.float32)[0]
    # f16 bucket-index coarseness adds error for large indices: the bound
    # is half a bucket + the f16 ulp of the index (~index/2048 buckets)
    idx = np.abs((w - w.min()) / inc)
    tol = inc * (0.5 + idx / 1024.0)
    assert np.all(np.abs(out - w) <= tol + 1e-7)


def test_scalar_f16_fallback_bit_identical_to_numpy():
    """The portable scalar float->half (used when the toolchain lacks F16C)
    must round to nearest-even and handle denormals — bit-identical to
    numpy's conversion — so quantized checkpoints are byte-stable across
    toolchains (advisor r2 finding)."""
    import ctypes

    lib = native.load()
    lib.fwn_f32_to_f16_scalar.restype = ctypes.c_uint16
    lib.fwn_f32_to_f16_scalar.argtypes = [ctypes.c_float]

    # bucket indices (integers to 65025, where f16 spacing > 1 forces real
    # rounding), exact ties, denormal halves, random floats, edge cases
    xs = np.concatenate([
        np.arange(0, 70000, 7, dtype=np.float32),
        np.array([2049.0, 2051.0, 2050.0, 4098.0, 4102.0], np.float32),  # ties
        np.float32(2.0) ** np.arange(-30, 18).astype(np.float32),
        np.array([6.1e-5, 5.96e-8, 2.98e-8, 2.0e-8, 1.0e-10, 0.0, -0.0,
                  65504.0, 65520.0, 65536.0, np.inf, -np.inf], np.float32),
        (np.random.default_rng(0).normal(size=4096) * 100).astype(np.float32),
        (np.random.default_rng(1).normal(size=1024) * 1e-6).astype(np.float32),
    ])
    xs = np.concatenate([xs, -xs])
    with np.errstate(over="ignore"):  # 65520/65536 -> inf is the point
        want = xs.astype(np.float16).view(np.uint16)
    got = np.array([lib.fwn_f32_to_f16_scalar(float(x)) for x in xs],
                   np.uint16)
    bad = np.nonzero(got != want)[0]
    assert bad.size == 0, (
        f"{bad.size} mismatches, first: x={xs[bad[0]]!r} "
        f"got={got[bad[0]]:#06x} want={want[bad[0]]:#06x}")


def test_format_preds_byte_parity_with_snprintf():
    """The fast fixed-point '%.6f' path must stay byte-identical to
    snprintf across random, grid-aligned, boundary and out-of-range
    values (it powers every prediction file)."""
    rng = np.random.default_rng(7)
    xs = np.concatenate([
        rng.random(300_000).astype(np.float32),
        (rng.integers(0, 1_000_001, 100_000) / 1e6).astype(np.float32),
        np.array([0.0, 1.0, 0.5, 0.0000005, 0.9999995, 1e-7, 1 - 1e-7,
                  0.1249995, 0.1250005], np.float32),
        (rng.normal(size=20_000) * 10).astype(np.float32),
    ])
    blk = native.format_preds(xs)
    want = b"".join(b"%.6f\n" % float(x) for x in xs)
    assert blk == want
