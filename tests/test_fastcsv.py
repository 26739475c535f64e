"""Native CSV line parser (io/_native/fastcsv.cc via io/native.py).

The parser is the loader's hot path (reference analog DataLoader.cu:19-54);
these tests pin exact agreement with NumPy's parsers on well-formed input
and the fall-back behavior on malformed input.
"""
import numpy as np
import pytest

from flex_tpu.io import native


needs_native = pytest.mark.skipif(
    not native.available(), reason="no g++ toolchain")


@needs_native
def test_i64_exact_random():
    rng = np.random.default_rng(0)
    vals = rng.integers(-(2**62), 2**62, 100_000)
    line = ",".join(map(str, vals)).encode()
    got = native.parse_number_line(line, np.int64)
    np.testing.assert_array_equal(got, vals)


@needs_native
def test_i64_small_and_edge():
    for text, want in [
        (b"0", [0]),
        (b"1,-2,+3", [1, -2, 3]),
        (b" 7 , 8", [7, 8]),
        (b"9223372036854775807,-9223372036854775808",
         [2**63 - 1, -(2**63)]),
    ]:
        np.testing.assert_array_equal(
            native.parse_number_line(text, np.int64), want)


@needs_native
def test_f32_correctly_rounded_vs_numpy():
    """Every token must round to the same f32 NumPy's parser produces —
    the graph values feed an exact-f32 check downstream."""
    rng = np.random.default_rng(1)
    vals = (2.0 * rng.random(50_000) - 1.0).astype(np.float32)
    # repr round-trips f32 exactly through decimal
    line = ",".join(repr(float(v)) for v in vals).encode()
    got = native.parse_number_line(line, np.float32)
    np.testing.assert_array_equal(got, vals)


@needs_native
def test_f32_forms():
    line = b"1.5,-0.25,3e2,2E-3,.5,-.75,+1e0,6250000000.0,1e-40"
    got = native.parse_number_line(line, np.float32)
    want = np.array([1.5, -0.25, 300.0, 2e-3, 0.5, -0.75, 1.0,
                     6.25e9, 1e-40], np.float32)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_f32_17_digit_mantissa_and_huge_exponent():
    # > 17 mantissa digits exercises the digit-overflow path; 1e99/The
    # strtof fallback covers out-of-range exponents (inf in f32)
    line = b"123456789012345678901.0,1e99,-1e99"
    got = native.parse_number_line(line, np.float32)
    assert got[0] == np.float32(123456789012345678901.0)
    assert np.isinf(got[1]) and got[1] > 0
    assert np.isinf(got[2]) and got[2] < 0


def test_empty_line():
    assert native.parse_number_line(b"", np.int64).shape == (0,)
    assert native.parse_number_line(b"", np.float32).shape == (0,)


def test_malformed_raises():
    """Garbage tokens must NOT silently parse as zeros — that corrupts the
    graph.  Both the native and the NumPy fallback raise ValueError."""
    for line in (b"1,foo,3", b"1,2,3junk,4"):
        with pytest.raises(ValueError):
            native.parse_number_line(line, np.int64)
        with pytest.raises(ValueError):
            native.parse_number_line(line, np.float32)
        with pytest.raises(ValueError):
            native._numpy_parse(line, np.dtype(np.float32))


@needs_native
def test_empty_token_parses_as_zero():
    # lenient like the reference's istringstream loop: ",," -> 0, in BOTH
    # dtypes (the f32 path once desynchronized on empty tokens)
    np.testing.assert_array_equal(
        native.parse_number_line(b"1,,2", np.int64), [1, 0, 2])
    np.testing.assert_array_equal(
        native.parse_number_line(b"1.0,,2.0", np.float32),
        np.array([1.0, 0.0, 2.0], np.float32))


@needs_native
def test_f32_leading_zeros_keep_significant_digits():
    """Leading zeros must not consume the 17-significant-digit budget —
    0.0000000000000000123 once silently parsed as 0.0."""
    line = b"0.0000000000000000123,00000000000000000005,0.0,000"
    got = native.parse_number_line(line, np.float32)
    want = np.array([1.23e-17, 5.0, 0.0, 0.0], np.float32)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_multithreaded_chunking_exact():
    """A line long enough to split across every worker thread must still
    parse element-exactly (chunk boundaries land mid-number unless the
    splitter advances them past a comma)."""
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 2**40, 500_000)
    line = ",".join(map(str, vals)).encode()
    got = native.parse_number_line(line, np.int64)
    np.testing.assert_array_equal(got, vals)
