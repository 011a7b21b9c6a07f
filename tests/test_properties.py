"""Property-based tests (hypothesis) — beyond the reference's own test
strategy (it has none; SURVEY.md §5): the staged Column kernel must
agree with its pure-Python twin for arbitrary JSON values, codecs must
round-trip arbitrary images, and the t-digest must bound quantile error.
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oblate_spark import fields
from oblate_spark.functions import codecs
from oblate_spark.pyload import load_field_value

# -- pure-python properties (no Spark session needed) -----------------------

json_scalars = st.one_of(
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(alphabet=st.characters(codec="ascii", exclude_characters='"\\\x00'), max_size=20),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)


@given(json_scalars)
@settings(max_examples=200)
def test_pyload_integer_matches_python_semantics(v):
    loaded, errs = load_field_value(fields.Integer(strict=False, name="f"), v)
    try:
        expected = int(v)
        ok = True
    except Exception:
        ok = False
    if ok:
        assert errs == [] and loaded == expected
    else:
        assert errs and errs[0][2] == f"Failed to coerce {v!r} to integer"


@given(json_scalars)
@settings(max_examples=200)
def test_pyload_string_nonstrict_total(v):
    loaded, errs = load_field_value(fields.String(strict=False, name="f"), v)
    assert errs == [] and loaded == str(v)


@given(st.integers(min_value=1, max_value=80), st.integers(min_value=1, max_value=80),
       st.sampled_from(["bmp", "png", "ppm"]), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_codec_roundtrip_property(w, h, fmt, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = codecs.decode_image(codecs.encode_image(px, fmt))
    assert np.array_equal(px, out)


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_phash_invariant_to_encoding(seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    hashes = {codecs.phash64(codecs.decode_image(codecs.encode_image(px, f))) for f in ("bmp", "png", "ppm")}
    assert len(hashes) == 1  # lossless codecs -> identical phash


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=50, max_size=500))
@settings(max_examples=25, deadline=None)
def test_tdigest_quantile_bounds(values):
    from oblate_spark.operators.drift import TDigest

    d = TDigest(compression=100)
    d.add(np.asarray(values))
    arr = np.sort(np.asarray(values))
    for q in (0.1, 0.5, 0.9):
        est = d.quantile(q)
        # estimate must lie within the data range and near the true
        # quantile's rank neighborhood
        assert arr[0] <= est <= arr[-1]
        true = float(np.quantile(arr, q))
        spread = float(arr[-1] - arr[0]) or 1.0
        assert abs(est - true) <= 0.15 * spread


# -- staged Column kernel vs python twin (one Spark pass over many cases) ---


def test_staged_kernel_agrees_with_python_twin(spark):
    import random

    rnd = random.Random(42)
    cases = []
    for _ in range(300):
        kind = rnd.randrange(5)
        if kind == 0:
            cases.append(rnd.randint(-(2**40), 2**40))
        elif kind == 1:
            cases.append(round(rnd.uniform(-1e6, 1e6), 6))
        elif kind == 2:
            cases.append("".join(rnd.choice("abc123 .-") for _ in range(rnd.randrange(12))))
        elif kind == 3:
            cases.append(rnd.choice([True, False]))
        else:
            cases.append(str(rnd.randint(-999999, 999999)))

    for field_cls in (fields.Integer, fields.Float, fields.Boolean, fields.String):
        for strict in (True, False):
            fld = field_cls(strict=strict, name="f")

            from .test_primitives import staged_df, violations_map

            df = staged_df(spark, {"f": cases})
            from oblate_spark.schema import Schema, SchemaMeta

            S = SchemaMeta("S", (Schema,), {"f": field_cls(strict=strict)})
            vm = violations_map(S.validate(df, mode="staged"))

            for i, v in enumerate(cases):
                _, errs = load_field_value(fld, v)
                spark_msgs = sorted(m for _, m in vm.get(str(i), []))
                py_msgs = sorted(m for _, _, m in errs)
                assert spark_msgs == py_msgs, (
                    field_cls.__name__, strict, v, spark_msgs, py_msgs
                )


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
    st.sampled_from(["bmp", "png", "ppm"]),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_codec_truncation_fuzz_never_escapes_decode_error(w, h, fmt, seed, cut):
    """Any prefix truncation of a valid encoding either decodes or
    raises ImageDecodeError — never IndexError/struct.error/etc. (the
    round-2 ADVICE bug class: malformed payloads must surface as
    violations, not task failures)."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = codecs.encode_image(px, fmt)
    prefix = blob[: min(cut, len(blob))]
    try:
        out = codecs.decode_image(prefix)
        assert out.shape[2] == 3  # decoded something plausible
    except codecs.ImageDecodeError:
        pass  # the only acceptable failure mode


@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
    st.sampled_from(["bmp", "png", "ppm"]),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=60, deadline=None)
def test_codec_byte_corruption_fuzz(w, h, fmt, seed, pos_seed, newbyte):
    """Single-byte corruption anywhere in a valid encoding either still
    decodes (an HxWx3 image) or raises ImageDecodeError — no other
    exception type may escape."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = bytearray(codecs.encode_image(px, fmt))
    pos = pos_seed % len(blob)
    blob[pos] = newbyte
    try:
        out = codecs.decode_image(bytes(blob))
        assert out.ndim == 3 and out.shape[2] == 3
    except codecs.ImageDecodeError:
        pass


@settings(deadline=None, max_examples=20, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=4, max_size=200),
)
def test_iqr_profile_matches_numpy(spark, vals):
    """iqr_outlier_profile's exact-percentile quartiles and fence
    counts agree with numpy's linear-interpolation percentile for any
    integer sample (the dyadic-exactness contract the oracle relies
    on)."""
    import numpy as np

    from oblate_spark.operators.stats import iqr_outlier_profile

    df = spark.createDataFrame([(int(v),) for v in vals], "x bigint")
    row = iqr_outlier_profile(df, ["x"]).collect()[0]
    q1, q3 = np.percentile(np.array(vals, dtype=np.int64), [25, 75], method="linear")
    assert row.q1 == q1 and row.q3 == q3
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    arr = np.array(vals, dtype=np.float64)
    assert row.n_below == int((arr < lo).sum())
    assert row.n_above == int((arr > hi).sum())
