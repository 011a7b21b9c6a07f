"""Distribution-drift checks: histograms, PSI, KS, t-digest quantiles.

Axis B of the north rule: the reference's Length/Literal checks lifted
to distribution level (SURVEY.md §2.7). scipy/datasketches are absent
in the sandbox, so the PSI and KS formulas are implemented directly
(they are ~20 LoC each) and the quantile sketch is a from-scratch
merging t-digest in numpy.

Scale notes:

* ``fixed_width_histogram`` — one groupBy on a derived bin id
  (map-side combinable; at most ``nbins`` groups, so the shuffle is
  tiny regardless of table size).
* ``psi`` / ``ks_statistic`` — computed on the *binned* frames
  (≤ nbins rows each): driver-side math on sketch output, never on raw
  data.
* ``tdigest_quantiles`` — one ``applyInPandas``-style partial sketch
  per partition, merged on the driver: O(partitions × centroids)
  driver work, constant executor memory.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "fixed_width_histogram",
    "psi",
    "ks_statistic",
    "drift_statistics",
    "drift_statistics_flagged",
    "drift_report",
    "tdigest_quantiles",
    "grouped_tdigest_quantiles",
    "volume_anomalies",
    "benford_first_digit",
    "category_diff",
    "signature_bit_profile",
    "signature_bit_drift",
]


def bin_expr(col, lo: float, hi: float, nbins: int):
    """Bin id in [0, nbins-1]; values outside [lo, hi) clamp to the edge
    bins. Identical arithmetic is used by the DuckDB oracle SQL."""
    width = (hi - lo) / nbins
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(nbins - 1).cast("long"), raw.cast("long")))


def fixed_width_histogram(
    df: DataFrame, col: str, *, lo: float, hi: float, nbins: int = 32
) -> DataFrame:
    """(bin, cnt) histogram with fixed-width bins — deterministic, so two
    engines binning the same data agree exactly."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(bin_expr(F.col(col), lo, hi, nbins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _hist_to_probs(hist: DataFrame, nbins: int) -> np.ndarray:
    counts = np.zeros(nbins, dtype=np.float64)
    for r in hist.collect():  # ≤ nbins rows
        counts[int(r["bin"])] = float(r["cnt"])
    total = counts.sum()
    return counts / total if total > 0 else counts


def psi(
    expected: DataFrame,
    actual: DataFrame,
    *,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 32,
    eps: float = 1e-6,
) -> float:
    """Population Stability Index between two frames on one column.

    PSI = sum over bins of (p_a - p_e) * ln(p_a / p_e), with ``eps``
    flooring empty bins. Common thresholds: <0.1 stable, 0.1-0.25
    moderate shift, >0.25 major shift.
    """
    pe = _hist_to_probs(fixed_width_histogram(expected, col, lo=lo, hi=hi, nbins=nbins), nbins)
    pa = _hist_to_probs(fixed_width_histogram(actual, col, lo=lo, hi=hi, nbins=nbins), nbins)
    pe = np.clip(pe, eps, None)
    pa = np.clip(pa, eps, None)
    return float(np.sum((pa - pe) * np.log(pa / pe)))


def ks_statistic(
    expected: DataFrame,
    actual: DataFrame,
    *,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 256,
) -> float:
    """Two-sample Kolmogorov–Smirnov statistic approximated on binned
    CDFs (exact as nbins -> distinct values; 256 bins bounds the error
    at ~1/256 of the range)."""
    pe = _hist_to_probs(fixed_width_histogram(expected, col, lo=lo, hi=hi, nbins=nbins), nbins)
    pa = _hist_to_probs(fixed_width_histogram(actual, col, lo=lo, hi=hi, nbins=nbins), nbins)
    return float(np.max(np.abs(np.cumsum(pe) - np.cumsum(pa))))


def _drift_from_tagged(
    tagged: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins_psi: int,
    nbins_ks: int,
    eps: float,
) -> dict:
    """Both drift statistics from ONE aggregation over a side-tagged
    frame (``__side``: False = expected, True = actual, NULL = neither).

    Each row contributes its coarse (PSI) and fine (KS) bin id in the
    same projection, so the group key is the composite (bin_psi,
    bin_ks) — at most ~nbins_ks + nbins_psi groups (fine bins nest in
    coarse ones up to FP boundary rounding, which the composite key
    handles exactly). Map-side combinable; the collect is <= a few
    hundred rows regardless of table size. Binning per statistic is the
    direct formula — bit-identical to the separate-histogram path and to
    the DuckDB oracle."""
    c = F.col(col)
    rows = (
        tagged.filter(c.isNotNull() & F.col("__side").isNotNull())
        .select(
            bin_expr(c, lo, hi, nbins_psi).alias("bp"),
            bin_expr(c, lo, hi, nbins_ks).alias("bk"),
            "__side",
        )
        .groupBy("bp", "bk")
        .agg(
            F.count(F.when(~F.col("__side"), F.lit(1))).alias("ce"),
            F.count(F.when(F.col("__side"), F.lit(1))).alias("ca"),
        )
        .collect()
    )
    he, ha = np.zeros(nbins_psi), np.zeros(nbins_psi)
    ke, ka = np.zeros(nbins_ks), np.zeros(nbins_ks)
    for r in rows:
        he[int(r["bp"])] += r["ce"]
        ha[int(r["bp"])] += r["ca"]
        ke[int(r["bk"])] += r["ce"]
        ka[int(r["bk"])] += r["ca"]
    pe = np.clip(he / he.sum() if he.sum() > 0 else he, eps, None)
    pa = np.clip(ha / ha.sum() if ha.sum() > 0 else ha, eps, None)
    psi_val = float(np.sum((pa - pe) * np.log(pa / pe)))
    qe = ke / ke.sum() if ke.sum() > 0 else ke
    qa = ka / ka.sum() if ka.sum() > 0 else ka
    ks_val = float(np.max(np.abs(np.cumsum(qe) - np.cumsum(qa))))
    return {"psi": psi_val, "ks": ks_val}


def drift_statistics(
    expected: DataFrame,
    actual: DataFrame,
    *,
    col: str,
    lo: float,
    hi: float,
    nbins_psi: int = 32,
    nbins_ks: int = 256,
    eps: float = 1e-6,
) -> dict:
    """PSI and KS together in a single job (tag-union of the two sides +
    one combined aggregation) — replaces four independent histogram
    scans with one pass per side."""
    tagged = expected.select(F.col(col), F.lit(False).alias("__side")).unionByName(
        actual.select(F.col(col), F.lit(True).alias("__side"))
    )
    return _drift_from_tagged(tagged, col, lo, hi, nbins_psi, nbins_ks, eps)


def drift_statistics_flagged(
    df: DataFrame,
    *,
    col: str,
    expected_cond,
    actual_cond,
    lo: float,
    hi: float,
    nbins_psi: int = 32,
    nbins_ks: int = 256,
    eps: float = 1e-6,
) -> dict:
    """The common drift pattern — both populations live in ONE table,
    distinguished by a predicate (this week vs last week, cohort A vs
    B). One single scan of the fact table computes PSI and KS for both
    sides; rows matching neither predicate are ignored."""
    side = F.when(actual_cond, F.lit(True)).when(expected_cond, F.lit(False))
    tagged = df.select(F.col(col), side.alias("__side"))
    return _drift_from_tagged(tagged, col, lo, hi, nbins_psi, nbins_ks, eps)


def drift_report(
    expected: DataFrame,
    actual: DataFrame,
    *,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 32,
    psi_threshold: float = 0.25,
    ks_threshold: float = 0.2,
) -> dict:
    stats = drift_statistics(
        expected, actual, col=col, lo=lo, hi=hi,
        nbins_psi=nbins, nbins_ks=max(nbins, 128),
    )
    p, k = stats["psi"], stats["ks"]
    return {
        "column": col,
        "psi": p,
        "ks": k,
        "psi_exceeded": p > psi_threshold,
        "ks_exceeded": k > ks_threshold,
    }


# ---------------------------------------------------------------------------
# t-digest (from scratch, numpy): partial sketch per partition -> merge
# ---------------------------------------------------------------------------


class TDigest:
    """Minimal merging t-digest (Dunning's k1 scale function idea
    simplified to quantile-uniform compression buckets). Accurate at the
    tails where uniform histograms are not; constant memory
    (≤ compression centroids)."""

    def __init__(self, compression: int = 100) -> None:
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self.means = np.concatenate([self.means, values.astype(np.float64)])
        self.weights = np.concatenate([self.weights, np.ones(len(values))])
        if len(self.means) > 8 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> None:
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()

    def _compress(self) -> None:
        if len(self.means) <= self.compression:
            return
        order = np.argsort(self.means)
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        # target: centroids sized by the k1 scale function — smaller near
        # the tails (q(1-q) weighting), larger in the middle
        cum = np.cumsum(weights) - weights / 2.0
        q = cum / total
        k = (self.compression / (2 * math.pi)) * np.arcsin(2 * q - 1)
        bucket = np.floor(k - k[0]).astype(np.int64)
        new_means, new_weights = [], []
        for b in np.unique(bucket):
            mask = bucket == b
            w = weights[mask].sum()
            new_means.append(float(np.average(means[mask], weights=weights[mask])))
            new_weights.append(float(w))
        self.means = np.asarray(new_means)
        self.weights = np.asarray(new_weights)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means)
        means, weights = self.means[order], self.weights[order]
        cum = np.cumsum(weights) - weights / 2.0
        target = q * weights.sum()
        return float(np.interp(target, cum, means))

    def to_rows(self) -> list:
        return [(float(m), float(w)) for m, w in zip(self.means, self.weights)]

    @classmethod
    def from_rows(cls, rows, compression: int = 100) -> "TDigest":
        d = cls(compression)
        if rows:
            d.means = np.array([r[0] for r in rows], dtype=np.float64)
            d.weights = np.array([r[1] for r in rows], dtype=np.float64)
        return d


def tdigest_quantiles(
    df: DataFrame,
    col: str,
    quantiles: Sequence[float] = (0.01, 0.25, 0.5, 0.75, 0.99),
    *,
    compression: int = 100,
) -> dict[float, float]:
    """Distributed quantiles via per-partition t-digest partials merged
    on the driver. Each executor sees only its partition's values inside
    an Arrow batch; the driver merges ≤ partitions × compression
    centroids."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf  # noqa: F401

    comp = compression

    def partial(iterator):
        for pdf in iterator:
            d = TDigest(comp)
            vals = pdf[col].dropna().to_numpy(dtype=np.float64)
            d.add(vals)
            d._compress()
            rows = d.to_rows()
            yield pd.DataFrame({"mean": [m for m, _ in rows], "weight": [w for _, w in rows]})

    partials = df.select(col).mapInPandas(partial, "mean double, weight double").collect()
    merged = TDigest.from_rows([(r["mean"], r["weight"]) for r in partials], comp)
    merged._compress()
    return {q: merged.quantile(q) for q in quantiles}


def grouped_tdigest_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    *,
    compression: int = 100,
    salt_buckets: Optional[int] = None,
) -> DataFrame:
    """Per-KEY quantiles via t-digest sketches:
    (key string, quantile double, value double) rows.

    This is the aggregate where explicit salting genuinely rescues skew
    (unlike count — see stats.duplicate_keys: algebraic aggregates get
    map-side partial aggregation for free). A custom sketch built in an
    ``applyInPandas`` group has NO map-side combine: unsalted, every row
    of a key converges on ONE Arrow python worker, so a hot key (30% of
    a 10^12-row table) is a straggler task holding 30% of the data.

    ``salt_buckets=B`` runs the classic two-phase shape instead:
    phase 1 digests per (key, salt) — the hot key's rows spread over B
    workers, each emitting <= ``compression`` centroids; phase 2 merges
    <= B x compression centroid rows per key (t-digests merge into a
    valid digest) and reads the quantiles off the merged sketch. Phase-2
    input is sketch-sized, not data-sized, so no task ever holds a
    data-proportional share of a hot key.

    The salt is the physical partition id (deterministic per scan
    layout, value-independent — a constant-valued hot key still
    spreads). Sketch results depend on centroid merge order either way,
    so salted vs unsalted agree to sketch tolerance, not bit-exactly.
    """
    import pandas as pd

    comp = compression
    probs = [float(q) for q in quantiles]
    out_schema = "key string, quantile double, value double"

    def digest_rows(values: np.ndarray) -> "pd.DataFrame":
        d = TDigest(comp)
        d.add(values)
        d._compress()
        rows = d.to_rows()
        return rows

    base = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("val"),
    ).where(F.col("val").isNotNull())

    if not salt_buckets:

        def one_phase(pdf: "pd.DataFrame") -> "pd.DataFrame":
            key = pdf["key"].iloc[0]
            d = TDigest(comp)
            d.add(pdf["val"].to_numpy(dtype=np.float64))
            return pd.DataFrame(
                {
                    "key": [key] * len(probs),
                    "quantile": probs,
                    "value": [d.quantile(q) for q in probs],
                }
            )

        return base.groupBy("key").applyInPandas(one_phase, out_schema)

    salt = F.pmod(F.spark_partition_id(), F.lit(int(salt_buckets)))

    def partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rows = digest_rows(pdf["val"].to_numpy(dtype=np.float64))
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]] * len(rows),
                "mean": [m for m, _ in rows],
                "weight": [w for _, w in rows],
            }
        )

    partials = (
        base.withColumn("salt", salt)
        .groupBy("key", "salt")
        .applyInPandas(partial, "key string, mean double, weight double")
    )

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        d = TDigest.from_rows(
            list(zip(pdf["mean"].to_numpy(), pdf["weight"].to_numpy())), comp
        )
        d._compress()
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]] * len(probs),
                "quantile": probs,
                "value": [d.quantile(q) for q in probs],
            }
        )

    return partials.groupBy("key").applyInPandas(merge, out_schema)


def categorical_histogram(df: DataFrame, col: str) -> DataFrame:
    """(value, cnt) — counts per category (map-side combinable)."""
    return df.filter(F.col(col).isNotNull()).groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def categorical_psi(
    expected: DataFrame, actual: DataFrame, *, col: str, eps: float = 1e-6
) -> float:
    """PSI over a categorical column (e.g. image format mix): same
    formula as the binned numeric PSI, categories as bins (union of both
    sides; missing category -> eps)."""
    e = {r["value"]: float(r["cnt"]) for r in categorical_histogram(expected, col).collect()}
    a = {r["value"]: float(r["cnt"]) for r in categorical_histogram(actual, col).collect()}
    cats = sorted(set(e) | set(a))
    et, at = sum(e.values()) or 1.0, sum(a.values()) or 1.0
    total = 0.0
    for c in cats:
        pe = max(e.get(c, 0.0) / et, eps)
        pa = max(a.get(c, 0.0) / at, eps)
        total += (pa - pe) * math.log(pa / pe)
    return float(total)


def categorical_psi_flagged(
    df: DataFrame,
    *,
    col,
    expected_cond,
    actual_cond,
    eps: float = 1e-6,
) -> float:
    """Categorical PSI when both populations live in ONE table: a single
    scan with per-category conditional counts (vs two scans for the
    two-frame form). Population rule, IDENTICAL to
    ``drift_statistics_flagged``: a row matching both predicates counts
    on the *actual* side only (exclusive when-chain precedence); rows
    matching neither are ignored."""
    side = F.when(actual_cond, F.lit(True)).when(expected_cond, F.lit(False))
    rows = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(
            F.count(F.when(side == F.lit(False), F.lit(1))).alias("ce"),
            F.count(F.when(side == F.lit(True), F.lit(1))).alias("ca"),
        )
        .collect()
    )
    et = float(sum(r["ce"] for r in rows)) or 1.0
    at = float(sum(r["ca"] for r in rows)) or 1.0
    total = 0.0
    for r in rows:
        if r["ce"] == 0 and r["ca"] == 0:
            continue  # category absent from both populations
        pe = max(r["ce"] / et, eps)
        pa = max(r["ca"] / at, eps)
        total += (pa - pe) * math.log(pa / pe)
    return float(total)


def image_table_drift_report(
    reference: DataFrame,
    current: DataFrame,
    *,
    caption_col: str = "caption",
    fmt_col: str = "fmt",
    max_caption_len: float = 256.0,
    nbins: int = 16,
    psi_threshold: float = 0.25,
) -> dict:
    """North-rule drift checks for the image+caption table: caption-
    length distribution (numeric PSI + KS on fixed bins) and format mix
    (categorical PSI) between a reference snapshot and the current data.
    Both sides reduce to <= nbins counts before any driver-side math.

    PSI is a large-sample statistic: with n samples per side its noise
    floor is ~nbins/n (eps-floored singleton bins explode the log term),
    so keep nbins << n — the 16-bin default is calibrated for >= 1k rows
    per side; at real scale any nbins is fine."""
    ref_len = reference.select(F.length(caption_col).cast("double").alias("__len"))
    cur_len = current.select(F.length(caption_col).cast("double").alias("__len"))
    cap = drift_statistics(
        ref_len, cur_len, col="__len", lo=0.0, hi=max_caption_len,
        nbins_psi=nbins, nbins_ks=128,
    )
    cap_psi, cap_ks = cap["psi"], cap["ks"]
    fmt_psi = categorical_psi(reference, current, col=fmt_col)
    return {
        "caption_len_psi": cap_psi,
        "caption_len_ks": cap_ks,
        "fmt_mix_psi": fmt_psi,
        "caption_drifted": cap_psi > psi_threshold,
        "fmt_drifted": fmt_psi > psi_threshold,
    }


def volume_anomalies(
    df,
    ts_col: str,
    *,
    k: int = 3,
) -> "DataFrame":
    """Ingest-volume anomaly detection: bucket rows per day and flag
    buckets whose count deviates more than ``k`` standard deviations
    from the table's own per-bucket mean — the "did a feed die /
    double-fire" monitor that row-level checks cannot see. Output:
    (bucket_start, n_rows, is_anomaly) for EVERY bucket.

    The k·σ gate is EXACT-INTEGER (same contract as the PSNR and
    centroid-distance gates): with per-bucket counts c_i, n buckets,
    S=Σc, Q=Σc², flag iff (c·n − S)² > k²·(n·Q − S²) — the |c−μ|>kσ
    inequality cleared of division and sqrt, so there is no float on
    either side and an oracle reproduces it bit-for-bit. BIGINTs hold
    to ~10^9 rows/bucket at ~10^3 buckets; beyond that cast the three
    products to DECIMAL(38,0).

    Scale: one map-side-combined groupBy(day) to |buckets| rows, one
    3-scalar global fold broadcast back (literal join of a 1-row
    frame) — the table is scanned once; everything after is O(buckets).
    """
    day = F.date_trunc("day", F.col(ts_col)).alias("bucket_start")
    counts = df.groupBy(day).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_rows").alias("__s"),
        F.sum(F.col("n_rows") * F.col("n_rows")).alias("__q"),
    )
    j = counts.crossJoin(F.broadcast(stats))
    lhs = F.col("n_rows") * F.col("__n") - F.col("__s")
    rhs = F.lit(int(k) * int(k)) * (
        F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    )
    return j.select(
        "bucket_start",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        ((lhs * lhs) > rhs).alias("is_anomaly"),
    )


def benford_first_digit(df: DataFrame, int_col: str) -> DataFrame:
    """Benford's-law profile of an integer column: for each leading
    digit 1-9, the observed share vs the Benford expectation
    log10(1+1/d) — (digit, n, p_observed, p_expected). Financial/count
    columns that drift from Benford flag fabricated or truncated feeds;
    it is the distribution check that needs no reference snapshot.

    The first digit comes from the INTEGER's decimal string (one
    substring on the codegen'd cast — no float log10 of the value,
    whose 1-ulp wobble at exact powers of ten would misbin boundary
    values and break cross-engine reproducibility). Zero values carry
    no leading digit and are excluded; negatives contribute their
    magnitude's digit. One map-side-combined 9-group aggregate joined
    to a literal 9-row digit frame so absent digits still report
    p_observed = 0."""
    first = F.substring(F.abs(F.col(int_col)).cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(int_col).isNotNull() & (F.col(int_col) != 0))
        .select(first.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    total = counts.agg(F.sum("cnt").alias("__t"))
    return (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n"),
            F.round(
                F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
                / F.col("__t").cast("double"),
                6,
            ).alias("p_observed"),
            F.round(
                F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")),
                6,
            ).alias("p_expected"),
        )
    )


def category_diff(df: DataFrame, col, *, base_cond, cur_cond) -> DataFrame:
    """Categorical-domain drift PSI cannot express: which categories are
    NEW in the current cohort, which VANISHED since the baseline, and
    the count movement of the rest. A format mix whose shares barely
    move still fails this check when a new 'avif' value appears — the
    schema-on-read regression a share-based statistic smooths over.

    Output: (category, n_base, n_current, status) with status in
    {'new', 'vanished', 'kept'}. Rows in neither cohort (the category
    exists in the table but matches neither condition) are dropped.

    ONE scan, ONE map-side-combinable groupBy: both cohorts aggregate
    as conditional sums per category — no second scan, no join of two
    count frames, and a hot category contributes one partial row per
    mapper. The shuffle carries |categories| rows."""
    col = F.col(col) if isinstance(col, str) else col
    out = (
        df.select(
            col.alias("category"),
            F.when(base_cond, 1).otherwise(0).alias("__b"),
            F.when(cur_cond, 1).otherwise(0).alias("__c"),
        )
        .groupBy("category")
        .agg(
            F.sum("__b").cast("bigint").alias("n_base"),
            F.sum("__c").cast("bigint").alias("n_current"),
        )
        .filter((F.col("n_base") > 0) | (F.col("n_current") > 0))
    )
    status = (
        F.when(F.col("n_base") == 0, F.lit("new"))
        .when(F.col("n_current") == 0, F.lit("vanished"))
        .otherwise(F.lit("kept"))
    )
    return out.select("category", "n_base", "n_current", status.alias("status"))


def signature_bit_profile(
    df: DataFrame, sig_col: str, *, bits: int = 48
) -> DataFrame:
    """Per-bit popcount profile of an integer signature column
    (phash/simhash): (bit, ones, n, frac_ones). On a healthy perceptual
    hash every bit sits near frac 0.5; a decoder or preprocessing
    change that biases specific DCT coefficients shows up as specific
    bits drifting — BEFORE any pair-level near-dup comparison would.

    One whole-table aggregate with ``bits`` algebraic sums (map-side
    combinable, one scan, no row fan-out — an explode over bit indexes
    would multiply the scan output ``bits``x at 100 TB), unpivoted by
    a stack projection.

    .. caution:: An EMPTY (or all-null) input yields ``n = 0`` and NULL
       ``frac_ones`` for every bit, and ``signature_bit_drift`` built on
       two such profiles reports NULL ``abs_diff``/``flagged`` — i.e. an
       empty snapshot passes the drift gate silently. Callers gating a
       pipeline on bit drift must pre-check snapshot non-emptiness
       (e.g. ``volume_anomaly`` or a bare count) before trusting an
       all-NULL profile."""
    aggs = [F.count(F.col(sig_col)).alias("__n")]
    for b in range(bits):
        aggs.append(
            F.sum(F.shiftright(F.col(sig_col), b).bitwiseAND(F.lit(1)))
            .alias(f"__b{b}")
        )
    wide = df.agg(*aggs)
    tuples = ", ".join(f"{b}, `__b{b}`" for b in range(bits))
    return wide.selectExpr(
        "__n", f"stack({bits}, {tuples}) as (bit, ones)"
    ).select(
        F.col("bit").cast("int").alias("bit"),
        F.col("ones").cast("bigint").alias("ones"),
        F.col("__n").cast("bigint").alias("n"),
        (F.col("ones") / F.col("__n")).alias("frac_ones"),
    )


def signature_bit_drift(
    base: DataFrame,
    current: DataFrame,
    sig_col: str,
    *,
    bits: int = 48,
    threshold: float = 0.05,
) -> DataFrame:
    """Per-bit frequency drift between two snapshots' signature
    columns: (bit, frac_base, frac_current, abs_diff, flagged). Each
    side is one aggregate; the join is ``bits`` rows — driver-trivial,
    broadcast by AQE regardless of input scale."""
    b = signature_bit_profile(base, sig_col, bits=bits).select(
        "bit", F.col("frac_ones").alias("frac_base")
    )
    c = signature_bit_profile(current, sig_col, bits=bits).select(
        "bit", F.col("frac_ones").alias("frac_current")
    )
    diff = F.abs(F.col("frac_current") - F.col("frac_base"))
    return b.join(c, "bit").select(
        "bit",
        "frac_base",
        "frac_current",
        diff.alias("abs_diff"),
        (diff > F.lit(threshold)).alias("flagged"),
    )
