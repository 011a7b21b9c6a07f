"""Deterministic sampling and sequence packing for training-data
pipelines.

Both operators are pure Column expressions built on engine-portable
primitives (md5, integer window sums), so a SQL oracle reproduces them
bit-for-bit. Neither uses ``rand()``: reproducibility across reruns,
engines, and partitionings is the point — a training-data sample that
changes under AQE re-planning is a bug, not a feature.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["deterministic_sample", "mixture_sample", "pack_sequences", "group_split", "split_boundaries", "group_cap"]

#: hex prefix length used for the keep/drop threshold: 8 nibbles = 32
#: uniform bits, granularity 2^-32 on the sampling rate.
_PREFIX = 8


def _threshold_hex(fraction: float) -> str:
    """Largest 8-hex-digit string such that a uniform prefix is below it
    with probability ``fraction`` (lexicographic compare == numeric
    compare for fixed-length lowercase hex)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    v = int(round(fraction * (1 << 32)))
    if v >= 1 << 32:
        # 2^32 needs 9 hex digits, which would compare LOWER than most
        # 8-char prefixes lexicographically ('1...' < 'a...'); 'g' sorts
        # above every hex character, so fraction 1.0 keeps every row
        return "g"
    return format(v, "08x")


def deterministic_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    fraction: float | None = None,
    strata_fractions: Mapping[str, float] | None = None,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic pseudo-random ``fraction`` of rows, decided
    by ``md5(salt || key)`` — the same row is kept on every rerun, on
    every engine, under any partitioning (unlike ``df.sample``, whose
    output depends on partition layout and seed plumbing).

    Stratified mode: pass ``strata_col`` + ``strata_fractions``
    ({stratum_value: fraction}); strata absent from the mapping fall
    back to ``fraction`` (or 0.0 — dropped — when no global fraction is
    given). Changing ``salt`` draws an independent sample; nested
    samples (e.g. 1% ⊂ 10%) come from the SAME salt with smaller
    fractions — a uniform prefix below the 1% threshold is below the
    10% one by construction.

    Scale: map-only (one md5 + one string compare per row); the filter
    sits directly on the scan, no shuffle, no driver state.
    """
    if fraction is None and strata_fractions is None:
        raise ValueError("one of fraction / strata_fractions is required")
    if (strata_fractions is None) != (strata_col is None):
        raise ValueError("strata_fractions and strata_col go together")
    key = F.md5(
        F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    )
    prefix = F.substring(key, 1, _PREFIX)
    if strata_fractions is None:
        cond = prefix < F.lit(_threshold_hex(fraction))
    else:
        default = _threshold_hex(fraction if fraction is not None else 0.0)
        thr = F.lit(default)
        for value, frac in sorted(strata_fractions.items()):
            thr = F.when(
                F.col(strata_col) == F.lit(value), F.lit(_threshold_hex(frac))
            ).otherwise(thr)
        cond = prefix < thr
    return df.filter(cond)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 1,
    order_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed token-budget training sequences:
    (id, tokens, shard, seq_id, seq_offset) — the "concatenate in a
    deterministic order, cut every ``budget`` tokens" packing used to
    build LM training examples from variable-length documents.

    ``seq_offset`` is the document's start position in the shard's
    concatenated token stream modulo nothing — cumulative tokens before
    it; ``seq_id = floor(seq_offset / budget)``, i.e. the sequence its
    FIRST token lands in. A document may straddle a boundary (the
    downstream tokenizer splits it); packing never reorders documents
    within a shard, so the layout is reproducible byte-for-byte.

    Scale: documents are sharded by ``pmod(hash-free id, n_shards)``
    (explicit modulus, not hash — oracle-portable) and each shard packs
    independently — this is how packing distributes at 100 TB: one
    window sum per shard, shards in parallel, no global sequential
    state. One shuffle (the window's partitionBy); all arithmetic exact
    BIGINTs. Deterministic order within a shard = ``order_col`` or
    ``id_col``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    order = order_col if order_col is not None else id_col
    shard = F.pmod(F.col(id_col).cast("bigint"), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(order), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col).cast("bigint")
    return (
        df.select(F.col(id_col), toks.alias("tokens"), shard.alias("shard"))
        .withColumn("seq_offset", F.sum("tokens").over(w) - F.col("tokens"))
        .withColumn("seq_id", F.floor(F.col("seq_offset") / F.lit(budget)))
        .select(id_col, "tokens", "shard", "seq_id", "seq_offset")
    )


def mixture_sample(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    strata_col: str,
    target_weights: Mapping[str, float],
    total_fraction: float = 1.0,
    salt: str = "",
    counts: Mapping[str, int] | None = None,
) -> DataFrame:
    """Rebalance a corpus to a target mixture: keep a deterministic
    subset in which stratum ``s`` contributes ``target_weights[s]`` of
    the output (corpus curation's "40% web / 30% books / 30% code"
    knob). Strata absent from ``target_weights`` are dropped.

    Without duplication the largest achievable output is capped by the
    scarcest stratum: ``T = min_s(count_s / w_s)``; each stratum then
    keeps ``fraction_s = w_s * T / count_s * total_fraction`` of its
    rows — the scarcest stratum keeps everything (at total_fraction=1),
    abundant strata are downsampled to match. Row selection reuses the
    :func:`deterministic_sample` md5-threshold machinery, so the output
    is reproducible across engines, reruns and partitionings, and
    nested in itself across ``total_fraction`` values at the same salt.

    ``counts`` lets callers pass known stratum counts; otherwise ONE
    ``groupBy(strata).count()`` pass collects them (bounded driver
    collect: #strata rows — the mixture spec is human-written and
    small). Threshold arithmetic is fixed-order IEEE double math
    (documented in the expression below), so a SQL oracle recomputing
    it from the same counts lands on bit-identical thresholds. The
    filter itself is map-only: one md5 + CASE per row on the scan.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    if not 0.0 < total_fraction <= 1.0:
        raise ValueError(f"total_fraction must be in (0, 1], got {total_fraction}")
    for s, w in target_weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be positive, got {w}")
    if counts is None:
        rows = (
            df.filter(F.col(strata_col).isin(*target_weights))
            .groupBy(strata_col)
            .count()
            .collect()
        )  # bounded: one row per stratum in the (human-sized) mixture spec
        counts = {r[strata_col]: r["count"] for r in rows}
    missing = sorted(set(target_weights) - set(counts))
    if missing:
        raise ValueError(f"strata absent from input: {missing}")
    # fixed operation order, mirrored verbatim by SQL oracles:
    #   cap_s = c_s / w_s ;  T = min(cap_s)
    #   v_s   = floor((((w_s * T) / c_s) * total_fraction) * 2^32)
    caps = {s: float(counts[s]) / target_weights[s] for s in target_weights}
    t_total = min(caps.values())
    thr = F.lit(None).cast("string")
    for s in sorted(target_weights):
        v = math.floor(
            (((target_weights[s] * t_total) / float(counts[s])) * total_fraction)
            * 4294967296.0
        )
        h = "g" if v >= 1 << 32 else format(v, "08x")
        thr = F.when(F.col(strata_col) == F.lit(s), F.lit(h)).otherwise(thr)
    key = F.md5(
        F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    )
    return df.filter(F.substring(key, 1, _PREFIX) < thr)


def split_boundaries(fractions: Mapping[str, float]) -> list[tuple[str, str]]:
    """(split_name, cumulative md5-prefix upper bound) pairs in the
    mapping's insertion order; the last bound is the 'g' sentinel (sorts
    above every hex char) so rounding can never drop a row. Pure so the
    SQL-oracle twin embeds the identical literals."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = float(sum(fractions.values()))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bounds: list[tuple[str, str]] = []
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        frac = fractions[name]
        if frac < 0:
            raise ValueError(f"negative fraction for {name!r}")
        acc += frac
        bounds.append((name, _threshold_hex(acc)))
    bounds.append((names[-1], "g"))
    return bounds


def group_split(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    fractions: Mapping[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP
    (user, domain, dedup cluster, ...) lands in the same split, decided
    by ``md5(salt || group key)`` against cumulative prefix thresholds.
    Splitting at row level leaks near-duplicate rows of one group across
    train and eval; hashing the group key is the standard fix, and the
    md5 recipe makes the assignment identical on every engine and rerun
    (``df.randomSplit`` is neither group-aware nor layout-stable).

    ``fractions`` maps split name -> fraction (must sum to 1; insertion
    order fixes the hash-space layout, so train ⊂ train+val nesting
    holds when later calls only grow a TRAILING fraction). Changing
    ``salt`` redraws the assignment.

    Scale: map-only — one md5 + a CASE chain per row, no shuffle, no
    driver state; the added column prunes/pushes like any projection.
    """
    key = F.md5(
        F.concat_ws(
            "\x1f", F.lit(salt), *[F.col(c).cast("string") for c in group_cols]
        )
    )
    prefix = F.substring(key, 1, _PREFIX)
    bounds = split_boundaries(fractions)
    # a WHEN chain evaluates in order: the first matching (smallest)
    # bound wins, mirroring the SQL CASE the oracle runs
    first = bounds[0]
    case = F.when(prefix < F.lit(first[1]), F.lit(first[0]))
    for name, bound in bounds[1:-1]:
        case = case.when(prefix < F.lit(bound), F.lit(name))
    case = case.otherwise(F.lit(bounds[-1][0]))
    return df.withColumn(split_col, case)


def group_cap(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    max_per_group: int,
    salt: str = "cap-v1",
    n_shards: int = 64,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, chosen
    DETERMINISTICALLY by md5(salt‖id) order — the per-domain cap of the
    RefinedWeb/C4 recipes (no domain may dominate the training mix).
    Re-running with the same salt reproduces the exact kept set; a new
    salt draws an independent one. Selection is hash-ordered, not
    "first N encountered", so it is layout-stable: repartitioning or
    compacting the input cannot change which rows survive.

    Hot-group safety (the reason this is NOT one window): a web corpus
    has domains with 10^8 pages; ``row_number() OVER (PARTITION BY
    domain)`` puts each domain in ONE task. Phase 1 ranks within
    (group, shard) — shard derived from the selection hash itself, so
    it is deterministic and oracle-free — and keeps ≤ cap per shard;
    phase 2 ranks the ≤ cap·n_shards survivors per group. The kept set
    equals the single-window top-cap by (hash, id) exactly (each
    group-wide top-cap row is necessarily in its own shard's top-cap),
    so a plain one-window SQL oracle is ground truth while the physical
    plan never builds a domain-sized partition."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_shards
    from pyspark.sql import Window

    tagged = df.withColumn("__h", h).withColumn("__s", shard)
    w1 = Window.partitionBy(group_col, "__s").orderBy("__h", id_col)
    survivors = (
        tagged.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= int(max_per_group))
        .drop("__r1", "__s")
    )
    w2 = Window.partitionBy(group_col).orderBy("__h", id_col)
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= int(max_per_group))
        .drop("__r2", "__h")
    )
