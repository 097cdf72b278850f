"""Round-9 corpus-curation layer: substring-level decontamination,
streaming index admission, and mergeable sketch parity.

Registration-order contract: this module imports LAST in
``queries.__init__._MODULES`` (see the extras module docstring) so its
names queue behind every older never-driver-verified query.

These extend the LLM-training-data families (SURVEY.md §2 extensions):
``contamination_check`` flags WHOLE documents sharing 8-grams with a
benchmark suite; ``span_decontaminate`` locates the contaminated token
SPANS inside each document — the mask-don't-drop primitive of modern
pipelines.  ``streaming_minhash_admission`` is the streaming twin of
``dedup_incremental``'s batch admission.  ``quantile_sketch_merge`` is
the shard-summary → merge quantile path every 100 TB profile job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.queries.text import _DUCK_TOKS
from big_data_lab_three_spark.sources import table


@register(
    "span_decontaminate",
    ids="text safety: substring-level decontamination — per-document contaminated token-span extents (mask, don't drop)",
    oracle=f"""
WITH bench AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 13 = 0
), corpus AS (
    SELECT doc_id, text FROM documents WHERE doc_id % 13 != 0
    UNION ALL
    SELECT doc_id + 3000000,
           'alpha beta gamma delta ' || text || ' omega psi'
    FROM bench WHERE doc_id % 26 = 0
), bg AS (
    SELECT DISTINCT unnest(list_distinct(
               [array_to_string(toks[i:i+7], ' ')
                for i in range(1, len(toks) - 6)])) AS g
    FROM (SELECT {_DUCK_TOKS} AS toks FROM bench)
), cw AS (
    SELECT doc_id, u.pos AS pos, u.g AS g FROM (
        SELECT doc_id,
               unnest([{{'pos': i, 'g': array_to_string(toks[i:i+7], ' ')}}
                       for i in range(1, len(toks) - 6)]) AS u
        FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM corpus)
    )
), hit AS (
    SELECT doc_id, pos,
           lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM cw WHERE g IN (SELECT g FROM bg)
)
SELECT doc_id AS corpus_doc,
       CAST(count(*) AS BIGINT) AS n_flagged_windows,
       CAST(sum(CASE WHEN nxt IS NULL THEN 8
                     ELSE least(8, nxt - pos) END) AS BIGINT)
           AS n_tokens_covered,
       CAST(min(pos) AS INTEGER) AS first_tok,
       CAST(max(pos) + 7 AS INTEGER) AS last_tok
FROM hit
GROUP BY doc_id
ORDER BY corpus_doc
""",
)
def span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-LEVEL benchmark decontamination: where
    ``contamination_check`` reports contaminated document PAIRS, this
    locates the contaminated token extents inside each corpus document
    — per doc: flagged 8-gram window count, exact union-of-intervals
    token coverage, and the first/last contaminated token positions —
    the table a mask-don't-drop pipeline feeds to its span scrubber
    ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022, applies the same windows-to-extents reduction for
    exact substring dedup).  Seeded leaks embed a benchmark document
    MID-TEXT (4-token prefix, 2-token suffix) so the extents are
    interior and the interval arithmetic is exercised, not just
    whole-doc hits.

    Interval union without an interval type: flagged window positions
    are sorted per doc and each contributes ``min(8, next_pos − pos)``
    tokens (8 for the last) — one ``lead`` window over hit rows only.
    All-integer output → exact hash parity.

    Scale shape: the benchmark 8-gram set is tiny and broadcasts, so
    the corpus explode streams through a map-side semi-join with NO
    corpus shuffle; only (doc_id, pos) hit rows — vanishingly few —
    reach the per-doc window + aggregate.  Same plan class as
    ``contamination_check``, plus a hits-only exchange."""
    d = table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 13 == 0).select("doc_id", "text")
    leaks = bench.where(F.col("doc_id") % 26 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta "),
            F.col("text"),
            F.lit(" omega psi"),
        ).alias("text"),
    )
    corpus = (
        d.where(F.col("doc_id") % 13 != 0)
        .select("doc_id", "text")
        .unionByName(leaks)
    )
    bg = (
        bench.select(
            F.explode(F.array_distinct(shingles(tokens(F.col("text")), 8)))
            .alias("g")
        )
        .distinct()
    )
    cw = corpus.select(
        "doc_id",
        F.posexplode(shingles(tokens(F.col("text")), 8)).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    hits = cw.join(F.broadcast(bg), "g", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = hits.withColumn("nxt", F.lead("pos").over(w)).select(
        "doc_id",
        "pos",
        F.when(F.col("nxt").isNull(), F.lit(8))
        .otherwise(F.least(F.lit(8), F.col("nxt") - F.col("pos")))
        .alias("covered"),
    )
    return (
        spans.groupBy(F.col("doc_id").alias("corpus_doc"))
        .agg(
            F.count(F.lit(1)).alias("n_flagged_windows"),
            F.sum("covered").alias("n_tokens_covered"),
            F.min("pos").cast("int").alias("first_tok"),
            (F.max("pos") + 7).cast("int").alias("last_tok"),
        )
        .orderBy("corpus_doc")
    )


@register(
    "quantile_sketch_merge",
    ids="agg: mergeable per-shard quantile summaries -> merged estimate (GK/KLL shard-merge shape, full value oracle)",
    oracle="""
WITH t AS (
    SELECT l_extendedprice AS v, l_orderkey AS k1, l_linenumber AS k2,
           l_orderkey % 16 AS shard
    FROM lineitem
), r AS (
    SELECT v, k1, k2, shard,
           row_number() OVER (PARTITION BY shard ORDER BY v, k1, k2) AS rn,
           count(*) OVER (PARTITION BY shard) AS ns
    FROM t
), s AS (
    SELECT shard, v, rn,
           rn - coalesce(lag(rn) OVER (PARTITION BY shard ORDER BY rn), 0)
               AS w
    FROM r
    WHERE rn % ((ns + 63) // 64) = 0 OR rn = ns
), m AS (
    SELECT v, shard, rn, w,
           sum(w) OVER (ORDER BY v, shard, rn
                        ROWS UNBOUNDED PRECEDING) AS cumw
    FROM s
), tot AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_samples
    FROM t
), est AS (
    SELECT (SELECT min(v) FROM m, tot WHERE cumw >= (n + 1) // 2)
               AS est_p50,
           (SELECT min(v) FROM m, tot WHERE cumw >= (19 * n + 19) // 20)
               AS est_p95
), realized AS (
    SELECT CAST(sum(CASE WHEN t.v <= est.est_p50 THEN 1 ELSE 0 END)
                AS BIGINT) AS le50,
           CAST(sum(CASE WHEN t.v <= est.est_p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS le95,
           CAST(sum(CASE WHEN t.v < est.est_p50 THEN 1 ELSE 0 END)
                AS BIGINT) AS lt50,
           CAST(sum(CASE WHEN t.v < est.est_p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS lt95
    FROM t, est
)
SELECT tot.n AS n,
       tot.n_samples AS n_samples,
       CAST(est.est_p50 AS DOUBLE) AS est_p50,
       CAST(est.est_p95 AS DOUBLE) AS est_p95,
       realized.le50 AS le50,
       realized.le95 AS le95,
       (realized.lt50 + 1 <= (tot.n + 1) // 2 + tot.n // 16 + 32
        AND realized.le50 >= (tot.n + 1) // 2 - tot.n // 16 - 32)
           AS p50_ok,
       (realized.lt95 + 1 <= (19 * tot.n + 19) // 20 + tot.n // 16 + 32
        AND realized.le95 >= (19 * tot.n + 19) // 20 - tot.n // 16 - 32)
           AS p95_ok
FROM tot, est, realized
""",
)
def quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summaries, shard-merge parity — the two-level
    path a 100 TB profile job actually runs (GK/KLL-style: executors
    keep bounded summaries, the driver merges summaries, never rows):

    1. per-shard (``l_orderkey % 16``) EQUI-DEPTH SUMMARY: every
       ``ceil(n_s/64)``-th order statistic plus the shard maximum, each
       carrying its exact covered-row weight (rank deltas) — a
       deterministic ε=1/64 quantile summary;
    2. MERGE: the ≤ 16×65 summary rows are ordered globally by
       ``(value, shard, rn)`` with a running weight sum — the weighted
       union of summaries;
    3. QUERY: the p50/p95 estimates are the first merged entries whose
       cumulative weight reaches ``ceil(q·N)`` (exact integer targets);
    4. AUDIT: the estimates are re-ranked against the full table and
       gated on the summary's rank-error bound (±(N/16 + 32), twice
       the design bound Σ_s step_s ≈ N/64 + shards).

    Unlike ``gk_quantile_check`` (opaque JVM sketch, TRUE-pinned
    bounds), every step here is deterministic integer rank algebra, so
    the DuckDB oracle recomputes the per-shard summaries, the merge,
    the estimates, AND the realized ranks — full value-hash parity on
    the whole shard-merge pipeline.

    Scale shape: one exchange partitions rows by shard for the summary
    windows (at 100 TB, shards = executor-sized ranges and this pass
    is the existing scan); the merge and query run on summary rows
    only (KB-sized — the single-partition running-sum window is over
    ≤ shards×65 rows BY CONSTRUCTION, which is the entire point of a
    sketch); the audit is one scan with a broadcast 1-row join."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.pmod("l_orderkey", F.lit(16)).alias("shard"),
    )
    w_ord = Window.partitionBy("shard").orderBy("v", "k1", "k2")
    w_all = Window.partitionBy("shard")
    ranked = li.withColumn("rn", F.row_number().over(w_ord)).withColumn(
        "ns", F.count(F.lit(1)).over(w_all)
    )
    step = F.expr("div(ns + 63, 64)")
    samples = ranked.where(
        (F.pmod(F.col("rn"), step) == 0) | (F.col("rn") == F.col("ns"))
    ).select(
        "shard",
        "v",
        "rn",
        (
            F.col("rn")
            - F.coalesce(
                F.lag("rn").over(
                    Window.partitionBy("shard").orderBy("rn")
                ),
                F.lit(0),
            )
        ).alias("w"),
    )
    merged = samples.withColumn(
        "cumw",
        F.sum("w").over(
            Window.orderBy("v", "shard", "rn").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    merged = merged.localCheckpoint()  # summary is KB-sized; reused 3×
    tot = li.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        F.broadcast(
            samples.agg(F.count(F.lit(1)).alias("n_samples"))
        )
    )
    t50 = F.expr("div(n + 1, 2)")
    t95 = F.expr("div(19 * n + 19, 20)")
    targets = tot.select("n", "n_samples", t50.alias("t50"), t95.alias("t95"))
    est = (
        merged.crossJoin(F.broadcast(targets))
        .agg(
            F.min(F.when(F.col("cumw") >= F.col("t50"), F.col("v"))).alias(
                "est_p50"
            ),
            F.min(F.when(F.col("cumw") >= F.col("t95"), F.col("v"))).alias(
                "est_p95"
            ),
        )
    )
    audited = li.crossJoin(F.broadcast(est)).agg(
        F.sum((F.col("v") <= F.col("est_p50")).cast("long")).alias("le50"),
        F.sum((F.col("v") <= F.col("est_p95")).cast("long")).alias("le95"),
        F.sum((F.col("v") < F.col("est_p50")).cast("long")).alias("lt50"),
        F.sum((F.col("v") < F.col("est_p95")).cast("long")).alias("lt95"),
        F.min("est_p50").alias("est_p50"),
        F.min("est_p95").alias("est_p95"),
    )
    out = audited.crossJoin(F.broadcast(targets))
    tol = F.expr("div(n, 16)") + F.lit(32)
    return out.select(
        "n",
        "n_samples",
        F.col("est_p50").cast("double").alias("est_p50"),
        F.col("est_p95").cast("double").alias("est_p95"),
        "le50",
        "le95",
        (
            (F.col("lt50") + 1 <= F.col("t50") + tol)
            & (F.col("le50") >= F.col("t50") - tol)
        ).alias("p50_ok"),
        (
            (F.col("lt95") + 1 <= F.col("t95") + tol)
            & (F.col("le95") >= F.col("t95") - tol)
        ).alias("p95_ok"),
    )


# Shared DuckDB fragment: portable-MinHash band keys (8 md5 perms → 4
# bands), bit-identical to ``operators.dedup.portable_minhash_signatures``
# + the band projection below — the same construction
# ``minhash_band_census`` pins at sf1.
_DUCK_BANDS = """
  SELECT id, b.band AS band,
         CAST(('0x' || substr(md5(
             CASE b.band
               WHEN 0 THEN CAST(m0 AS VARCHAR) || ',' || CAST(m1 AS VARCHAR)
               WHEN 1 THEN CAST(m2 AS VARCHAR) || ',' || CAST(m3 AS VARCHAR)
               WHEN 2 THEN CAST(m4 AS VARCHAR) || ',' || CAST(m5 AS VARCHAR)
               ELSE CAST(m6 AS VARCHAR) || ',' || CAST(m7 AS VARCHAR)
             END), 1, 15)) AS BIGINT) AS k
  FROM sig CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band)
"""


def _portable_band_keys(sig: DataFrame) -> DataFrame:
    """(id, band, k) band keys from a portable-minhash signature frame
    — the Spark twin of ``_DUCK_BANDS`` (and of the inline construction
    in ``extras.minhash_band_census``)."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(",", f"m{2 * b}", f"m{2 * b + 1}")),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("k"),
        )
        for b in range(4)
    ]
    return sig.select("id", F.explode(F.array(*bands)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.k").alias("k")
    )


@register(
    "streaming_minhash_admission",
    ids="streaming: stateful MinHash index admission — per-micro-batch dedup against an accumulating signature index (streaming twin of dedup_incremental)",
    oracle="""
WITH base AS (
  SELECT doc_id AS id, text, doc_id % 4 AS shard FROM documents
  UNION ALL
  SELECT doc_id + 5000002, text, (doc_id + 2) % 4
  FROM documents WHERE doc_id % 8 = 0
  UNION ALL
  SELECT doc_id + 6000002, text || ' zz qq', (doc_id + 2) % 4
  FROM documents WHERE doc_id % 8 = 1
), dig AS (
  SELECT id, md5(text) AS d FROM base
), tok AS (
  SELECT id, list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x != '') AS toks
  FROM base
), sh AS (
  SELECT id,
         unnest([array_to_string(toks[i:i+2], ' ')
                 for i in range(1, len(toks) - 1)]) AS s
  FROM tok
), hp AS (
  SELECT id, g.i AS i,
         CAST(('0x' || substr(md5(s || '|' || CAST(g.i AS VARCHAR)),
                              1, 15)) AS BIGINT) AS h
  FROM sh CROSS JOIN generate_series(0, 7) AS g(i)
), sig AS (
  SELECT id,
         min(h) FILTER (WHERE i = 0) AS m0,
         min(h) FILTER (WHERE i = 1) AS m1,
         min(h) FILTER (WHERE i = 2) AS m2,
         min(h) FILTER (WHERE i = 3) AS m3,
         min(h) FILTER (WHERE i = 4) AS m4,
         min(h) FILTER (WHERE i = 5) AS m5,
         min(h) FILTER (WHERE i = 6) AS m6,
         min(h) FILTER (WHERE i = 7) AS m7
  FROM hp GROUP BY id
), banded AS (""" + _DUCK_BANDS + """
), collide AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM dig x JOIN dig y ON x.d = y.d AND x.id <> y.id
  UNION
  SELECT DISTINCT x.id, y.id
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.k = y.k AND x.id <> y.id
), i0 AS (
  SELECT id FROM base WHERE shard = 0
), i1 AS (
  SELECT id FROM base WHERE shard = 1
  AND id NOT IN (SELECT c.b FROM collide c JOIN i0 ON c.a = i0.id)
), idx1 AS (SELECT id FROM i0 UNION ALL SELECT id FROM i1
), i2 AS (
  SELECT id FROM base WHERE shard = 2
  AND id NOT IN (SELECT c.b FROM collide c JOIN idx1 ON c.a = idx1.id)
), idx2 AS (SELECT id FROM idx1 UNION ALL SELECT id FROM i2
), i3 AS (
  SELECT id FROM base WHERE shard = 3
  AND id NOT IN (SELECT c.b FROM collide c JOIN idx2 ON c.a = idx2.id)
), adm AS (
  SELECT 0 AS shard, id FROM i0
  UNION ALL SELECT 1, id FROM i1
  UNION ALL SELECT 2, id FROM i2
  UNION ALL SELECT 3, id FROM i3
)
SELECT CAST(b.shard AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(adm.id) AS BIGINT) AS n_admitted,
       CAST(coalesce(sum(adm.id), 0) AS BIGINT) AS sum_admitted_id
FROM base b LEFT JOIN adm ON adm.id = b.id
GROUP BY b.shard
ORDER BY shard
""",
)
def streaming_minhash_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming index admission — the streaming twin of
    ``dedup_incremental``: documents arrive as chronological
    micro-batches, and each batch is admitted against an ACCUMULATING
    dedup index holding only content digests and portable-MinHash band
    keys (16-byte digests + (band, long) rows — never text, the
    production index shape).  A batch document is rejected when its
    digest or ANY band key already exists in the index; admitted
    documents append their digests/band keys to the index inside the
    same ``foreachBatch`` transaction.  Seeds plant an exact copy
    (``doc_id % 8 == 0``) and a near-dup (``% 8 == 1``, two appended
    tokens) of corpus docs two shards after their originals, so both
    rejection gates fire across batch boundaries.

    First-wins semantics are deterministic because the file source
    drains the four forced-mtime shards in order; the oracle replays
    the same four admission rounds as chained CTEs over a precomputed
    collision relation (digest-equal ∪ band-equal pairs — the exact
    predicate the index lookups implement).

    Scale shape: per batch, the index probes are two key joins
    (digest, (band, k)) — at 100 TB the index is a bucketed table and
    the probes shuffle only batch-sized sides; band keys mean the
    near-dup check never rescans corpus text (reference point:
    ``dedup_incremental`` recomputes cross-side LSH per batch, this
    variant persists the index — the encode-at-ingest trade)."""
    import os
    import shutil
    import tempfile

    from big_data_lab_three_spark.operators.dedup import (
        portable_minhash_signatures,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    base = (
        d.select(
            F.col("doc_id").alias("id"),
            "text",
            F.pmod("doc_id", F.lit(4)).alias("shard"),
        )
        .unionByName(
            d.where(F.col("doc_id") % 8 == 0).select(
                (F.col("doc_id") + 5000002).alias("id"),
                "text",
                F.pmod(F.col("doc_id") + 2, F.lit(4)).alias("shard"),
            )
        )
        .unionByName(
            d.where(F.col("doc_id") % 8 == 1).select(
                (F.col("doc_id") + 6000002).alias("id"),
                F.concat("text", F.lit(" zz qq")).alias("text"),
                F.pmod(F.col("doc_id") + 2, F.lit(4)).alias("shard"),
            )
        )
    )
    base.persist()

    root = tempfile.mkdtemp(prefix="minhash_admission_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    # Stage the four chronological shards (test scaffolding, not the
    # measured operator): one file per shard, mtimes forced ascending so
    # the file source drains them in shard order.
    for s in range(4):
        stage = os.path.join(root, f"stage_{s}")
        base.where(F.col("shard") == s).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dest = os.path.join(src, f"shard_{s}.parquet")
        shutil.move(os.path.join(stage, part), dest)
        os.utime(dest, (1_000_000 * (s + 1), 1_000_000 * (s + 1)))
        shutil.rmtree(stage)

    idx_digest = os.path.join(root, "idx_digest")
    idx_bands = os.path.join(root, "idx_bands")
    admitted_dir = os.path.join(root, "admitted")

    def _read_or_empty(path: str, schema: str) -> DataFrame:
        if os.path.isdir(path):
            return spark.read.parquet(path)
        return spark.createDataFrame([], schema)

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.localCheckpoint()
        digs = batch_df.select(
            "id", "shard", F.md5(F.encode("text", "UTF-8")).alias("d")
        )
        bands = _portable_band_keys(
            portable_minhash_signatures(batch_df, id_col="id", num_perms=8)
        )
        old_d = _read_or_empty(idx_digest, "d string")
        old_b = _read_or_empty(idx_bands, "band int, k long")
        blocked = (
            bands.join(old_b, ["band", "k"], "left_semi")
            .select("id")
            .distinct()
        )
        blocked_ids = (
            digs.join(old_d, "d", "left_semi")
            .select("id")
            .distinct()
            .unionByName(blocked)
            .distinct()
        )
        admitted = digs.join(blocked_ids, "id", "left_anti")
        admitted = admitted.localCheckpoint()
        admitted.select("id", "shard").write.mode("append").parquet(
            admitted_dir
        )
        admitted.select("d").write.mode("append").parquet(idx_digest)
        bands.join(admitted.select("id"), "id", "left_semi").select(
            "band", "k"
        ).write.mode("append").parquet(idx_bands)

    schema = base.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(admit)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    adm = spark.read.parquet(admitted_dir).select(
        F.col("id").alias("aid"), F.col("shard").alias("ashard")
    )
    out = (
        base.join(adm, base["id"] == adm["aid"], "left")
        .groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("aid").alias("n_admitted"),
            F.coalesce(F.sum("aid"), F.lit(0)).alias("sum_admitted_id"),
        )
        .orderBy("shard")
    )
    out = out.localCheckpoint()
    base.unpersist()
    return out
