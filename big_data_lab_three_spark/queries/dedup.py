"""Deduplication query corpus over ``documents``/``embeddings``.

The synthetic tables are duplicate-free, so each query seeds its own
duplicates deterministically (re-keyed copies, optionally mutated) before
deduplicating — making the expected output exactly computable by the
DuckDB oracle.

Oracle strategy per family:
- exact + n-gram Jaccard: direct SQL twin.
- MinHash+LSH: the oracle is the EXACT all-pairs Jaccard answer; the
  Spark side must reproduce it through the approximate pipeline (with
  r=4/b=16 the miss probability at the seeded J≈0.96 is ~4e-15, so the
  approximate answer equals the exact one — that equivalence is the
  point of the test).
- SimHash: engine-specific 64-bit hashing → rows-only check here,
  ground-truth subset assertions live in tests/.
- embedding cosine: double-precision cosine rounded to 4 decimals on
  both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.operators.dedup import (
    embedding_near_dup_pairs_lsh,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table

_DUCK_SHINGLES = """
  SELECT id, list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
  FROM (SELECT id, list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x != '') AS toks FROM base)
  WHERE len(toks) >= 3
"""

_SEED_OFFSET = 1_000_000


def _seed_id(col, k: int = 1):
    """Seed-row id for the k-th synthesized near-dup copy:
    ``id + k·1_000_000``, FAIL-LOUD if a tier ever carries source ids
    at/above the offset (ADVICE r10: a silent collision between seed
    ids and representative ids would corrupt seeded-pair semantics
    while both engines stayed hash-green).  The guard is one codegen
    branch per row — free — and ``raise_error`` aborts the job with
    the offending id, which is the behavior we want the day a tier's
    id domain outgrows the convention."""
    return F.when(col < _SEED_OFFSET, col + k * _SEED_OFFSET).otherwise(
        F.raise_error(
            F.concat(
                F.lit("seed-id collision: source id "),
                col.cast("string"),
                F.lit(f" >= seed offset {_SEED_OFFSET}"),
            )
        )
    )


@register(
    "dedup_exact",
    ids="dedup: exact (hash-groupBy), generalizes U3",
    oracle="""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
)
SELECT min(doc_id) AS kept_id, count(*) AS copies
FROM u
GROUP BY md5(text)
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: every tenth document is duplicated
    under a new id, then groupBy(md5(text)) keeps the smallest id.  The
    shuffle carries 16-byte digests, not documents — the 100 TB plan."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.where(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    return exact_dedup(d.unionByName(dups)).select("kept_id", "copies")


@register(
    "dedup_ngram_jaccard",
    ids="dedup: n-gram Jaccard (exact, brute-force baseline)",
    oracle=f"""
WITH base AS (
  SELECT min(doc_id) AS id, min(text) AS text
  FROM documents WHERE doc_id % 25 = 0
  GROUP BY md5(text)
), t AS ({_DUCK_SHINGLES})
SELECT a.id AS id_a, b.id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM t a JOIN t b ON a.id < b.id
""",
)
def dedup_ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over all pairs of a deterministic document
    sample — the correctness baseline the LSH pipeline must reproduce —
    run AFTER exact-dedup collapse (min-id representative per content
    digest), the canonical pipeline composition: production never
    rescored exact copies, and the collapse is what keeps BOTH engines'
    pair counts bounded by DISTINCT content (the r10 planted-witness
    conversion that admits this query to the replicated sf1 tier,
    where every document has 10 byte-identical copies)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    reps = (
        d.groupBy(F.md5("text").alias("dig"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .drop("dig")
    )
    return ngram_jaccard_pairs(reps)


def collapsed_seeded_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-deduped ``doc_id % 5`` sample (min-id representative per
    content digest) plus one ``' zzz'`` near-dup seed per
    representative — the SHARED population of ``dedup_minhash_lsh``
    and ``jaccard_threshold_sweep``, factored so the sweep can never
    silently calibrate a different base than the verified query."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    reps = (
        d.groupBy(F.md5("text").alias("dig"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .drop("dig")
    )
    mutated = reps.select(
        _seed_id(F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return reps.select("doc_id", "text").unionByName(mutated)



@register(
    "dedup_minhash_lsh",
    ids="dedup: MinHash+LSH (shingle→minhash→band→bucket-join→rescore)",
    oracle=f"""
WITH reps AS (
  SELECT min(doc_id) AS id, min(text) AS text
  FROM documents WHERE doc_id % 5 = 0
  GROUP BY md5(text)
), base AS (
  SELECT id, text FROM reps
  UNION ALL
  SELECT id + 1000000, text || ' zzz' FROM reps
), t AS ({_DUCK_SHINGLES})
SELECT a.id AS id_a, b.id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM t a JOIN t b ON a.id < b.id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
""",
)
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection over EXACT-DEDUPED content:
    every fifth document is collapsed to its min-id content
    representative (the r10 conversion — exact-dedup before near-dup
    is the production order, and it bounds the pair set by DISTINCT
    content so the replicated sf1 tier stays linear for both engines),
    then each representative gets a near-duplicate (one appended
    token, shingle-Jaccard ≈ 0.96); the LSH pipeline (32 perms, 16
    bands × 4 rows, exact rescore ≥ 0.7) must recover exactly the
    pairs the oracle's brute-force Jaccard finds.

    At scale only the band-bucket join shuffles, and it shuffles
    (band, bucket, id) keys — never the documents."""
    base = collapsed_seeded_base(spark, sf_dir)
    return minhash_lsh_pairs(
        base, num_perms=32, bands=16, jaccard_threshold=0.7
    ).select("id_a", "id_b", "jaccard")


@register(
    "dedup_simhash",
    ids="dedup: SimHash (60-bit md5-portable, multi-segment pigeonhole buckets)",
    oracle="""
WITH reps AS (
  SELECT min(doc_id) AS id, min(text) AS text
  FROM documents WHERE doc_id % 5 = 0
  GROUP BY md5(text)
), base AS (
  SELECT id, text FROM reps
  UNION ALL
  SELECT id + 1000000, text FROM reps
), t AS (
  SELECT id, list_filter(regexp_split_to_array(text, '\\s+'),
                         x -> x != '') AS toks
  FROM base
), sh AS (
  SELECT id,
         unnest([array_to_string(toks[i:i+2], ' ')
                 for i in range(1, len(toks) - 1)]) AS s
  FROM t
), h AS (
  SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh
), votes AS (
  SELECT id, g.b AS b,
         sum(CASE WHEN (h >> g.b) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM h CROSS JOIN generate_series(0, 59) AS g(b)
  GROUP BY id, g.b
), sig AS (
  SELECT id,
         CAST(sum(CASE WHEN c > 0 THEN CAST(1 AS BIGINT) << b
                       ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b
  ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
""",
)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over an EXACT-DEDUPED sample (min-id
    content representative — the r10/r11 collapse-first conversion
    that bounds the pair set by DISTINCT content and admits this
    query to the replicated sf1 tier) seeded with exact duplicates
    (identical text ⇒ identical signature ⇒ Hamming 0).  The 60-bit
    truncated-md5 shingle hash is engine-portable, so the oracle
    recomputes votes and signatures exactly — and because the Spark
    side's multi-segment pigeonhole bucketing (Manku et al.) has
    candidate recall 1 for Hamming ≤ 3, the oracle is the *all-pairs*
    ground truth: a value-hash match here proves the bucketed plan
    loses nothing vs brute force, not merely that both engines bucket
    alike (the r2 prefix-bucket oracle only showed the latter)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    reps = (
        d.groupBy(F.md5("text").alias("dig"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .drop("dig")
    )
    dup = reps.select(_seed_id(F.col("doc_id")).alias("doc_id"), "text")
    base = reps.select("doc_id", "text").unionByName(dup)
    return simhash_pairs(base, max_hamming=3).select(
        "id_a", "id_b", "hamming"
    )


@register(
    "dedup_embedding",
    ids="dedup: embedding-cosine near-dup",
    oracle="""
WITH reps AS (
  SELECT min(vec_id) AS id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 5 = 0
  GROUP BY CAST(embedding AS DOUBLE[])
), base AS (
  SELECT id, v FROM reps
  UNION ALL
  SELECT id + 1000000, list_transform(v, x -> x * 1.01) FROM reps
)
SELECT a.id AS id_a, b.id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
FROM base a JOIN base b ON a.id < b.id
WHERE list_cosine_similarity(a.v, b.v) >= 0.99
""",
)
def dedup_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the scale path: hyperplane-LSH buckets →
    bucket-join candidates → exact cosine rescore ≥ 0.99, over
    EXACT-DEDUPED vectors (min-id representative per bit-identical
    embedding — the r10 conversion that keeps the pair set bounded by
    DISTINCT vectors at the replicated sf1 tier; collapsing exact
    copies before the near-dup stage is the production order anyway).
    Every fifth representative gets a rescaled copy (cosine exactly 1
    up to fp); rescaling preserves every sign bit, so each true pair
    collides in ALL tables — recall 1 by construction — and the exact
    rescore drops any false bucket-mates (random 64-d pairs sit at
    |cos| ≲ 0.5).  The oracle is the exact all-pairs answer, so this
    checks the LSH pipeline end-to-end, not just the scorer."""
    e = table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    base = (
        e.select(
            F.col("vec_id").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .groupBy("embedding")
        .agg(F.min("vec_id").alias("vec_id"))
        .select("vec_id", "embedding")
    )
    perturbed = base.select(
        _seed_id(F.col("vec_id")).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.01).alias("embedding"),
    )
    u = base.unionByName(perturbed)
    # dim passed explicitly (testdata embeddings are 64-d): skips the
    # probe-first-row job, so the union pipeline executes exactly once.
    return embedding_near_dup_pairs_lsh(u, threshold=0.99, dim=64).select(
        "id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim")
    )


_CLUSTERS_ORACLE = f"""
WITH RECURSIVE reps AS (
  SELECT min(doc_id) AS id, min(text) AS text
  FROM documents WHERE doc_id % 10 = 0
  GROUP BY md5(text)
), base AS (
  SELECT id, text FROM reps
  UNION ALL
  SELECT id + 1000000, text || ' zzz' FROM reps
  UNION ALL
  SELECT id + 2000000, text || ' zzz yyy' FROM reps
), t AS ({_DUCK_SHINGLES}),
p AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM t a JOIN t b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
reach(id, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e2.src, reach.r FROM e e2 JOIN reach ON e2.dst = reach.id
)
SELECT id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach
GROUP BY id
ORDER BY id
"""


def _clusters_seeded_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded corpus for the clustering queries: every tenth document
    COLLAPSED to its min-id content representative (the r11
    collapse-first conversion — exact-dedup before near-dup is the
    production order, and it bounds every consumer's pair/clique work
    by DISTINCT content, admitting the whole cluster family to the
    replicated sf1 tier) plus two mutated copies of each representative
    (one near-dup clique per distinct source text)."""
    s = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    d = (
        s.groupBy(F.md5("text").alias("dig"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .drop("dig")
    )
    m1 = d.select(
        _seed_id(F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    m2 = d.select(
        _seed_id(F.col("doc_id"), k=2).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz yyy")).alias("text"),
    )
    return d.select("doc_id", "text").unionByName(m1).unionByName(m2)


def _clusters_seeded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pair pipeline for the clustering queries: the seeded base
    through MinHash+LSH candidates with exact-Jaccard rescore."""
    base = _clusters_seeded_base(spark, sf_dir)
    return minhash_lsh_pairs(
        base, num_perms=32, bands=16, jaccard_threshold=0.7
    )


@register(
    "dedup_clusters",
    ids="dedup: near-dup clustering (LSH pairs → connected components → canonical id)",
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERING — the step after pair generation in a
    real dedup pipeline: every tenth document is seeded with two
    mutated copies (one clique per source doc), the MinHash+LSH
    pipeline produces candidate pairs, and min-label connected
    components assign each member its cluster's canonical (minimum)
    id.  A pipeline then keeps one row per cluster_id.

    The oracle recomputes ground truth independently: brute-force
    exact Jaccard pairs + a recursive-CTE transitive closure — so this
    checks LSH recall AND the distributed component labeling in one
    query.  Scale shape: pair table only (never the corpus) iterates
    through the propagation joins; see ``connected_components``."""
    from big_data_lab_three_spark.operators.dedup import (
        connected_components,
    )

    pairs = _clusters_seeded_pairs(spark, sf_dir)
    return connected_components(pairs).orderBy("id")


@register(
    "dedup_clusters_star",
    ids="dedup: near-dup clustering via large-star/small-star contraction (O(log n)-round CC)",
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering semantics as ``dedup_clusters`` (identical
    oracle), computed with the alternating large-star/small-star
    contraction instead of min-label propagation.  Near-dup components
    are small cliques, so locally both converge in 2-3 rounds; the
    contraction is the variant that stays O(log n) rounds when the pair
    graph develops long chains (transitive near-dup drift at corpus
    scale).  Registering both against ONE ground-truth oracle proves
    the two independent implementations agree with the exact transitive
    closure — the strongest check this operator family gets."""
    from big_data_lab_three_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = _clusters_seeded_pairs(spark, sf_dir)
    return connected_components_star(pairs).orderBy("id")


_APPLY_ORACLE = f"""
WITH RECURSIVE reps AS (
  SELECT min(doc_id) AS id, min(text) AS text
  FROM documents WHERE doc_id % 10 = 0
  GROUP BY md5(text)
), base AS (
  SELECT id, text FROM reps
  UNION ALL
  SELECT id + 1000000, text || ' zzz' FROM reps
  UNION ALL
  SELECT id + 2000000, text || ' zzz yyy' FROM reps
), t AS ({{shingles}}),
p AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM t a JOIN t b ON a.id < b.id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.7
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b, id_a FROM p
),
reach(id, r) AS (
  SELECT src, src FROM e
  UNION
  SELECT e2.src, reach.r FROM e e2 JOIN reach ON e2.dst = reach.id
),
labels AS (
  SELECT id, CAST(min(r) AS BIGINT) AS cluster_id
  FROM reach GROUP BY id
),
dropped AS (SELECT id FROM labels WHERE id != cluster_id)
SELECT (SELECT count(*) FROM base) AS n_total,
       (SELECT count(*) FROM labels) AS n_in_clusters,
       (SELECT count(*) FROM dropped) AS n_dropped,
       (SELECT count(*) FROM base) - (SELECT count(*) FROM dropped)
         AS n_kept
"""


@register(
    "near_dedup_apply",
    ids="dedup composition: LSH pairs → CC labels → canonical-keep anti-join",
    oracle=_APPLY_ORACLE.format(shingles=_DUCK_SHINGLES),
)
def near_dedup_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step the whole dedup family exists for — actually SHRINKING
    the corpus: candidate pairs (MinHash+LSH, exact-rescored) →
    connected-component labels → drop every member that is not its
    cluster's canonical (minimum) id, via a broadcast anti-join of the
    label table's non-canonical rows against the corpus.  Documents in
    no pair are untouched (they never enter the label table).  The
    seeded corpus (two mutated copies per tenth doc) makes the expected
    shrinkage exact: one clique per source doc, two dropped per clique.

    Scale shape: the anti-join probe side is (non-canonical id) —
    cluster-membership-sized, orders of magnitude below the corpus —
    and the corpus side streams map-side when the drop list broadcasts.
    The oracle recomputes ground truth via exact all-pairs Jaccard +
    recursive-CTE closure, so recall, labeling, AND the keep rule are
    all hash-checked together."""
    from big_data_lab_three_spark.operators.dedup import (
        connected_components,
    )

    base = _clusters_seeded_base(spark, sf_dir)
    base.persist()
    labels = connected_components(
        _clusters_seeded_pairs(spark, sf_dir)
    )
    labels.persist()
    dropped = labels.where(F.col("id") != F.col("cluster_id")).select("id")
    kept = base.join(
        F.broadcast(dropped),
        base["doc_id"] == dropped["id"],
        "left_anti",
    )
    return (
        base.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(
            F.broadcast(
                labels.agg(F.count(F.lit(1)).alias("n_in_clusters"))
            )
        )
        .crossJoin(
            F.broadcast(dropped.agg(F.count(F.lit(1)).alias("n_dropped")))
        )
        .crossJoin(
            F.broadcast(kept.agg(F.count(F.lit(1)).alias("n_kept")))
        )
    )


def incremental_admission_frames(spark: SparkSession, sf_dir: str):
    """The incremental-admission pipeline's frames — (corpus, batch,
    surv1, admitted) — shared by the registered ``dedup_incremental``
    census and ``tools/sf10_witness.py`` (the r14 convention: witnesses
    drive the EXACT pipeline the query runs via a shared constructor,
    never a re-implementation that could drift).  See the query
    docstring for stage semantics."""
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text")
    # ADVICE r12: batch ids route through the fail-loud _seed_id guard
    # (k=5 → the same +5_000_000 offset, outputs unchanged) instead of
    # a raw add — a silent source-id/batch-id collision would corrupt
    # the id_a/id_b side split below while both engines stay hash-green.
    batch = (
        d.where(F.col("doc_id") % 4 == 0)
        .select(_seed_id(F.col("doc_id"), k=5).alias("doc_id"), "text")
        .unionByName(
            d.where(F.col("doc_id") % 4 == 1).select(
                _seed_id(F.col("doc_id"), k=5).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz qq")).alias("text"),
            )
        )
        .unionByName(
            d.where(F.col("doc_id") % 4 == 2).select(
                _seed_id(F.col("doc_id"), k=5).alias("doc_id"),
                F.concat(
                    F.lit("fresh doc "),
                    F.col("doc_id"),
                    F.lit(" standalone content"),
                ).alias("text"),
            )
        )
    )
    batch.persist()

    def _reps(frame: DataFrame) -> DataFrame:
        return frame.groupBy(F.md5("text").alias("dig")).agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
        )

    # ONE digest exchange serves both gates (r16, guide §2.4): the
    # corpus representatives keep their digest column, so the exact
    # gate's distinct-digest set IS creps' key set — the old separate
    # ``select(md5(text)).distinct()`` shuffled the corpus digests a
    # second time for the same information.
    creps = _reps(corpus).persist()
    surv1 = batch.join(
        creps.select(F.col("dig").alias("_d")),
        F.md5(batch["text"]) == F.col("_d"),
        "left_anti",
    )
    surv1.persist()

    breps = _reps(surv1).drop("dig")
    union = creps.drop("dig").unionByName(breps)
    # Only CROSS-side pairs (corpus id < 5M ≤ batch id) feed the
    # admission verdict — filtering candidates before the rescore
    # joins skips exact-Jaccard work on within-side bucket-mates
    # (r16; the post-hoc ``where`` below is then a no-op kept for
    # clarity).  Identical output: the filter is the same predicate
    # ``flagged_dig`` always applied.
    pairs = minhash_lsh_pairs(
        union,
        num_perms=32,
        bands=16,
        jaccard_threshold=0.7,
        candidate_filter=(
            (F.col("id_a") < 5000000) & (F.col("id_b") >= 5000000)
        ),
    )
    flagged_dig = (
        pairs.where(
            (F.col("id_a") < 5000000) & (F.col("id_b") >= 5000000)
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .join(breps, "doc_id")
        .select(F.md5("text").alias("_fd"))
    )
    # No broadcast hint on `flagged_dig`: it is O(batch-content)-sized,
    # so a static hint would be wrong for corpus-sized batches — AQE
    # promotes it to a broadcast at runtime when it is actually small.
    admitted = surv1.join(
        flagged_dig, F.md5(surv1["text"]) == F.col("_fd"), "left_anti"
    )
    return corpus, batch, surv1, admitted


@register(
    "dedup_incremental",
    ids="dedup: incremental batch-vs-corpus admission (exact digest gate → cross-side LSH)",
    oracle=f"""
WITH corpus AS (SELECT doc_id AS id, text FROM documents),
batch AS (
  SELECT doc_id + 5000000 AS id, text
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 5000000, text || ' zz qq'
  FROM documents WHERE doc_id % 4 = 1
  UNION ALL
  SELECT doc_id + 5000000,
         'fresh doc ' || doc_id || ' standalone content'
  FROM documents WHERE doc_id % 4 = 2
),
surv1 AS (
  SELECT * FROM batch
  WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
),
creps AS (
  SELECT min(id) AS id, min(text) AS text FROM corpus GROUP BY md5(text)
),
breps AS (
  SELECT min(id) AS id, min(text) AS text FROM surv1 GROUP BY md5(text)
),
base AS (SELECT id, text FROM creps UNION ALL SELECT id, text FROM breps),
t AS ({{shingles}}),
cross_near AS (
  SELECT DISTINCT b.id
  FROM t b JOIN t c ON b.id >= 5000000 AND c.id < 5000000
  WHERE CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(b.sh, c.sh))) >= 0.7
),
flagged_dig AS (
  SELECT md5(breps.text) AS dig
  FROM breps JOIN cross_near ON cross_near.id = breps.id
)
SELECT (SELECT count(*) FROM batch) AS n_batch,
       (SELECT count(*) FROM surv1) AS n_after_exact,
       (SELECT count(*) FROM surv1
         WHERE md5(text) NOT IN (SELECT dig FROM flagged_dig))
           AS n_admitted
""".format(shingles=_DUCK_SHINGLES),
)
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup — the shape a production pipeline
    actually runs (a NEW batch admitted against an EXISTING corpus,
    not a one-shot self-dedup): (1) exact gate — batch anti-joined
    on content digest against the corpus digest set (16-byte keys,
    never text); (2) near gate — MinHash+LSH candidates restricted to
    CROSS-side pairs (batch × corpus; id ranges are disjoint so the
    side test is a pure predicate), exact-Jaccard rescored, any match
    rejects the batch doc.  The seeded batch has one exact copy, one
    near-dup, and one genuinely-new doc per corpus stride, so all
    three admission outcomes are exercised and exactly recomputable.

    The near gate runs over DISTINCT CONTENT on both sides (r11
    collapse-first conversion: a batch document's admission decision is
    a pure function of its content, so representatives decide and the
    verdict propagates back to every id by digest — identical results
    on duplicate-free tiers, pair work bounded by distinct content on
    the replicated sf1 tier).

    Scale shape: the exact gate shuffles digests; the near gate is the
    standard band join over the collapsed union (at 100 TB the corpus
    side's signatures are PRECOMPUTED and stored — only the batch
    recomputes, and the band join prunes to colliding buckets).

    Pipeline construction lives in :func:`incremental_admission_frames`
    (shared with the sf10 witness, r15)."""
    _corpus, batch, surv1, admitted = incremental_admission_frames(
        spark, sf_dir
    )
    return (
        batch.agg(F.count(F.lit(1)).alias("n_batch"))
        .crossJoin(
            F.broadcast(surv1.agg(F.count(F.lit(1)).alias("n_after_exact")))
        )
        .crossJoin(
            F.broadcast(admitted.agg(F.count(F.lit(1)).alias("n_admitted")))
        )
    )
