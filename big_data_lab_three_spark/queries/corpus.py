"""Corpus-preparation layer (round 11): the iterative/compositional
shapes the r10 verdict ranked highest among missing LLM-pipeline
operators — full BPE tokenizer TRAINING (the K-merge loop, not just the
first merge), SemDeDup-style cluster-scoped embedding dedup, and the
CCNet-style perplexity-bucket quality filter.

Reference scope note: the reference lab (``src/preprocess.py``,
``src/train.py``) has no tokenizer/dedup layer at all — this module is
beyond-reference extension, built on the registry's existing
conventions (portable md5 hashing, micro-unit quantization, chained-CTE
iterative oracles per ``queries/graph.py``'s pagerank_check).

Registration-order contract: this module imports LAST (see
``queries/__init__._MODULES``) so its never-driver-verified names sort
after every older queued name in the driver's 50-query prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.functions.text import tokens
from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.queries.text import _DUCK_TOKS
from big_data_lab_three_spark.sources import table

_BPE_K = 10


def _bpe_vocab(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """The word-frequency table BPE trains on: ONE corpus token scan
    collapsed to (tok, cnt, syms) where ``syms`` is the initial
    character segmentation.  Everything after this is
    vocabulary-bounded (Zipf), never corpus-sized — the property that
    makes the 10-round loop scale-free: at 100 TB the corpus scan is
    one combiner-friendly groupBy and the loop state is still only the
    vocabulary.  ``docs`` overrides the source frame (r14: the frozen-
    vocab census trains on an md5 fold, not the whole table)."""
    words = (
        (docs if docs is not None else table(spark, sf_dir, "documents"))
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.select(
        "tok",
        "cnt",
        F.expr("filter(split(tok, ''), x -> x != '')").alias("syms"),
    )


def _bpe_merge_loop(
    spark: SparkSession,
    sf_dir: str,
    k: int = _BPE_K,
    docs: DataFrame | None = None,
    round_times: list | None = None,
):
    """Run the K-merge BPE training loop; returns ``(merges, vocab)``
    where ``merges`` is the list of (rank, left, right, merged, cnt)
    rows and ``vocab`` is the final segmented vocabulary DataFrame.

    Loop shape per round: one pair-explode + combiner groupBy on the
    vocabulary, ONE driver-side ``first()`` for the argmax pair (1 row
    × K rounds — the same bounded driver materialization as the IVF
    codebook sample), then the greedy non-overlapping merge as a pure
    ``aggregate`` fold over each word's symbol array (left-to-right,
    exactly Sennrich's merge: a consumed symbol becomes the merged
    token, which can never equal the left symbol again, so the
    last-element check IS the non-overlap rule).  The vocabulary is
    localCheckpoint'ed per round — bounded state, same convention as
    the connected-components iteration — so the plan never compounds
    across rounds."""
    vocab = _bpe_vocab(spark, sf_dir, docs=docs).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, k + 1):
        if round_times is not None:
            import time as _time

            _t0 = _time.time()
        n = F.size("syms")
        pairs = (
            vocab.where(n >= 2)
            .select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, n - 1),
                        F.slice("syms", 2, n - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), "a", "b").first()
        if top is None:
            break
        a, b, c = top["a"], top["b"], int(top["c"])
        merges.append((rank, a, b, a + b, c))
        # LAZY local checkpoint (r16): the merged vocabulary still
        # truncates its lineage (the plan can never compound across
        # rounds), but materialization rides round r+1's argmax job
        # instead of paying a dedicated eager-materialization job —
        # ONE Spark job per round where the eager form ran two (the
        # fold-merge projection is computed exactly once either way:
        # the sort computes every partition, which the lazy
        # checkpoint's persist captures).  Guide §1.3 fixed costs.
        vocab = vocab.select(
            "tok", "cnt", bpe_merge_expr("syms", a, b).alias("syms")
        ).localCheckpoint(eager=False)
        if round_times is not None:
            round_times.append((rank, _time.time() - _t0))
    return merges, vocab


def bpe_merge_expr(syms, a: str, b: str):
    """Greedy left-to-right NON-OVERLAPPING merge of the symbol pair
    (a, b) in a symbol array, as a pure fold expression: append each
    symbol unless the accumulator's last element is ``a`` and the
    current is ``b``, in which case replace the last element with
    ``a+b``.  This IS Sennrich's merge: a consumed position becomes
    the merged token, which can never equal ``a`` again (``b`` is
    non-empty), so runs like [a,a,a] under (a,a) yield [aa,a] and
    [a,b,a,b] under (a,b) yields [ab,ab] — pinned by
    ``tests/test_llm_ops.py``."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_oracle_rounds(k: int = _BPE_K, src: str = "documents") -> str:
    """The chained-CTE DuckDB twin of the K-merge loop (the
    ``pagerank_check`` iterative-oracle pattern): round r derives pair
    counts from span table ``s{r-1}``, takes the (count DESC, pair
    ASC) argmax, selects the greedy non-overlapping merge positions
    with the run-parity window trick (consecutive candidate runs take
    every other position — exactly left-to-right greedy), and emits
    span table ``s{r}``.  ``MATERIALIZED`` pins each multi-referenced
    CTE so the 10-round chain can't inline exponentially.

    Run grouping uses the DENSE span index ``seq`` (row_number over
    surviving spans), NOT the raw ``pos``: from round 2 onward consumed
    positions leave gaps in ``pos``, so a self-pair run (a == b, e.g.
    merging ('ab','ab') over the spans of 'abababab' after round 1)
    would split into separate pos-based groups and BOTH overlapping
    sites would be selected, deleting a symbol from the span table.
    ``seq``-based grouping keeps exactly the truly span-adjacent
    candidates in one run — pinned by the abab regression case in
    ``tests/test_llm_ops.py``."""
    parts = [
        f"""WITH words AS MATERIALIZED (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM {src})
    GROUP BY tok
), s0 AS MATERIALIZED (
    SELECT tok AS w, cnt,
           unnest([{{'pos': i, 'sym': tok[i]}}
                   for i in range(1, length(tok) + 1)],
                  recursive := true)
    FROM words
)"""
    ]
    for r in range(1, k + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""", adj{r} AS MATERIALIZED (
    SELECT w, cnt, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS seq
    FROM {prev}
), t{r} AS MATERIALIZED (
    SELECT sym AS a, nxt AS b, CAST(sum(cnt) AS BIGINT) AS c
    FROM adj{r} WHERE nxt IS NOT NULL GROUP BY sym, nxt
    ORDER BY c DESC, a, b LIMIT 1
), k{r} AS (
    SELECT w, pos FROM (
        SELECT w, pos,
               row_number() OVER (PARTITION BY w, grp ORDER BY pos) AS rn
        FROM (SELECT x.w, x.pos,
                     x.seq - row_number() OVER (
                         PARTITION BY x.w ORDER BY x.seq) AS grp
              FROM adj{r} x, t{r}
              WHERE x.sym = t{r}.a AND x.nxt = t{r}.b))
    WHERE rn % 2 = 1
), s{r} AS MATERIALIZED (
    SELECT w, cnt, pos, sym FROM (
        SELECT s.w, s.cnt, s.pos,
               CASE WHEN k.pos IS NOT NULL
                    THEN s.sym || lead(s.sym) OVER (
                        PARTITION BY s.w ORDER BY s.pos)
                    ELSE s.sym END AS sym,
               lag(k.pos IS NOT NULL) OVER (
                   PARTITION BY s.w ORDER BY s.pos) AS pt
        FROM {prev} s LEFT JOIN k{r} k ON k.w = s.w AND k.pos = s.pos)
    WHERE pt IS DISTINCT FROM TRUE
)"""
        )
    return "".join(parts)


def _bpe_merges_select(k: int) -> str:
    """UNION-ALL readout of the k training argmax rows t1..tk — shared
    by the K=10 and K=50 oracles so the merge-table shape can never
    drift between them."""
    return "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, a AS left_sym, "
        f"b AS right_sym, a || b AS merged, c AS pair_cnt FROM t{r}"
        for r in range(1, k + 1)
    )


_BPE_MERGES_SELECT = _bpe_merges_select(_BPE_K)


@register(
    "bpe_train_merges",
    ids="tokenizer: full BPE training loop — K=10 greedy merges over the "
    "Zipf-weighted vocabulary, exact merge table (rank, pair, count)",
    oracle=_bpe_oracle_rounds()
    + f"""
{_BPE_MERGES_SELECT}
ORDER BY merge_rank
""",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer TRAINING — the iterative merge loop
    ``bpe_merge_census`` (first merge only) stops short of, and the
    r10 verdict's top missing LLM-pipeline shape: 10 rounds of
    (count adjacent symbol pairs weighted by word frequency → merge
    the argmax pair greedily left-to-right in every word), emitting
    the merge table a tokenizer would persist.  Ties break on the
    (left, right) pair strings; counts are exact integers, so the
    whole loop is engine-portable with no float anywhere.

    The oracle replays all 10 rounds as chained CTEs (the
    ``pagerank_check`` pattern) over a span representation, selecting
    greedy non-overlapping merge sites with a run-parity window — the
    value hash pins every rank's pair AND its pre-merge count.

    Scale shape: ONE corpus token scan collapses to the word-frequency
    table; every loop round is vocabulary-bounded (pair explode +
    combiner groupBy + 1-row driver argmax + fold-merge projection,
    localCheckpoint'ed bounded state).  At 100 TB the corpus scan
    dominates and runs once; the loop cost is independent of corpus
    size."""
    merges, _ = _bpe_merge_loop(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_cnt long",
    ).orderBy("merge_rank")


@register(
    "bpe_segment_census",
    ids="tokenizer: BPE apply/compression census — corpus segmented by "
    "the 10 learned merges, weighted symbols-per-token before/after",
    oracle=_bpe_oracle_rounds()
    + f"""
, before AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(sum(cnt * length(tok)) AS BIGINT) AS syms_before
    FROM words
), after AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS syms_after,
           CAST(count(DISTINCT sym) AS BIGINT) AS vocab_syms
    FROM s{_BPE_K}
)
SELECT before.n_tokens, before.syms_before, after.syms_after,
       after.vocab_syms,
       CAST(after.syms_after * 1000000 // before.syms_before AS BIGINT)
           AS compression_micro
FROM before, after
""",
)
def bpe_segment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY census — the downstream half of tokenizer training:
    segment the corpus with the 10 learned merges and report the
    weighted compression (total symbols per corpus before vs after,
    plus the distinct symbol vocabulary the merges produced).  This is
    the number a tokenizer pipeline actually tunes for — symbols per
    token ≈ sequence length ≈ training cost.

    All counts are exact integers weighted by word frequency; the
    compression ratio is an integer micro-unit division.

    Scale shape: shares ``bpe_train_merges``'s loop (one corpus scan,
    vocabulary-bounded rounds); the census itself is two 1-row
    aggregates over the vocabulary joined by a broadcast cross —
    output is exactly one row."""
    _, vocab = _bpe_merge_loop(spark, sf_dir)
    before = _bpe_vocab(spark, sf_dir).agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.col("cnt") * F.length("tok")).alias("syms_before"),
    )
    after = vocab.select(
        "cnt", F.explode("syms").alias("sym")
    ).agg(
        F.sum("cnt").alias("syms_after"),
        F.count_distinct(F.col("sym")).alias("vocab_syms"),
    )
    return (
        before.crossJoin(F.broadcast(after))
        .select(
            "n_tokens",
            "syms_before",
            "syms_after",
            "vocab_syms",
            F.expr(
                "div(syms_after * 1000000, syms_before)"
            ).alias("compression_micro"),
        )
    )


# ---------------------------------------------------------------------
# SemDeDup: cluster-scoped embedding dedup (Abbas et al. 2023 shape)
# ---------------------------------------------------------------------

# Centroid count SCALES WITH THE CORPUS (r11 verdict watch item: a
# fixture-fixed k=8 leaves the per-cell matrix unbounded at 100×) but
# is CAPPED at _CELL_MAX (ADVICE r12: an uncapped n/256 formula trades
# the per-cell quadratic for an n×k assignment quadratic — at 1B
# vectors the centroid broadcast is ~2 GB and assignment is 4×10^15
# dot products).  Both engines derive the count from the same corpus
# count with the same formula, so the oracle stays exact at every
# tier: n_cells = min(4096, max(8, ceil(n/256))).
#
# Honest cost accounting under the cap: assignment is O(n · n_cells)
# = at most O(n · 4096) — LINEAR in the corpus with a bounded (<= a
# few MB) centroid broadcast.  The expected cell stays ~256 up to
# 1.05M vectors (cap × target); between 1.05M and 16.8M vectors the
# intra-cell prune's GEMM grows toward _CELL_CAP² (~134 MB float64,
# still one task); past 16.8M vectors the fail-loud _CELL_CAP guard
# ABORTS — the documented scale path beyond that is hierarchical
# (two-level) assignment, not a silently-degrading flat index.
# At the driver tiers (<= 2048 vectors) this IS the historical k=8;
# the sf1 tier (20k vectors) gets 79 cells, exercising the growth.
_CELL_TARGET = 256
_CELL_CAP = 16 * _CELL_TARGET
_CELL_MAX = 4096  # hard ceiling on centroid count (bounds n×k assign)


def _n_cells(n_vecs: int, floor: int = 8) -> int:
    """Centroid count for ``n_vecs`` corpus vectors: enough cells that
    the EXPECTED cell holds ~``_CELL_TARGET`` vectors, never fewer
    than ``floor``, never more than ``_CELL_MAX`` (see the cost
    accounting above).  Pure integer function — both engines compute
    it from the same corpus count (see ``_DUCK_N_CELLS``)."""
    import math

    return min(_CELL_MAX, max(floor, math.ceil(n_vecs / _CELL_TARGET)))


_DUCK_N_CELLS = (
    "(SELECT least(4096, greatest(8, "
    "CAST(ceil(count(*) / 256.0) AS BIGINT))) FROM embeddings)"
)


def _check_cell_bound(cell, n: int) -> None:
    """Fail-loud per-cell size guard for grouped-map prune stages: a
    cell past ``_CELL_CAP`` means the centroid count stopped scaling
    with the corpus (or assignment collapsed onto one centroid) and
    the intra-cell O(cell²) stage is about to go quadratic — abort
    with the cell id rather than spill or OOM silently."""
    if n > _CELL_CAP:
        raise ValueError(
            f"semdedup cell {cell!r} holds {n} vectors > cap "
            f"{_CELL_CAP}; centroid count must scale with the corpus "
            "(_n_cells)"
        )


_SEMDEDUP_ORACLE = f"""
WITH reps AS (
  SELECT min(vec_id) AS id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings GROUP BY CAST(embedding AS DOUBLE[])
), base AS (
  SELECT id, v FROM reps
  UNION ALL
  SELECT id + 1000000, list_transform(v, x -> x * 1.01) FROM reps
), cents AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {_DUCK_N_CELLS}
), sc AS (
  SELECT base.id, cents.cid,
         round(list_dot_product(v, cv)
               / (sqrt(list_dot_product(v, v))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cq
  FROM base CROSS JOIN cents
), asg AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid,
           row_number() OVER (
               PARTITION BY id ORDER BY cq DESC, cid ASC) AS rn
    FROM sc)
  WHERE rn = 1
), wc AS (
  SELECT base.id, base.v, asg.cell FROM base JOIN asg USING (id)
), dropped AS (
  SELECT DISTINCT b.id FROM wc a JOIN wc b
    ON a.cell = b.cell AND a.id < b.id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.95
)
SELECT CAST(wc.cell AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(d.id) AS BIGINT) AS n_dropped,
       CAST(count(*) - count(d.id) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN d.id IS NULL THEN wc.id END), 0)
            AS BIGINT) AS sum_kept_id
FROM wc LEFT JOIN dropped d ON d.id = wc.id
GROUP BY wc.cell
ORDER BY cell
"""


def _semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared SemDeDup front half: collapse bit-identical embeddings to
    min-id representatives, seed one rescaled (×1.01 — cosine exactly 1
    up to fp) near-dup per representative, and assign every vector to
    its nearest of ``_n_cells(corpus)`` deterministic centroids (the
    lowest-``vec_id`` originals, the ``ivf_cost_census`` convention) by
    6-decimal cosine with centroid-id tiebreak.  The centroid count
    scales with the corpus up to a hard cap
    (``min(4096, max(8, ceil(n/256)))``, computed from the same count
    by both engines): assignment stays LINEAR (O(n·4096) worst case,
    bounded broadcast) and the per-cell prune stays one-task-sized up
    to the fail-loud ``_CELL_CAP`` boundary (~16.8M vectors) — see the
    cost accounting above ``_n_cells``.  Returns (id, v, cell)."""
    from big_data_lab_three_spark.functions.vector import dot as _dot
    from big_data_lab_three_spark.queries.dedup import _seed_id

    e = table(spark, sf_dir, "embeddings")
    n_cells = _n_cells(e.count())
    reps = (
        e.select(
            F.col("embedding").cast("array<double>").alias("v"), "vec_id"
        )
        .groupBy("v")
        .agg(F.min("vec_id").alias("id"))
    )
    base = reps.select("id", "v").unionByName(
        reps.select(
            _seed_id(F.col("id")).alias("id"),
            F.transform("v", lambda x: x * 1.01).alias("v"),
        )
    )
    cents = e.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    cq = F.round(
        _dot(F.col("v"), F.col("cv"))
        / (
            F.sqrt(_dot(F.col("v"), F.col("v")))
            * F.sqrt(_dot(F.col("cv"), F.col("cv")))
        ),
        6,
    )
    best = (
        base.crossJoin(F.broadcast(cents))
        .select("id", "v", "cid", cq.alias("cq"))
        .groupBy("id", "v")
        .agg(
            F.max(
                F.struct(
                    F.col("cq").alias("cq"), (-F.col("cid")).alias("negcid")
                )
            ).alias("b")
        )
    )
    return best.select(
        "id", "v", (-F.col("b.negcid")).alias("cell")
    )


@register(
    "semdedup_prune",
    ids="dedup: SemDeDup cluster-scoped embedding dedup — centroid-cell "
    "assignment, intra-cell pairwise cosine prune, per-cell census",
    oracle=_SEMDEDUP_ORACLE,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — the cluster-scoped composition
    the r10 verdict ranked among the top missing pieces: vectors are
    assigned to centroid cells, and the pairwise cosine prune runs
    only WITHIN cells, never across the corpus — the device that turns
    embedding dedup's O(n²) into O(Σ cell²).  Bit-identical embeddings
    collapse to min-id representatives FIRST (the r10 collapse-first
    conversion, which is also what keeps the replicated sf1 tier's
    pair stage bounded by distinct content); each representative gets
    a rescaled near-dup seed, so every cell genuinely prunes; a vector
    drops when any smaller-id cell-mate has cosine ≥ 0.95 (margins are
    structural — seeded pairs sit at ~1.0, unrelated 64-d pairs at
    |cos| ≲ 0.5 — the ``dedup_embedding`` threshold precedent).

    Output is the per-cell census (sizes, drops, kept-id checksum) —
    linear in cells — and the oracle recomputes assignment AND prune
    exactly (6-decimal assignment cosine with centroid tiebreak, the
    engine-parity formula proven by ``ivf_cost_census``).

    Scale shape: assignment is a broadcast nested-loop over the
    centroid table (the IVF assign); the prune is ONE grouped-map
    ``applyInPandas`` pass — each cell's vectors arrive once (a single
    cell-keyed shuffle of (id, vec) rows, never pair rows), the
    intra-cell cosine matrix is one float64 GEMM, and each cell emits
    exactly its census row.  This is SemDeDup's own formulation
    (per-cluster matrices), and it replaced a JVM pair self-join that
    evaluated three fold-expressions per pair — 13× slower at sf0.1
    (19.6s → 1.5s, bench r11).  At 100 TB: more centroids bound the
    per-cell matrix; the shuffle stays linear in vectors."""
    import pandas as pd

    wc = _semdedup_cells(spark, sf_dir)

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        _check_cell_bound(int(pdf["cell"].iloc[0]), len(pdf))
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["v"].to_numpy())[order].astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = mn @ mn.T
        # dropped: any strictly-lower-triangle neighbor ≥ threshold
        # (ids are sorted, so j < i means a smaller id)
        dropped = (np.tril(cos >= 0.95, k=-1)).any(axis=1)
        kept = ~dropped
        return pd.DataFrame(
            {
                "cell": [int(pdf["cell"].iloc[0])],
                "n_vecs": [len(ids)],
                "n_dropped": [int(dropped.sum())],
                "n_kept": [int(kept.sum())],
                "sum_kept_id": [int(ids[kept].sum()) if kept.any() else 0],
            }
        )

    return (
        wc.groupBy("cell")
        .applyInPandas(
            prune,
            "cell long, n_vecs long, n_dropped long, n_kept long, "
            "sum_kept_id long",
        )
        .orderBy("cell")
    )


@register(
    "semdedup_cell_census",
    ids="dedup: SemDeDup cell-assignment census — linear sf1-scale "
    "witness for the cluster-scoped prune (no pair stage)",
    oracle=f"""
WITH reps AS (
  SELECT min(vec_id) AS id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings GROUP BY CAST(embedding AS DOUBLE[])
), base AS (
  SELECT id, v FROM reps
  UNION ALL
  SELECT id + 1000000, list_transform(v, x -> x * 1.01) FROM reps
), cents AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < {_DUCK_N_CELLS}
), sc AS (
  SELECT base.id, cents.cid,
         round(list_dot_product(v, cv)
               / (sqrt(list_dot_product(v, v))
                  * sqrt(list_dot_product(cv, cv))), 6) AS cq
  FROM base CROSS JOIN cents
), asg AS (
  SELECT id, cid AS cell FROM (
    SELECT id, cid,
           row_number() OVER (
               PARTITION BY id ORDER BY cq DESC, cid ASC) AS rn
    FROM sc)
  WHERE rn = 1
)
SELECT CAST(cell AS BIGINT) AS cell,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(id) AS BIGINT) AS sum_id,
       CAST(min(id) AS BIGINT) AS min_id
FROM asg GROUP BY cell ORDER BY cell
""",
)
def semdedup_cell_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LINEAR half of SemDeDup — cell sizes and id checksums after
    collapse + seeding + centroid assignment, with NO pair stage: the
    sf1-scale witness that pins the assignment arithmetic (the part
    whose cost grows with the corpus) while ``semdedup_prune`` pins
    the intra-cell prune on the collapsed representative set.

    Scale shape: one groupBy collapse, one broadcast nested-loop
    assign, one rollup — strictly linear in vectors."""
    wc = _semdedup_cells(spark, sf_dir)
    return (
        wc.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("id").alias("sum_id"),
            F.min("id").alias("min_id"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------
# CCNet-style perplexity-bucket quality filter
# ---------------------------------------------------------------------


def _ccnet_oracle() -> str:
    from big_data_lab_three_spark.queries.pipeline import _DUCK_BIGRAM_SC

    return f"""
WITH {_DUCK_BIGRAM_SC}, bkt AS (
    SELECT lang, doc_id, avg_lp,
           ntile(3) OVER (
               PARTITION BY lang ORDER BY avg_lp DESC, doc_id) AS bucket
    FROM sc
)
SELECT lang, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(floor(avg_lp * 1000000 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_lp_micro,
       round(min(avg_lp), 4) AS worst_logprob
FROM bkt GROUP BY lang, bucket ORDER BY lang, bucket
"""


@register(
    "ccnet_perplexity_buckets",
    ids="curation: CCNet-style LM-perplexity head/middle/tail buckets — "
    "per-language terciles of per-doc bigram-LM scores",
    oracle=_ccnet_oracle(),
)
def ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style QUALITY BUCKETING (Wenzek et al. 2020) — the
    composition ``bigram_logprob`` (per-doc LM scores) and
    ``quality_filter_funnel`` (gate chain) separately stop short of:
    per language, documents split into head / middle / tail terciles
    of LM log-probability (bucket 1 = head = best-scored; CCNet keeps
    head+middle for training and discards tail).  The census reports
    each bucket's size, micro-quantized score mass, and worst score.

    Portability: per-doc scores come from the shared micro-quantized
    bigram scorer (``pipeline.bigram_doc_scores`` / its DuckDB twin
    ``_DUCK_BIGRAM_SC``, identical by construction); the tercile cut
    orders by (avg_lp DESC, doc_id) — fully deterministic — and both
    engines' ``ntile`` put the remainder in the leading buckets.

    Scale shape: the scorer is two token scans against Zipf-bounded
    model tables; the tercile is one per-language range-partition sort
    of (doc_id, score) rows — CCNet itself fits percentile cutoffs on
    a sample at production scale, and that swap (approx percentiles →
    filter) keeps this plan's downstream identical."""
    from pyspark.sql import Window

    from big_data_lab_three_spark.queries.pipeline import (
        bigram_doc_scores,
    )

    sc = bigram_doc_scores(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(F.desc("avg_lp"), "doc_id")
    bkt = sc.select(
        "lang",
        "doc_id",
        "avg_lp",
        F.ntile(3).over(w).alias("bucket"),
    )
    return (
        bkt.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.floor(F.col("avg_lp") * F.lit(1000000.0) + F.lit(0.5))
            ).alias("sum_lp_micro"),
            F.round(F.min("avg_lp"), 4).alias("worst_logprob"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "bpe_fertility_by_lang",
    ids="tokenizer: per-language fertility of the trained BPE — weighted "
    "symbols-per-token after the 10 learned merges (tokenizer equity)",
    oracle=_bpe_oracle_rounds()
    + f"""
, wl AS (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT lang, unnest({_DUCK_TOKS}) AS tok FROM documents)
    GROUP BY lang, tok
), f AS (
    SELECT w AS tok, CAST(count(*) AS BIGINT) AS ns
    FROM s{_BPE_K} GROUP BY w
)
SELECT wl.lang,
       CAST(sum(wl.c) AS BIGINT) AS n_tokens,
       CAST(sum(wl.c * f.ns) AS BIGINT) AS n_syms,
       CAST(sum(wl.c * f.ns) * 1000000 // sum(wl.c) AS BIGINT)
           AS fertility_micro
FROM wl JOIN f USING (tok)
GROUP BY wl.lang ORDER BY wl.lang
""",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE fertility of the trained tokenizer — the equity
    metric every multilingual tokenizer report leads with: after the
    10 learned merges, how many symbols does an average token of each
    language cost?  (A language whose tokens segment into more symbols
    pays more sequence length per word — the under-served-language
    signal.)  Weighted by corpus frequency; exact integers and one
    micro-unit division.

    Scale shape: the corpus contributes one (lang, tok) rollup; the
    trained segmentation contributes a vocabulary-sized (tok →
    n_symbols) map joined BROADCAST onto it — the corpus is never
    rescanned per language, and the loop cost is shared with
    ``bpe_train_merges`` by construction."""
    _, vocab = _bpe_merge_loop(spark, sf_dir)
    wl = (
        table(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f = vocab.select("tok", F.size("syms").alias("ns"))
    return (
        wl.join(F.broadcast(f), "tok")
        .groupBy("lang")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("ns")).alias("n_syms"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_syms",
            F.expr("div(n_syms * 1000000, n_tokens)").alias(
                "fertility_micro"
            ),
        )
        .orderBy("lang")
    )


@register(
    "dedup_priority_keep",
    ids="dedup: priority-keep exact dedup — same-content groups keep the "
    "highest-priority source copy (canonical-over-mirror), per-source census",
    oracle="""
WITH base AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, 'mirror'
  FROM documents WHERE doc_id % 6 = 0
), pr AS (
  SELECT doc_id, source, md5(text) AS dig,
         CASE WHEN source = 'mirror' THEN 0 ELSE 1 END AS prio
  FROM base
), keep AS (
  SELECT dig, doc_id AS kept_id FROM (
    SELECT dig, doc_id,
           row_number() OVER (
               PARTITION BY dig ORDER BY prio DESC, doc_id ASC) AS rn
    FROM pr) WHERE rn = 1
)
SELECT pr.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep.kept_id = pr.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(coalesce(sum(CASE WHEN keep.kept_id = pr.doc_id
                              THEN pr.doc_id END), 0) AS BIGINT)
           AS sum_kept_id
FROM pr JOIN keep USING (dig)
GROUP BY pr.source
ORDER BY pr.source
""",
)
def dedup_priority_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIORITY-KEEP exact dedup — the production refinement of
    ``dedup_exact``'s min-id rule: when the same content arrives from
    several sources (here: seeded ``mirror`` copies of every sixth
    document), the pipeline keeps the highest-PRIORITY copy (canonical
    sources over mirrors), breaking ties on the smaller id — the
    "which copy do we trust" decision every crawl dedup makes.  The
    census reports per-source totals, keeps, and a kept-id checksum.

    Scale shape: one digest groupBy via ``max(struct(prio, -id))`` —
    a combiner-friendly argmax, no window over the corpus — then one
    source rollup; the shuffle carries 16-byte digests, ids, and a
    source tag, never text."""
    from big_data_lab_three_spark.queries.dedup import _seed_id

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    base = d.unionByName(
        d.where(F.col("doc_id") % 6 == 0).select(
            _seed_id(F.col("doc_id")).alias("doc_id"),
            "text",
            F.lit("mirror").alias("source"),
        )
    )
    pr = base.select(
        "doc_id",
        "source",
        F.md5("text").alias("dig"),
        F.when(F.col("source") == "mirror", F.lit(0))
        .otherwise(F.lit(1))
        .alias("prio"),
    )
    keep = pr.groupBy("dig").agg(
        F.max(
            F.struct(
                F.col("prio").alias("prio"),
                (-F.col("doc_id")).alias("negid"),
            )
        ).alias("b")
    ).select("dig", (-F.col("b.negid")).alias("kept_id"))
    return (
        pr.join(keep, "dig")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("kept_id") == F.col("doc_id")).cast("int")
            ).cast("long").alias("n_kept"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("kept_id") == F.col("doc_id"),
                        F.col("doc_id"),
                    )
                ),
                F.lit(0),
            ).alias("sum_kept_id"),
        )
        .orderBy("source")
    )


@register(
    "hard_negative_mining",
    ids="similarity: hard-negative mining — per probe, top-3 most-similar "
    "vectors BELOW the near-dup threshold (contrastive training pairs)",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
), q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 8
), sc AS (
  SELECT q.qid, v.vec_id,
         round(list_dot_product(ev, qv)
               / (sqrt(list_dot_product(ev, ev))
                  * sqrt(list_dot_product(qv, qv))), 4) AS cq
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.qid
), neg AS (
  SELECT qid, vec_id, cq,
         row_number() OVER (
             PARTITION BY qid ORDER BY cq DESC, vec_id ASC) AS rank
  FROM sc WHERE cq < 0.95
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS INTEGER) AS rank,
       CAST(vec_id AS BIGINT) AS neg_id, cq AS cos_sim
FROM neg WHERE rank <= 3
ORDER BY qid, rank
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining — the contrastive-training composition the
    similarity family stops short of: for each probe (the 8
    ``vec_id < 8`` query vectors), the 3 most-similar corpus vectors
    that are NOT near-duplicates (4-decimal cosine < 0.95, self
    excluded) — exactly the "hard negatives" an embedding trainer
    pairs with each anchor.  Deterministic: cosine ties break on
    vec_id.

    Scale shape: one broadcast nested-loop of the 8-probe table
    against the corpus scan (the ``ivf_cost_census`` assign shape),
    then TakeOrderedAndProject per probe via a qid-partitioned window
    over probe-keyed rows — linear in the corpus, and the near-dup
    exclusion is a scan predicate, not a join."""
    from big_data_lab_three_spark.functions.vector import dot as _dot
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ev")
    )
    q = table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    cq = F.round(
        _dot(F.col("ev"), F.col("qv"))
        / (
            F.sqrt(_dot(F.col("ev"), F.col("ev")))
            * F.sqrt(_dot(F.col("qv"), F.col("qv")))
        ),
        4,
    )
    sc = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cq.alias("cq"))
        .where(F.col("cq") < 0.95)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cq"), F.asc("vec_id"))
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "qid",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neg_id"),
            F.col("cq").alias("cos_sim"),
        )
        .orderBy("qid", "rank")
    )


@register(
    "dedup_soft_weights",
    ids="dedup: soft dedup — duplication-aware downweighting (weight "
    "1/copies per content group) instead of dropping, per-source census",
    oracle="""
WITH base AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source
  FROM documents WHERE doc_id % 10 = 0
), dig AS (
  SELECT doc_id, source, md5(text) AS d FROM base
), cnt AS (
  SELECT d, CAST(count(*) AS BIGINT) AS copies FROM dig GROUP BY d
)
SELECT dig.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT dig.d) AS BIGINT) AS n_distinct,
       CAST(sum(1000000 // cnt.copies) AS BIGINT) AS weight_micro_sum
FROM dig JOIN cnt USING (d)
GROUP BY dig.source
ORDER BY dig.source
""",
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup — the downweighting alternative to dropping (the
    duplication-aware training-mix correction: a document seen k times
    contributes weight 1/k, so duplicated content keeps exactly one
    document's worth of gradient mass instead of k or 1).  Every tenth
    document is seeded with an exact copy so weights genuinely split;
    the census reports, per source, raw rows, distinct contents, and
    the total retained weight in exact integer micro-units
    (``1000000 // copies`` — integer division, engine-identical).

    Scale shape: one digest groupBy builds the copy-count table, one
    digest-keyed join attaches it (both shuffle 16-byte digests, never
    text), one source rollup — strictly linear, no pair stage at all,
    so this query rides every tier including replicated sf1 as-is."""
    from big_data_lab_three_spark.queries.dedup import _seed_id

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    base = d.unionByName(
        d.where(F.col("doc_id") % 10 == 0).select(
            _seed_id(F.col("doc_id")).alias("doc_id"), "text", "source"
        )
    )
    dig = base.select("doc_id", "source", F.md5("text").alias("d"))
    cnt = dig.groupBy("d").agg(F.count(F.lit(1)).alias("copies"))
    return (
        dig.join(cnt, "d")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("d")).alias("n_distinct"),
            F.sum(F.expr("div(1000000, copies)")).alias(
                "weight_micro_sum"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# k-core decomposition (iterative graph peeling)
# ---------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 6


def _kcore_oracle(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [
        """WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), p AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
    SELECT pa, pb FROM p GROUP BY pa, pb HAVING count(*) >= 2
), s0 AS MATERIALIZED (
    SELECT pa AS src, pb AS dst FROM e
    UNION ALL
    SELECT pb, pa FROM e
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", k{r} AS MATERIALIZED (
    SELECT src FROM s{r - 1} GROUP BY src HAVING count(*) >= {k}
), s{r} AS MATERIALIZED (
    SELECT s.src, s.dst FROM s{r - 1} s
    JOIN k{r} x ON s.src = x.src
    JOIN k{r} y ON s.dst = y.src
)"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS round, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM k{r}) AS n_nodes, "
        f"(SELECT CAST(count(*) AS BIGINT) // 2 FROM s{r}) AS n_edges"
        for r in range(1, rounds + 1)
    )
    parts.append(f"\n{sel}\nORDER BY round")
    return "".join(parts)


@register(
    "kcore_peel_census",
    ids="graph: k-core decomposition — 6 peeling rounds over the "
    "co-purchase graph, nodes/edges surviving each round",
    oracle=_kcore_oracle(),
)
def kcore_peel_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE decomposition census — the iterative graph-peeling
    family the registry lacked (connected components and PageRank
    exist; peeling is the third canonical iterative-graph shape, used
    for spam-farm detection and graph-based corpus filtering): on the
    co-purchase graph (parts sharing ≥2 orders — the bounded
    ``copurchase_topk`` pair generation), repeatedly remove nodes with
    degree < 3; each of the 6 rounds reports surviving nodes and
    edges.  Exact integers; the oracle replays every round as chained
    MATERIALIZED CTEs (the ``pagerank_check``/``bpe_train_merges``
    iterative-oracle pattern).

    Scale shape: pair generation is basket-keyed (fan-out ≤ C(items,2)
    per order, linear overall); each peel round is one degree rollup +
    two semi-joins on the shrinking edge table, localCheckpoint'ed
    bounded state per round — round count is FIXED (6), so the plan
    and the oracle are both round-bounded, never data-dependent."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("pa", "pb")
    )
    sym = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    ).unionByName(
        edges.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )
    sym = sym.localCheckpoint()
    rows: list[tuple] = []
    for r in range(1, _KCORE_ROUNDS + 1):
        # lazy checkpoints (r16): the census counts below materialize
        # them — keep.count() runs the degree rollup, sym.count() the
        # two semi-joins — 2 jobs per round where the eager form ran 4
        # (each checkpoint job + each count).  Lineage truncation per
        # round is unchanged.
        keep = (
            sym.groupBy("src")
            .agg(F.count(F.lit(1)).alias("dg"))
            .where(F.col("dg") >= _KCORE_K)
            .select("src")
        ).localCheckpoint(eager=False)
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(
                keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
        rows.append((r, keep.count(), sym.count() // 2))
    return spark.createDataFrame(
        rows, "round int, n_nodes long, n_edges long"
    ).orderBy("round")


@register(
    "vocab_coverage_curve",
    ids="tokenizer: vocabulary coverage curve — cumulative corpus-token "
    "share of the top-k vocabulary entries at k in {1,10,20,30}",
    oracle=f"""
WITH words AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM documents)
    GROUP BY tok
), tot AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS total FROM words
), rk AS (
    SELECT cnt,
           row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn,
           sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
    FROM words
), ks AS (
    SELECT CAST(k AS INTEGER) AS k FROM (VALUES (1), (10), (20), (30)) t(k)
)
SELECT ks.k,
       CAST(max(rk.cum) AS BIGINT) AS covered_tokens,
       CAST(max(rk.cum) * 1000000 // max(tot.total) AS BIGINT)
           AS coverage_micro
FROM ks JOIN rk ON rk.rn <= ks.k, tot
GROUP BY ks.k ORDER BY ks.k
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary COVERAGE curve — the first chart of every tokenizer
    sizing exercise: what share of all corpus tokens do the k most
    frequent vocabulary entries cover, at k ∈ {1, 10, 20, 30}?  (The
    Zipf complement of ``heaps_law_fit``'s growth view; the knee of
    this curve is where vocabulary budget stops paying.)  Exact
    integer counts; rank ties break on the token string; shares are
    integer micro-unit divisions.

    Scale shape: one corpus token scan collapses to the
    vocabulary-bounded word table; the cumulative window runs over
    VOCAB rows ordered by count (Zipf-bounded, never corpus-sized),
    and the k readout is a broadcast join against a 4-row literal
    table."""
    from pyspark.sql import Window

    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = words.agg(F.sum("cnt").alias("total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    rk = words.select(
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    ks = spark.createDataFrame([(1,), (10,), (20,), (30,)], "k int")
    return (
        F.broadcast(ks)
        .join(rk, rk["rn"] <= ks["k"])
        .crossJoin(F.broadcast(tot))
        .groupBy("k")
        .agg(
            F.max("cum").alias("covered_tokens"),
            F.expr("div(max(cum) * 1000000, max(total))").alias(
                "coverage_micro"
            ),
        )
        .orderBy("k")
    )


@register(
    "source_overlap_matrix",
    ids="corpus analytics: pairwise source vocabulary overlap — exact "
    "token-set Jaccard between every source pair",
    oracle=f"""
WITH st AS (
    SELECT DISTINCT source, unnest({_DUCK_TOKS}) AS tok FROM documents
), n AS (
    SELECT source, CAST(count(*) AS BIGINT) AS nv FROM st GROUP BY source
), inter AS (
    SELECT a.source AS sa, b.source AS sb,
           CAST(count(*) AS BIGINT) AS n_common
    FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT inter.sa, inter.sb, inter.n_common,
       na.nv + nb.nv - inter.n_common AS n_union,
       CAST(inter.n_common * 1000000
            // (na.nv + nb.nv - inter.n_common) AS BIGINT)
           AS jaccard_micro
FROM inter JOIN n na ON na.source = inter.sa
           JOIN n nb ON nb.source = inter.sb
ORDER BY inter.sa, inter.sb
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SOURCE-vocabulary overlap — the corpus-composition
    audit behind mix planning (two sources with near-identical
    vocabularies add redundancy, not diversity): exact token-set
    Jaccard for every source pair, in integer micro-units.

    Scale shape: the corpus collapses to DISTINCT (source, token) rows
    (vocabulary × sources bounded); the intersection self-join is
    keyed on the token, so fan-out per token is bounded by the source
    count squared — at 100 TB this is a |sources|²-output rollup over
    a Zipf-bounded table, never a corpus-scale shuffle."""
    st = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    st = st.localCheckpoint()  # vocab×sources-bounded, reused 3×
    n = st.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = st.select(F.col("source").alias("sa"), "tok")
    b = st.select(F.col("source").alias("sb"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = n.select(F.col("source").alias("sa"), F.col("nv").alias("na"))
    nb = n.select(F.col("source").alias("sb"), F.col("nv").alias("nb"))
    return (
        inter.join(F.broadcast(na), "sa")
        .join(F.broadcast(nb), "sb")
        .select(
            "sa",
            "sb",
            "n_common",
            (F.col("na") + F.col("nb") - F.col("n_common")).alias(
                "n_union"
            ),
            F.expr(
                "div(n_common * 1000000, na + nb - n_common)"
            ).alias("jaccard_micro"),
        )
        .orderBy("sa", "sb")
    )


@register(
    "heldout_perplexity_census",
    ids="text quality: HELD-OUT bigram-LM perplexity census — model from "
    "the md5-80% train split, smoothed backoff scoring of the test split",
    oracle=f"""
WITH d AS (
    SELECT doc_id, lang, {_DUCK_TOKS} AS toks,
           CAST(('0x' || substr(md5('hp:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), tr AS (
    SELECT * FROM d WHERE fold != 0
), te AS (
    SELECT * FROM d WHERE fold = 0
), uni AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS c1
    FROM (SELECT unnest(toks) AS tok FROM tr) GROUP BY tok
), tt AS (
    SELECT CAST(sum(c1) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS vsz
    FROM uni
), bg AS (
    SELECT doc_id, lang,
           unnest([{{'w1': toks[i], 'w2': toks[i+1]}}
                   for i in range(1, len(toks))],
                  recursive := true)
    FROM tr WHERE len(toks) >= 2
), b2 AS (
    SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
), tbg AS (
    SELECT doc_id, lang,
           unnest([{{'w1': toks[i], 'w2': toks[i+1]}}
                   for i in range(1, len(toks))],
                  recursive := true)
    FROM te WHERE len(toks) >= 2
), sc AS (
    SELECT tbg.doc_id, tbg.lang,
           sum(CAST(floor(ln(coalesce(0.75 * b2.c2 / ua.c1, 0.0)
                             + 0.25 * (coalesce(ub.c1, 0) + 1)
                               / (tt.total + tt.vsz))
                          * 1000000 + 0.5) AS BIGINT))
               / count(*) / 1000000.0 AS avg_lp,
           CAST(sum(CASE WHEN b2.c2 IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov
    FROM tbg LEFT JOIN b2 USING (w1, w2)
         LEFT JOIN uni ua ON ua.tok = tbg.w1
         LEFT JOIN uni ub ON ub.tok = tbg.w2, tt
    GROUP BY tbg.doc_id, tbg.lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_oov) AS BIGINT) AS n_oov_bigrams,
       round(avg(avg_lp), 4) AS mean_logprob,
       round(min(avg_lp), 4) AS worst_logprob
FROM sc GROUP BY lang ORDER BY lang
""",
)
def heldout_perplexity_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HELD-OUT bigram-LM perplexity — the honest-eval twin of
    ``bigram_logprob`` (which trains and scores on the same corpus):
    the model (unigram + bigram counts) fits on the md5-derived 80%
    train fold only, and the 20% test fold is scored with smoothed
    backoff — an unseen bigram falls back to the add-one unigram term
    ``0.25·(c₁(w₂)+1)/(T+V)``, so out-of-vocabulary continuations get
    finite scores instead of breaking the join.  The census reports
    per-language test-doc counts, OOV-bigram totals (exact integers),
    and mean/worst per-doc scores under the registry's
    quantize-before-sum convention.

    Scale shape: identical to ``bigram_logprob`` — two token scans
    build Zipf-bounded model tables, the test bigram stream LEFT-joins
    them (Spark broadcasts when they fit), one per-doc rollup, one
    per-language census.  The md5 fold split is a scan predicate."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    fold = md5_mod("hp:", F.col("doc_id"), 5)
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("toks"),
        fold.alias("fold"),
    )
    tr = d.where(F.col("fold") != 0)
    te = d.where(F.col("fold") == 0)
    uni = (
        tr.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint()  # model table, reused for w1 AND w2
    )
    tt = uni.agg(
        F.sum("c1").alias("total"), F.count(F.lit(1)).alias("vsz")
    )

    def bigrams(frame: DataFrame) -> DataFrame:
        n = F.size("toks")
        return (
            frame.where(n >= 2)
            .select(
                "doc_id",
                "lang",
                F.explode(
                    F.zip_with(
                        F.slice("toks", 1, n - 1),
                        F.slice("toks", 2, n - 1),
                        lambda a, b: F.struct(
                            a.alias("w1"), b.alias("w2")
                        ),
                    )
                ).alias("p"),
            )
            .select("doc_id", "lang", F.col("p.w1"), F.col("p.w2"))
        )

    b2 = (
        bigrams(tr)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    ua = uni.select(F.col("tok").alias("w1"), F.col("c1").alias("c1a"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c1").alias("c1b"))
    term = F.log(
        F.coalesce(
            F.lit(0.75) * F.col("c2") / F.col("c1a"), F.lit(0.0)
        )
        + F.lit(0.25)
        * (F.coalesce(F.col("c1b"), F.lit(0)) + F.lit(1))
        / (F.col("total") + F.col("vsz"))
    )
    sc = (
        bigrams(te)
        .join(b2, ["w1", "w2"], "left")
        .join(ua, "w1", "left")
        .join(ub, "w2", "left")
        .crossJoin(F.broadcast(tt))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.floor(term * F.lit(1000000.0) + F.lit(0.5))
            ).alias("lp_micro"),
            F.count(F.lit(1)).alias("nb"),
            F.sum(F.col("c2").isNull().cast("int"))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "lang",
            (
                F.col("lp_micro").cast("double")
                / F.col("nb")
                / F.lit(1000000.0)
            ).alias("avg_lp"),
            "n_oov",
        )
    )
    return (
        sc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_oov").alias("n_oov_bigrams"),
            F.round(F.avg("avg_lp"), 4).alias("mean_logprob"),
            F.round(F.min("avg_lp"), 4).alias("worst_logprob"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# Interpolated Kneser-Ney trigram LM (held-out scoring)
# ---------------------------------------------------------------------

# The KN probability ladder as ONE shared arithmetic text, compiled by
# both engines (Spark F.expr / DuckDB SQL) so the float expression
# trees are identical operation-for-operation — the registry's parity
# convention for transcendental scoring (see bigram_doc_scores).
# Continuation counts and discount algebra are exact integers joined
# onto the test trigram stream; D = 0.75 at both upper orders.
#   p1: add-one-smoothed CONTINUATION unigram N1+(.w3)/N1+(..) — the
#       same finite-OOV floor as heldout_perplexity_census's unigram.
#   p2: max(N1+(.w2w3)-D,0)/N1+(.w2.) + D*N1+(w2.)/N1+(.w2.) * p1,
#       falling back to p1 when w2 was never a trigram middle.
#   p3: max(c3-D,0)/ctx + D*N1+(w1w2.)/ctx * p2, falling back to p2
#       when the (w1,w2) context is unseen.
_KN_P1 = "((cu + 1) / (btypes + vsz + 1.0))"
_KN_P2 = (
    "(CASE WHEN m > 0 THEN (greatest(nl - 0.75, 0.0) + 0.75 * rt * "
    f"{_KN_P1}) / m ELSE {_KN_P1} END)"
)
_KN_P3 = (
    "(CASE WHEN cctx > 0 THEN (greatest(c3 - 0.75, 0.0) + 0.75 * r3 * "
    f"{_KN_P2}) / cctx ELSE {_KN_P2} END)"
)
_KN_TERM = f"CAST(floor(ln({_KN_P3}) * 1000000 + 0.5) AS BIGINT)"

_DUCK_TRIGRAMS = """unnest([{'w1': toks[i], 'w2': toks[i+1],
                   'w3': toks[i+2]}
                   for i in range(1, len(toks) - 1)],
                  recursive := true)"""


@register(
    "kn_trigram_perplexity",
    ids="text quality: interpolated Kneser-Ney TRIGRAM LM — the CCNet "
    "scorer shape; md5-80% train fold, continuation-count smoothing, "
    "held-out per-language perplexity census",
    oracle=f"""
WITH d AS (
    SELECT doc_id, lang, {_DUCK_TOKS} AS toks,
           CAST(('0x' || substr(md5('kn:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), tr AS (
    SELECT * FROM d WHERE fold != 0
), te AS (
    SELECT * FROM d WHERE fold = 0
), tg AS (
    SELECT {_DUCK_TRIGRAMS}
    FROM tr WHERE len(toks) >= 3
), t3 AS (
    SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c3
    FROM tg GROUP BY w1, w2, w3
), ctx AS (
    SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS cctx,
           CAST(count(*) AS BIGINT) AS r3
    FROM t3 GROUP BY w1, w2
), cl AS (
    SELECT w2, w3, CAST(count(*) AS BIGINT) AS nl
    FROM t3 GROUP BY w2, w3
), mid AS (
    SELECT w2, CAST(sum(nl) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS rt
    FROM cl GROUP BY w2
), cuni AS (
    SELECT w3, CAST(count(*) AS BIGINT) AS cu FROM cl GROUP BY w3
), tot AS (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cl) AS btypes,
           (SELECT CAST(count(DISTINCT tok) AS BIGINT)
            FROM (SELECT unnest(toks) AS tok FROM tr)) AS vsz
), ttg AS (
    SELECT doc_id, lang, {_DUCK_TRIGRAMS}
    FROM te WHERE len(toks) >= 3
), j AS (
    SELECT ttg.doc_id, ttg.lang,
           coalesce(t3.c3, 0) AS c3,
           coalesce(ctx.cctx, 0) AS cctx, coalesce(ctx.r3, 0) AS r3,
           coalesce(cl.nl, 0) AS nl,
           coalesce(mid.m, 0) AS m, coalesce(mid.rt, 0) AS rt,
           coalesce(cuni.cu, 0) AS cu,
           tot.btypes, tot.vsz
    FROM ttg
    LEFT JOIN t3 ON t3.w1 = ttg.w1 AND t3.w2 = ttg.w2
                AND t3.w3 = ttg.w3
    LEFT JOIN ctx ON ctx.w1 = ttg.w1 AND ctx.w2 = ttg.w2
    LEFT JOIN cl ON cl.w2 = ttg.w2 AND cl.w3 = ttg.w3
    LEFT JOIN mid ON mid.w2 = ttg.w2
    LEFT JOIN cuni ON cuni.w3 = ttg.w3, tot
), sc AS (
    SELECT doc_id, lang,
           CAST(floor(sum({_KN_TERM}) * 1.0 / count(*) + 0.5) AS BIGINT)
               AS avg_lp_micro,
           CAST(sum(CASE WHEN c3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unseen
    FROM j GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_unseen) AS BIGINT) AS n_unseen_trigrams,
       round(sum(avg_lp_micro) * 1.0 / count(*) / 1000000.0, 4)
           AS mean_logprob,
       round(min(avg_lp_micro) / 1000000.0, 4) AS worst_logprob
FROM sc GROUP BY lang ORDER BY lang
""",
)
def kn_trigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY trigram LM with held-out scoring — the
    actual CCNet-scorer shape (Wenzek et al. train n-gram KN models;
    ``ccnet_perplexity_buckets`` rode an order-2 proxy until now), and
    the top rung of the registry's LM ladder: ``unigram_logprob`` →
    ``bigram_logprob`` → ``heldout_perplexity_census`` → this.

    Model (train fold = md5-derived 80%): trigram counts ``c3``,
    trigram-context totals/right-type counts per (w1,w2), and KN
    CONTINUATION counts — N1+(.w2w3) distinct left-extensions per
    bigram, their per-middle sums N1+(.w2.) and type counts N1+(w2.),
    and the continuation unigram N1+(.w3).  All are exact integers
    from two groupBy ladders over ONE trigram aggregation (the cl
    table derives from t3, not a second corpus scan).  Scoring (test
    fold = 20%): each test trigram LEFT-joins the five model tables
    and evaluates the shared ``_KN_P3`` ladder — absolute discount
    D=0.75 at trigram and bigram orders, add-one continuation-unigram
    floor so OOV words stay finite — micro-quantized per the registry
    convention, then per-doc means and a per-language census.

    Scale shape: model tables are n-gram-type-bounded (Zipf), never
    corpus-bounded; the test stream joins are all model-table-sized
    on the build side (AQE broadcasts them at driver tiers; at 100 TB
    they are shuffled hash joins on bounded tables).  One corpus-scale
    exchange per groupBy ladder stage, no pair blowups, no Python in
    the hot path — the fold split is a scan predicate."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    fold = md5_mod("kn:", F.col("doc_id"), 5)
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        tokens(F.col("text")).alias("toks"),
        fold.alias("fold"),
    )
    tr = d.where(F.col("fold") != 0)
    te = d.where(F.col("fold") == 0)

    def trigrams(frame: DataFrame) -> DataFrame:
        return (
            frame.where(F.size("toks") >= 3)
            .select(
                "doc_id",
                "lang",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 2), i -> "
                        "struct(element_at(toks, i) AS w1, "
                        "element_at(toks, i + 1) AS w2, "
                        "element_at(toks, i + 2) AS w3))"
                    )
                ).alias("t"),
            )
            .select("doc_id", "lang", "t.w1", "t.w2", "t.w3")
        )

    t3 = (
        trigrams(tr)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c3"))
        .localCheckpoint()  # model table, feeds ctx + cl + the join
    )
    ctx = t3.groupBy("w1", "w2").agg(
        F.sum("c3").alias("cctx"), F.count(F.lit(1)).alias("r3")
    )
    cl = (
        t3.groupBy("w2", "w3")
        .agg(F.count(F.lit(1)).alias("nl"))
        .localCheckpoint()  # continuation table, feeds mid + cuni + tot
    )
    mid = cl.groupBy("w2").agg(
        F.sum("nl").alias("m"), F.count(F.lit(1)).alias("rt")
    )
    cuni = cl.groupBy("w3").agg(F.count(F.lit(1)).alias("cu"))
    tot = cl.agg(F.count(F.lit(1)).alias("btypes")).crossJoin(
        tr.select(F.explode("toks").alias("tok"))
        .agg(F.count_distinct("tok").alias("vsz"))
    )
    j = (
        trigrams(te)
        .join(t3, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(cl, ["w2", "w3"], "left")
        .join(mid, "w2", "left")
        .join(cuni, "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.coalesce("c3", F.lit(0)).alias("c3"),
            F.coalesce("cctx", F.lit(0)).alias("cctx"),
            F.coalesce("r3", F.lit(0)).alias("r3"),
            F.coalesce("nl", F.lit(0)).alias("nl"),
            F.coalesce("m", F.lit(0)).alias("m"),
            F.coalesce("rt", F.lit(0)).alias("rt"),
            F.coalesce("cu", F.lit(0)).alias("cu"),
            "btypes",
            "vsz",
        )
    )
    sc = (
        j.groupBy("doc_id", "lang")
        .agg(
            F.sum(F.expr(_KN_TERM)).alias("lp_micro"),
            F.count(F.lit(1)).alias("nb"),
            F.sum((F.col("c3") == 0).cast("int"))
            .cast("long")
            .alias("n_unseen"),
        )
        .select(
            "lang",
            # ADVICE r12: per-doc averages quantize to integer
            # micro-units BEFORE the per-language mean — avg() over
            # doubles is summation-order-dependent and can last-ULP-flip
            # the 4th decimal between engines; sums of BIGINTs are exact.
            F.floor(
                F.col("lp_micro") * F.lit(1.0) / F.col("nb") + F.lit(0.5)
            )
            .cast("long")
            .alias("avg_lp_micro"),
            "n_unseen",
        )
    )
    return (
        sc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_unseen").alias("n_unseen_trigrams"),
            F.round(
                F.sum("avg_lp_micro")
                * F.lit(1.0)
                / F.count(F.lit(1))
                / F.lit(1000000.0),
                4,
            ).alias("mean_logprob"),
            F.round(
                F.min("avg_lp_micro") / F.lit(1000000.0), 4
            ).alias("worst_logprob"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# TTL-windowed streaming admission (bounded-state dedup)
# ---------------------------------------------------------------------

_TTL_SIG_CHAIN = """
dig AS (
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
), banded AS ({BANDS}
), collide AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM dig x JOIN dig y ON x.d = y.d AND x.id <> y.id
  UNION
  SELECT DISTINCT x.id, y.id
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.k = y.k AND x.id <> y.id
)"""


# Seeded-cohort id offsets for the TTL admission fixture; the GUARD
# below fails loud if a tier's doc_id domain ever reaches a range where
# a collision is ARITHMETICALLY POSSIBLE (mirrors dedup._seed_id —
# ADVICE r11/r12: a silent collision between cohort ids and source ids,
# or between two cohorts' id ranges, would corrupt cohort semantics
# while both engines stayed hash-green).  Two cohorts (r_a, o_a) and
# (r_b, o_b) — each filtering doc_id % 8 == r — can emit the same id
# only if x + o_a == y + o_b with x ≡ r_a, y ≡ r_b (mod 8), which
# requires (o_a - o_b) ≡ (r_b - r_a) (mod 8); gaps failing that
# congruence can NEVER alias at any doc_id and must not tighten the
# guard (ADVICE r13 — the old unconditional min-gap bound of 500_000
# left ~1 id of headroom at the sf10 tier's ~499_999 max doc_id for a
# collision that cannot happen: all four offsets are ≡ 2 mod 8 while
# every residue pair differs by a non-zero amount mod 8).
# The four TTL-fixture cohort offsets, in shard order: (mod8 filter,
# offset, shard, mutate).  Both the Spark cohorts AND the DuckDB
# oracle's UNION arms render from THIS tuple, and the guard threshold
# derives from it — adding or moving an offset automatically tightens
# the guard instead of silently under-protecting (review finding r13).
_COHORT_SPEC: tuple[tuple[int, int, int, bool], ...] = (
    (0, 7_000_002, 1, False),
    (4, 8_000_002, 2, False),
    (1, 9_000_002, 2, True),
    (5, 9_500_002, 3, True),
)
_COHORT_OFFSETS = tuple(o for _, o, _s, _m in _COHORT_SPEC)
_COHORT_SMALLEST_OFFSET = min(_COHORT_OFFSETS)
# Inter-cohort gaps where the mod-8 congruence admits a collision; the
# source table keeps every residue, so the source/cohort bound
# (smallest offset) is always live, while collidable gaps may be empty.
_COHORT_COLLIDABLE_GAPS = tuple(
    ob - oa
    for ra, oa in ((r, o) for r, o, _s, _m in _COHORT_SPEC)
    for rb, ob in ((r, o) for r, o, _s, _m in _COHORT_SPEC)
    if ob > oa and (ob - oa) % 8 == (ra - rb) % 8
)
_COHORT_GUARD = min(
    (_COHORT_SMALLEST_OFFSET,) + _COHORT_COLLIDABLE_GAPS
)


def _cohort_id(col, offset: int):
    """``doc_id + offset`` for a seeded admission cohort, FAIL-LOUD
    (``raise_error``, one codegen branch per row) when a source id
    reaches ``_COHORT_GUARD`` — the smallest cohort offset (source/
    cohort collision) or, if the spec ever gains a congruence-
    collidable offset pair, the smallest such gap (see the derivation
    above ``_COHORT_SPEC``; the current spec has none, so the guard
    binds at 7_000_002)."""
    assert offset >= _COHORT_SMALLEST_OFFSET
    return F.when(col < _COHORT_GUARD, col + offset).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cohort-id collision: source doc_id "),
                col.cast("string"),
                F.lit(f" >= cohort guard {_COHORT_GUARD}"),
            )
        )
    )


def _ttl_oracle() -> str:
    from big_data_lab_three_spark.queries.curation import _DUCK_BANDS

    cohort_arms = "".join(
        f"""
  UNION ALL
  SELECT doc_id + {off}, text{" || ' zz qq'" if mut else ''}, {shard}
  FROM documents WHERE doc_id % 8 = {mod8}"""
        for mod8, off, shard, mut in _COHORT_SPEC
    )
    return (
        f"""
WITH base AS (
  SELECT doc_id AS id, text, doc_id % 4 AS shard FROM documents{cohort_arms}
), """
        + _TTL_SIG_CHAIN.lstrip().format(BANDS=_DUCK_BANDS)
        + """, i0 AS (
  SELECT id FROM base WHERE shard = 0
), i1 AS (
  SELECT id FROM base WHERE shard = 1
  AND id NOT IN (SELECT c.b FROM collide c JOIN i0 ON c.a = i0.id)
), i2 AS (
  SELECT id FROM base WHERE shard = 2
  AND id NOT IN (SELECT c.b FROM collide c JOIN i1 ON c.a = i1.id)
), i3 AS (
  SELECT id FROM base WHERE shard = 3
  AND id NOT IN (SELECT c.b FROM collide c JOIN i2 ON c.a = i2.id)
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
"""
    )


def admission_ttl_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TTL admission fixture's seeded stream: the corpus sharded
    ``id mod 4`` plus the four ``_COHORT_SPEC`` cohorts (exact copies
    one and two shards after their originals, and the same pair of
    near-dup mutations) — factored (r14 review) so the registered
    query and ``tools/sf10_witness.py`` can NEVER drift onto different
    streams (the `curation.admission_base` convention)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def cohort(mod8: int, offset: int, shard: int, mutate: bool):
        rows = d.where(F.col("doc_id") % 8 == mod8)
        txt = (
            F.concat("text", F.lit(" zz qq")).alias("text")
            if mutate
            else F.col("text").alias("text")
        )
        return rows.select(
            _cohort_id(F.col("doc_id"), offset).alias("id"),
            txt,
            F.lit(shard).cast("long").alias("shard"),
        )

    base = d.select(
        F.col("doc_id").alias("id"),
        "text",
        F.pmod("doc_id", F.lit(4)).alias("shard"),
    )
    for mod8, offset, shard, mutate in _COHORT_SPEC:
        base = base.unionByName(cohort(mod8, offset, shard, mutate))
    return base


@register(
    "streaming_admission_ttl",
    ids="streaming: TTL-windowed admission — bounded-state dedup where "
    "index entries expire after 1 batch (partition pruning IS eviction)",
    oracle=_ttl_oracle(),
)
def streaming_admission_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming admission — the state-eviction trade
    every production streaming dedup makes (Spark's
    ``dropDuplicatesWithinWatermark``, Flink state TTL): the digest +
    band-key index only answers for the last TTL=1 batches, so a
    duplicate arriving AFTER its original's entries expired is
    re-admitted and re-registers its keys — bounded memory bought with
    bounded lookback.  Four seeded cohorts pin all outcomes: an exact
    copy one shard later (inside the window → rejected), an exact copy
    two shards later (expired → re-admitted), and the same pair of
    outcomes for near-duplicates (band-key expiry, not just digests).

    Because the r11 index layout keys every sink write by
    ``batch_id`` partition, EVICTION IS PARTITION PRUNING: the probe
    simply does not read partitions older than ``k − ttl`` — no
    delete/compact pass, no state rewrite, and the crash/retry
    idempotence guarantees carry over unchanged.

    The oracle replays the four admission rounds as chained CTEs
    where round k's collision check joins ONLY round k−1's admitted
    set — the exact window the TTL probes implement.

    Scale shape: identical per-batch cost to
    ``streaming_minhash_admission``, but the probed index is bounded
    by the window instead of growing with the stream — the variant
    that still works when the stream never ends."""
    import os
    import shutil
    import tempfile

    from big_data_lab_three_spark.queries.curation import (
        batch_complete,
        index_admit_batch,
        run_foreachbatch_stream,
        stage_admission_shards,
    )

    base = admission_ttl_base(spark, sf_dir)
    base.persist()

    root = tempfile.mkdtemp(prefix="minhash_admission_ttl_")
    stage_admission_shards(base, root, range(4))

    def admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_complete(os.path.join(root, "idx_bands"), batch_id):
            return
        # fan-out + batch re-reads live inside index_admit_batch (r16)
        index_admit_batch(spark, batch_df, root, batch_id, ttl=1)

    run_foreachbatch_stream(spark, base.schema, root, admit)

    adm = spark.read.parquet(os.path.join(root, "admitted")).select(
        F.col("id").alias("aid")
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
    shutil.rmtree(root, ignore_errors=True)  # out is checkpointed
    return out


@register(
    "parquet_schema_evolution",
    ids="io: parquet schema-evolution round-trip — v1 writer without a "
    "column, v2 writer with it, mergeSchema read, per-version census",
    oracle="""
WITH v1 AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
), v2 AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
)
SELECT ver,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_priority AS BIGINT) AS n_priority,
       round(sum_price, 2) AS sum_price
FROM (
    SELECT 'v1' AS ver, count(*) AS n_rows, 0 AS n_priority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_price
    FROM v1
    UNION ALL
    SELECT 'v2', count(*), count(o_orderpriority),
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
    FROM v2
)
ORDER BY ver
""",
)
def parquet_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet SCHEMA-EVOLUTION round-trip — the lake-format concern
    every long-lived 100 TB table hits: an old writer lands files
    without a column, a new writer lands files with it, and readers
    must see one table where the missing column is null for old files.
    Exercised for real: v1 (even order keys, no priority column) and
    v2 (odd keys, with it) are WRITTEN to disk as separate parquet
    directories, read back through ``mergeSchema=true``, and the
    census — row counts, non-null evolved-column counts, price sums —
    must match the oracle's direct computation from the source table.

    Scale shape: two projection writes + one merged scan + one rollup;
    ``mergeSchema`` costs a footer read per FILE at planning time
    (why production tables pin schemas in a metastore — noted, not
    simulated); the census aggregate is combiner-friendly."""
    import shutil
    import tempfile

    o = table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="schema_evo_")
    ver = F.when(F.col("o_orderkey") % 2 == 0, "v1").otherwise("v2")
    o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(f"{root}/ver=v1")
    o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{root}/ver=v2")
    merged = spark.read.option("mergeSchema", "true").parquet(root)
    out = (
        merged.groupBy("ver")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderpriority").alias("n_priority"),
            # DECIMAL(12,2) before summing (ADVICE r11, the temporal.py
            # convention): at sf1 magnitudes a double partial-sum's
            # ordering drift can approach the 0.005 rounding margin;
            # fixed-point sums are exact and engine-order-free
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("ver")
    )
    out = out.localCheckpoint()
    shutil.rmtree(root, ignore_errors=True)  # out is checkpointed
    return out


@register(
    "byte_fallback_census",
    ids="tokenizer: byte-fallback census — per-language share of symbol "
    "occurrences outside the top-16 trained vocabulary (UTF-8 byte cost)",
    oracle=_bpe_oracle_rounds()
    + f"""
, wl AS (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT lang, unnest({_DUCK_TOKS}) AS tok FROM documents)
    GROUP BY lang, tok
), fsy AS (
    SELECT w, sym, CAST(count(*) AS BIGINT) AS m
    FROM s{_BPE_K} GROUP BY w, sym
), vocabw AS (
    SELECT fsy.sym, CAST(sum(wl.c * fsy.m) AS BIGINT) AS wcnt
    FROM wl JOIN fsy ON fsy.w = wl.tok
    GROUP BY fsy.sym
), topv AS (
    SELECT sym FROM vocabw ORDER BY wcnt DESC, sym LIMIT 16
), occ AS (
    SELECT wl.lang, fsy.sym, CAST(sum(wl.c * fsy.m) AS BIGINT) AS n
    FROM wl JOIN fsy ON fsy.w = wl.tok
    GROUP BY wl.lang, fsy.sym
)
SELECT occ.lang,
       CAST(sum(occ.n) AS BIGINT) AS n_occurrences,
       CAST(sum(CASE WHEN topv.sym IS NOT NULL THEN occ.n ELSE 0 END)
            AS BIGINT) AS n_in_vocab,
       CAST(sum(CASE WHEN topv.sym IS NULL
                     THEN occ.n * length(occ.sym) ELSE 0 END)
            AS BIGINT) AS fallback_bytes,
       CAST(sum(CASE WHEN topv.sym IS NULL THEN occ.n ELSE 0 END)
            * 1000000 // sum(occ.n) AS BIGINT) AS fallback_micro
FROM occ LEFT JOIN topv ON topv.sym = occ.sym
GROUP BY occ.lang ORDER BY occ.lang
""",
)
def byte_fallback_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BYTE-FALLBACK census — the second tokenizer-equity readout
    (after ``bpe_fertility_by_lang``): cap the trained vocabulary at
    its top-16 symbols by weighted frequency and measure, per
    language, how many symbol occurrences fall OUTSIDE it — each
    falling back to raw UTF-8 bytes (the SentencePiece/Llama
    byte-fallback device).  A language whose text keeps missing the
    vocabulary pays ``length(sym)`` bytes per miss — the
    under-served-language cost in its most concrete unit.

    Exact integers throughout (weighted counts, byte totals,
    micro-unit shares); the vocabulary cut ties break on the symbol.

    Scale shape: shares the BPE loop's vocabulary state; the corpus
    contributes one (lang, tok) rollup; everything after is
    vocabulary-sized joins, with the 16-row cap table broadcast."""
    from pyspark.sql import Window

    _, vocab = _bpe_merge_loop(spark, sf_dir)
    wl = (
        table(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fsy = (
        vocab.select("tok", F.explode("syms").alias("sym"))
        .groupBy("tok", "sym")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    joined = wl.join(F.broadcast(fsy), "tok").select(
        "lang", "sym", (F.col("c") * F.col("m")).alias("n")
    )
    occ = joined.groupBy("lang", "sym").agg(F.sum("n").alias("n"))
    occ = occ.localCheckpoint()  # census-sized, reused by vocab + readout
    vocabw = occ.groupBy("sym").agg(F.sum("n").alias("wcnt"))
    w = Window.orderBy(F.desc("wcnt"), F.asc("sym"))
    topv = (
        vocabw.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 16)
        .select("sym", F.lit(1).alias("inv"))
    )
    return (
        occ.join(F.broadcast(topv), "sym", "left")
        .groupBy("lang")
        .agg(
            F.sum("n").alias("n_occurrences"),
            F.sum(
                F.when(F.col("inv").isNotNull(), F.col("n")).otherwise(
                    F.lit(0)
                )
            ).alias("n_in_vocab"),
            F.sum(
                F.when(
                    F.col("inv").isNull(),
                    F.col("n") * F.length("sym"),
                ).otherwise(F.lit(0))
            ).alias("fallback_bytes"),
            F.expr(
                "div(sum(CASE WHEN inv IS NULL THEN n ELSE 0 END) "
                "* 1000000, sum(n))"
            ).alias("fallback_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# Iterative Lloyd k-means under an exact chained-CTE oracle
# ---------------------------------------------------------------------

_KM_DIM = 64
_KM_ROUNDS = 3  # a1 = assign(C0), C1, a2, C2, a3 — readout from a3/C2


def _km_sql_dot(v: str, c: str) -> str:
    """64-term explicit left-associated dot product between a vector
    array column and a (micro-sum, count)-represented centroid."""
    return " + ".join(
        f"{v}[{i}] * ({c}.s{i} / CAST({c}.n AS DOUBLE))"
        for i in range(1, _KM_DIM + 1)
    )


def _km_sql_cnorm(c: str) -> str:
    return " + ".join(
        f"({c}.s{i} / CAST({c}.n AS DOUBLE))"
        f" * ({c}.s{i} / CAST({c}.n AS DOUBLE))"
        for i in range(1, _KM_DIM + 1)
    )


def _km_sql_vnorm(v: str) -> str:
    return " + ".join(f"{v}[{i}] * {v}[{i}]" for i in range(1, _KM_DIM + 1))


def _km_sql_sums(v: str) -> str:
    return ", ".join(
        f"CAST(sum(CAST(floor({v}[{i}] * 1000000 + 0.5) AS BIGINT)) "
        f"AS BIGINT) AS s{i}"
        for i in range(1, _KM_DIM + 1)
    )


def _kmeans_oracle() -> str:
    parts = [
        f"""WITH ve AS MATERIALIZED (
    SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), c0 AS MATERIALIZED (
    SELECT vec_id AS cell, CAST(1 AS BIGINT) AS n,
           {', '.join(f'CAST(floor(CAST(embedding[{i}] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS s{i}' for i in range(1, _KM_DIM + 1))}
    FROM embeddings WHERE vec_id < {_DUCK_N_CELLS}
)"""
    ]
    for r in range(1, _KM_ROUNDS + 1):
        c = f"c{r - 1}"
        parts.append(
            f""", sc{r} AS (
    SELECT ve.id, {c}.cell,
           round(({_km_sql_dot('ve.v', c)})
                 / (sqrt({_km_sql_vnorm('ve.v')})
                    * sqrt({_km_sql_cnorm(c)})), 6) AS cq
    FROM ve CROSS JOIN {c}
), a{r} AS MATERIALIZED (
    SELECT id, cell FROM (
        SELECT id, cell, row_number() OVER (
            PARTITION BY id ORDER BY cq DESC, cell ASC) AS rn
        FROM sc{r}) WHERE rn = 1
)"""
        )
        if r < _KM_ROUNDS:
            parts.append(
                f""", c{r} AS MATERIALIZED (
    SELECT a{r}.cell, CAST(count(*) AS BIGINT) AS n,
           {_km_sql_sums('ve.v')}
    FROM a{r} JOIN ve USING (id) GROUP BY a{r}.cell
)"""
            )
    last_c = f"c{_KM_ROUNDS - 1}"
    last_a = f"a{_KM_ROUNDS}"
    parts.append(
        f"""
SELECT {last_a}.cell,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum({last_a}.id) AS BIGINT) AS sum_member_id,
       round(any_value(sqrt({_km_sql_cnorm(last_c)})) / 1000000.0, 4)
           AS centroid_norm
FROM {last_a} JOIN {last_c} ON {last_c}.cell = {last_a}.cell
GROUP BY {last_a}.cell
ORDER BY {last_a}.cell
"""
    )
    return "".join(parts)


@register(
    "kmeans_lloyd_census",
    ids="ML: distributed Lloyd k-means — 3 cosine-assignment rounds with "
    "micro-quantized centroid sums, exact cross-engine value oracle",
    oracle=_kmeans_oracle(),
)
def kmeans_lloyd_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative LLOYD K-MEANS as a first-class oracle-verified
    distributed operator — the update step ``label_centroids`` and
    the driver-side ``_spherical_kmeans`` (IVF codebooks) each cover
    half of: 3 full rounds of (cosine assignment → centroid
    recomputation) over the embeddings, both halves distributed, with
    the DuckDB oracle replaying every round to exact value parity.

    Cross-engine determinism is by construction: member components
    quantize to integer micro-units BEFORE the centroid sums (exact
    BIGINTs; the mean is the rational s/n evaluated identically), the
    assignment cosine is one explicit left-associated 64-term double
    chain on both engines rounded to 6 decimals with cell-id
    tiebreaks, and the uniform (s, n) centroid representation scales
    every centroid by 1e6 — which cosine cancels.

    Scale shape: each assignment is a broadcast nested-loop of the
    k-row centroid table against one corpus scan; each update is ONE
    combiner-friendly hash aggregate with 64 per-dimension integer
    sums (no explode, the ``label_centroids`` plan); round state is a
    k-row localCheckpoint.  At 100 TB: bigger k, same plan — this IS
    how MLlib's KMeans structures an iteration, minus its
    run-to-convergence driver loop (fixed rounds keep the oracle
    bounded)."""
    ve, asg, cent = _lloyd_state(spark, sf_dir)
    n = F.col("n").cast("double")
    cnorm = F.sqrt(
        F.aggregate(
            F.transform(
                F.col("s"),
                lambda y: (y.cast("double") / n) * (y.cast("double") / n),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cent_norms = cent.select(
        "cell",
        F.round(cnorm / F.lit(1000000.0), 4).alias("centroid_norm"),
    )
    return (
        asg.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("id").alias("sum_member_id"),
        )
        .join(F.broadcast(cent_norms), "cell")
        .select("cell", "n_members", "sum_member_id", "centroid_norm")
        .orderBy("cell")
    )


def _lloyd_state(spark: SparkSession, sf_dir: str):
    """The distributed Lloyd loop behind ``kmeans_lloyd_census``,
    exposed for the MLlib parity bench: returns ``(ve, asg, cent)`` —
    the (id, v) vector table, the final round's assignment (id, cell),
    and the final centroids in (cell, n, s) micro-sum representation
    (centroid vector = s/n, uniformly scaled 1e6 — cosine cancels
    it)."""
    e = table(spark, sf_dir, "embeddings")
    ve = e.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    ve = ve.localCheckpoint()  # scanned once per round, 3 rounds

    micro = lambda col: F.floor(col * F.lit(1000000.0) + F.lit(0.5))
    # initial-centroid count scales with the corpus — same _n_cells
    # formula the oracle's c0 computes from the same count
    cents = e.where(F.col("vec_id") < _n_cells(e.count())).select(
        F.col("vec_id").alias("cell"),
        F.lit(1).cast("long").alias("n"),
        F.array(
            *[
                micro(F.element_at(F.col("embedding").cast("array<double>"), i))
                .cast("long")
                for i in range(1, _KM_DIM + 1)
            ]
        ).alias("s"),
    )

    def assign(cent: DataFrame) -> DataFrame:
        # NOTE (r16 measured): an explicit 64-term codegen'd sum chain
        # was TRIED here and is ~1.7x SLOWER than these higher-order
        # folds on this data (192-term trees compile to worse code
        # than the interpreted primitive-array fold loop) — keep the
        # folds; do not "optimize" them back into chains.
        n = F.col("n").cast("double")
        dot = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.col("s"),
                lambda x, y: x * (y.cast("double") / n),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        vnorm = F.sqrt(
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cnorm = F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("s"),
                    lambda y: (y.cast("double") / n)
                    * (y.cast("double") / n),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cq = F.round(dot / (vnorm * cnorm), 6)
        return (
            ve.crossJoin(F.broadcast(cent))
            .select("id", "cell", cq.alias("cq"))
            .groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cq").alias("cq"),
                        (-F.col("cell")).alias("negcell"),
                    )
                ).alias("b")
            )
            .select("id", (-F.col("b.negcell")).alias("cell"))
        )

    def update(asg: DataFrame) -> DataFrame:
        sums = [
            F.sum(micro(F.element_at(F.col("v"), i)).cast("long")).alias(
                f"_s{i}"
            )
            for i in range(1, _KM_DIM + 1)
        ]
        agg = (
            asg.join(ve, "id")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
        )
        return agg.select(
            "cell",
            "n",
            F.array(
                *[F.col(f"_s{i}") for i in range(1, _KM_DIM + 1)]
            ).alias("s"),
        )

    # lazy checkpoints (r16): each round's centroid table still
    # truncates the logical plan, but materialization rides the next
    # round's broadcast build instead of a dedicated job per round
    cent = cents.localCheckpoint(eager=False)
    for r in range(1, _KM_ROUNDS + 1):
        asg = assign(cent)
        if r < _KM_ROUNDS:
            cent = update(asg).localCheckpoint(eager=False)
    return ve, asg, cent


# ---------------------------------------------------------------------
# Cross-document line-level dedup (C4 / RefinedWeb shape)
# ---------------------------------------------------------------------

# Sentence-structured fixture, built identically in both engines (the
# corpus ships single-line texts): each document's tokens chunk into
# 8-token "lines", and three deterministic boilerplate lines are
# seeded across overlapping doc_id cohorts so the operator has real
# high-doc-frequency lines to remove at every tier.
_LINE_W = 8
_LINE_DF_MIN = 3  # drop lines appearing in >= 3 distinct docs (C4's N)
_BOILER = (
    (3, 0, "subscribe to our newsletter for daily updates"),
    (4, 1, "all rights reserved copyright notice applies"),
    (7, 2, "click here to accept cookies and continue"),
)


@register(
    "line_dedup_crossdoc",
    ids="dedup: CROSS-DOCUMENT line-level dedup — drop every line whose "
    "doc-frequency >= 3 (C4/RefinedWeb boilerplate removal), reassemble, "
    "per-source census with content checksum",
    oracle=f"""
WITH d AS (
    SELECT doc_id, source, {_DUCK_TOKS} AS toks FROM documents
), lined AS (
    SELECT doc_id, source,
           (CASE WHEN doc_id % {_BOILER[0][0]} = {_BOILER[0][1]}
                 THEN ['{_BOILER[0][2]}'] ELSE [] END)
           || [array_to_string(toks[i:i+{_LINE_W - 1}], ' ')
               for i in range(1, len(toks) + 1, {_LINE_W})]
           || (CASE WHEN doc_id % {_BOILER[1][0]} = {_BOILER[1][1]}
                    THEN ['{_BOILER[1][2]}'] ELSE [] END)
           || (CASE WHEN doc_id % {_BOILER[2][0]} = {_BOILER[2][1]}
                    THEN ['{_BOILER[2][2]}'] ELSE [] END) AS lines
    FROM d
), ex AS (
    SELECT doc_id, source,
           unnest([{{'pos': i, 'line': lines[i]}}
                   for i in range(1, len(lines) + 1)],
                  recursive := true)
    FROM lined
), ldf AS (
    SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
    FROM ex GROUP BY line
), marked AS (
    SELECT ex.doc_id, ex.source, ex.pos, ex.line,
           ldf.df_docs < {_LINE_DF_MIN} AS keep
    FROM ex JOIN ldf USING (line)
), per_doc AS (
    SELECT doc_id, source,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS clean
    FROM marked GROUP BY doc_id, source
), whole AS (
    SELECT d.doc_id, d.source,
           coalesce(p.n_lines, 0) AS n_lines,
           coalesce(p.n_dropped, 0) AS n_dropped,
           coalesce(p.clean, '') AS clean
    FROM d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_lines) AS BIGINT) AS n_lines,
       CAST(sum(n_dropped) AS BIGINT) AS n_lines_dropped,
       CAST(sum(CASE WHEN n_dropped > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_touched,
       CAST(sum(CAST(('0x' || substr(md5(clean), 1, 15)) AS BIGINT)
                % 1000000007) AS BIGINT) AS clean_checksum
FROM whole GROUP BY source ORDER BY source
""",
)
def line_dedup_crossdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOCUMENT line-level dedup — the C4/RefinedWeb boilerplate
    rule the within-stream ``text.line_dedup`` doesn't cover: hash
    every line, count the DISTINCT documents containing it, drop every
    occurrence of a line whose doc-frequency reaches ``_LINE_DF_MIN``,
    and reassemble the surviving lines in original order.  The census
    proves the rewrite end-to-end: per source, total/dropped line
    counts, touched-doc counts, and a checksum over the REASSEMBLED
    text (md5-15-hex mod 1e9+7, summed) that any reassembly-order or
    drop-set divergence would break.

    The sentence fixture is built in-query (corpus texts are
    single-line): 8-token chunk lines plus three seeded boilerplate
    lines over overlapping ``doc_id`` cohorts (every 3rd/4th/7th doc),
    so high-doc-frequency lines exist at every tier; organic chunk
    collisions (the synthetic vocabulary is small) exercise the same
    path and stay engine-agreed by construction.

    Scale shape: linear and bucketed — one corpus-scale exchange to
    count per-line doc-frequency (combiner-friendly: count DISTINCT
    doc per line key), one hash join of the line stream against the
    line-frequency table on the same key, one per-doc rollup.  No
    pair stage, no skew hazard beyond the boilerplate keys themselves
    (bounded: one row per distinct line in the frequency table)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(F.col("text")).alias("toks")
    )
    chunk = (
        "CASE WHEN size(toks) = 0 THEN array() ELSE "
        f"transform(sequence(0, cast(ceil(size(toks) / {_LINE_W}.0) "
        "as int) - 1), "
        f"i -> array_join(slice(toks, i * {_LINE_W} + 1, {_LINE_W}), ' ')) "
        "END"
    )

    def boiler(mod: int, rem: int, line: str):
        return F.when(
            F.col("doc_id") % mod == rem, F.array(F.lit(line))
        ).otherwise(F.expr("CAST(array() AS array<string>)"))

    lined = d.select(
        "doc_id",
        "source",
        F.concat(
            boiler(*_BOILER[0]),
            F.expr(chunk),
            boiler(*_BOILER[1]),
            boiler(*_BOILER[2]),
        ).alias("lines"),
    )
    ex = lined.select(
        "doc_id", "source", F.posexplode("lines").alias("pos", "line")
    )
    ldf = ex.groupBy("line").agg(
        F.count_distinct("doc_id").alias("df_docs")
    )
    marked = ex.join(ldf, "line").select(
        "doc_id",
        "source",
        "pos",
        "line",
        (F.col("df_docs") < _LINE_DF_MIN).alias("keep"),
    )
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"), F.struct("pos", "line")
                        )
                    )
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean"),
    )
    full = (
        d.select("doc_id", "source")
        .join(per_doc.drop("source"), "doc_id", "left")
        .select(
            "source",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.coalesce("clean", F.lit("")).alias("clean"),
        )
    )
    csum = (
        F.conv(F.substring(F.md5(F.encode("clean", "UTF-8")), 1, 15), 16, 10)
        .cast("long")
        .__mod__(1000000007)
    )
    return (
        full.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_lines").alias("n_lines"),
            F.sum("n_dropped").alias("n_lines_dropped"),
            F.sum((F.col("n_dropped") > 0).cast("long")).alias(
                "n_docs_touched"
            ),
            F.sum(csum).alias("clean_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# Distributed multinomial Naive Bayes (reference M5 at corpus scale)
# ---------------------------------------------------------------------

# Seeded per-language marker tokens (corpus texts share one uniform
# 31-token vocabulary across langs — measured: per-lang frequency
# profiles are flat, so the raw label is textually unlearnable and a
# classifier correctly degenerates to the prior).  Three disjoint
# stopword-like markers per language, appended in-query by BOTH
# engines, give the operator a real signal to recover — the same
# build-the-fixture-in-query convention as line_dedup_crossdoc and
# the admission cohorts.  An md5-selected ~15% of docs stay
# markerless, so the held-out confusion matrix keeps explainable
# off-diagonal mass (markerless docs fall back to shared-vocab noise
# and the prior) and the smoothing path is genuinely exercised.
_NB_MARKERS = (
    ("en", "of and is"),
    ("de", "der und ist"),
    ("fr", "le et est"),
    ("es", "el y es"),
    ("zh", "de shi zai"),
)

# DuckDB CASE arms rendered from _NB_MARKERS (ADVICE r12: duplicated
# string literals in the oracle could silently drift from the Spark
# side's _NB_MARKERS and surface only as a gate-time hash mismatch —
# same shared-constant convention as _DUCK_N_CELLS / _ulm_dp_steps).
_NB_MARKER_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{l}' THEN ' {m}'" for l, m in _NB_MARKERS)
    + " ELSE '' END"
)


@register(
    "nb_lang_confusion",
    ids="ML: distributed multinomial Naive Bayes language classifier — "
    "sparse per-token features, md5-80% train fold, exact integer score "
    "algebra, held-out confusion census (reference M5+A9+A10 at corpus "
    "scale)",
    oracle=f"""
WITH d AS (
    SELECT doc_id, lang,
           list_filter(regexp_split_to_array(
               text || CASE WHEN CAST(('0x' || substr(md5(
                   'nbm:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < 85 THEN {_NB_MARKER_CASE} ELSE '' END, '\\s+'), x -> x != '') AS toks,
           CAST(('0x' || substr(md5('nb:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), tr AS (
    SELECT * FROM d WHERE fold != 0 AND len(toks) > 0
), te AS (
    SELECT * FROM d WHERE fold = 0 AND len(toks) > 0
), pri AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS nc FROM tr GROUP BY lang
), tot AS (
    SELECT CAST(sum(nc) AS BIGINT) AS n FROM pri
), trt AS (
    SELECT lang, tok FROM (SELECT lang, unnest(toks) AS tok FROM tr)
), vsz AS (
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM trt
), cb AS (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
    FROM trt GROUP BY lang, tok
), cw AS (
    SELECT lang, tok,
           CAST(floor(ln(cnt + 1) * 1000000 + 0.5) AS BIGINT) AS w
    FROM cb
), dm AS (
    SELECT tc.lang,
           CAST(floor(ln(tc.t + vsz.v) * 1000000 + 0.5) AS BIGINT) AS wd,
           CAST(floor(ln(pri.nc / CAST(tot.n AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS w0
    FROM (SELECT lang, CAST(sum(cnt) AS BIGINT) AS t
          FROM cb GROUP BY lang) tc
    JOIN pri ON pri.lang = tc.lang, vsz, tot
), tet AS (
    SELECT doc_id, lang AS actual, tok
    FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM te)
), hs AS (
    SELECT tet.doc_id, cw.lang AS cand, CAST(sum(cw.w) AS BIGINT) AS s1
    FROM tet JOIN cw ON cw.tok = tet.tok
    GROUP BY tet.doc_id, cw.lang
), sc AS (
    SELECT g.doc_id, g.actual, g.cand,
           coalesce(hs.s1, 0) - g.nt * dm.wd + dm.w0 AS score
    FROM (SELECT te.doc_id, te.lang AS actual,
                 CAST(len(te.toks) AS BIGINT) AS nt, pri.lang AS cand
          FROM te CROSS JOIN pri) g
    LEFT JOIN hs ON hs.doc_id = g.doc_id AND hs.cand = g.cand
    JOIN dm ON dm.lang = g.cand
), best AS (
    SELECT doc_id, actual, cand AS predicted FROM (
        SELECT doc_id, actual, cand,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, cand ASC
               ) AS rn
        FROM sc) WHERE rn = 1
)
SELECT actual, predicted,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM best GROUP BY actual, predicted ORDER BY actual, predicted
""",
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed MULTINOMIAL NAIVE BAYES language classifier — the
    reference's model zoo (``src/train.py:53`` trains NB; M5) and its
    evaluation ops (A9 accuracy, A10 confusion via ``pd.crosstab``)
    re-expressed as corpus-scale relational algebra with a FULL value
    oracle (``pkg/ml/models.py`` covers the same surface through
    ``pyspark.ml``; this is the from-counts formulation a 100 TB
    corpus needs).

    Train (md5-80% fold): class priors and SPARSE per-(lang, token)
    counts — no feature hashing, so rare language markers keep their
    identity (a 256-bucket hash smeared them into the shared-vocab
    mass and the classifier degenerated to the majority class;
    measured before this formulation was chosen).  Score (held-out
    20%) via the sparse decomposition of add-one log-likelihoods::

        score(c) = Σ_t floor(ln(cnt(c,t)+1)·1e6)      (hits only —
                                                       cnt=0 → ln 1 = 0)
                 - N_doc · floor(ln(T_c+V)·1e6)       (per-class denom)
                 + floor(ln(n_c/N)·1e6)               (prior)

    Every piece quantizes to integers separately, so the per-(doc,
    candidate) score is an exact BIGINT on both engines and the argmax
    (score DESC, lang ASC) has no float tie hazard.  Readout: the
    held-out confusion matrix with per-cell doc-id checksums.

    Scale shape: training is one corpus token scan into an
    (n-gram-type × langs)-bounded SPARSE parameter table; scoring
    joins test tokens against it KEYED ON THE TOKEN (only matching
    (candidate, token) pairs flow — the zero contributions never
    materialize), then a (doc × |langs|) bounded grid adds denominator
    and prior, and the argmax is a max-score + min-lang pair of
    groupBys — NO corpus-partitioned window, no dense grid, no
    feature-space explode."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    fold = md5_mod("nb:", F.col("doc_id"), 5)
    marked = md5_mod("nbm:", F.col("doc_id"), 100) < 85
    marker = F.when(
        marked,
        F.coalesce(
            *[
                F.when(F.col("lang") == l, F.lit(" " + m))
                for l, m in _NB_MARKERS
            ],
            F.lit(""),
        ),
    ).otherwise(F.lit(""))
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            tokens(F.concat("text", marker)).alias("toks"),
            fold.alias("fold"),
        )
        .where(F.size("toks") > 0)
    )
    tr = d.where(F.col("fold") != 0)
    te = d.where(F.col("fold") == 0)

    pri = tr.groupBy("lang").agg(F.count(F.lit(1)).alias("nc"))
    pri = pri.localCheckpoint()  # class table, reused 3×
    tot = pri.agg(F.sum("nc").alias("n"))
    trt = tr.select("lang", F.explode("toks").alias("tok"))
    cb = trt.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    cb = cb.localCheckpoint()  # sparse params, feed cw + tc
    vsz = trt.agg(F.count_distinct("tok").alias("v"))
    from big_data_lab_three_spark.functions.numeric import (
        micro_quantize as micro,
    )

    cw = cb.select(
        "lang", "tok", micro(F.log(F.col("cnt") + F.lit(1))).alias("w")
    )
    dm = (
        cb.groupBy("lang")
        .agg(F.sum("cnt").alias("t"))
        .join(pri, "lang")
        .crossJoin(F.broadcast(vsz))
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            micro(F.log(F.col("t") + F.col("v"))).alias("wd"),
            micro(
                F.log(F.col("nc") / F.col("n").cast("double"))
            ).alias("w0"),
        )
    )
    tet = te.select(
        "doc_id",
        F.col("lang").alias("actual"),
        F.explode("toks").alias("tok"),
    )
    hs = (
        tet.select("doc_id", "tok")
        .join(cw.withColumnRenamed("lang", "cand"), "tok")
        .groupBy("doc_id", "cand")
        .agg(F.sum("w").alias("s1"))
    )
    grid = te.select(
        "doc_id",
        F.col("lang").alias("actual"),
        F.size("toks").cast("long").alias("nt"),
    ).crossJoin(F.broadcast(pri.select(F.col("lang").alias("cand"))))
    sc = (
        grid.join(hs, ["doc_id", "cand"], "left")
        .join(F.broadcast(dm.withColumnRenamed("lang", "cand")), "cand")
        .select(
            "doc_id",
            "actual",
            "cand",
            (
                F.coalesce("s1", F.lit(0))
                - F.col("nt") * F.col("wd")
                + F.col("w0")
            ).alias("score"),
        )
    )
    sc = sc.localCheckpoint()  # scored twice (max join-back)
    ms = sc.groupBy("doc_id").agg(F.max("score").alias("ms"))
    best = (
        sc.join(ms, "doc_id")
        .where(F.col("score") == F.col("ms"))
        .groupBy("doc_id", "actual")
        .agg(F.min("cand").alias("predicted"))
    )
    return (
        best.groupBy("actual", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("actual", "predicted")
    )


# ---------------------------------------------------------------------
# Exact-substring dedup extents (Lee et al. 2022 removal accounting)
# ---------------------------------------------------------------------

_SSD_W = 8  # window width in tokens (the repeated_span_census grain)


@register(
    "substring_dedup_extents",
    ids="dedup: exact-substring dedup extents — per-source union-of-"
    "intervals coverage of corpus-repeated 8-token windows (the Lee "
    "et al. 2022 'what would substring dedup remove' accounting)",
    oracle=f"""
WITH base AS (
  SELECT doc_id AS id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 5000000, source, text
  FROM documents WHERE doc_id % 13 = 0
), tok AS (
  SELECT id, source, {_DUCK_TOKS} AS toks FROM base
), nt AS (
  SELECT source, CAST(sum(len(toks)) AS BIGINT) AS n_tokens
  FROM tok GROUP BY source
), sp AS (
  SELECT id, source, u.pos AS pos, u.g AS g FROM (
    SELECT id, source,
           unnest([{{'pos': i,
                     'g': array_to_string(toks[i:i+{_SSD_W - 1}], ' ')}}
                   for i in range(1, len(toks) - {_SSD_W - 2})]) AS u
    FROM tok)
), rep AS (
  SELECT g FROM sp GROUP BY g HAVING count(*) >= 2
), hit AS (
  SELECT id, source, pos,
         lead(pos) OVER (PARTITION BY id ORDER BY pos) AS nxt
  FROM sp WHERE g IN (SELECT g FROM rep)
), per_doc AS (
  SELECT id, source,
         CAST(count(*) AS BIGINT) AS n_win,
         CAST(sum(CASE WHEN nxt IS NULL THEN {_SSD_W}
                       ELSE least({_SSD_W}, nxt - pos) END) AS BIGINT)
             AS cov
  FROM hit GROUP BY id, source
)
SELECT p.source,
       CAST(count(*) AS BIGINT) AS n_docs_affected,
       CAST(sum(n_win) AS BIGINT) AS n_repeated_windows,
       CAST(sum(cov) AS BIGINT) AS n_tokens_covered,
       CAST(sum(cov) * 1000000 // min(nt.n_tokens) AS BIGINT)
           AS covered_micro
FROM per_doc p JOIN nt ON nt.source = p.source
GROUP BY p.source ORDER BY p.source
""",
)
def substring_dedup_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup accounting (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") — the APPLY-side twin
    of ``repeated_span_census`` (which ranks the repeated spans
    themselves): for every document, the union-of-intervals coverage
    of all 8-token windows whose exact text occurs >= 2 times anywhere
    in the corpus, rolled up per source — "how many tokens would
    substring dedup remove, and from how many documents".  Seeded
    replicas (every 13th doc, the ``repeated_span_census`` cohort)
    guarantee full-document extents exist at every tier; organic
    window collisions exercise the same path.

    Interval union is the ``span_decontaminate`` lead-trick: flagged
    window starts sorted per doc contribute ``min(W, next_start −
    start)`` tokens each (the final window contributes W), which IS
    the union length of overlapping fixed-width intervals — no
    interval explode, no per-token rows.

    Scale shape: one window explode (corpus-linear, the price
    ``repeated_span_census`` already pays), one combiner-friendly
    frequency rollup on the window text, one semi join back on the
    same key, one per-DOC window (partitions bounded by document
    length), two rollups.  No pair stage — the repeated-window set is
    frequency-filtered before anything joins it."""
    from big_data_lab_three_spark.queries.dedup import _seed_id

    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "source", "text"
    )
    # ADVICE r12: replica ids route through the fail-loud _seed_id
    # guard (k=5 → the same +5_000_000 offset, outputs unchanged).
    base = d.unionByName(
        d.where(F.col("id") % 13 == 0).select(
            _seed_id(F.col("id"), k=5).alias("id"), "source", "text"
        )
    )
    tok = base.select(
        "id", "source", tokens(F.col("text")).alias("toks")
    )
    nt = tok.groupBy("source").agg(
        F.sum(F.size("toks")).cast("long").alias("n_tokens")
    )
    w = _SSD_W
    sp = (
        tok.where(F.size("toks") >= w)
        .select(
            "id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {w - 1}), i -> "
                    f"struct(i AS pos, array_join(slice(toks, i, {w}), "
                    "' ') AS g))"
                )
            ).alias("u"),
        )
        .select("id", "source", "u.pos", "u.g")
    )
    sp = sp.localCheckpoint()  # window stream feeds rep AND the probe
    rep = (
        sp.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select("g")
    )
    from pyspark.sql import Window

    hit = (
        sp.join(rep, "g", "left_semi")
        .select(
            "id",
            "source",
            "pos",
            F.lead("pos").over(
                Window.partitionBy("id").orderBy("pos")
            ).alias("nxt"),
        )
    )
    per_doc = hit.groupBy("id", "source").agg(
        F.count(F.lit(1)).alias("n_win"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(w)).otherwise(
                F.least(F.lit(w), F.col("nxt") - F.col("pos"))
            )
        )
        .cast("long")
        .alias("cov"),
    )
    return (
        per_doc.join(F.broadcast(nt), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_affected"),
            F.sum("n_win").alias("n_repeated_windows"),
            F.sum("cov").alias("n_tokens_covered"),
            F.expr(
                "div(sum(cov) * 1000000, min(n_tokens))"
            ).alias("covered_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------
# Unigram-LM (SentencePiece) Viterbi segmentation census
# ---------------------------------------------------------------------

_ULM_MAXLEN = 8  # corpus words are <= 8 chars; longer words are
#                  counted out-of-scope in the census, never dropped
_ULM_MAXPIECE = 4
_ULM_SENTINEL = -(10**15)


def _ulm_dp_steps(ix) -> str:
    """The unrolled Viterbi DP as lateral-alias SELECT columns, shared
    by both engines via a per-engine 1-based list-index renderer
    ``ix(list_name, flat_index)``.  State encoding: ``b_i = 16·S − P``
    where S is the best micro-quantized log-score of a segmentation of
    the first i chars and P its piece count — integer scores are >= 1
    apart and P <= 8 < 16, so one BIGINT max IS the lexicographic
    (score DESC, pieces ASC) argmax.  ``sf`` is the flat per-word
    piece-score list: slot (i−1)·4+k holds the score of the length-k
    piece ENDING at char i (sentinel where k > i)."""
    cols = ["CAST(0 AS BIGINT) AS b0"]
    for i in range(1, _ULM_MAXLEN + 1):
        cands = [
            f"b{i - k} + 16 * {ix('sf', (i - 1) * _ULM_MAXPIECE + k)} - 1"
            for k in range(1, min(_ULM_MAXPIECE, i) + 1)
        ]
        body = cands[0] if len(cands) == 1 else (
            "greatest(" + ", ".join(cands) + ")"
        )
        cols.append(f"{body} AS b{i}")
    final = "CASE wlen " + " ".join(
        f"WHEN {i} THEN b{i}" for i in range(1, _ULM_MAXLEN + 1)
    ) + " END AS bfin"
    return ",\n           ".join(cols + [final])


def _ulm_duck_pieces(src: str = "words") -> str:
    """Piece-occurrence expansion of a (w, cnt) vocabulary relation —
    parametrized on the source so the frozen-apply oracle can expand
    HELD-OUT words against the same structural grid (r14)."""
    return f"""(SELECT w, cnt,
            unnest(flatten(
                [[{{'i0': i, 'k': k, 'p': w[i:i+k-1]}}
                  for k in range(1, least({_ULM_MAXPIECE},
                                          length(w) - i + 1) + 1)]
                 for i in range(1, length(w) + 1)]),
                   recursive := true)
     FROM {src} WHERE length(w) <= {_ULM_MAXLEN})"""


_ULM_DUCK_PIECES = _ulm_duck_pieces()


def _ulm_piece_occurrences(words: DataFrame) -> DataFrame:
    """All (w, cnt, i0, k, p) substring-piece occurrences of the
    in-unroll words of a (w, cnt) vocabulary — the structural grid the
    Viterbi DP scores against; factored (r14) so the frozen apply can
    expand HELD-OUT words with the identical expression."""
    inscope = words.where(F.length("w") <= _ULM_MAXLEN)
    return inscope.select(
        "w",
        "cnt",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(w)), i ->
                    transform(sequence(1, least({_ULM_MAXPIECE},
                                                length(w) - i + 1)),
                              k -> struct(i AS i0, k AS k,
                                          substring(w, i, k) AS p))))"""
            )
        ).alias("u"),
    ).select("w", "cnt", "u.i0", "u.k", "u.p")


def _ulm_dp_frame(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
):
    """Shared unigram-LM front half: the vocabulary table, the piece-
    occurrence table, and the per-word Viterbi DP frame (w, cnt, wlen,
    sf, b0..b8, bfin) under the frequency-initialized scores —
    ``unigram_lm_viterbi_census`` reads the packed optimum,
    ``unigram_lm_em_round`` walks the traceback,
    ``unigram_lm_round2_census`` re-runs the DP under re-estimated
    scores (``_ulm_dp_from_scores``).  Returns ``(toks, pc, dp)``.
    ``docs`` overrides the source frame (r14: the frozen-vocab apply
    trains on an md5 fold)."""
    toks = (
        (docs if docs is not None else table(spark, sf_dir, "documents"))
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("tok").alias("w"), "cnt")
    )
    toks = toks.localCheckpoint()  # vocab table: pieces + long-row census
    pc = _ulm_piece_occurrences(toks)
    pc = pc.localCheckpoint()  # piece occurrences: freq AND per-word sf
    pf = pc.groupBy("p").agg(F.sum("cnt").alias("f"))
    pt = pf.agg(F.sum("f").alias("t"))
    ps = pf.crossJoin(F.broadcast(pt)).select(
        "p",
        F.floor(
            F.log(F.col("f") / F.col("t").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s"),
    )
    return toks, pc, _ulm_dp_from_scores(pc, ps)


def _ulm_dp_from_scores(pc: DataFrame, ps: DataFrame) -> DataFrame:
    """The per-word Viterbi DP frame under an arbitrary (p, s) piece-
    score table: pieces absent from ``ps`` take the sentinel (pruned),
    so the same function runs round 1 (frequency scores over ALL
    pieces) and round 2 (re-estimated scores over kept pieces)."""
    nslots = _ULM_MAXLEN * _ULM_MAXPIECE
    wsf = (
        pc.join(ps, "p")
        .groupBy("w")
        .agg(
            F.first("cnt").alias("cnt"),
            F.length(F.first("w")).cast("long").alias("wlen"),
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (
                            (F.col("i0") + F.col("k") - 2)
                            * F.lit(_ULM_MAXPIECE)
                            + F.col("k")
                        ).cast("int").alias("slot"),
                        F.col("s").alias("s"),
                    )
                )
            ).alias("sm"),
        )
        .select(
            "w",
            "cnt",
            "wlen",
            F.expr(
                f"""transform(sequence(1, {nslots}), n ->
                    coalesce(element_at(sm, n),
                             CAST({_ULM_SENTINEL} AS BIGINT)))"""
            ).alias("sf"),
        )
    )
    dp = wsf.selectExpr(
        "w",
        "cnt",
        "wlen",
        "sf",
        *[
            c.replace("\n           ", " ")
            for c in _ulm_dp_steps(
                lambda l, i: f"element_at({l}, {i})"
            ).split(",\n           ")
        ],
    )
    # Materialize the vocab-sized DP frame: the lateral b-aliases
    # INLINE during analysis (b8 alone is a 4^8-node greatest tree),
    # and every downstream reference re-expands them — the EM round's
    # barr/karr references multiplied analysis time past a minute.
    # The checkpoint pins b0..b8 as plain scan columns; the frame is
    # vocabulary-bounded, so this is a KB-scale materialization.
    return dp.localCheckpoint()


def _ulm_base_sql(src: str = "documents") -> str:
    """The training front half (words → pieces → frequency scores →
    round-1 DP) as chained CTEs, parametrized on the document source
    so the frozen-vocab apply can train on an md5 fold (r14)."""
    return f"""WITH RECURSIVE words AS MATERIALIZED (
    SELECT tok AS w, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM {src})
    GROUP BY tok
), pc AS MATERIALIZED (
    SELECT * FROM {_ULM_DUCK_PIECES}
), pf AS MATERIALIZED (
    SELECT p, CAST(sum(cnt) AS BIGINT) AS f FROM pc GROUP BY p
), pt AS (
    SELECT CAST(sum(f) AS BIGINT) AS t FROM pf
), ps AS MATERIALIZED (
    SELECT pf.p,
           CAST(floor(ln(pf.f / CAST(pt.t AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT) AS s
    FROM pf, pt
), dp AS (
    SELECT w, cnt, wlen, sf,
           {_ulm_dp_steps(lambda l, i: f"{l}[{i}]")}
    FROM (
        SELECT w, cnt, wlen,
               [coalesce(list_max([pr.s FOR pr IN pairs
                                   IF pr.slot = n]),
                         CAST(-1000000000000000 AS BIGINT))
                FOR n IN range(1, 33)] AS sf
        FROM (
            SELECT pc.w, any_value(pc.cnt) AS cnt,
                   CAST(any_value(length(pc.w)) AS BIGINT) AS wlen,
                   list({{'slot': (pc.i0 + pc.k - 2) * 4 + pc.k,
                          's': ps.s}}) AS pairs
            FROM pc JOIN ps ON ps.p = pc.p
            GROUP BY pc.w))
"""


_ULM_BASE_SQL = _ulm_base_sql()


@register(
    "unigram_lm_viterbi_census",
    ids="tokenizer: unigram-LM (SentencePiece) Viterbi segmentation — "
    "frequency-initialized piece scores, exact integer DP over every "
    "vocabulary word, corpus-weighted segmentation census",
    oracle=_ULM_BASE_SQL + f"""), seg AS (
    SELECT w, cnt, wlen,
           (bfin + ((- bfin) % 16)) // 16 AS best_s,
           (- bfin) % 16 AS best_p
    FROM dp
)
SELECT CAST(wlen AS INTEGER) AS len_group,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(cnt) AS BIGINT) AS corpus_cnt,
       CAST(sum(cnt * best_p) AS BIGINT) AS sum_pieces_weighted,
       CAST(sum(cnt * best_s) AS BIGINT) AS sum_score_weighted
FROM seg GROUP BY wlen
UNION ALL
SELECT -1, CAST(count(*) AS BIGINT), CAST(coalesce(sum(cnt), 0) AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM words WHERE length(w) > {_ULM_MAXLEN}
ORDER BY len_group
""",
)
def unigram_lm_viterbi_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNIGRAM-LM tokenizer segmentation (the SentencePiece model
    family, vs BPE's merge loop): candidate pieces are every substring
    of length <= 4 of every vocabulary word, piece scores are the
    frequency-initialized log-probabilities ``ln(f(p)/T)`` (the
    standard unigram-LM initialization before EM), and each word's
    optimal segmentation is found by an EXACT-INTEGER Viterbi DP —
    micro-quantized scores, the (score, piece-count) pair packed into
    one BIGINT (``16·S − P``) so a single ``greatest`` chain is the
    lexicographic argmax with no float tie hazards.  The DP is
    unrolled to the corpus's bounded word length (8 chars) from ONE
    shared Python generator (``_ulm_dp_steps``), so the two engines
    execute the identical recurrence; words past the bound are counted
    in a ``len_group = −1`` census row, never silently dropped.
    Readout: per word-length group, corpus-weighted piece counts
    (fertility) and total segmentation scores.

    Scale shape: everything after the one corpus token scan is
    vocabulary-bounded (Zipf) — the piece explode is <= 26 rows per
    DISTINCT word, the score table is piece-type-bounded, and the DP
    is a fixed-depth expression evaluated per vocabulary row (no
    iteration state, no shuffle growth with corpus size).  At 100 TB
    the census costs one combiner-friendly groupBy more than reading
    the data.  Longer words need a longer unroll (L·4 slots, linear),
    or the grouped-map route ``semdedup_prune`` uses — noted, bounded,
    fail-visible."""
    toks, _pc, dp = _ulm_dp_frame(spark, sf_dir)
    seg = dp.select(
        "w",
        "cnt",
        "wlen",
        F.expr("(bfin + ((- bfin) % 16)) div 16").alias("best_s"),
        F.expr("(- bfin) % 16").alias("best_p"),
    )
    census = seg.groupBy(F.col("wlen").cast("int").alias("len_group")).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("cnt").alias("corpus_cnt"),
        F.sum(F.col("cnt") * F.col("best_p")).alias(
            "sum_pieces_weighted"
        ),
        F.sum(F.col("cnt") * F.col("best_s")).alias(
            "sum_score_weighted"
        ),
    )
    longrow = toks.where(F.length("w") > _ULM_MAXLEN).agg(
        F.lit(-1).cast("int").alias("len_group"),
        F.count(F.lit(1)).alias("n_words"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("corpus_cnt"),
        F.lit(0).cast("long").alias("sum_pieces_weighted"),
        F.lit(0).cast("long").alias("sum_score_weighted"),
    )
    return census.unionByName(longrow).orderBy("len_group")


def _ulm_traceback_k(ix, pos: str) -> str:
    """The Viterbi traceback step as a CASE chain, shared by both
    engines via the same index renderer as ``_ulm_dp_steps``: at
    position ``pos``, the chosen piece length is the SMALLEST k whose
    predecessor state reproduces the packed optimum —
    ``b[pos−k] + 16·s(pos,k) − 1 = b[pos]`` — re-derived from the DP
    values instead of stored, so the forward pass stays one packed
    BIGINT.  ``barr`` is the 1-based list [b0..b8]."""
    tests = []
    for k in range(1, _ULM_MAXPIECE + 1):
        cur = ix("barr", f"{pos} + 1")
        prev = ix("barr", f"{pos} - {k} + 1")
        sco = ix("sf", f"({pos} - 1) * {_ULM_MAXPIECE} + {k}")
        tests.append(
            f"WHEN {pos} >= {k} AND {prev} + 16 * {sco} - 1 = {cur} "
            f"THEN {k}"
        )
    return "CASE " + " ".join(tests) + " END"


_ULM_K_DUCK = _ulm_traceback_k(lambda l, i: f"{l}[{i}]", "pos")
_ULM_K_SPARK = _ulm_traceback_k(
    lambda l, i: f"element_at({l}, CAST({i} AS INT))", "pos"
)
_ULM_BARR = "[" + ", ".join(f"b{i}" for i in range(_ULM_MAXLEN + 1)) + "]"


def _ulm_traceback_pieces(dp: DataFrame) -> DataFrame:
    """The Viterbi traceback over a DP frame: (w, cnt, ps) where
    ``ps`` is the chosen piece array.  The k decision depends only on
    the position, so it is hoisted out of the fold into ONE
    per-position array (kept the plan off the 3x-inlined-CASE codegen
    cliff: 70s -> interactive)."""
    tb = (
        dp.withColumn(
            "barr", F.array(*[f"b{i}" for i in range(_ULM_MAXLEN + 1)])
        )
        .withColumn(
            "karr",
            F.expr(
                f"transform(sequence(1, {_ULM_MAXLEN}), "
                f"pos -> {_ULM_K_SPARK})"
            ),
        )
        .select(
            "w",
            "cnt",
            F.expr(
                f"""aggregate(
    sequence(1, {_ULM_MAXLEN}),
    named_struct('pos', CAST(wlen AS INT),
                 'ps', CAST(array() AS array<string>)),
    (acc, st) -> IF(acc.pos <= 0, acc,
        named_struct(
            'pos', acc.pos - element_at(karr, acc.pos),
            'ps', concat(acc.ps, array(substring(
                w,
                acc.pos - element_at(karr, acc.pos) + 1,
                element_at(karr, acc.pos)))))),
    acc -> acc.ps)"""
            ).alias("ps"),
        )
    )
    return tb


_ULM_TB_SQL = f"""), tb AS (
    SELECT w, cnt, sf, {_ULM_BARR} AS barr,
           wlen AS pos, CAST([] AS VARCHAR[]) AS ps
    FROM dp
    UNION ALL
    SELECT w, cnt, sf, barr,
           pos - kk AS pos,
           list_append(ps, w[CAST(pos - kk + 1 AS BIGINT)
                             : CAST(pos AS BIGINT)]) AS ps
    FROM (SELECT *, {_ULM_K_DUCK} AS kk FROM tb WHERE pos > 0)
), chosen AS (
    SELECT w, cnt, unnest(ps) AS piece FROM tb WHERE pos = 0
), m AS (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS used_cnt
    FROM chosen GROUP BY piece
)"""


@register(
    "unigram_lm_em_round",
    ids="tokenizer: unigram-LM EM round — Viterbi E-step with exact "
    "integer traceback, count M-step, re-estimated top-20 piece table",
    oracle=_ULM_BASE_SQL
    + _ULM_TB_SQL
    + f""", mt AS (
    SELECT CAST(sum(used_cnt) AS BIGINT) AS t FROM m
)
SELECT m.piece, m.used_cnt,
       CAST(m.used_cnt * 1000000 // mt.t AS BIGINT) AS prob_micro
FROM m, mt
ORDER BY m.used_cnt DESC, m.piece
LIMIT 20
""",
)
def unigram_lm_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE full unigram-LM EM round (the SentencePiece training step,
    beside ``bpe_train_merges``'s merge loop): the E-step is the
    Viterbi segmentation of every vocabulary word under the
    frequency-initialized piece scores (``_ulm_dp_frame``), its
    traceback RE-DERIVED from the packed DP values — at each position
    the chosen piece length is the smallest k whose predecessor state
    reproduces the optimum, a pure integer test both engines evaluate
    identically (``_ulm_traceback_k``) — and the M-step re-estimates
    piece probabilities from the corpus-weighted Viterbi piece counts.
    Readout: the re-estimated top-20 piece table (count-desc,
    piece-asc; exact integer counts, micro-unit probabilities).

    The traceback is a bounded fold on the Spark side
    (``aggregate(sequence(1, 8), …)`` peeling one piece per step) and
    a recursive CTE on the DuckDB side (the ``lttb_downsample``
    oracle precedent) — the recurrence text is generated once and
    rendered per engine.

    Scale shape: identical to ``unigram_lm_viterbi_census`` —
    everything after the corpus token scan is vocabulary-bounded, the
    traceback adds a fixed-depth expression per vocabulary row, and
    the M-step is one groupBy over (pieces-per-word × vocab) rows.
    This is exactly how a full EM loop would iterate at 100 TB: the
    corpus is scanned once for word counts, every E/M round after
    that touches only the Zipf-bounded vocabulary."""
    toks, _pc, dp = _ulm_dp_frame(spark, sf_dir)
    tb = _ulm_traceback_pieces(dp)
    chosen = tb.select(
        "cnt", F.explode("ps").alias("piece")
    )
    m = chosen.groupBy("piece").agg(F.sum("cnt").alias("used_cnt"))
    mt = m.agg(F.sum("used_cnt").alias("t"))
    return (
        m.crossJoin(F.broadcast(mt))
        .select(
            "piece",
            "used_cnt",
            F.expr("div(used_cnt * 1000000, t)").alias("prob_micro"),
        )
        .orderBy(F.desc("used_cnt"), "piece")
        .limit(20)
    )


_ULM_INV_SQL = """, chars AS (
    SELECT CAST(count(DISTINCT p) AS BIGINT) AS c FROM pc WHERE k = 1
), allp AS MATERIALIZED (
    SELECT DISTINCT p FROM pc
)"""


def _ulm_s_sql_r(msuf: str, r: int) -> str:
    """Parameterized score re-estimation: model round ``r`` keeps the
    pieces round ``msuf``'s Viterbi used plus the single-character
    floor (add-one mass), scored ``ln((used+floor)/(t+c))`` — the ONE
    SQL text behind round 2 (``_ULM_S2_SQL``), the convergence chain,
    and the corpus apply (review finding r13: three drifting copies)."""
    return f""", t{r} AS (
    SELECT CAST(sum(used_cnt) AS BIGINT) AS t FROM m{msuf}
), s{r} AS MATERIALIZED (
    SELECT allp.p,
           CAST(floor(ln((coalesce(mm.used_cnt, 0)
                          + CASE WHEN length(allp.p) = 1
                                 THEN 1 ELSE 0 END)
                         / CAST(t{r}.t + chars.c AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS s
    FROM allp LEFT JOIN m{msuf} mm ON mm.piece = allp.p, t{r}, chars
    WHERE mm.piece IS NOT NULL OR length(allp.p) = 1
)"""


_ULM_S2_SQL = _ULM_INV_SQL + _ulm_s_sql_r("", 2)


def _ulm_inventory(pc: DataFrame):
    """Shared piece inventory: ``(allp, chars)`` — the distinct piece
    table (localCheckpoint'ed: reused by scores AND the prune
    accounting) and the single-character type count for the add-one
    floor."""
    allp = pc.select("p").distinct().localCheckpoint()
    chars = pc.where(F.col("k") == 1).agg(
        F.count_distinct("p").alias("c")
    )
    return allp, chars


def _ulm_rescore(m: DataFrame, allp: DataFrame, chars: DataFrame):
    """Shared M-step score re-estimation — the SINGLE Spark
    implementation behind ``unigram_lm_round2_census``, the
    convergence loop, and ``unigram_corpus_apply_census`` (review
    finding r13: three hand-copies could drift independently): keep
    pieces the Viterbi used plus the single-character floor with
    add-one mass, scored ``ln((used + floor) / (t + c))`` in
    micro-units.  SQL twin: ``_ulm_s_sql_r`` / ``_ULM_S2_SQL``."""
    from big_data_lab_three_spark.functions.numeric import micro_quantize

    t = m.agg(F.sum("used_cnt").alias("t"))
    return (
        allp.join(m, "p", "left")
        .crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(chars))
        .where(F.col("used_cnt").isNotNull() | (F.length("p") == 1))
        .select(
            "p",
            micro_quantize(
                F.log(
                    (
                        F.coalesce("used_cnt", F.lit(0))
                        + F.when(
                            F.length("p") == 1, F.lit(1)
                        ).otherwise(F.lit(0))
                    )
                    / (F.col("t") + F.col("c")).cast("double")
                )
            ).alias("s"),
        )
        .localCheckpoint()
    )


def _ulm_dp2_sql(
    src_pc: str = "pc", score: str = "s2", out: str = "dp2"
) -> str:
    """DP-under-a-given-score-table chain for the DuckDB side:
    identical construction to the base ``dp`` but joined against the
    ``score`` table (pruned pieces simply have no row, so their slots
    take the sentinel).  Parametrized on the piece source and output
    name so the frozen-apply oracle can run the SAME machinery over
    held-out pieces (r14)."""
    return f""", {out} AS (
    SELECT w, cnt, wlen,
           {_ulm_dp_steps(lambda l, i: f"{l}[{i}]")}
    FROM (
        SELECT w, cnt, wlen,
               [coalesce(list_max([pr.s FOR pr IN pairs
                                   IF pr.slot = n]),
                         CAST({_ULM_SENTINEL} AS BIGINT))
                FOR n IN range(1, {_ULM_MAXLEN * _ULM_MAXPIECE + 1})] AS sf
        FROM (
            SELECT {src_pc}.w, any_value({src_pc}.cnt) AS cnt,
                   CAST(any_value(length({src_pc}.w)) AS BIGINT) AS wlen,
                   list({{'slot': ({src_pc}.i0 + {src_pc}.k - 2)
                          * {_ULM_MAXPIECE}
                          + {src_pc}.k, 's': {score}.s}}) AS pairs
            FROM {src_pc} JOIN {score} ON {score}.p = {src_pc}.p
            GROUP BY {src_pc}.w))
)"""


@register(
    "unigram_lm_round2_census",
    ids="tokenizer: unigram-LM training iteration 2 — prune unused "
    "pieces after the EM round, re-segment the vocabulary under the "
    "re-estimated model, census with model-size delta",
    oracle=_ULM_BASE_SQL
    + _ULM_TB_SQL
    + _ULM_S2_SQL
    + _ulm_dp2_sql()
    + f""", seg2 AS (
    SELECT w, cnt, wlen,
           (bfin + ((- bfin) % 16)) // 16 AS best_s,
           (- bfin) % 16 AS best_p
    FROM dp2
)
SELECT CAST(wlen AS INTEGER) AS len_group,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(cnt) AS BIGINT) AS corpus_cnt,
       CAST(sum(cnt * best_p) AS BIGINT) AS sum_pieces_weighted,
       CAST(sum(cnt * best_s) AS BIGINT) AS sum_score_weighted
FROM seg2 GROUP BY wlen
UNION ALL
SELECT -1, CAST(count(*) AS BIGINT), CAST(coalesce(sum(cnt), 0) AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM words WHERE length(w) > {_ULM_MAXLEN}
UNION ALL
SELECT -2,
       (SELECT CAST(count(*) AS BIGINT) FROM s2),
       (SELECT CAST(count(*) AS BIGINT) FROM allp)
           - (SELECT CAST(count(*) AS BIGINT) FROM s2),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
ORDER BY len_group
""",
)
def unigram_lm_round2_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unigram-LM TRAINING ITERATION 2 — the step that makes the EM
    round a LOOP (SentencePiece's actual training cycle: E-step →
    M-step → prune → re-segment): pieces the round-1 Viterbi never
    used are PRUNED from the model (single characters always survive,
    with add-one mass, so every word stays segmentable — exactly
    SentencePiece's required-character floor), the survivors take
    their re-estimated count-based scores, and the whole vocabulary
    is re-segmented by a second exact-integer Viterbi DP under the
    new model.  Readout: the round-2 segmentation census (same shape
    as ``unigram_lm_viterbi_census`` for direct round-over-round
    comparison) plus a ``len_group = −2`` row carrying (model pieces
    kept, pieces pruned).

    Scale shape: the round-1 chain plus one vocabulary-bounded score
    re-estimation and one more fixed-depth DP — per-iteration cost at
    100 TB is vocabulary-sized, never corpus-sized; the corpus is
    scanned exactly once for word counts no matter how many EM rounds
    run."""
    toks, pc, dp = _ulm_dp_frame(spark, sf_dir)
    tb = _ulm_traceback_pieces(dp)
    m = (
        tb.select("cnt", F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("used_cnt"))
    )
    m = m.localCheckpoint()  # model table: scores + t2
    allp, chars = _ulm_inventory(pc)
    s2 = _ulm_rescore(m, allp, chars)  # kept model: dp2 + kept count
    dp2 = _ulm_dp_from_scores(pc, s2)
    seg2 = dp2.select(
        "cnt",
        "wlen",
        F.expr("(bfin + ((- bfin) % 16)) div 16").alias("best_s"),
        F.expr("(- bfin) % 16").alias("best_p"),
    )
    census = seg2.groupBy(
        F.col("wlen").cast("int").alias("len_group")
    ).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("cnt").alias("corpus_cnt"),
        F.sum(F.col("cnt") * F.col("best_p")).alias(
            "sum_pieces_weighted"
        ),
        F.sum(F.col("cnt") * F.col("best_s")).alias(
            "sum_score_weighted"
        ),
    )
    longrow = toks.where(F.length("w") > _ULM_MAXLEN).agg(
        F.lit(-1).cast("int").alias("len_group"),
        F.count(F.lit(1)).alias("n_words"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("corpus_cnt"),
        F.lit(0).cast("long").alias("sum_pieces_weighted"),
        F.lit(0).cast("long").alias("sum_score_weighted"),
    )
    modelrow = (
        s2.agg(F.count(F.lit(1)).alias("kept"))
        .crossJoin(
            F.broadcast(allp.agg(F.count(F.lit(1)).alias("np")))
        )
        .select(
            F.lit(-2).cast("int").alias("len_group"),
            F.col("kept").alias("n_words"),
            (F.col("np") - F.col("kept")).alias("corpus_cnt"),
            F.lit(0).cast("long").alias("sum_pieces_weighted"),
            F.lit(0).cast("long").alias("sum_score_weighted"),
        )
    )
    return (
        census.unionByName(longrow)
        .unionByName(modelrow)
        .orderBy("len_group")
    )


# ---------------------------------------------------------------------
# Corpus-level tokenizer APPLY (r12 verdict item 4)
# ---------------------------------------------------------------------


@register(
    "bpe_corpus_apply_census",
    ids="tokenizer: corpus-level BPE APPLY — every document's token "
    "stream segmented by the 10 trained merges; per-language tokens/doc, "
    "fertility, and compression vs the character baseline",
    oracle=_bpe_oracle_rounds()
    + f"""
, f AS (
    SELECT w AS tok, CAST(count(*) AS BIGINT) AS ns
    FROM s{_BPE_K} GROUP BY w
), stream AS (
    SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS tok FROM documents
), pd AS (
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS nt,
           CAST(sum(f.ns) AS BIGINT) AS np,
           CAST(sum(length(stream.tok)) AS BIGINT) AS nc
    FROM stream JOIN f USING (tok)
    GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(np) AS BIGINT) AS n_pieces,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(nt) * 1000000 // count(*) AS BIGINT)
           AS tokens_per_doc_micro,
       CAST(sum(np) * 1000000 // sum(nt) AS BIGINT) AS fertility_micro,
       CAST(sum(np) * 1000000 // sum(nc) AS BIGINT) AS compression_micro,
       CAST(max(np * 1000000 // nt) AS BIGINT)
           AS worst_doc_fertility_micro
FROM pd GROUP BY lang ORDER BY lang
""",
)
def bpe_corpus_apply_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CORPUS-LEVEL tokenizer APPLY — the per-document path a 100 TB
    pipeline actually executes, which the training loop
    (``bpe_train_merges``) and the vocabulary-grain readouts
    (``bpe_segment_census``, ``bpe_fertility_by_lang``) stop short of
    (r12 verdict item 4): every document's token stream is segmented
    by the 10 trained merges, rolled up per document, then censused
    per language — tokens/doc, pieces-per-token fertility, and
    sequence-length compression vs the raw character baseline, plus
    the WORST per-doc fertility (the tail a per-doc distribution has
    and a vocabulary rollup cannot see).

    The apply itself is MEMOIZED segmentation — the standard
    production shape (SentencePiece/fastText cache word → pieces):
    the training loop already holds the final segmentation of every
    DISTINCT token, so the corpus stream hash-joins that
    vocabulary-bounded (tok → n_pieces) map instead of re-running the
    10-merge fold per corpus token; ``bpe_merge_expr`` remains the
    per-token fold for out-of-vocabulary application (exercised by
    ``tests/test_llm_ops.py``), and for corpus tokens the join is
    exact by construction (the vocabulary came from the same scan).

    All counts are exact integers; ratios are integer micro-unit
    divisions (``div``/``//`` on both engines) — no float anywhere.

    Scale shape: ONE corpus token scan (shared shape with training's
    frequency scan), one join against the Zipf-bounded piece map —
    UNHINTED (ADVICE r13): the localCheckpoint'ed map's known size
    lets the planner broadcast it at driver tiers, while a vocabulary
    that ever outgrew ``autoBroadcastJoinThreshold`` at 100 TB would
    legitimately fall back to a shuffled hash join on the bounded
    table instead of being forced through driver memory — one per-doc
    combiner rollup keyed by the document, one per-language census.
    No corpus-partitioned window, no pair stage, loop cost shared
    with ``bpe_train_merges``."""
    _, vocab = _bpe_merge_loop(spark, sf_dir)
    pieces = vocab.select("tok", F.size("syms").alias("ns"))
    stream = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    pd = (
        stream.join(pieces, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.sum("ns").alias("np"),
            F.sum(F.length("tok")).alias("nc"),
        )
    )
    return (
        pd.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("np").alias("n_pieces"),
            F.sum("nc").alias("n_chars"),
            F.max(F.expr("div(np * 1000000, nt)")).alias(
                "worst_doc_fertility_micro"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_pieces",
            "n_chars",
            F.expr("div(n_tokens * 1000000, n_docs)").alias(
                "tokens_per_doc_micro"
            ),
            F.expr("div(n_pieces * 1000000, n_tokens)").alias(
                "fertility_micro"
            ),
            F.expr("div(n_pieces * 1000000, n_chars)").alias(
                "compression_micro"
            ),
            "worst_doc_fertility_micro",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# Unigram-LM K-round EM convergence (r12 verdict item 5)
# ---------------------------------------------------------------------

_ULM_K_ROUNDS = 3


def _ulm_tb_sql_r(dpname: str, suf: str) -> str:
    """Parameterized DuckDB traceback chain (the ``_ULM_TB_SQL`` shape
    over an arbitrary DP CTE): recursive piece-peeling from the packed
    DP values, then the corpus-weighted used-piece counts ``m{suf}``."""
    return f""", tb{suf} AS (
    SELECT w, cnt, sf, {_ULM_BARR} AS barr,
           wlen AS pos, CAST([] AS VARCHAR[]) AS ps
    FROM {dpname}
    UNION ALL
    SELECT w, cnt, sf, barr,
           pos - kk AS pos,
           list_append(ps, w[CAST(pos - kk + 1 AS BIGINT)
                             : CAST(pos AS BIGINT)]) AS ps
    FROM (SELECT *, {_ULM_K_DUCK} AS kk FROM tb{suf} WHERE pos > 0)
), m{suf} AS (
    SELECT piece, CAST(sum(cnt) AS BIGINT) AS used_cnt
    FROM (SELECT w, cnt, unnest(ps) AS piece
          FROM tb{suf} WHERE pos = 0)
    GROUP BY piece
)"""


def _ulm_dp_sql_r(r: int) -> str:
    """Parameterized round-``r`` DP chain (``_ulm_dp2_sql`` shape
    joined against ``s{r}``), PROJECTING ``sf`` so the next round's
    traceback can re-derive decisions from the same frame."""
    return f""", dp{r} AS (
    SELECT w, cnt, wlen, sf,
           {_ulm_dp_steps(lambda l, i: f"{l}[{i}]")}
    FROM (
        SELECT w, cnt, wlen,
               [coalesce(list_max([pr.s FOR pr IN pairs
                                   IF pr.slot = n]),
                         CAST({_ULM_SENTINEL} AS BIGINT))
                FOR n IN range(1, {_ULM_MAXLEN * _ULM_MAXPIECE + 1})] AS sf
        FROM (
            SELECT pc.w, any_value(pc.cnt) AS cnt,
                   CAST(any_value(length(pc.w)) AS BIGINT) AS wlen,
                   list({{'slot': (pc.i0 + pc.k - 2) * {_ULM_MAXPIECE}
                          + pc.k, 's': s{r}.s}}) AS pairs
            FROM pc JOIN s{r} ON s{r}.p = pc.p
            GROUP BY pc.w))
)"""


def _ulm_convergence_oracle() -> str:
    """K=3-round trajectory oracle: dp (round 1, frequency-init) →
    traceback → s2 → dp2 → traceback → s3 → dp3, then one census row
    per round.  Round 1's model is the full piece inventory."""
    parts = [_ULM_BASE_SQL, ")" + _ULM_INV_SQL]
    seg_rows = []
    dpname = "dp"
    for r in range(1, _ULM_K_ROUNDS + 1):
        kept = (
            "(SELECT CAST(count(*) AS BIGINT) FROM allp)"
            if r == 1
            else f"(SELECT CAST(count(*) AS BIGINT) FROM s{r})"
        )
        seg_rows.append(
            f"""SELECT CAST({r} AS INTEGER) AS round,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(cnt) AS BIGINT) AS corpus_cnt,
       {kept} AS kept_pieces,
       (SELECT CAST(count(*) AS BIGINT) FROM allp) - {kept}
           AS pruned_pieces,
       CAST(sum(cnt * ((- bfin) % 16)) AS BIGINT)
           AS sum_pieces_weighted,
       CAST(sum(cnt * ((bfin + ((- bfin) % 16)) // 16)) AS BIGINT)
           AS sum_score_weighted
FROM {dpname}"""
        )
        if r < _ULM_K_ROUNDS:
            suf = str(r)
            parts.append(_ulm_tb_sql_r(dpname, suf))
            parts.append(_ulm_s_sql_r(suf, r + 1))
            parts.append(_ulm_dp_sql_r(r + 1))
            dpname = f"dp{r + 1}"
    parts.append("\n" + "\nUNION ALL\n".join(seg_rows) + "\nORDER BY round\n")
    return "".join(parts)


@register(
    "unigram_lm_convergence",
    ids="tokenizer: unigram-LM K=3 EM convergence — per-round "
    "(kept, pruned, weighted score) trajectory of the full "
    "prune + re-segment training loop",
    oracle=_ulm_convergence_oracle(),
)
def unigram_lm_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM EM CONVERGENCE over K=3 fixed rounds — the loop
    ``unigram_lm_round2_census`` runs once, generalized to the
    fixed-K trajectory the SentencePiece trainer actually executes
    (r12 verdict item 5): round 1 segments under frequency-initialized
    scores over the full piece inventory; each later round prunes
    pieces the previous Viterbi never used (single characters always
    survive with add-one mass), re-estimates scores from used counts,
    and re-segments.  One census row per round: model size (kept /
    pruned pieces) and the corpus-weighted piece count and total
    segmentation score — the score trajectory is the convergence
    evidence (monotone improvement pinned at sf0.001 by
    ``tests/test_llm_ops.py``).

    Both engines run the identical recurrence: the DP and traceback
    texts come from the same Python generators (``_ulm_dp_steps``,
    ``_ulm_traceback_k``) rendered per engine, and each round's score
    arithmetic is the shared round-2 formula.

    Scale shape: the corpus is scanned ONCE for word counts; each of
    the K rounds adds one vocabulary-bounded traceback + score
    re-estimation + fixed-depth DP (localCheckpoint'ed bounded state,
    the ``_bpe_merge_loop`` convention) — per-round cost is
    independent of corpus size, which is exactly what lets a real
    trainer run tens of EM rounds at 100 TB."""
    toks, pc, dp = _ulm_dp_frame(spark, sf_dir)
    allp, chars = _ulm_inventory(pc)
    npp = allp.agg(F.count(F.lit(1)).alias("np"))
    model = npp.select(
        F.col("np").alias("kept_pieces"),
        F.lit(0).cast("long").alias("pruned_pieces"),
    )
    rows: list[DataFrame] = []
    for r in range(1, _ULM_K_ROUNDS + 1):
        seg = dp.select(
            "cnt",
            F.expr("(bfin + ((- bfin) % 16)) div 16").alias("best_s"),
            F.expr("(- bfin) % 16").alias("best_p"),
        )
        census = seg.agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("cnt").alias("corpus_cnt"),
            F.sum(F.col("cnt") * F.col("best_p")).alias(
                "sum_pieces_weighted"
            ),
            F.sum(F.col("cnt") * F.col("best_s")).alias(
                "sum_score_weighted"
            ),
        )
        rows.append(
            census.crossJoin(F.broadcast(model)).select(
                F.lit(r).cast("int").alias("round"),
                "n_words",
                "corpus_cnt",
                "kept_pieces",
                "pruned_pieces",
                "sum_pieces_weighted",
                "sum_score_weighted",
            )
        )
        if r < _ULM_K_ROUNDS:
            tb = _ulm_traceback_pieces(dp)
            m = (
                tb.select("cnt", F.explode("ps").alias("p"))
                .groupBy("p")
                .agg(F.sum("cnt").alias("used_cnt"))
                .localCheckpoint()
            )
            s_next = _ulm_rescore(m, allp, chars)
            model = (
                s_next.agg(F.count(F.lit(1)).alias("kept_pieces"))
                .crossJoin(F.broadcast(npp))
                .select(
                    "kept_pieces",
                    (F.col("np") - F.col("kept_pieces")).alias(
                        "pruned_pieces"
                    ),
                )
            )
            dp = _ulm_dp_from_scores(pc, s_next)
    out = rows[0]
    for extra in rows[1:]:
        out = out.unionByName(extra)
    return out.orderBy("round")


# ---------------------------------------------------------------------
# fastText-style quality classifier (r12 verdict item 6)
# ---------------------------------------------------------------------

# Seeded spam markers appended (at ~85% rate) to the 'bad' cohort —
# the same build-the-fixture-in-query convention as _NB_MARKERS: the
# classifier has a real signal to recover, and the ~15% markerless
# bad docs keep honest false negatives in the held-out confusion.
_QC_MARKER = " click free winner prize cheap"

# Shared DuckDB fragment: the whole classifier chain through the
# per-doc argmax verdict ``qbest`` (doc_id, source, cohort, fold,
# predicted).  qc-prefixed CTE names so it composes into oracles that
# also use the bigram scorer's d/sc names (the curation funnel, r14);
# used by quality_classifier_census and curation_pipeline_census — one
# model definition, two consumers.
_QC_BEST_SQL = f"""qcd AS (
    SELECT doc_id, source,
           CASE WHEN CAST(('0x' || substr(md5(
                    'qc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 10 < 3 THEN 'bad' ELSE 'good' END AS cohort,
           list_filter(regexp_split_to_array(
               text || CASE WHEN CAST(('0x' || substr(md5(
                   'qc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 10 < 3
                   AND CAST(('0x' || substr(md5(
                   'qcm:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                   % 100 < 85
                   THEN '{_QC_MARKER}' ELSE '' END, '\\s+'),
               x -> x != '') AS toks,
           CAST(('0x' || substr(md5('qcf:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), qcdd AS (
    SELECT * FROM qcd WHERE len(toks) > 0
), qctr AS (
    SELECT * FROM qcdd WHERE fold != 0
), qcpri AS (
    SELECT cohort AS cand, CAST(count(*) AS BIGINT) AS nc
    FROM qctr GROUP BY cohort
), qctot AS (
    SELECT CAST(sum(nc) AS BIGINT) AS n FROM qcpri
), qctrt AS (
    SELECT cohort AS cand, tok
    FROM (SELECT cohort, unnest(toks) AS tok FROM qctr)
), qcvsz AS (
    SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM qctrt
), qccb AS (
    SELECT cand, tok, CAST(count(*) AS BIGINT) AS cnt
    FROM qctrt GROUP BY cand, tok
), qccw AS (
    SELECT cand, tok,
           CAST(floor(ln(cnt + 1) * 1000000 + 0.5) AS BIGINT) AS w
    FROM qccb
), qcdm AS (
    SELECT tc.cand,
           CAST(floor(ln(tc.t + qcvsz.v) * 1000000 + 0.5) AS BIGINT) AS wd,
           CAST(floor(ln(qcpri.nc / CAST(qctot.n AS DOUBLE))
                      * 1000000 + 0.5) AS BIGINT) AS w0
    FROM (SELECT cand, CAST(sum(cnt) AS BIGINT) AS t
          FROM qccb GROUP BY cand) tc
    JOIN qcpri ON qcpri.cand = tc.cand, qcvsz, qctot
), qctet AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, unnest(toks) AS tok FROM qcdd)
), qchs AS (
    SELECT qctet.doc_id, qccw.cand, CAST(sum(qccw.w) AS BIGINT) AS s1
    FROM qctet JOIN qccw ON qccw.tok = qctet.tok
    GROUP BY qctet.doc_id, qccw.cand
), qcsc AS (
    SELECT g.doc_id, g.source, g.cohort, g.fold, g.cand,
           coalesce(qchs.s1, 0) - g.nt * qcdm.wd + qcdm.w0 AS score
    FROM (SELECT qcdd.doc_id, qcdd.source, qcdd.cohort, qcdd.fold,
                 CAST(len(qcdd.toks) AS BIGINT) AS nt, qcpri.cand
          FROM qcdd CROSS JOIN qcpri) g
    LEFT JOIN qchs ON qchs.doc_id = g.doc_id AND qchs.cand = g.cand
    JOIN qcdm ON qcdm.cand = g.cand
), qbest AS (
    SELECT doc_id, source, cohort, fold, cand AS predicted FROM (
        SELECT doc_id, source, cohort, fold, cand,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, cand ASC
               ) AS rn
        FROM qcsc) WHERE rn = 1
)"""


@register(
    "quality_classifier_census",
    ids="curation: fastText-style linear quality classifier — binary "
    "NB-weighted linear score trained on seeded good/bad cohorts "
    "(md5-80% fold), whole-corpus keep/drop census per source with "
    "held-out confusion (the CCNet/fastText curation stage)",
    oracle=f"""
WITH {_QC_BEST_SQL}
SELECT source, cohort, predicted,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN fold = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_heldout,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM qbest GROUP BY source, cohort, predicted
ORDER BY source, cohort, predicted
""",
)
def quality_classifier_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """fastText-STYLE QUALITY CLASSIFIER — the remaining standard
    curation stage beside the Gopher rule funnel
    (``quality_filter_funnel``) and the CCNet perplexity buckets
    (``ccnet_perplexity_buckets``): CCNet/LLaMA-style pipelines train
    a linear text classifier on seeded good/bad cohorts and
    keep-or-drop the whole corpus on its score (r12 verdict item 6).

    The classifier is the closed-form NB-weighted linear score the
    ``nb_lang_confusion`` machinery provides (binary multinomial NB
    IS a linear classifier over bag-of-token counts — the same model
    family fastText's single-layer softmax converges to on sparse
    counts, trained in one pass instead of SGD epochs): sparse
    per-(cohort, token) counts from the md5-80% train fold, exact
    integer score decomposition (hit weights − N·denominator +
    prior), argmax with (score DESC, cohort ASC) tie order.  No
    feature hashing for the same measured reason as
    ``nb_lang_confusion`` — rare markers must keep their identity.

    The WHOLE corpus is then scored (filter decisions are what the
    pipeline ships; train docs included, as production classifiers
    do), censused per (source, actual cohort, predicted), with a
    held-out count per cell so the honest confusion (15% of bad docs
    carry no marker and mostly land as false negatives) is readable
    from the same table.

    Scale shape: training is one token scan into a (token-types × 2)
    sparse parameter table; scoring joins corpus tokens KEYED ON THE
    TOKEN (zero contributions never materialize), adds the bounded
    (doc × 2) denominator/prior grid, argmaxes with one groupBy — no
    corpus window, no dense grid (the ``nb_lang_confusion`` plan with
    2 classes and a whole-corpus test side)."""
    best = _qc_best(spark, sf_dir)
    return (
        best.groupBy("source", "cohort", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("fold") == 0).cast("int"))
            .cast("long")
            .alias("n_heldout"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .orderBy("source", "cohort", "predicted")
    )


def _qc_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier chain through the per-doc argmax verdict:
    (doc_id, source, cohort, fold, predicted) — the Spark twin of the
    ``_QC_BEST_SQL`` fragment, shared by ``quality_classifier_census``
    and the curation funnel's classifier stage (one model definition,
    two consumers)."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    hash_mod = lambda salt, mod: md5_mod(salt, F.col("doc_id"), mod)
    is_bad = hash_mod("qc:", 10) < 3
    marked = hash_mod("qcm:", 100) < 85
    marker = F.when(is_bad & marked, F.lit(_QC_MARKER)).otherwise(
        F.lit("")
    )
    dd = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.when(is_bad, F.lit("bad"))
            .otherwise(F.lit("good"))
            .alias("cohort"),
            tokens(F.concat("text", marker)).alias("toks"),
            hash_mod("qcf:", 5).alias("fold"),
        )
        .where(F.size("toks") > 0)
    )
    tr = dd.where(F.col("fold") != 0)

    pri = tr.groupBy(F.col("cohort").alias("cand")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    pri = pri.localCheckpoint()  # 2-row class table, reused 3×
    tot = pri.agg(F.sum("nc").alias("n"))
    trt = tr.select(
        F.col("cohort").alias("cand"), F.explode("toks").alias("tok")
    )
    cb = trt.groupBy("cand", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    cb = cb.localCheckpoint()  # sparse params, feed cw + per-class totals
    vsz = trt.agg(F.count_distinct("tok").alias("v"))
    from big_data_lab_three_spark.functions.numeric import (
        micro_quantize as micro,
    )

    cw = cb.select(
        "cand", "tok", micro(F.log(F.col("cnt") + F.lit(1))).alias("w")
    )
    dm = (
        cb.groupBy("cand")
        .agg(F.sum("cnt").alias("t"))
        .join(pri, "cand")
        .crossJoin(F.broadcast(vsz))
        .crossJoin(F.broadcast(tot))
        .select(
            "cand",
            micro(F.log(F.col("t") + F.col("v"))).alias("wd"),
            micro(
                F.log(F.col("nc") / F.col("n").cast("double"))
            ).alias("w0"),
        )
    )
    tet = dd.select("doc_id", F.explode("toks").alias("tok"))
    hs = (
        tet.join(cw, "tok")
        .groupBy("doc_id", "cand")
        .agg(F.sum("w").alias("s1"))
    )
    grid = dd.select(
        "doc_id",
        "source",
        "cohort",
        "fold",
        F.size("toks").cast("long").alias("nt"),
    ).crossJoin(F.broadcast(pri.select("cand")))
    sc = (
        grid.join(hs, ["doc_id", "cand"], "left")
        .join(F.broadcast(dm), "cand")
        .select(
            "doc_id",
            "source",
            "cohort",
            "fold",
            "cand",
            (
                F.coalesce("s1", F.lit(0))
                - F.col("nt") * F.col("wd")
                + F.col("w0")
            ).alias("score"),
        )
    )
    # argmax(score DESC, cand ASC) without a corpus window: pack the
    # exact-integer score with the candidate's order in one struct max
    # (the nb_lang_confusion convention; 'bad' < 'good' so ASC order
    # means ties pick 'bad' — encode as max over (score, negord)).
    best = (
        sc.withColumn(
            "ord",
            F.when(F.col("cand") == "bad", F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("doc_id", "source", "cohort", "fold")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("score"),
                    F.col("ord").alias("ord"),
                    F.col("cand").alias("cand"),
                )
            ).alias("b")
        )
        .select("doc_id", "source", "cohort", "fold", F.col("b.cand").alias("predicted"))
    )
    return best


# ---------------------------------------------------------------------
# Corpus-level unigram-LM APPLY (the trained-model sibling of
# bpe_corpus_apply_census)
# ---------------------------------------------------------------------

@register(
    "unigram_corpus_apply_census",
    ids="tokenizer: corpus-level unigram-LM APPLY — every document's "
    "token stream segmented under the TRAINED (post-EM, pruned) model; "
    "per-language tokens/doc, fertility, compression — the "
    "bpe_corpus_apply_census twin for the SentencePiece family",
    oracle=_ULM_BASE_SQL
    + _ULM_TB_SQL
    + _ULM_S2_SQL
    + _ulm_dp2_sql()
    + f""", f AS (
    SELECT w AS tok, (- bfin) % 16 AS np FROM dp2
), stream AS (
    SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS tok FROM documents
), pd AS (
    SELECT doc_id, lang,
           CAST(count(*) AS BIGINT) AS nt,
           CAST(sum(f.np) AS BIGINT) AS np,
           CAST(sum(length(stream.tok)) AS BIGINT) AS nc
    FROM stream JOIN f USING (tok)
    GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(np) AS BIGINT) AS n_pieces,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       CAST(sum(nt) * 1000000 // count(*) AS BIGINT)
           AS tokens_per_doc_micro,
       CAST(sum(np) * 1000000 // sum(nt) AS BIGINT) AS fertility_micro,
       CAST(sum(np) * 1000000 // sum(nc) AS BIGINT) AS compression_micro,
       CAST(max(np * 1000000 // nt) AS BIGINT)
           AS worst_doc_fertility_micro
FROM pd GROUP BY lang ORDER BY lang
""",
)
def unigram_corpus_apply_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CORPUS-LEVEL unigram-LM APPLY — the trained-model sibling of
    ``bpe_corpus_apply_census`` and the closure of the r12 verdict's
    apply-side caveat for the SentencePiece family: after one full EM
    round (Viterbi E-step, count M-step, prune + re-score — the
    ``unigram_lm_round2_census`` model), every document's token
    stream is segmented under the TRAINED model and censused per
    language with the same schema as the BPE apply, so the two
    tokenizer families are directly comparable on tokens/doc,
    fertility, and compression at corpus grain.

    The apply is memoized segmentation, as in the BPE twin: the
    round-2 DP already yields each DISTINCT word's optimal piece
    count under the trained model (packed in ``bfin``), so the corpus
    stream joins the vocabulary-bounded (word → n_pieces) map — the
    per-word DP never re-runs per corpus token.  (Every corpus word
    is in the vocabulary by construction; the ``len_group = −1``
    guard in the training censuses pins that the out-of-unroll bucket
    stays empty at every tier.)

    Scale shape: the training chain's one corpus scan + vocabulary-
    bounded rounds, then ONE more corpus token scan joined against
    the piece map — unhinted, same rationale as
    ``bpe_corpus_apply_census`` (planner broadcasts the known-size
    map at driver tiers; an over-threshold vocabulary falls back to
    a shuffled hash join rather than forcing driver memory) — one
    per-doc combiner rollup, one per-language census: no corpus
    window, no pair stage."""
    toks, pc, dp = _ulm_dp_frame(spark, sf_dir)
    tb = _ulm_traceback_pieces(dp)
    m = (
        tb.select("cnt", F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("used_cnt"))
        .localCheckpoint()
    )
    allp, chars = _ulm_inventory(pc)
    s2 = _ulm_rescore(m, allp, chars)
    dp2 = _ulm_dp_from_scores(pc, s2)
    pieces = dp2.select(
        F.col("w").alias("tok"),
        F.expr("(- bfin) % 16").alias("np"),
    )
    stream = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    pd = (
        stream.join(pieces, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("nt"),
            F.sum("np").alias("np"),
            F.sum(F.length("tok")).alias("nc"),
        )
    )
    return (
        pd.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.sum("np").alias("n_pieces"),
            F.sum("nc").alias("n_chars"),
            F.max(F.expr("div(np * 1000000, nt)")).alias(
                "worst_doc_fertility_micro"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_pieces",
            "n_chars",
            F.expr("div(n_tokens * 1000000, n_docs)").alias(
                "tokens_per_doc_micro"
            ),
            F.expr("div(n_pieces * 1000000, n_tokens)").alias(
                "fertility_micro"
            ),
            F.expr("div(n_pieces * 1000000, n_chars)").alias(
                "compression_micro"
            ),
            "worst_doc_fertility_micro",
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# End-to-end curation funnel (composed DAG capstone)
# ---------------------------------------------------------------------


def _curation_funnel_oracle() -> str:
    from big_data_lab_three_spark.queries.pipeline import _DUCK_BIGRAM_SC
    from big_data_lab_three_spark.queries.text import duck_pii_redact

    rtoks = _DUCK_TOKS.replace("(text,", "(rtext,")
    return f"""
WITH {_DUCK_BIGRAM_SC}, {_QC_BEST_SQL}, lmsc AS (
    SELECT doc_id, (- lp_micro) // n_bigrams AS pos_micro FROM sc
), lmcut AS (
    SELECT sc.lang, CAST(sum((- lp_micro) // n_bigrams) // count(*)
                         AS BIGINT) AS cutoff
    FROM sc GROUP BY sc.lang
), seeded AS (
    SELECT doc_id, lang, source,
           CASE WHEN doc_id % 11 = 0
                THEN text || ' contact user' || doc_id ||
                     '@example.com at 10.0.' || (doc_id % 250) ||
                     '.1 see https://ex.com/d/' || doc_id
                ELSE text END AS text
    FROM documents
), base AS (
    SELECT doc_id, doc_id AS orig_id, lang, source, text FROM seeded
    UNION ALL
    SELECT doc_id + 5000000, doc_id, lang, 'mirror', text
    FROM seeded WHERE doc_id % 7 = 0
), raw AS (
    SELECT doc_id, orig_id, lang, source, text, rtext, {rtoks} AS toks
    FROM (SELECT *, {duck_pii_redact("text")} AS rtext FROM base)
), fbg AS (
    SELECT DISTINCT unnest(list_distinct(
               [array_to_string(toks[i:i+7], ' ')
                for i in range(1, len(toks) - 6)])) AS g
    FROM (SELECT {_DUCK_TOKS} AS toks
          FROM documents WHERE doc_id % 13 = 0)
), fcontam AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_id, unnest([array_to_string(toks[i:i+7], ' ')
                               for i in range(1, len(toks) - 6)]) AS g
        FROM raw WHERE len(toks) >= 8)
    WHERE g IN (SELECT g FROM fbg)
), flags AS (
    SELECT r.source, r.doc_id, r.toks,
           (r.rtext != r.text) AS pii_hit,
           length(r.text) - length(r.rtext) AS pii_delta,
           row_number() OVER (
               PARTITION BY md5(r.rtext) ORDER BY r.doc_id) AS rn,
           lmsc.pos_micro, lmcut.cutoff,
           coalesce(qbest.predicted = 'good', FALSE) AS qc_ok,
           (c.doc_id IS NOT NULL) AS contam
    FROM raw r
    LEFT JOIN lmsc ON lmsc.doc_id = r.orig_id
    LEFT JOIN lmcut ON lmcut.lang = r.lang
    LEFT JOIN qbest ON qbest.doc_id = r.orig_id
    LEFT JOIN fcontam c ON c.doc_id = r.doc_id
), staged AS (
    SELECT source, doc_id, toks, pii_hit, pii_delta,
           (len(toks) >= 5) AS f_c,
           (len(toks) >= 5 AND rn = 1) AS f_u,
           (len(toks) >= 5 AND rn = 1
            AND len(list_distinct(toks)) * 1000000 // len(toks)
                >= 300000) AS f_q,
           (len(toks) >= 5 AND rn = 1
            AND len(list_distinct(toks)) * 1000000 // len(toks)
                >= 300000
            AND pos_micro IS NOT NULL AND pos_micro <= cutoff) AS f_l,
           (len(toks) >= 5 AND rn = 1
            AND len(list_distinct(toks)) * 1000000 // len(toks)
                >= 300000
            AND pos_micro IS NOT NULL AND pos_micro <= cutoff
            AND qc_ok) AS f_k,
           (len(toks) >= 5 AND rn = 1
            AND len(list_distinct(toks)) * 1000000 // len(toks)
                >= 300000
            AND pos_micro IS NOT NULL AND pos_micro <= cutoff
            AND qc_ok AND NOT contam) AS f_d
    FROM flags
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(CASE WHEN pii_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pii,
       CAST(coalesce(sum(CASE WHEN pii_hit THEN pii_delta END), 0)
            AS BIGINT) AS pii_chars_delta,
       CAST(sum(CASE WHEN f_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(sum(CASE WHEN f_u THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(sum(CASE WHEN f_q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       CAST(sum(CASE WHEN f_l THEN 1 ELSE 0 END) AS BIGINT) AS n_lm,
       CAST(sum(CASE WHEN f_k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_classified,
       CAST(sum(CASE WHEN f_d THEN 1 ELSE 0 END) AS BIGINT)
           AS n_decontam,
       CAST(coalesce(sum(CASE WHEN f_d THEN len(toks) END), 0) AS BIGINT)
           AS n_tokens_kept,
       CAST(ceil(coalesce(sum(CASE WHEN f_d THEN len(toks) END), 0)
                 / 2048.0) AS BIGINT) AS n_sequences,
       CAST(coalesce(sum(CASE WHEN f_d THEN doc_id END), 0) AS BIGINT)
           AS sum_kept_doc_id
FROM staged GROUP BY source ORDER BY source
"""


@register(
    "curation_pipeline_census",
    ids="curation: END-TO-END pipeline funnel v3 — PII redaction → "
    "clean → exact dedup → lexical-diversity gate → LM-score gate → "
    "quality-classifier gate → benchmark decontamination gate → "
    "sequence-budget accounting, per-source survivor counts in ONE "
    "composed plan",
    oracle=_curation_funnel_oracle(),
)
def curation_pipeline_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END curation funnel v3 — the composed DAG a training-data
    pipeline actually ships, in ONE Spark plan, now including the two
    GOVERNANCE stages (r14 verdict gap #3: v2 composed the model
    stages but a shipping curator also redacts PII and decontaminates
    against its benchmark suite in the same pass; the standalone
    queries — ``corpus_clean``, ``dedup_exact``,
    ``quality_filter_funnel``, ``ccnet_perplexity_buckets``,
    ``quality_classifier_census``, ``pii_redact``,
    ``span_decontaminate``, ``sequence_packing`` — exist on their own;
    this is the composition, with per-source attrition at every
    stage):

    Two seeded cohorts keep every stage non-degenerate by
    construction: the ``mirror`` re-ingest cohort (every 7th doc
    re-keyed through the fail-loud ``_seed_id`` guard — the dedup
    stage visibly attrites) and a PII cohort (every 11th doc arrives
    with an appended email + IPv4 + URL, the ``pii_scan``/
    ``pii_redact`` fixture — the redaction stage visibly rewrites;
    decoupled residues so PII-carrying mirrors and clean mirrors both
    occur).  Organic duplicates / PII / benchmark overlap count the
    same way.

    0. PII REDACTION (rewrite, not a drop): emails/IPv4s/URLs →
       typed placeholders via the SHARED ``pii_redact_col`` chain —
       the text every later stage sees is the redacted text, the
       production order (redact before anything is retained).
       Censused as ``n_pii`` rewritten docs and ``pii_chars_delta``.
    1. CLEAN: drop docs under 5 tokens (the min-length gate).
    2. EXACT DEDUP: md5-content groups keep the min-id copy (digest
       of the REDACTED text — two docs differing only in PII literals
       collapse, which is what a redacting pipeline deduplicates).
    3. QUALITY: lexical-diversity gate — distinct-token ratio >= 0.30
       (micro-unit integer arithmetic, the Gopher-style repetition
       proxy).
    4. LM SCORE (CCNet stage): per-doc positive-micro LM cost
       ``(-lp_micro) div n_bigrams`` from the SHARED bigram scorer
       (``pipeline.bigram_doc_scores`` — the exact model
       ``ccnet_perplexity_buckets`` buckets with); keep docs at or
       under their language's mean cost (the deterministic
       sample-fit-cutoff stand-in for CCNet's tercile — a corpus-grain
       ntile would need a per-language window, which this plan
       forbids).  All-positive integer arithmetic: Spark ``div``
       truncates toward zero and DuckDB ``//`` floors, which only
       agree on non-negative operands — lp_micro ≤ 0 by construction,
       so the negation keeps both engines exact.
    5. CLASSIFIER (fastText stage): keep docs the shared NB-weighted
       linear classifier (``_qc_best`` — the exact model
       ``quality_classifier_census`` censuses) predicts 'good'.
    6. DECONTAMINATION (benchmark gate): drop docs sharing ANY 8-gram
       with the benchmark suite (every 13th doc — which flows through
       the funnel itself, so retained eval docs are dropped HERE, the
       production point of the stage; ``span_decontaminate`` locates
       the extents for mask-don't-drop pipelines).  The benchmark
       gram set is tiny and broadcasts; the corpus window explode
       streams through a map-side semi-join exactly as the standalone
       documents, and only (doc_id) hit rows come back.
    7. SEQUENCE BUDGET: surviving tokens per source divided into
       2048-token training sequences (the number a packer would emit;
       ``sequence_packing`` pins the actual bin assignment).

    Mirror docs carry their ORIGINAL's model verdicts (scored once,
    joined on ``orig_id``): a re-ingested copy has identical text, so
    re-scoring it would compute the same number twice — and the
    classifier/scorer fixtures key off the original doc_id.  (The
    model fixtures score the canonical per-doc content, the feature-
    store shape; the contamination verdict is computed on the
    funnel's own redacted text per funnel row — mirrors are
    text-identical, so both arrive at the same verdict.)

    Readout per source: redaction rewrite counts, survivors at each
    of 6 gate stages, kept-token total, sequence count, and a kept-id
    checksum — the funnel numbers a pipeline dashboard shows per
    ingest source.

    Scale shape: the funnel lineage is still ONE corpus scan with ONE
    digest-keyed exchange (the min-id dedup window over the 16-byte
    content hash); redaction is a codegen projection in the lineage
    (no extra scan, no shuffle carries text it didn't already); the
    two model stages add their standalones' published costs plus
    doc-keyed verdict joins and one broadcast of the per-language
    cutoff table; decontamination adds the broadcast-semi-join gram
    probe (hits-only exchange, no corpus shuffle) joined back on
    doc_id.  No re-derived text stages joined back on doc_id, no
    packing window here (that's ``sequence_packing``'s job)."""
    from big_data_lab_three_spark.functions.text import shingles
    from big_data_lab_three_spark.queries.dedup import _seed_id
    from big_data_lab_three_spark.queries.pipeline import (
        bigram_doc_scores,
    )
    from big_data_lab_three_spark.queries.text import pii_redact_col

    # NOT persisted (r16 measured): the two consumers below (lmsc,
    # lmcut) share the scorer's exchanges via Catalyst's ReuseExchange
    # — an explicit persist changed neither jobs nor wall (A/B 1.02).
    sc = bigram_doc_scores(spark, sf_dir)
    lmsc = sc.select(
        F.col("doc_id").alias("orig_id"),
        F.expr("(- lp_micro) div n_bigrams").alias("pos_micro"),
    )
    lmcut = sc.groupBy("lang").agg(
        F.expr(
            "sum((- lp_micro) div n_bigrams) div count(1)"
        ).alias("cutoff")
    )
    qb = _qc_best(spark, sf_dir).select(
        F.col("doc_id").alias("orig_id"), "predicted"
    )

    d0 = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    d = d0.select(
        "doc_id",
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id"),
                F.lit("@example.com at 10.0."), F.col("doc_id") % 250,
                F.lit(".1 see https://ex.com/d/"), F.col("doc_id"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    base = d.select(
        "doc_id", F.col("doc_id").alias("orig_id"), "lang", "source", "text"
    ).unionByName(
        d.where(F.col("doc_id") % 7 == 0).select(
            _seed_id(F.col("doc_id"), k=5).alias("doc_id"),
            F.col("doc_id").alias("orig_id"),
            "lang",
            F.lit("mirror").alias("source"),
            "text",
        )
    )
    raw = base.withColumn("rtext", pii_redact_col(F.col("text"))).select(
        "doc_id",
        "orig_id",
        "lang",
        "source",
        "text",
        "rtext",
        tokens(F.col("rtext")).alias("toks"),
    )
    # Benchmark gram set (tiny, broadcasts) + the funnel rows' own
    # contamination verdict — computed on the redacted text the
    # funnel retains, hits-only exchange.
    bg = (
        d0.where(F.col("doc_id") % 13 == 0)
        .select(
            F.explode(
                F.array_distinct(shingles(tokens(F.col("text")), 8))
            ).alias("g")
        )
        .distinct()
    )
    contam = (
        raw.where(F.size("toks") >= 8)
        .select("doc_id", F.explode(shingles(F.col("toks"), 8)).alias("g"))
        .join(F.broadcast(bg), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_contam", F.lit(True))
    )
    from pyspark.sql import Window

    # Single-lineage flag columns (one funnel scan, ONE digest-keyed
    # window exchange — the text-pure stages are never re-derived and
    # joined back): clean and the diversity gate are pure functions of
    # the text, so every member of a content group shares them and
    # "min-id clean copy" IS rn == 1 within the digest partition.  The
    # diversity ratio multiplies in BIGINT — size() returns INT and
    # INT·1e6 wraps past ~2147 distinct tokens (review finding r13).
    # The model verdicts join ON THE KEY (orig_id / lang): per-doc
    # corpus-sized frames shuffle on doc id, the per-language cutoff
    # broadcasts.
    w = Window.partitionBy(F.md5("rtext")).orderBy("doc_id")
    scored = (
        raw.join(lmsc, "orig_id", "left")
        .join(F.broadcast(lmcut), "lang", "left")
        .join(qb, "orig_id", "left")
        .join(contam, "doc_id", "left")
        .withColumn("_pii", F.col("rtext") != F.col("text"))
        .withColumn("_c", F.size("toks") >= 5)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("_u", F.col("_c") & (F.col("rn") == 1))
        .withColumn(
            "_q",
            F.col("_u")
            & (
                F.expr(
                    "div(CAST(size(array_distinct(toks)) AS BIGINT)"
                    " * 1000000, CAST(size(toks) AS BIGINT))"
                )
                >= 300000
            ),
        )
        .withColumn(
            "_l",
            F.col("_q")
            & F.col("pos_micro").isNotNull()
            & (F.col("pos_micro") <= F.col("cutoff")),
        )
        .withColumn(
            "_k",
            F.col("_l")
            & F.coalesce(
                F.col("predicted") == F.lit("good"), F.lit(False)
            ),
        )
        .withColumn(
            "_d",
            F.col("_k") & ~F.coalesce(F.col("_contam"), F.lit(False)),
        )
    )
    kept_toks = F.when(F.col("_d"), F.size("toks").cast("long"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.col("_pii").cast("long")).alias("n_pii"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_pii"),
                        (
                            F.length("text") - F.length("rtext")
                        ).cast("long"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("pii_chars_delta"),
            F.sum(F.col("_c").cast("long")).alias("n_clean"),
            F.sum(F.col("_u").cast("long")).alias("n_unique"),
            F.sum(F.col("_q").cast("long")).alias("n_quality"),
            F.sum(F.col("_l").cast("long")).alias("n_lm"),
            F.sum(F.col("_k").cast("long")).alias("n_classified"),
            F.sum(F.col("_d").cast("long")).alias("n_decontam"),
            F.coalesce(F.sum(kept_toks), F.lit(0))
            .cast("long")
            .alias("n_tokens_kept"),
            F.ceil(
                F.coalesce(F.sum(kept_toks), F.lit(0)) / F.lit(2048.0)
            )
            .cast("long")
            .alias("n_sequences"),
            F.coalesce(
                F.sum(F.when(F.col("_d"), F.col("doc_id"))), F.lit(0)
            )
            .cast("long")
            .alias("sum_kept_doc_id"),
        )
        .orderBy("source")
    )


def _bpe_oracle_apply_rounds(k: int = _BPE_K) -> str:
    """Chained-CTE APPLY of an already-trained merge table to a
    held-out span table ``h0``: round r replays training round r's
    argmax pair ``t{r}`` (from ``_bpe_oracle_rounds`` — NOT re-derived
    from the held-out text; the tokenizer is FROZEN) with the same
    run-parity greedy non-overlap selection, emitting ``h{r}``.  The
    OOV production path: a held-out token the training fold never saw
    still flows through every merge left-to-right, exactly like
    ``bpe_merge_expr``'s per-token fold on the Spark side."""
    parts = []
    for r in range(1, k + 1):
        prev = f"h{r - 1}"
        parts.append(
            f""", hadj{r} AS MATERIALIZED (
    SELECT w, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS seq
    FROM {prev}
), hk{r} AS (
    SELECT w, pos FROM (
        SELECT w, pos,
               row_number() OVER (PARTITION BY w, grp ORDER BY pos) AS rn
        FROM (SELECT x.w, x.pos,
                     x.seq - row_number() OVER (
                         PARTITION BY x.w ORDER BY x.seq) AS grp
              FROM hadj{r} x, t{r}
              WHERE x.sym = t{r}.a AND x.nxt = t{r}.b))
    WHERE rn % 2 = 1
), h{r} AS MATERIALIZED (
    SELECT w, pos, sym FROM (
        SELECT s.w, s.pos,
               CASE WHEN k.pos IS NOT NULL
                    THEN s.sym || lead(s.sym) OVER (
                        PARTITION BY s.w ORDER BY s.pos)
                    ELSE s.sym END AS sym,
               lag(k.pos IS NOT NULL) OVER (
                   PARTITION BY s.w ORDER BY s.pos) AS pt
        FROM {prev} s LEFT JOIN hk{r} k ON k.w = s.w AND k.pos = s.pos)
    WHERE pt IS DISTINCT FROM TRUE
)"""
        )
    return "".join(parts)


_BFO_ORACLE = (
    """WITH docs_f AS MATERIALIZED (
    SELECT doc_id, lang, text,
           CAST(('0x' || substr(md5('bfo:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), train_docs AS MATERIALIZED (
    SELECT doc_id, lang, text FROM docs_f WHERE fold != 0
), """
    + _bpe_oracle_rounds(src="train_docs")[len("WITH "):]
)


@register(
    "bpe_frozen_oov_apply_census",
    ids="tokenizer: FROZEN-vocabulary BPE apply with a real OOV path — "
    "train on the md5-80% fold, segment the held-out 20% (memoized "
    "in-vocab join + per-token merge fold for OOV), per-language OOV "
    "rate / fertility / unseen-char census",
    oracle=_BFO_ORACLE
    + f"""
, heldsrc AS (
    SELECT lang,
           CASE WHEN doc_id % 4 = 2
                THEN text || ' ' || repeat('qv', 1 + doc_id % 3)
                     || ' x' || repeat('z', 1 + doc_id % 2)
                ELSE text END AS text
    FROM docs_f WHERE fold = 0
), held AS MATERIALIZED (
    SELECT lang, {_DUCK_TOKS} AS toks FROM heldsrc
), hw AS MATERIALIZED (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT lang, unnest(toks) AS tok FROM held)
    GROUP BY lang, tok
), h0 AS MATERIALIZED (
    SELECT tok AS w,
           unnest([{{'pos': i, 'sym': tok[i]}}
                   for i in range(1, length(tok) + 1)],
                  recursive := true)
    FROM (SELECT DISTINCT tok FROM hw)
)"""
    + _bpe_oracle_apply_rounds()
    + f"""
, hp AS MATERIALIZED (
    SELECT w AS tok, CAST(count(*) AS BIGINT) AS np
    FROM h{_BPE_K} GROUP BY w
), inv AS MATERIALIZED (
    SELECT DISTINCT sym FROM s0
), unseen AS MATERIALIZED (
    SELECT DISTINCT h0.w AS tok
    FROM h0 LEFT JOIN inv ON h0.sym = inv.sym
    WHERE inv.sym IS NULL
), flat AS (
    SELECT hw.lang, hw.cnt, hp.np,
           (words.tok IS NULL) AS is_oov,
           (unseen.tok IS NOT NULL) AS has_unseen
    FROM hw
    JOIN hp ON hw.tok = hp.tok
    LEFT JOIN words ON hw.tok = words.tok
    LEFT JOIN unseen ON hw.tok = unseen.tok
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN is_oov THEN cnt ELSE 0 END) AS BIGINT)
           AS n_oov_tokens,
       CAST(sum(CASE WHEN is_oov THEN cnt ELSE 0 END) * 1000000
            // sum(cnt) AS BIGINT) AS oov_rate_micro,
       CAST(sum(CASE WHEN NOT is_oov THEN cnt * np ELSE 0 END) AS BIGINT)
           AS pieces_invocab,
       CAST(sum(CASE WHEN is_oov THEN cnt * np ELSE 0 END) AS BIGINT)
           AS pieces_oov,
       CASE WHEN sum(CASE WHEN NOT is_oov THEN cnt ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN NOT is_oov THEN cnt * np ELSE 0 END)
                      * 1000000
                      // sum(CASE WHEN NOT is_oov THEN cnt ELSE 0 END)
                      AS BIGINT)
            END AS fertility_invocab_micro,
       CASE WHEN sum(CASE WHEN is_oov THEN cnt ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN is_oov THEN cnt * np ELSE 0 END)
                      * 1000000
                      // sum(CASE WHEN is_oov THEN cnt ELSE 0 END)
                      AS BIGINT)
            END AS fertility_oov_micro,
       CAST(sum(CASE WHEN has_unseen THEN cnt ELSE 0 END) AS BIGINT)
           AS n_unseen_char_tokens
FROM flat GROUP BY lang ORDER BY lang
""",
)
def bpe_frozen_oov_apply_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FROZEN-vocabulary BPE apply — the production shape the memoized
    ``bpe_corpus_apply_census`` legitimately sidesteps (its vocabulary
    comes from the same scan, so every token hits the map by
    construction; r13 verdict gap #1): train the 10-merge tokenizer on
    the md5-derived 80% fold ONLY, freeze it, and segment the held-out
    20% where a real fraction of tokens is OUT-OF-VOCABULARY.  Because
    the synthetic corpus's templated vocabulary is fully covered by
    any 80% fold, a deterministic OOV arm is planted on a quarter of
    held-out docs (same fixture convention as the dedup/TTL cohorts —
    both engines render it from the same expressions): 'qv'-repeat
    tokens spelled in training-inventory characters exercise the pure
    merge-fold path, 'xz'-repeat tokens ('x'/'z' are outside the
    corpus alphabet) exercise the unseen-character fallback; organic
    OOV counts identically when the data has it.

    Two segmentation paths, both exercised at corpus grain:

    - IN-VOCAB: the held-out (lang, tok, cnt) stream joins the frozen
      memoized (tok → n_pieces) map — the fast path a production
      tokenizer serves from its cache.
    - OOV: tokens the join misses take the REAL fold path — the 10
      frozen merges applied left-to-right via ``bpe_merge_expr`` over
      the character segmentation, exactly Sennrich apply.  A character
      the training fold never saw simply survives as a singleton
      symbol (the char-level analogue of byte fallback) and is counted
      in ``n_unseen_char_tokens``.

    The oracle replays training on the train fold (chained CTEs),
    then replays the FROZEN merge ranks over the held-out span table
    (``_bpe_oracle_apply_rounds`` — t{{r}} is read, never re-derived)
    and computes every census column from that single ground-truth
    segmentation — so the hash ALSO proves the memoized join and the
    fold path agree on in-vocab tokens (the memoization-validity
    property, now oracle-checked rather than asserted).

    Census per language: held-out token count, OOV count + micro rate,
    pieces via each path, fertility (pieces per token, micro) split by
    path — the delta is the production cost of OOV — and the
    unseen-character token count.  All integers; NULL fertility when a
    side is empty (guarded identically in both engines).

    Scale shape: one train-fold token scan (the training chain's),
    one held-out token scan collapsed to (lang, tok, cnt) — both scan
    predicates on the same table — then everything is
    vocabulary-bounded: the frozen map join (planner broadcasts the
    localCheckpoint'ed known-size map at driver tiers, shuffled hash
    join if a 100 TB vocabulary outgrows the threshold), the 10-deep
    merge fold over DISTINCT OOV tokens only, and the bounded
    char-inventory anti-join.  No corpus window, no pair stage."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        md5_mod("bfo:", F.col("doc_id"), 5).alias("fold"),
    )
    tr = d.where(F.col("fold") != 0)
    # Seeded OOV arm (registry fixture convention — the synthetic
    # corpus's templated vocabulary is fully covered by the 80% fold,
    # so without a plant the OOV path would be vacuously green at
    # every tier): a quarter of held-out docs gain 'qv'-repeat tokens
    # (OOV spelled entirely in training-inventory characters — the
    # pure merge-fold path) and 'xz'-repeat tokens ('x'/'z' never
    # appear in the corpus alphabet — the unseen-character fallback).
    # Organic OOV, when the data has it, counts identically.
    te = d.where(F.col("fold") == 0).select(
        "lang",
        F.when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.expr("repeat('qv', CAST(1 + doc_id % 3 AS INT))"),
                F.lit(" x"),
                F.expr("repeat('z', CAST(1 + doc_id % 2 AS INT))"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    merges, vocab = _bpe_merge_loop(spark, sf_dir, docs=tr)
    pieces = vocab.select("tok", F.size("syms").alias("np"))
    chars = F.expr("filter(split(tok, ''), x -> x != '')")
    inv = (
        vocab.select(F.explode(chars).alias("sym"))
        .distinct()
        .localCheckpoint()
    )
    hw = (
        te.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    j = hw.join(pieces, "tok", "left")
    oov_toks = (
        j.where(F.col("np").isNull()).select("tok").distinct()
    )
    fold_expr = chars
    for _rank, a, b, _m, _c in merges:
        fold_expr = bpe_merge_expr(fold_expr, a, b)
    oov_pieces = oov_toks.select(
        "tok", F.size(fold_expr).alias("np_oov")
    ).localCheckpoint()
    oov_unseen = (
        oov_toks.select("tok", F.explode(chars).alias("sym"))
        .join(inv, "sym", "left_anti")
        .select("tok")
        .distinct()
        .withColumn("has_unseen", F.lit(True))
        .localCheckpoint()
    )
    flat = (
        j.join(oov_pieces, "tok", "left")
        .join(oov_unseen, "tok", "left")
        .select(
            "lang",
            "cnt",
            F.col("np").isNull().alias("is_oov"),
            F.coalesce("np", "np_oov").cast("long").alias("npc"),
            F.coalesce("has_unseen", F.lit(False)).alias("unseen"),
        )
    )
    zero = F.lit(0).cast("long")
    agg = flat.groupBy("lang").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("is_oov"), F.col("cnt")).otherwise(zero))
        .alias("n_oov_tokens"),
        F.sum(
            F.when(~F.col("is_oov"), F.col("cnt") * F.col("npc"))
            .otherwise(zero)
        ).alias("pieces_invocab"),
        F.sum(
            F.when(F.col("is_oov"), F.col("cnt") * F.col("npc"))
            .otherwise(zero)
        ).alias("pieces_oov"),
        F.sum(F.when(F.col("unseen"), F.col("cnt")).otherwise(zero))
        .alias("n_unseen_char_tokens"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_oov_tokens",
        F.expr("n_oov_tokens * 1000000 div n_tokens").alias(
            "oov_rate_micro"
        ),
        "pieces_invocab",
        "pieces_oov",
        F.when(
            F.col("n_tokens") - F.col("n_oov_tokens") > 0,
            F.expr(
                "pieces_invocab * 1000000"
                " div (n_tokens - n_oov_tokens)"
            ),
        ).alias("fertility_invocab_micro"),
        F.when(
            F.col("n_oov_tokens") > 0,
            F.expr("pieces_oov * 1000000 div n_oov_tokens"),
        ).alias("fertility_oov_micro"),
        "n_unseen_char_tokens",
    ).orderBy("lang")


_BPE_K50 = 50

_BPE_K50_MERGES_SELECT = _bpe_merges_select(_BPE_K50)


@register(
    "bpe_train_merges_k50",
    ids="tokenizer: BPE training at production merge depth — K=50 greedy "
    "merges, exact merge table, per-round cost flat (vocabulary-bounded "
    "loop state)",
    oracle=_bpe_oracle_rounds(_BPE_K50)
    + f"""
{_BPE_K50_MERGES_SELECT}
ORDER BY merge_rank
""",
)
def bpe_train_merges_k50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training at PRODUCTION merge depth (r13 verdict item 6) —
    the same loop as ``bpe_train_merges`` continued to K=50, emitting
    the full 50-rank merge table.  The point being proven is the cost
    model, not new mechanics: every round is vocabulary-bounded (pair
    explode + combiner groupBy + 1-row driver argmax + fold-merge
    projection over localCheckpoint'ed bounded state), so per-round
    wall-time stays FLAT as the rank grows — measured ~0.5s/round on
    an idle local[32] at sf0.01 with no upward trend from rank 1 to 50
    (EXPERIMENTS.md r14) — and the corpus scan still runs exactly
    once.  At a real 100 TB tier the scan dominates and rounds 2..K
    cost the same as round 1: the property that makes 32k-merge
    production vocabularies a driver-loop, not a corpus-loop.

    The oracle replays all 50 rounds as chained CTEs (the
    ``_bpe_oracle_rounds`` machinery at k=50 — full replay, stronger
    than witness-checking the tail rounds; ~6-20s in DuckDB since the
    span tables are vocabulary-bounded too).  If the corpus exhausts
    mergeable pairs before rank 50 both engines emit only the realized
    ranks (the Spark loop breaks on an empty argmax; the oracle's
    empty t{{r}} contributes no UNION arm rows)."""
    merges, _ = _bpe_merge_loop(spark, sf_dir, k=_BPE_K50)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_cnt long",
    ).orderBy("merge_rank")


# Fallback separator: one sentinel piece in the best path drags the
# packed optimum to ~16·(−1e15); a fully-scored path bottoms out near
# 16·8·|min score| ≈ −3e9.  Any threshold between separates exactly.
_ULM_FALLBACK_FLOOR = -(10**12)

_UFO_ORACLE = (
    """WITH RECURSIVE docs_f AS MATERIALIZED (
    SELECT doc_id, lang, text,
           CAST(('0x' || substr(md5('ufo:' || CAST(doc_id AS VARCHAR)),
                                1, 15)) AS BIGINT) % 5 AS fold
    FROM documents
), train_docs AS MATERIALIZED (
    SELECT doc_id, lang, text FROM docs_f WHERE fold != 0
), """
    + _ulm_base_sql("train_docs")[len("WITH RECURSIVE ") :]
)


@register(
    "unigram_frozen_oov_apply_census",
    ids="tokenizer: FROZEN unigram-LM apply with real OOV + char "
    "fallback — train (EM round + prune) on the md5-80% fold, Viterbi-"
    "segment the held-out 20% under the frozen scores (memoized "
    "in-vocab join + fresh DP for OOV, sentinel-detected fallback), "
    "per-language census",
    oracle=_UFO_ORACLE
    + _ULM_TB_SQL
    + _ULM_S2_SQL
    + f""", heldsrc AS (
    SELECT lang,
           CASE WHEN doc_id % 4 = 2
                THEN text || ' ' || repeat('qv', 1 + doc_id % 3)
                     || ' x' || repeat('z', 1 + doc_id % 2)
                ELSE text END AS text
    FROM docs_f WHERE fold = 0
), held AS MATERIALIZED (
    SELECT lang, {_DUCK_TOKS} AS toks FROM heldsrc
), hw AS MATERIALIZED (
    SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT lang, unnest(toks) AS tok FROM held)
    GROUP BY lang, tok
), hwords AS MATERIALIZED (
    SELECT tok AS w, CAST(1 AS BIGINT) AS cnt
    FROM (SELECT DISTINCT tok FROM hw)
), hpc AS MATERIALIZED (
    SELECT * FROM {_ulm_duck_pieces("hwords")}
)"""
    + _ulm_dp2_sql(src_pc="hpc", score="s2", out="hdp")
    + f""", hseg AS (
    SELECT w AS tok,
           CASE WHEN bfin > {_ULM_FALLBACK_FLOOR}
                THEN (- bfin) % 16 END AS np_seg
    FROM hdp
), htab AS (
    SELECT hw.lang, hw.cnt,
           (words.w IS NULL) AS is_oov,
           (hseg.np_seg IS NULL) AS is_fallback,
           CAST(coalesce(hseg.np_seg, length(hw.tok)) AS BIGINT) AS np
    FROM hw
    LEFT JOIN words ON words.w = hw.tok
    LEFT JOIN hseg ON hseg.tok = hw.tok
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN is_oov THEN cnt ELSE 0 END) AS BIGINT)
           AS n_oov_tokens,
       CAST(sum(CASE WHEN is_oov THEN cnt ELSE 0 END) * 1000000
            // sum(cnt) AS BIGINT) AS oov_rate_micro,
       CAST(sum(CASE WHEN is_fallback THEN cnt ELSE 0 END) AS BIGINT)
           AS n_fallback_tokens,
       CAST(sum(CASE WHEN NOT is_oov THEN cnt * np ELSE 0 END) AS BIGINT)
           AS pieces_invocab,
       CAST(sum(CASE WHEN is_oov THEN cnt * np ELSE 0 END) AS BIGINT)
           AS pieces_oov,
       CASE WHEN sum(CASE WHEN NOT is_oov THEN cnt ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN NOT is_oov THEN cnt * np ELSE 0 END)
                      * 1000000
                      // sum(CASE WHEN NOT is_oov THEN cnt ELSE 0 END)
                      AS BIGINT)
            END AS fertility_invocab_micro,
       CASE WHEN sum(CASE WHEN is_oov THEN cnt ELSE 0 END) > 0
            THEN CAST(sum(CASE WHEN is_oov THEN cnt * np ELSE 0 END)
                      * 1000000
                      // sum(CASE WHEN is_oov THEN cnt ELSE 0 END)
                      AS BIGINT)
            END AS fertility_oov_micro
FROM htab GROUP BY lang ORDER BY lang
""",
)
def unigram_frozen_oov_apply_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FROZEN unigram-LM apply — the SentencePiece sibling of
    ``bpe_frozen_oov_apply_census`` (r13 verdict gap #1 covered both
    tokenizer families): train the full chain (frequency-initialized
    Viterbi, EM count step, prune + re-score) on the md5-derived 80%
    fold ONLY, freeze the pruned piece-score table, and segment the
    held-out 20% where a real fraction of tokens is out-of-vocabulary.

    Three segmentation paths, all exercised at corpus grain:

    - IN-VOCAB: the held-out (lang, tok, cnt) stream joins the frozen
      memoized (word → n_pieces) map from the round-2 DP — the
      production cache hit.
    - OOV, SEGMENTABLE: tokens the map misses run a FRESH Viterbi DP
      under the frozen scores (``_ulm_dp_from_scores`` over the OOV
      remainder's piece grid — vocabulary-bounded, never per corpus
      token).  An unseen WORD spelled in seen pieces segments normally
      (the single-character floor guarantees a path whenever every
      character was seen in training — SentencePiece's char coverage).
    - FALLBACK: a token containing a character the training fold never
      saw has NO fully-scored path — every segmentation crosses a
      sentinel slot, detected exactly by ``bfin <`` the fallback floor
      (one sentinel costs ~16e15, a real path bottoms near −3e9) — and
      is counted as length(w) UNK-per-char pieces, SentencePiece's
      byte-fallback shape.

    The oracle replays training on the train fold and runs the SAME
    DP machinery (``_ulm_dp2_sql`` parametrized to the held-out piece
    grid) over ALL distinct held-out tokens — so the value hash also
    proves the memoized map and the fresh DP agree on in-vocab tokens,
    the memoization-validity property, oracle-checked like the BPE
    sibling.  The same deterministic OOV arm is planted ('qv'-repeats:
    OOV over seen chars = segmentable path; 'xz'-repeats: unseen chars
    = fallback path); organic OOV counts identically.

    Scale shape: the training chain's one corpus scan + vocabulary-
    bounded rounds; one held-out token scan collapsed to (lang, tok,
    cnt); the frozen map join and the OOV-remainder DP are both
    vocabulary-bounded; one per-language census.  No corpus window,
    no pair stage."""
    from big_data_lab_three_spark.functions.numeric import md5_mod

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        md5_mod("ufo:", F.col("doc_id"), 5).alias("fold"),
    )
    tr = d.where(F.col("fold") != 0)
    te = d.where(F.col("fold") == 0).select(
        "lang",
        F.when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.expr("repeat('qv', CAST(1 + doc_id % 3 AS INT))"),
                F.lit(" x"),
                F.expr("repeat('z', CAST(1 + doc_id % 2 AS INT))"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    toks_tr, pc_tr, dp1 = _ulm_dp_frame(spark, sf_dir, docs=tr)
    tb = _ulm_traceback_pieces(dp1)
    m = (
        tb.select("cnt", F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.sum("cnt").alias("used_cnt"))
        .localCheckpoint()
    )
    allp, chars = _ulm_inventory(pc_tr)
    s2 = _ulm_rescore(m, allp, chars)
    dp2 = _ulm_dp_from_scores(pc_tr, s2)
    pieces = dp2.select(
        F.col("w").alias("tok"),
        F.expr("(- bfin) % 16").alias("np_map"),
    )

    hw = (
        te.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    vocab_flag = toks_tr.select(
        F.col("w").alias("tok"), F.lit(True).alias("in_vocab")
    )
    j = hw.join(pieces, "tok", "left").join(vocab_flag, "tok", "left")
    # OOV remainder: fresh Viterbi under the FROZEN scores — the real
    # production apply for unseen words; vocabulary-bounded.
    oov_words = (
        j.where(F.col("np_map").isNull())
        .select(F.col("tok").alias("w"))
        .distinct()
        .withColumn("cnt", F.lit(1).cast("long"))
    )
    hdp = _ulm_dp_from_scores(_ulm_piece_occurrences(oov_words), s2)
    oov_seg = hdp.select(
        F.col("w").alias("tok"),
        F.when(
            F.col("bfin") > F.lit(_ULM_FALLBACK_FLOOR),
            F.expr("(- bfin) % 16"),
        ).alias("np_oov"),
    )
    flat = (
        j.join(oov_seg, "tok", "left")
        .select(
            "lang",
            "cnt",
            F.col("in_vocab").isNull().alias("is_oov"),
            F.coalesce("np_map", "np_oov")
            .isNull()
            .alias("is_fallback"),
            F.coalesce(
                "np_map", "np_oov", F.length("tok").cast("long")
            )
            .cast("long")
            .alias("np"),
        )
    )
    zero = F.lit(0).cast("long")
    agg = flat.groupBy("lang").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("is_oov"), F.col("cnt")).otherwise(zero))
        .alias("n_oov_tokens"),
        F.sum(
            F.when(F.col("is_fallback"), F.col("cnt")).otherwise(zero)
        ).alias("n_fallback_tokens"),
        F.sum(
            F.when(~F.col("is_oov"), F.col("cnt") * F.col("np"))
            .otherwise(zero)
        ).alias("pieces_invocab"),
        F.sum(
            F.when(F.col("is_oov"), F.col("cnt") * F.col("np"))
            .otherwise(zero)
        ).alias("pieces_oov"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_oov_tokens",
        F.expr("n_oov_tokens * 1000000 div n_tokens").alias(
            "oov_rate_micro"
        ),
        "n_fallback_tokens",
        "pieces_invocab",
        "pieces_oov",
        F.when(
            F.col("n_tokens") - F.col("n_oov_tokens") > 0,
            F.expr(
                "pieces_invocab * 1000000"
                " div (n_tokens - n_oov_tokens)"
            ),
        ).alias("fertility_invocab_micro"),
        F.when(
            F.col("n_oov_tokens") > 0,
            F.expr("pieces_oov * 1000000 div n_oov_tokens"),
        ).alias("fertility_oov_micro"),
    ).orderBy("lang")


# Shared CTE core of the semantic-decontamination pair (census +
# per-doc ship list): fixture, folds, planted cohorts, both channels.
_SDC_CORE = f"""
WITH j AS (
  SELECT d.doc_id AS id, d.text, CAST(e.embedding AS DOUBLE[]) AS v
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.doc_id % 2 = 0
), reps AS (
  SELECT min(id) AS id, min(text) AS text, v
  FROM j GROUP BY md5(text), v
), folded AS (
  SELECT id, text, v,
         CAST(('0x' || substr(md5('sd:' || CAST(id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 10 < 8 AS is_train
  FROM reps
), train AS MATERIALIZED (
  SELECT id, text, v FROM folded WHERE is_train
), eval_side AS MATERIALIZED (
  SELECT id, text, v FROM folded WHERE NOT is_train
  UNION ALL
  SELECT id + 1000000, text, v FROM train WHERE id % 5 = 0
  UNION ALL
  SELECT id + 2000000,
         'paraphrase ' || CAST(id AS VARCHAR),
         list_transform(v, x -> x * 1.01)
  FROM train WHERE id % 5 = 0
), sem AS (
  SELECT DISTINCT e.id
  FROM eval_side e JOIN train t
    ON list_cosine_similarity(e.v, t.v) >= 0.99
), tg AS (
  SELECT DISTINCT gram FROM (
    SELECT unnest([array_to_string(toks[i:i+7], ' ')
                   for i in range(1, len(toks) - 6)]) AS gram
    FROM (SELECT {_DUCK_TOKS} AS toks FROM train)
    WHERE len(toks) >= 8)
), eg AS (
  SELECT id, unnest([array_to_string(toks[i:i+7], ' ')
                     for i in range(1, len(toks) - 6)]) AS gram
  FROM (SELECT id, {_DUCK_TOKS} AS toks FROM eval_side)
  WHERE len(toks) >= 8
), lex AS (
  SELECT DISTINCT eg.id FROM eg JOIN tg USING (gram)
)
"""

_SDC_ORACLE = _SDC_CORE + """, flags AS (
  SELECT e.id,
         (sem.id IS NOT NULL) AS sem_hit,
         (lex.id IS NOT NULL) AS lex_hit
  FROM eval_side e
  LEFT JOIN sem ON sem.id = e.id
  LEFT JOIN lex ON lex.id = e.id
)
SELECT CAST((SELECT count(*) FROM train) AS BIGINT) AS n_train,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN sem_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sem,
       CAST(sum(CASE WHEN lex_hit THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lex,
       CAST(sum(CASE WHEN sem_hit AND lex_hit THEN 1 ELSE 0 END)
            AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN sem_hit AND NOT lex_hit THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sem_only,
       CAST(sum(CASE WHEN lex_hit AND NOT sem_hit THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lex_only,
       CASE WHEN count(*) > 0 THEN
         round(CAST(sum(CASE WHEN sem_hit AND NOT lex_hit
                        THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*), 4) END AS sem_only_leak_rate
FROM flags
"""


def _sdc_frames(spark: SparkSession, sf_dir: str):
    """Shared pipeline of the semantic-decontamination pair (census +
    per-doc ship list): content-collapsed reps, md5 folds, the two
    planted cohorts, the bipartite hyperplane-LSH cosine channel and
    the 8-gram lexical channel.  Returns ``(train, eval_side,
    sem_pairs, lex_counts)`` where ``sem_pairs`` is (eid, cos_sim)
    rows at cosine ≥ 0.99 and ``lex_counts`` is (id,
    n_shared_grams > 0) rows.  One model definition, two consumers —
    the `_qc_best` convention."""
    import numpy as np

    from big_data_lab_three_spark.functions.text import shingles
    from big_data_lab_three_spark.operators.similarity import (
        cosine_score_pairs,
        hyperplane_keys,
    )
    from big_data_lab_three_spark.queries.dedup import _seed_id

    d = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 2 == 0)
        .select(F.col("doc_id").alias("id"), "text")
    )
    e = (
        table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % 2 == 0)
        .select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    reps = (
        d.join(e, "id")
        .groupBy(F.md5("text").alias("dig"), "v")
        .agg(F.min("id").alias("id"), F.min("text").alias("text"))
        .select("id", "text", "v")
    )
    folded = reps.withColumn(
        "is_train",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("sd:"), F.col("id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .__mod__(10)
        < 8,
    ).localCheckpoint()  # five arms reuse the collapsed rep table
    train = folded.where("is_train").select("id", "text", "v")
    evalo = folded.where(~F.col("is_train")).select("id", "text", "v")
    seeded = train.where(F.col("id") % 5 == 0)
    verbatim = seeded.select(
        _seed_id(F.col("id")).alias("id"), "text", "v"
    )
    paraphrase = seeded.select(
        _seed_id(F.col("id"), k=2).alias("id"),
        F.concat(
            F.lit("paraphrase "), F.col("id").cast("string")
        ).alias("text"),
        F.transform("v", lambda x: x * 1.01).alias("v"),
    )
    eval_side = evalo.unionByName(verbatim).unionByName(paraphrase)

    # Semantic channel: bipartite LSH (testdata embeddings are 64-d,
    # same explicit-dim convention as dedup_embedding).
    planes = (
        np.random.default_rng(13).normal(size=(16 * 4, 64)).tolist()
    )
    tk = hyperplane_keys(
        train.select(F.col("id").alias("tid"), F.col("v").alias("vec_t")),
        planes,
        tables=4,
        vec_col="vec_t",
    )
    ek = hyperplane_keys(
        eval_side.select(
            F.col("id").alias("eid"), F.col("v").alias("vec_e")
        ),
        planes,
        tables=4,
        vec_col="vec_e",
    )
    cands = (
        ek.join(tk, "key")
        # a pair colliding in several tables is scored once, not L times
        .dropDuplicates(["eid", "tid"])
        .select("eid", "tid", "vec_e", "vec_t")
    )
    sem_pairs = cosine_score_pairs(
        cands, "vec_e", "vec_t", ["eid"], threshold=0.99
    )

    # Lexical channel: split_leakage_census's 8-gram overlap shape.
    tg = (
        train.select(tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 8)
        .select(F.explode(shingles(F.col("toks"), 8)).alias("gram"))
        .distinct()
    )
    lex_counts = (
        eval_side.select("id", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 8)
        .select("id", F.explode(shingles(F.col("toks"), 8)).alias("gram"))
        .join(tg, "gram")
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )
    return train, eval_side, sem_pairs, lex_counts


@register(
    "semantic_decontamination_census",
    ids="curation: EMBEDDING-level train/eval decontamination — "
    "hyperplane-LSH cosine near-dup join between md5-assigned folds, "
    "cross-checked against the lexical 8-gram channel; censuses the "
    "paraphrased contamination the n-gram check cannot see",
    oracle=_SDC_ORACLE,
)
def semantic_decontamination_census_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Semantic (embedding-level) EVAL DECONTAMINATION — the r14
    verdict's top-ranked missing production shape: paraphrased
    contamination survives every n-gram check (`split_leakage_census`,
    `contamination_check`), so a shipping pipeline also runs an
    embedding-similarity sweep of the eval fold against the training
    fold.  This census runs BOTH channels over the same md5-assigned
    80/20 split and reports their disagreement:

    - **semantic channel**: bipartite hyperplane-LSH join (train keys
      vs eval keys — no within-fold candidates, unlike running the
      symmetric `embedding_near_dup_pairs_lsh` on the union) with
      exact cosine ≥ 0.99 rescore;
    - **lexical channel**: the 8-gram overlap check, exactly
      `split_leakage_census`'s shape (distinct fold gram sets, one
      equi-join, semi-join back to eval docs).

    Two planted cohorts (built from train representatives, `_seed_id`
    convention, thinned id % 5) make the disagreement provable rather
    than data-dependent: a VERBATIM copy (same text, same embedding —
    caught by both channels whenever the source text has ≥ 8 tokens)
    and a PARAPHRASE (2-token placeholder text, so zero 8-grams and
    provably lexically invisible; embedding rescaled × 1.01 — colinear,
    cosine exactly 1, and rescaling preserves every hyperplane sign
    bit, so the planted pair collides in ALL LSH tables: recall 1 by
    construction, the `dedup_embedding` argument).  `n_sem_only` is
    therefore ≥ the paraphrase cohort — the docs an n-gram
    decontamination pass would have shipped.

    The oracle recomputes ground truth independently: brute-force
    all-pairs train × eval cosine (so a value-hash match proves the
    bipartite LSH pipeline loses NOTHING vs exhaustive search on this
    data, not merely that both engines bucket alike) plus the same
    gram arithmetic.

    Scale shape: content collapse first (min-id rep per distinct
    (text, embedding) — bounds everything downstream by DISTINCT
    content at the replicated tiers, the r11 convention), the rep
    table localCheckpoint'ed because five arms reuse it; the semantic
    join is bucket-keyed (never all-pairs), the lexical join is
    gram-keyed; census aggregates are 1-row broadcast crossJoins.  At
    100 TB: the LSH join's per-bucket cost is tuned by bits/tables
    exactly as `embedding_near_dup_pairs_lsh` documents, and the gram
    sets would carry xxhash64 digests instead of strings."""
    train, eval_side, sem_pairs, lex_counts = _sdc_frames(spark, sf_dir)
    sem = (
        sem_pairs.select(F.col("eid").alias("id"))
        .distinct()
        .withColumn("sem_hit", F.lit(True))
    )
    lex = lex_counts.select("id").withColumn("lex_hit", F.lit(True))
    flags = (
        eval_side.select("id")
        .join(sem, "id", "left")
        .join(lex, "id", "left")
        .select(
            F.coalesce("sem_hit", F.lit(False)).alias("sem_hit"),
            F.coalesce("lex_hit", F.lit(False)).alias("lex_hit"),
        )
    )
    one = F.lit(1)
    zero = F.lit(0)
    census = flags.agg(
        F.count(one).alias("n_eval"),
        F.sum(F.when(F.col("sem_hit"), one).otherwise(zero)).alias(
            "n_sem"
        ),
        F.sum(F.when(F.col("lex_hit"), one).otherwise(zero)).alias(
            "n_lex"
        ),
        F.sum(
            F.when(F.col("sem_hit") & F.col("lex_hit"), one).otherwise(
                zero
            )
        ).alias("n_both"),
        F.sum(
            F.when(
                F.col("sem_hit") & ~F.col("lex_hit"), one
            ).otherwise(zero)
        ).alias("n_sem_only"),
        F.sum(
            F.when(
                F.col("lex_hit") & ~F.col("sem_hit"), one
            ).otherwise(zero)
        ).alias("n_lex_only"),
    )
    return census.crossJoin(
        F.broadcast(train.agg(F.count(one).alias("n_train")))
    ).select(
        "n_train",
        "n_eval",
        "n_sem",
        "n_lex",
        "n_both",
        "n_sem_only",
        "n_lex_only",
        F.when(
            F.col("n_eval") > 0,
            F.round(
                F.col("n_sem_only").cast("double") / F.col("n_eval"), 4
            ),
        ).alias("sem_only_leak_rate"),
    )


_IDN_ORACLE = """
WITH base AS (
  SELECT min(doc_id) AS id, doc_id % 4096 AS sk, CAST(-1 AS BIGINT) AS pj
  FROM documents WHERE doc_id % 3 = 0
  GROUP BY doc_id % 4096
), ids AS (
  SELECT id, sk, pj FROM base
  UNION ALL
  SELECT id + 1000000, sk, id % 64 FROM base WHERE id % 5 = 0
), px AS (
  SELECT id,
         [ (CAST(('0x' || substr(md5(CAST(sk AS VARCHAR) || ':' ||
                   CAST(i // 16 AS VARCHAR)),
                   (i % 16) * 2 + 1, 2)) AS BIGINT)
            + CASE WHEN i = pj THEN 128 ELSE 0 END) % 256
           for i in range(0, 64) ] AS p
  FROM ids
), bits AS (
  SELECT px.id,
         CAST(sum(CASE WHEN p[(t.b // 7) * 8 + (t.b % 7) + 1]
                        < p[(t.b // 7) * 8 + (t.b % 7) + 2]
                  THEN CAST(1 AS BIGINT) << t.b
                  ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS dh
  FROM px, range(56) t(b)
  GROUP BY px.id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
FROM bits a JOIN bits b ON a.id < b.id
WHERE bit_count(xor(a.dh, b.dh)) <= 3
"""

_DHASH_BAND_BITS = 14
_DHASH_BANDS = 4  # 4 x 14 = 56 dhash bits


def _png_gen_partitions(
    spark: SparkSession, sf_dir: str, target_bytes: int = 4 << 20
) -> int:
    """Partition count for the PNG-generation ``mapInPandas`` stage,
    derived from the INPUT SIZE (guide §2: scale-adaptive, not a
    constant tuned for either local mode or the cluster): one
    partition per ``target_bytes`` of the documents table, floor 1.

    Why: ``spark.sql.files.minPartitionNum`` defaults to the cluster
    parallelism, so a KB-sized local scan splits into 32 micro-tasks
    of ~50 rows each — every one paying Python-worker + Arrow startup
    for sub-millisecond of PNG work (the r15 driver measured the
    32-core run 5× SLOWER than 8-core on exactly this stage).  The
    value feeds ``coalesce``, which only ever REDUCES partitioning —
    at 100 TB the scan's own ~128 MB splits already exceed the target
    and the coalesce is a no-op."""
    import os

    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(
            os.path.join(sf_dir, "documents.parquet")
        )
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        size = fs.getContentSummary(path).getLength()
    except Exception:
        return 16  # unknown FS: a safe mid fan-out, never 1-per-50-rows
    return max(1, int(size) // target_bytes)


def _md5_png_media(ids: DataFrame) -> DataFrame:
    """(id, sk, pj) → MEDIA_SCHEMA rows: an 8×8 grayscale PNG whose 64
    pixels are the concatenated digest bytes of ``md5(f"{sk}:{k}")``
    for k = 0..3 (pseudorandom per source key, and exactly the
    arithmetic the DuckDB oracle replays via hex substrings), with
    pixel ``pj`` bumped +128 mod 256 when ``pj ≥ 0`` (the planted
    near-identical mutation for the dHash query), or a UNIFORM
    brightness lift to full range when ``pj == -2`` (every pixel
    ``+ (255 − max)`` — the pHash query's planted perceptual dup:
    provably Hamming 0 under the DCT hash, different bytes whenever
    the shift is nonzero).  Encoded by the vendored real codec — the
    payloads downstream stages decode are genuine PNGs."""
    from big_data_lab_three_spark.multimodal.media import MEDIA_SCHEMA

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from big_data_lab_three_spark.multimodal.png import encode_png

        for b in batches:
            if len(b) == 0:
                continue
            payloads = []
            for sk, pj in zip(b["sk"], b["pj"]):
                raw = b"".join(
                    hashlib.md5(f"{int(sk)}:{k}".encode()).digest()
                    for k in range(4)
                )
                px = np.frombuffer(raw, np.uint8).copy()
                if pj >= 0:
                    px[int(pj)] = (int(px[int(pj)]) + 128) % 256
                elif pj == -2:
                    px = (
                        px.astype(np.int64) + (255 - int(px.max()))
                    ).astype(np.uint8)
                payloads.append(encode_png(px.reshape(8, 8)))
            yield pd.DataFrame(
                {
                    "media_id": b["id"].astype("int64"),
                    "media_type": "image",
                    "payload": payloads,
                    "meta": [
                        {
                            "codec": "image/png",
                            "width": 8,
                            "height": 8,
                            "sample_rate": None,
                            "duration_ms": None,
                            "n_bytes": len(p),
                        }
                        for p in payloads
                    ],
                }
            )

    return ids.select("id", "sk", "pj").mapInPandas(gen, MEDIA_SCHEMA)


@register(
    "image_dhash_near_dup",
    ids="multimodal+dedup: perceptual image near-dup — REAL PNG "
    "decode → 56-bit dHash → banded-Hamming candidate join → exact "
    "Hamming rescore; the image twin of dedup_simhash",
    oracle=_IDN_ORACLE,
)
def image_dhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-duplicate pairs — the r14 verdict's
    missing image twin of `dedup_simhash`: every third document keys
    an 8×8 grayscale PNG (pixels = md5 digest bytes of the source key
    ``doc_id % 4096``, so DISTINCT images stay bounded at 4096 and the
    replicated tiers collapse exactly like the text family), the REAL
    codec path encodes and decodes them (`multimodal/png.py` →
    `image_dhash`), a 56-bit horizontal-gradient difference hash is
    packed per image, and pairs at Hamming ≤ 3 are found by the
    Manku-style banded pigeonhole: 4 bands × 14 bits — ≤ 3 flipped
    bits leave ≥ 1 band untouched, so candidate recall is 1 by
    construction and the exact ``bit_count(xor)`` rescore (JVM-side,
    codegen) only ever DROPS false bucket-mates.

    Production order mirrors the text pipeline: exact collapse first
    (min-id representative per payload digest — content-identical
    images never reach the perceptual stage), THEN the banded join
    over representatives.  Every fifth representative plants a
    near-identical copy (one pixel +128 mod 256 → at most the two
    gradient comparisons touching it flip → Hamming ≤ 2 ≤ 3, found in
    every run); md5-pseudorandom pixel grids put organic pairs at
    ~C(56,≤3)/2⁵⁶ ≈ 4e-13 per pair, so the output is exactly the
    planted arm plus provably-found organic coincidences.

    The oracle replays pixel generation (hex substrings of the same
    md5), the dHash arithmetic, and the ALL-PAIRS ground truth — a
    value-hash match proves the banded plan loses nothing vs brute
    force AND that encode → Arrow → decode → unfilter is byte-exact.

    Scale shape: blobs never shuffle (generation, decode, and hashing
    are chained Arrow stages); the only exchanges carry (digest, id)
    for the collapse and (band, bits, id, dhash) for the candidate
    join — both key-bounded.  At 100 TB the band join's bucket sizes
    are tuned by band count exactly as `dedup_simhash` documents."""
    from big_data_lab_three_spark.multimodal.decode import image_dhash
    from big_data_lab_three_spark.queries.dedup import _seed_id

    ids = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").alias("id"),
            (F.col("doc_id") % 4096).alias("sk"),
            F.lit(-1).cast("long").alias("pj"),
        )
    )
    media = _md5_png_media(
        ids.coalesce(_png_gen_partitions(spark, sf_dir))
    )
    # exact collapse first: min-id representative per payload digest
    reps = (
        media.select(
            F.col("media_id").alias("id"),
            (F.col("media_id") % 4096).alias("sk"),
            "payload",
            F.md5("payload").alias("dig"),
        )
        .groupBy("dig")
        .agg(
            F.min("id").alias("id"),
            F.min("sk").alias("sk"),
            F.min("payload").alias("payload"),
        )
        .localCheckpoint()  # reused by the planted arm + own dhash
    )
    rep_media = reps.select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("media_type"),
        "payload",
        F.struct(
            F.lit("image/png").alias("codec"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    planted_src = reps.where(F.col("id") % 5 == 0).select(
        _seed_id(F.col("id")).alias("id"),
        "sk",
        (F.col("id") % 64).cast("long").alias("pj"),
    )
    planted_media = _md5_png_media(planted_src)
    all_dh = image_dhash(rep_media).unionByName(
        image_dhash(planted_media)
    )
    banded = all_dh.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bnd"),
                        F.shiftright(
                            F.col("dhash"), i * _DHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit((1 << _DHASH_BAND_BITS) - 1))
                        .alias("bits"),
                    )
                    for i in range(_DHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "dhash", "bk.bnd", "bk.bits")
    a = banded.select(
        F.col("bnd"),
        F.col("bits"),
        F.col("media_id").alias("id_a"),
        F.col("dhash").alias("dh_a"),
    )
    b = banded.select(
        F.col("bnd"),
        F.col("bits"),
        F.col("media_id").alias("id_b"),
        F.col("dhash").alias("dh_b"),
    )
    cands = (
        a.join(b, ["bnd", "bits"])
        .where(F.col("id_a") < F.col("id_b"))
        # a pair colliding in several bands is rescored once, not 4×
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("dh_a").bitwiseXOR(F.col("dh_b"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )


def _idn_phash_oracle() -> str:
    from big_data_lab_three_spark.multimodal.decode import phash_q

    q = phash_q()
    qvals = ", ".join(
        f"({x}, {u}, {q[x][u]})" for x in range(8) for u in range(8)
    )
    return f"""
WITH qtab(x, u, q) AS (VALUES {qvals}
), base AS (
  SELECT min(doc_id) AS id, doc_id % 4096 AS sk
  FROM documents WHERE doc_id % 3 = 0
  GROUP BY doc_id % 4096
), px0 AS (
  SELECT id,
         [ CAST(('0x' || substr(md5(CAST(sk AS VARCHAR) || ':' ||
                 CAST(i // 16 AS VARCHAR)),
                 (i % 16) * 2 + 1, 2)) AS BIGINT)
           for i in range(0, 64) ] AS p
  FROM base
), ids AS (
  SELECT id, p FROM px0
  UNION ALL
  SELECT id + 1000000,
         list_transform(p, x -> x + 255 - list_max(p))
  FROM px0 WHERE id % 5 = 0
), dct AS (
  SELECT ids.id, t.t AS t,
         CAST(sum(p[i.i + 1] * q1.q * q2.q) AS BIGINT) AS c
  FROM ids
  CROSS JOIN range(64) t(t)
  CROSS JOIN range(64) i(i)
  JOIN qtab q1 ON q1.x = i.i // 8 AND q1.u = t.t // 8
  JOIN qtab q2 ON q2.x = i.i % 8 AND q2.u = t.t % 8
  GROUP BY ids.id, t.t
), med AS (
  SELECT id, c AS m FROM (
    SELECT id, c,
           row_number() OVER (PARTITION BY id ORDER BY c, t) AS rn
    FROM dct WHERE t != 0)
  WHERE rn = 32
), bits AS (
  SELECT d.id,
         CAST(sum(CASE WHEN d.c > med.m
                  THEN CAST(1 AS BIGINT) << (d.t - 1)
                  ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ph
  FROM dct d JOIN med USING (id)
  WHERE d.t != 0
  GROUP BY d.id
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
FROM bits a JOIN bits b ON a.id < b.id
WHERE bit_count(xor(a.ph, b.ph)) <= 2
"""


_PHASH_BAND_BITS = 21
_PHASH_BANDS = 3  # 3 x 21 = 63 AC bits; pigeonhole exact for ham <= 2


@register(
    "image_phash_near_dup",
    ids="multimodal+dedup: perceptual image near-dup via DCT pHash — "
    "REAL PNG decode → integer 8×8 DCT-II → 63-bit median hash → "
    "banded-Hamming join; brightness-shift dups provably Hamming 0",
    oracle=_idn_phash_oracle(),
)
def image_phash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-duplicates via DCT pHash — the
    low-frequency-structure complement of ``image_dhash_near_dup``
    (the pHash/dHash pair the r14 verdict named; the text-family
    analogy is minhash vs simhash).  The same md5-pixel PNG corpus
    (distinct images bounded at 4096 by the ``doc_id % 4096`` keying,
    so replicated tiers collapse and the all-pairs oracle stays
    bounded at EVERY tier) flows through the real codec, then
    ``image_phash``: an exact-INTEGER 8×8 DCT-II — both engines use
    the ONE quantized basis from ``multimodal.decode.phash_q``, so
    there is no cross-engine float rounding anywhere — drops the DC
    term and compares each of the 63 AC coefficients to their lower
    median; pairs at Hamming ≤ 2 come from a 3-band × 21-bit
    pigeonhole join (≤ 2 flips leave ≥ 1 band intact → candidate
    recall 1) with the exact JVM ``bit_count(xor)`` rescore.

    The planted arm is the class pHash EXISTS for and digest dedup
    cannot see: every fifth representative gets a UNIFORM
    brightness-lifted copy (all pixels ``+ (255 − max)``).  A uniform
    shift lives entirely in the DC coefficient — every AC basis row
    sums to zero — so the copy's 63 AC terms are IDENTICAL and the
    pair is PROVABLY Hamming 0, while the bytes differ whenever the
    shift is nonzero (~78% of reps; shift-0 copies are byte-identical
    and pair at Hamming 0 trivially).  md5-pseudorandom grids put
    organic pairs at measured Hamming ≥ 16, so the output is exactly
    the planted arm.

    The oracle replays pixel generation, the integer DCT (the shared
    basis as a VALUES table), the median-threshold pack, and the
    ALL-PAIRS ground truth — a value match proves the banded plan
    loses nothing vs brute force and that encode → Arrow → decode is
    byte-exact.  Scale shape: identical to the dHash query — blobs in
    chained Arrow stages, exchanges carry only (digest, id) and
    (band, bits, id, phash)."""
    from big_data_lab_three_spark.multimodal.decode import image_phash
    from big_data_lab_three_spark.queries.dedup import _seed_id

    ids = (
        table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").alias("id"),
            (F.col("doc_id") % 4096).alias("sk"),
            F.lit(-1).cast("long").alias("pj"),
        )
    )
    media = _md5_png_media(
        ids.coalesce(_png_gen_partitions(spark, sf_dir))
    )
    reps = (
        media.select(
            F.col("media_id").alias("id"),
            (F.col("media_id") % 4096).alias("sk"),
            "payload",
            F.md5("payload").alias("dig"),
        )
        .groupBy("dig")
        .agg(
            F.min("id").alias("id"),
            F.min("sk").alias("sk"),
            F.min("payload").alias("payload"),
        )
        .localCheckpoint()  # reused by the planted arm + own phash
    )
    rep_media = reps.select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("media_type"),
        "payload",
        F.struct(
            F.lit("image/png").alias("codec"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length("payload").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    planted_src = reps.where(F.col("id") % 5 == 0).select(
        _seed_id(F.col("id")).alias("id"),
        "sk",
        F.lit(-2).cast("long").alias("pj"),
    )
    planted_media = _md5_png_media(planted_src)
    all_ph = image_phash(rep_media).unionByName(
        image_phash(planted_media)
    )
    banded = all_ph.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bnd"),
                        F.shiftright(
                            F.col("phash"), i * _PHASH_BAND_BITS
                        )
                        .bitwiseAND(
                            F.lit((1 << _PHASH_BAND_BITS) - 1)
                        )
                        .alias("bits"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "phash", "bk.bnd", "bk.bits")
    a = banded.select(
        F.col("bnd"),
        F.col("bits"),
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
    )
    b = banded.select(
        F.col("bnd"),
        F.col("bits"),
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
    )
    cands = (
        a.join(b, ["bnd", "bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= 2)
    )


@register(
    "semantic_decontamination_doclist",
    ids="curation: per-doc decontamination SHIP LIST — the table the "
    "census summarizes: every contaminated eval doc with its channel "
    "flags, max train cosine, and shared-gram count",
    oracle=_SDC_CORE
    + """, semagg AS (
  SELECT e.id,
         round(max(list_cosine_similarity(e.v, t.v)), 4) AS max_sem_cos
  FROM eval_side e JOIN train t
    ON list_cosine_similarity(e.v, t.v) >= 0.99
  GROUP BY e.id
), lexagg AS (
  SELECT eg.id, CAST(count(DISTINCT eg.gram) AS BIGINT)
             AS n_shared_grams
  FROM eg JOIN tg USING (gram) GROUP BY eg.id
)
SELECT coalesce(s.id, l.id) AS eval_id,
       (s.id IS NOT NULL) AS sem_hit,
       (l.id IS NOT NULL) AS lex_hit,
       s.max_sem_cos,
       coalesce(l.n_shared_grams, 0) AS n_shared_grams
FROM semagg s FULL OUTER JOIN lexagg l ON s.id = l.id
ORDER BY eval_id
""",
)
def semantic_decontamination_doclist_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-doc decontamination SHIP LIST — the actionable table
    `semantic_decontamination_census` summarizes: one row per
    contaminated eval document (either channel), with the channel
    flags, the maximum train cosine among its ≥ 0.99 semantic matches
    (what an auditor sorts by), and how many distinct 8-grams it
    shares with the training fold.  This is what actually feeds an
    eval-set scrubber: drop/replace the listed docs, keep the rest.

    Same shared pipeline as the census (`_sdc_frames` — one model
    definition, two consumers, the `_qc_best` convention); the oracle
    recomputes ground truth by brute force, so the per-doc rows ALSO
    re-prove the bipartite LSH channel loses nothing vs all-pairs at
    row grain, not just in aggregate.  On this fixture every semantic
    match is colinear (cos ≈ 1.0 exactly), so the rounded max is
    engine-stable by the `dedup_embedding` argument.

    Scale shape: identical to the census minus the final 1-row
    rollup — the output is bounded by contaminated docs, the frame a
    100 TB pipeline materializes for human review anyway."""
    train, eval_side, sem_pairs, lex_counts = _sdc_frames(spark, sf_dir)
    semagg = (
        sem_pairs.groupBy(F.col("eid").alias("id"))
        .agg(F.round(F.max("cos_sim"), 4).alias("max_sem_cos"))
        .withColumn("sem_hit", F.lit(True))
    )
    lexagg = lex_counts.withColumn("lex_hit", F.lit(True))
    return (
        semagg.join(lexagg, "id", "full_outer")
        .select(
            F.col("id").alias("eval_id"),
            F.coalesce("sem_hit", F.lit(False)).alias("sem_hit"),
            F.coalesce("lex_hit", F.lit(False)).alias("lex_hit"),
            "max_sem_cos",
            F.coalesce("n_shared_grams", F.lit(0))
            .cast("long")
            .alias("n_shared_grams"),
        )
        .orderBy("eval_id")
    )
