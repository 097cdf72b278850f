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


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word-frequency table BPE trains on: ONE corpus token scan
    collapsed to (tok, cnt, syms) where ``syms`` is the initial
    character segmentation.  Everything after this is
    vocabulary-bounded (Zipf), never corpus-sized — the property that
    makes the 10-round loop scale-free: at 100 TB the corpus scan is
    one combiner-friendly groupBy and the loop state is still only the
    vocabulary."""
    words = (
        table(spark, sf_dir, "documents")
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
    spark: SparkSession, sf_dir: str, k: int = _BPE_K
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
    vocab = _bpe_vocab(spark, sf_dir).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, k + 1):
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
        merged = F.aggregate(
            "syms",
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
        vocab = vocab.select(
            "tok", "cnt", merged.alias("syms")
        ).localCheckpoint()
    return merges, vocab


def _bpe_oracle_rounds(k: int = _BPE_K) -> str:
    """The chained-CTE DuckDB twin of the K-merge loop (the
    ``pagerank_check`` iterative-oracle pattern): round r derives pair
    counts from span table ``s{r-1}``, takes the (count DESC, pair
    ASC) argmax, selects the greedy non-overlapping merge positions
    with the run-parity window trick (consecutive candidate runs take
    every other position — exactly left-to-right greedy), and emits
    span table ``s{r}``.  ``MATERIALIZED`` pins each multi-referenced
    CTE so the 10-round chain can't inline exponentially."""
    parts = [
        f"""WITH words AS MATERIALIZED (
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_DUCK_TOKS}) AS tok FROM documents)
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
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
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
                     x.pos - row_number() OVER (
                         PARTITION BY x.w ORDER BY x.pos) AS grp
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


_BPE_MERGES_SELECT = "\nUNION ALL ".join(
    f"SELECT CAST({r} AS INTEGER) AS merge_rank, a AS left_sym, "
    f"b AS right_sym, a || b AS merged, c AS pair_cnt FROM t{r}"
    for r in range(1, _BPE_K + 1)
)


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
