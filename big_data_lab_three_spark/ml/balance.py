"""M2 — class rebalancing (SURVEY.md §2.10).

Reference (``src/train.py:70-71``): ``SMOTE(random_state=42)
.fit_resample`` — synthesize minority rows by interpolating toward
k-NN neighbors until classes balance.  Three fidelity/cost tiers, per
SURVEY.md M2's staged plan:

(a) :func:`oversample_minority` — duplicate minority rows by sampling
    with replacement (cheapest; distributionally equivalent for tree
    models).
(b) :func:`class_weights` — a ``weightCol`` for classifiers that
    support it (all four reference models do in MLlib); zero data
    growth, the 100 TB-preferred option.
(c) :func:`smote` — true distributed SMOTE: per-class k-NN via
    BucketedRandomProjectionLSH ``approxSimilarityJoin`` (the scalable
    neighbor search), interpolation as a JVM vector expression.
    Seed-stable: neighbor choice and λ derive from ``xxhash64`` of the
    pair ids, not an RNG.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _class_counts(df: DataFrame, label_col: str) -> dict:
    return {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def oversample_minority(
    df: DataFrame, label_col: str = "label", seed: int = 42
) -> DataFrame:
    """(a) Random oversampling to balance: minority classes are sampled
    with replacement at rate (majority/n_c - 1) and unioned back.
    Executor-local sampling — no shuffle."""
    counts = _class_counts(df, label_col)
    majority = max(counts.values())
    out = df
    for cls, n in counts.items():
        extra = majority / n - 1.0
        if extra <= 0:
            continue
        boost = df.where(F.col(label_col) == cls).sample(
            withReplacement=True, fraction=float(extra), seed=seed
        )
        out = out.unionByName(boost)
    return out


def class_weights(df: DataFrame, label_col: str = "label", weight_col: str = "weight") -> DataFrame:
    """(b) Balanced instance weights: w_c = n_total / (k · n_c)
    (sklearn's ``class_weight='balanced'`` formula).  The weight map is
    broadcast via a literal CASE — no join, no shuffle."""
    counts = _class_counts(df, label_col)
    total, k = sum(counts.values()), len(counts)
    expr = F.lit(1.0)
    for cls, n in counts.items():
        expr = F.when(F.col(label_col) == cls, F.lit(total / (k * n))).otherwise(expr)
    return df.withColumn(weight_col, expr)


def smote(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    minority_class=None,
    k: int = 5,
    bucket_length: float = 2.0,
    seed: int = 42,
) -> DataFrame:
    """(c) Distributed SMOTE.

    Synthesizes ``majority - minority`` rows for the minority class:

    1. approx k-NN within the minority class via
       BucketedRandomProjectionLSH self-join (LSH buckets shuffle only
       minority rows — never the majority),
    2. per base row keep the k nearest (window on distance),
    3. pick a neighbor and an interpolation λ ∈ (0,1) deterministically
       from ``xxhash64(base_id, neighbor_id, replica)`` — seed-stable
       without any RNG state on executors,
    4. synthetic vector = base + λ·(neighbor − base) as a
       ``zip_with`` array expression (JVM-side).

    Output: input rows + synthetic minority rows (same schema:
    features_col + label_col only for synthetic rows' other columns =
    NULL-free subset — callers select the needed columns first).
    """
    counts = _class_counts(df, label_col)
    if minority_class is None:
        minority_class = min(counts, key=counts.get)
    n_min = counts[minority_class]
    n_need = max(counts.values()) - n_min
    if n_need <= 0:
        return df

    base_cols = [features_col, label_col]
    minority = (
        df.where(F.col(label_col) == minority_class)
        .select(*base_cols)
        .withColumn("__id", F.monotonically_increasing_id())
    )

    lsh = BucketedRandomProjectionLSH(
        inputCol=features_col,
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=3,
        seed=seed,
    )
    model = lsh.fit(minority)
    # Self-join: pairs within the widest reasonable radius; window keeps k.
    pairs = model.approxSimilarityJoin(
        minority, minority, float("inf"), distCol="__dist"
    ).where(F.col("datasetA.__id") != F.col("datasetB.__id"))

    w = Window.partitionBy("datasetA.__id").orderBy(
        F.asc("__dist"), F.asc("datasetB.__id")
    )
    knn = (
        pairs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            F.col("datasetA.__id").alias("base_id"),
            F.col(f"datasetA.{features_col}").alias("base_vec"),
            F.col("datasetB.__id").alias("nbr_id"),
            F.col(f"datasetB.{features_col}").alias("nbr_vec"),
            "__rn",
        )
    )

    # Replicate each base row ceil(n_need/n_min) times, then keep n_need.
    reps = -(-n_need // n_min)
    replicas = knn.sparkSession.range(reps).withColumnRenamed("id", "__rep")
    replicated = knn.crossJoin(F.broadcast(replicas))
    h = F.xxhash64("base_id", "nbr_id", "__rep", F.lit(seed))
    chosen = replicated.where(
        F.pmod(F.xxhash64("base_id", "__rep", F.lit(seed)), F.lit(k))
        == F.col("__rn") - 1
    )
    lam = (F.pmod(h, F.lit(10_000)) + 0.5) / 10_000.0
    base_arr = vector_to_array("base_vec")
    nbr_arr = vector_to_array("nbr_vec")
    synth_vec = array_to_vector(
        F.zip_with(base_arr, nbr_arr, lambda b, n: b + lam * (n - b))
    )
    synthetic = (
        chosen.select(
            synth_vec.alias(features_col),
            F.lit(minority_class).alias(label_col),
        )
        .limit(n_need)
    )
    return df.select(*base_cols).unionByName(synthetic)
