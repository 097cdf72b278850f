"""MLlib parity bench (r11 verdict item 6): validate the hand-rolled
distributed operators against ``pyspark.ml`` at equal parameters —
the way ``png_pixel_stats`` validated the vendored PNG codec against
a reference decoder.

Four comparisons, all printed as one JSON line for EXPERIMENTS.md:

1. **Lloyd k-means** (``kmeans_lloyd_census``'s ``_lloyd_state`` vs
   ``pyspark.ml.clustering.KMeans``): equal k (``_n_cells`` of the
   corpus), equal update count (our 3-assignment/2-update loop vs
   ``maxIter=2`` — MLlib assigns once more against its final
   centers, the same shape), vectors L2-normalized for the library so
   its Euclidean objective matches our cosine assignment.  Metric:
   MEAN COSINE DISTANCE to the assigned centroid — the clustering
   objective itself, deterministic under fixed seeds, insensitive to
   cluster relabeling (assignment-overlap would need a Hungarian
   match and still break on ties).  Parity = our cost within a few
   percent of the library's (our init is the first-k rows —
   deterministic and oracle-friendly; MLlib gets k-means|| — so the
   library may win slightly; a LARGE gap would mean the update step
   is wrong).

2. **MinHash LSH** (``operators.dedup.minhash_lsh_pairs`` vs
   ``pyspark.ml.feature.MinHashLSH``): the same 3-shingle sets on
   both sides (CountVectorizer binary featurization, lossless
   vocabulary), equal collision budget (our 16 bands × 2 rows vs the
   library's 16 single-hash tables), the same exact-Jaccard 0.7 gate
   (ours rescores shingle sets; ``approxSimilarityJoin`` filters by
   true vector-set Jaccard distance <= 0.3).  Planted near-dup pairs
   (every 10th doc gets a ``+1_000_000``-id copy with two appended
   tokens, Jaccard ~0.95) give both methods a ground truth; the
   readout is each method's planted-pair recall plus the Jaccard
   agreement of the two full pair sets.

3. **Naive Bayes** (``nb_parity``, r13): the registered
   ``nb_lang_confusion`` exact-integer sparse scoring vs
   ``pyspark.ml.classification.NaiveBayes`` — held-out confusion
   matrices compared cell-by-cell (measured identical at 3 SFs).

4. **Embedding near-dup** (``brp_parity``, r14): our hyperplane-LSH
   cosine pipeline vs ``pyspark.ml.feature
   .BucketedRandomProjectionLSH`` on L2-normalized vectors (cos ≥ t ⇔
   ‖a−b‖ ≤ sqrt(2−2t) — the same predicate), both graded against the
   exact brute-force ground truth on planted duplicates.

Usage: python tools/mllib_parity.py [sf_dir]
       (default /root/testdata/sf0.01; tests pin the same numbers at
       sf0.001 via tests/test_ml.py — test_kmeans/minhash parity
       bounds, test_nb_confusion_matches_mllib, and
       test_embedding_near_dup_matches_mllib_brp)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cos_dist_to_center(vecs: DataFrame, centers: DataFrame) -> float:
    """Mean cosine distance of (id, v, cell) rows to their (cell, c)
    centroid — the shared readout metric.  ``c`` may be any uniform
    scaling of the centroid (cosine cancels it)."""
    j = vecs.join(F.broadcast(centers), "cell")
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.col("c"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (norm(F.col("v")) * norm(F.col("c")))
    return j.agg(F.avg(F.lit(1.0) - cos)).first()[0]


def kmeans_parity(spark: SparkSession, sf_dir: str) -> dict:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from big_data_lab_three_spark.queries.corpus import (
        _KM_ROUNDS,
        _lloyd_state,
        _n_cells,
    )
    from big_data_lab_three_spark.sources import table

    t0 = time.time()
    ve, asg, cent = _lloyd_state(spark, sf_dir)
    ours_vecs = asg.join(ve, "id").select("id", "cell", "v")
    ours_centers = cent.select(
        "cell",
        F.transform(
            "s", lambda y: y.cast("double") / F.col("n").cast("double")
        ).alias("c"),
    )
    cost_ours = _cos_dist_to_center(ours_vecs, ours_centers)
    t_ours = time.time() - t0

    t0 = time.time()
    e = table(spark, sf_dir, "embeddings")
    k = _n_cells(e.count())
    unit = e.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "id",
        "v",
        F.transform(
            "v",
            lambda x: x
            / F.sqrt(
                F.aggregate(
                    F.transform(F.col("v"), lambda y: y * y),
                    F.lit(0.0),
                    lambda acc, y: acc + y,
                )
            ),
        ).alias("u"),
    )
    feat = unit.select("id", "v", array_to_vector("u").alias("f"))
    km = KMeans(
        k=k,
        maxIter=_KM_ROUNDS - 1,
        seed=7,
        featuresCol="f",
        predictionCol="cell",
    )
    model = km.fit(feat)
    pred = model.transform(feat).select("id", "cell", "v")
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, c array<double>",
    )
    cost_lib = _cos_dist_to_center(pred, centers)
    t_lib = time.time() - t0
    return {
        "k": k,
        "cost_ours": round(cost_ours, 6),
        "cost_mllib": round(cost_lib, 6),
        # ADVICE r12: a zero library cost with nonzero ours must FAIL
        # the parity bound readably, not slip past as None (TypeError in
        # the test) — the 1e30 sentinel trips `<= 1.10` with the dict in
        # the message AND stays valid JSON (float('inf') would make
        # json.dumps emit bare Infinity, which strict parsers reject).
        "cost_ratio": round(cost_ours / cost_lib, 4)
        if cost_lib
        else (1.0 if not cost_ours else 1e30),
        "sec_ours": round(t_ours, 2),
        "sec_mllib": round(t_lib, 2),
    }


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_lab_three_spark.sources import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz qq")).alias("text"),
    )
    return d.unionByName(dup)


def minhash_parity(spark: SparkSession, sf_dir: str) -> dict:
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from big_data_lab_three_spark.functions.text import shingles, tokens
    from big_data_lab_three_spark.operators.dedup import minhash_lsh_pairs

    corpus = _planted_corpus(spark, sf_dir).localCheckpoint()
    planted = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in corpus.where(F.col("doc_id") % 10 == 0)
        .where(F.col("doc_id") < 1_000_000)
        .select("doc_id")
        .collect()
    }

    t0 = time.time()
    ours = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            corpus, num_perms=32, bands=16, jaccard_threshold=0.7
        )
        .select("id_a", "id_b")
        .collect()
    }
    t_ours = time.time() - t0

    t0 = time.time()
    sh = corpus.select(
        "doc_id",
        F.array_distinct(shingles(tokens(F.col("text")), 3)).alias("sh"),
    ).where(F.size("sh") > 0)
    cv = CountVectorizer(
        inputCol="sh", outputCol="f", binary=True, vocabSize=1 << 20, minDF=1.0
    ).fit(sh)
    feat = cv.transform(sh).select("doc_id", "f")
    lsh = MinHashLSH(
        inputCol="f", outputCol="h", numHashTables=16, seed=7
    ).fit(feat)
    joined = lsh.approxSimilarityJoin(feat, feat, 0.3, distCol="dist")
    lib = {
        (r["a"], r["b"])
        for r in joined.where(
            F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
        )
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
        .collect()
    }
    t_lib = time.time() - t0

    union = ours | lib
    return {
        "n_planted": len(planted),
        "recall_ours": round(len(ours & planted) / len(planted), 4),
        "recall_mllib": round(len(lib & planted) / len(planted), 4),
        "n_pairs_ours": len(ours),
        "n_pairs_mllib": len(lib),
        "pairset_agreement": (
            round(len(ours & lib) / len(union), 4) if union else 1.0
        ),
        "sec_ours": round(t_ours, 2),
        "sec_mllib": round(t_lib, 2),
    }


def nb_parity(spark: SparkSession, sf_dir: str) -> dict:
    """Naive Bayes parity (r13): the registered corpus-scale
    ``nb_lang_confusion`` (sparse exact-integer score decomposition)
    vs ``pyspark.ml.classification.NaiveBayes`` (multinomial,
    smoothing=1.0 — the SAME add-one model family) on the SAME seeded
    fixture: identical marker/fold construction, CountVectorizer
    count featurization (lossless vocabulary), library predictions on
    the held-out fold crosstabbed and compared cell-by-cell against
    our query's confusion census.  Residual disagreement can come
    only from float-vs-micro-quantized near-ties."""
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import CountVectorizer, StringIndexer

    from big_data_lab_three_spark.queries import load_all
    from big_data_lab_three_spark.queries.corpus import _NB_MARKERS
    from big_data_lab_three_spark.functions.text import tokens
    from big_data_lab_three_spark.sources import table

    reg = load_all()

    t0 = time.time()
    ours = {
        (r["actual"], r["predicted"]): r["n_docs"]
        for r in reg["nb_lang_confusion"].spark(spark, sf_dir).collect()
    }
    t_ours = time.time() - t0

    # the registered query's exact fixture: md5 fold + marker columns
    t0 = time.time()
    from big_data_lab_three_spark.functions.numeric import md5_mod

    hash_mod = lambda salt, mod: md5_mod(salt, F.col("doc_id"), mod)
    marker = F.when(
        hash_mod("nbm:", 100) < 85,
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
            hash_mod("nb:", 5).alias("fold"),
        )
        .where(F.size("toks") > 0)
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="f", vocabSize=1 << 20, minDF=1.0
    ).fit(d.where(F.col("fold") != 0))
    si = StringIndexer(inputCol="lang", outputCol="y").fit(d)
    tr = si.transform(cv.transform(d.where(F.col("fold") != 0)))
    te = si.transform(cv.transform(d.where(F.col("fold") == 0)))
    nb = NaiveBayes(
        featuresCol="f",
        labelCol="y",
        smoothing=1.0,
        modelType="multinomial",
    ).fit(tr)
    back = {float(i): l for i, l in enumerate(si.labels)}
    pred = nb.transform(te).select(
        "lang",
        F.udf(lambda p: back[float(p)])(F.col("prediction")).alias("pl"),
    )
    lib = {
        (r["lang"], r["pl"]): r["n"]
        for r in pred.groupBy("lang", "pl")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    t_lib = time.time() - t0

    total = sum(ours.values())
    diff = sum(
        abs(ours.get(k, 0) - lib.get(k, 0)) for k in set(ours) | set(lib)
    )
    acc = lambda m: (
        sum(v for (a, p), v in m.items() if a == p) / sum(m.values())
        if m
        else 0.0
    )
    return {
        "n_heldout": total,
        "confusion_agreement": round(1.0 - diff / (2 * total), 4),
        "acc_ours": round(acc(ours), 4),
        "acc_mllib": round(acc(lib), 4),
        "sec_ours": round(t_ours, 2),
        "sec_mllib": round(t_lib, 2),
    }


def brp_parity(spark: SparkSession, sf_dir: str) -> dict:
    """Embedding near-dup parity (r14): our hyperplane-LSH cosine
    pipeline (``embedding_near_dup_pairs_lsh``, sign-bit buckets +
    exact rescore) vs ``pyspark.ml`` BucketedRandomProjectionLSH —
    comparable because on L2-NORMALIZED vectors ``cos(a,b) ≥ t`` is
    exactly ``‖a−b‖ ≤ sqrt(2−2t)``, so the Euclidean library searches
    the same predicate our cosine pipeline does.  Both are graded
    against the exact brute-force ground truth
    (``embedding_near_dup_pairs``) on a corpus with planted exact
    duplicates (every 10th vector re-keyed +1M)."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from big_data_lab_three_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_lsh,
    )
    from big_data_lab_three_spark.sources import table

    from big_data_lab_three_spark.functions.vector import l2_norm

    thresh = 0.99
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # deterministic id-keyed thinning keeps the brute-force ground
    # truth under embedding_near_dup_pairs' 100k-row cap at ANY tier
    # (review finding r14: an sf10 run would otherwise crash main()
    # and discard the other parity results)
    n = e.count()
    step = max(1, (n + 80_000 - 1) // 80_000)
    if step > 1:
        e = e.where(F.col("vec_id") % step == 0)
    dup = e.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus = e.unionByName(dup)
    # norm computed ONCE per row in its own projection (inlining the
    # aggregate into the per-element lambda is O(d²)/row), via the
    # shared functions.vector.l2_norm
    c = (
        corpus.select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x.cast("double")
            ).alias("_e"),
            F.greatest(l2_norm(F.col("embedding")), F.lit(1e-12)).alias(
                "_n"
            ),
        )
        .select(
            "vec_id",
            F.transform(
                F.col("_e"), lambda x: x / F.col("_n")
            ).alias("vec"),
        )
        .localCheckpoint()
    )
    planted = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in e.where(F.col("vec_id") % 10 == 0)
        .select("vec_id")
        .collect()
    }

    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            c, vec_col="vec", id_col="vec_id", threshold=thresh
        )
        .select("id_a", "id_b")
        .collect()
    }

    t0 = time.time()
    ours = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs_lsh(
            c, vec_col="vec", id_col="vec_id", threshold=thresh
        )
        .select("id_a", "id_b")
        .collect()
    }
    t_ours = time.time() - t0

    t0 = time.time()
    feat = c.select("vec_id", array_to_vector("vec").alias("v"))
    brp = BucketedRandomProjectionLSH(
        inputCol="v",
        outputCol="h",
        numHashTables=4,
        bucketLength=0.5,
        seed=13,
    ).fit(feat)
    # cos ≥ t on unit vectors ⇔ dist ≤ sqrt(2 − 2t); +1e-9 so the
    # boundary is closed on both engines despite float rounding
    joined = brp.approxSimilarityJoin(
        feat, feat, math.sqrt(2.0 - 2.0 * thresh) + 1e-9, distCol="dist"
    )
    lib = {
        (r["a"], r["b"])
        for r in joined.where(
            F.col("datasetA.vec_id") < F.col("datasetB.vec_id")
        )
        .select(
            F.col("datasetA.vec_id").alias("a"),
            F.col("datasetB.vec_id").alias("b"),
        )
        .collect()
    }
    t_lib = time.time() - t0

    union = ours | lib
    return {
        "n_planted": len(planted),
        "n_exact": len(exact),
        "recall_ours_vs_exact": (
            round(len(ours & exact) / len(exact), 4) if exact else 1.0
        ),
        "recall_mllib_vs_exact": (
            round(len(lib & exact) / len(exact), 4) if exact else 1.0
        ),
        "planted_recall_ours": (
            round(len(ours & planted) / len(planted), 4)
            if planted
            else 1.0
        ),
        "planted_recall_mllib": (
            round(len(lib & planted) / len(planted), 4)
            if planted
            else 1.0
        ),
        "false_pairs_ours": len(ours - exact),
        "false_pairs_mllib": len(lib - exact),
        "pairset_agreement": (
            round(len(ours & lib) / len(union), 4) if union else 1.0
        ),
        "sec_ours": round(t_ours, 2),
        "sec_mllib": round(t_lib, 2),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from big_data_lab_three_spark.session import get_spark

    spark = get_spark("mllib_parity")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "sf_dir": sf_dir,
        "kmeans": kmeans_parity(spark, sf_dir),
        "minhash": minhash_parity(spark, sf_dir),
        "nb": nb_parity(spark, sf_dir),
        "brp": brp_parity(spark, sf_dir),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
