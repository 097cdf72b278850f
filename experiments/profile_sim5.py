import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.operators.dedup import simhash64, minhash_signature, _SIMHASH_MASKS

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup)

def force(df, name):
    t0 = time.time()
    df.agg(F.sum(F.bit_count(F.xxhash64(*[F.col(c) for c in df.columns])))).collect()
    print("%s: %.2fs" % (name, time.time() - t0))

# current HOF-based simhash (forced)
force(base.select("doc_id", simhash64(shingles(tokens(F.col("text")), 3)).alias("sig")), "HOF simhash64")
# current HOF-based minhash (forced)
force(base.select("doc_id", F.xxhash64(F.concat_ws(",", minhash_signature(tokens(F.col("text"))))).alias("s")), "HOF minhash")

# explode-based simhash
toks = base.select("doc_id", F.explode(shingles(tokens(F.col("text")), 3)).alias("t"))
hashed = toks.select("doc_id", F.xxhash64("t").alias("h"))
aggs = [F.sum(F.when(F.col("h").bitwiseAND(F.lit(m)) != 0, 1).otherwise(-1)).alias(f"b{i}")
        for i, m in enumerate(_SIMHASH_MASKS)]
counts = hashed.groupBy("doc_id").agg(*aggs)
sig = F.lit(0).cast("long")
for i, m in enumerate(_SIMHASH_MASKS):
    sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(m).cast("long")).otherwise(F.lit(0).cast("long"))
esim = counts.select("doc_id", sig.alias("sig"))
force(esim, "explode simhash")

# explode-based minhash
maggs = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}") for i in range(32)]
emin = hashed.groupBy("doc_id").agg(*maggs)
force(emin, "explode minhash")
