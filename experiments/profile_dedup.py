import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.operators.dedup import (
    minhash_signature, simhash64, minhash_lsh_pairs, simhash_pairs)

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup).cache()
print("base rows:", base.count())

t0 = time.time()
toks = tokens(F.col("text"))
sig = base.select("doc_id", minhash_signature(toks).alias("sig"))
sig.count()
print("minhash signature only: %.2fs" % (time.time() - t0))

t0 = time.time()
sh = base.select("doc_id", F.array_distinct(shingles(toks, 3)).alias("sh"))
sh.count()
print("shingles only: %.2fs" % (time.time() - t0))

t0 = time.time()
n = minhash_lsh_pairs(base).count()
print("full minhash_lsh: %.2fs rows=%d" % (time.time() - t0, n))

t0 = time.time()
ss = base.select("doc_id", simhash64(shingles(tokens(F.col("text")), 3)).alias("sig"))
ss.count()
print("simhash64 sig only: %.2fs" % (time.time() - t0))

t0 = time.time()
n = simhash_pairs(base).count()
print("full simhash_pairs: %.2fs rows=%d" % (time.time() - t0, n))
