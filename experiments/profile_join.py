import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.operators.dedup import simhash64, minhash_signature

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup)

sigs = base.select(
    F.col("doc_id").alias("id"),
    simhash64(shingles(tokens(F.col("text")), 3)).alias("sig"),
).withColumn("prefix", F.shiftright("sig", 48))
sigs.cache()
print("distinct prefixes:", sigs.select("prefix").distinct().count())
print(sigs.groupBy("prefix").count().orderBy(F.desc("count")).limit(5).collect())

# join with cached sigs (materialized) vs uncached
a, b = sigs.alias("a"), sigs.alias("b")
j = a.join(b, (F.col("a.prefix")==F.col("b.prefix")) & (F.col("a.id")<F.col("b.id"))) \
     .select(F.col("a.id"), F.col("b.id"),
             F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("h")) \
     .where(F.col("h")<=3)
t0=time.time(); print("cached-sig join rows:", j.count(), "%.2fs" % (time.time()-t0))

sigs2 = base.select(
    F.col("doc_id").alias("id"),
    simhash64(shingles(tokens(F.col("text")), 3)).alias("sig"),
).withColumn("prefix", F.shiftright("sig", 48))
a2, b2 = sigs2.alias("a"), sigs2.alias("b")
j2 = a2.join(b2, (F.col("a.prefix")==F.col("b.prefix")) & (F.col("a.id")<F.col("b.id"))) \
     .select(F.col("a.id"), F.col("b.id"),
             F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("h")) \
     .where(F.col("h")<=3)
t0=time.time(); print("uncached-sig join rows:", j2.count(), "%.2fs" % (time.time()-t0))
j2.explain("formatted")
