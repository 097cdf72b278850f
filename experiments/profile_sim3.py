import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.operators.dedup import simhash64, hamming64

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup)

sigs = base.select(
    F.col("doc_id").alias("id"),
    simhash64(shingles(tokens(F.col("text")), 3)).alias("sig"),
).withColumn("prefix", F.shiftright("sig", 48))

t0=time.time(); sigs.count(); print("sigs+prefix count: %.2fs" % (time.time()-t0))

a, b = sigs.alias("a"), sigs.alias("b")
j_nofilter = a.join(b, (F.col("a.prefix")==F.col("b.prefix")) & (F.col("a.id")<F.col("b.id")))
t0=time.time(); n=j_nofilter.count(); print("join no-hamming: rows=%d %.2fs" % (n, time.time()-t0))

j = j_nofilter.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming")) \
              .where(F.col("hamming")<=3)
t0=time.time(); n=j.count(); print("join + hamming: rows=%d %.2fs" % (n, time.time()-t0))
