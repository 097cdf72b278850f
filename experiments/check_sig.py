import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.functions.text import shingles, tokens
from big_data_lab_three_spark.operators.dedup import simhash64

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup)
sigs = base.select(
    F.col("doc_id").alias("id"),
    simhash64(shingles(tokens(F.col("text")), 3)).alias("sig"),
).withColumn("prefix", F.shiftright("sig", 48)).cache()
print("rows:", sigs.count())
print("distinct sigs:", sigs.select("sig").distinct().count())
print("distinct prefixes:", sigs.select("prefix").distinct().count())
print("top prefixes:", sigs.groupBy("prefix").count().orderBy(F.desc("count")).limit(5).collect())
print(sigs.limit(4).collect())
