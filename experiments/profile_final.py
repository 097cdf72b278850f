import time
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.sources import table
from big_data_lab_three_spark.operators.dedup import simhash_pairs, minhash_lsh_pairs

spark = get_spark()
sf = "/root/testdata/sf0.1"
d = table(spark, sf, "documents").where(F.col("doc_id") % 5 == 0)
dup = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
base = d.select("doc_id", "text").unionByName(dup)
t0=time.time(); n=minhash_lsh_pairs(base).count(); print("minhash_lsh: rows=%d %.2fs" % (n, time.time()-t0))
t0=time.time(); n=simhash_pairs(base).count(); print("simhash_pairs: rows=%d %.2fs" % (n, time.time()-t0))
