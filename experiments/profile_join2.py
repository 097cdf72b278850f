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
p = simhash_pairs(base)
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    p.explain("formatted")
plan = buf.getvalue()
# count occurrences of the simhash building blocks in the plan
print("plan length:", len(plan))
print("xxhash occurrences:", plan.count("xxhash64"))
print("filter-lambda occurrences:", plan.count("filter("))
print("join section:")
for line in plan.splitlines():
    if "Join" in line or "Exchange" in line or "Arguments" in line and "Join" in line:
        print("  ", line[:200])
