import json, os
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.streaming import windowed_event_counts
from big_data_lab_three_spark.streaming.jobs import EVENTS_SCHEMA

spark = get_spark()
sf_dir = "/root/testdata/sf0.001"
t = pq.read_table(f"{sf_dir}/events.parquet")
med = int(pc.quantile(t["ts"].cast("int64"), q=0.5)[0].as_py())
mask = pc.greater(t["ts"].cast("int64"), med)
d = "/tmp/dbg_stream"
os.system(f"rm -rf {d}"); os.makedirs(d)
pq.write_table(t.filter(mask), f"{d}/events1.parquet", version="2.6")
pq.write_table(t.filter(pc.invert(mask)), f"{d}/events2.parquet", version="2.6")
os.utime(f"{d}/events1.parquet", (1_000_000, 1_000_000))
os.utime(f"{d}/events2.parquet", (2_000_000, 2_000_000))

spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
raw = (spark.readStream.schema(EVENTS_SCHEMA)
       .option("maxFilesPerTrigger", "1").option("latestFirst", "false").parquet(d))
stream = raw.withColumn("ts_utc", F.timestamp_micros(F.expr("ts div 1000")))
res = windowed_event_counts(stream, "1 hour", "2 hours")
q = (res.writeStream.format("memory").queryName("dbg").outputMode("append")
     .trigger(availableNow=True).start())
q.awaitTermination()
for p in q.recentProgress:
    print(json.dumps({
        "batchId": p["batchId"], "numInputRows": p["numInputRows"],
        "eventTime": p.get("eventTime", {}),
        "files": [s.get("endOffset") for s in p["sources"]],
    }))
print("total:", spark.table("dbg").agg(F.sum("n")).first()[0])
