import json, os
import duckdb
from pyspark.sql import functions as F
from pyspark.sql import types as T
from big_data_lab_three_spark.session import get_spark

spark = get_spark()
d = "/tmp/dbg_stream2"
os.system(f"rm -rf {d}"); os.makedirs(d)
# two shards with plain µs timestamps
duckdb.sql(f"""
COPY (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM '/root/testdata/sf0.001/events.parquet'
      WHERE ts > TIMESTAMP '2024-01-15') TO '{d}/events1.parquet' (FORMAT PARQUET)
""")
duckdb.sql(f"""
COPY (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      FROM '/root/testdata/sf0.001/events.parquet'
      WHERE ts <= TIMESTAMP '2024-01-15') TO '{d}/events2.parquet' (FORMAT PARQUET)
""")
os.utime(f"{d}/events1.parquet", (1_000_000, 1_000_000))
os.utime(f"{d}/events2.parquet", (2_000_000, 2_000_000))

schema = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])
raw = (spark.readStream.schema(schema)
       .option("maxFilesPerTrigger", "1").option("latestFirst", "false").parquet(d))
res = (raw.withWatermark("ts", "2 hours")
       .groupBy(F.window("ts", "1 hour"), "event_type")
       .agg(F.count(F.lit(1)).alias("n")))
q = (res.writeStream.format("memory").queryName("dbg2").outputMode("append")
     .trigger(availableNow=True).start())
q.awaitTermination()
for p in q.recentProgress:
    print(json.dumps({"batchId": p["batchId"], "rows": p["numInputRows"],
                      "wm": p.get("eventTime", {}).get("watermark"),
                      "droppedByWatermark": p["stateOperators"][0]["numRowsDroppedByWatermark"] if p["stateOperators"] else None}))
print("total:", spark.table("dbg2").agg(F.sum("n")).first()[0])
