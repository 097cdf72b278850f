from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.queries import load_all
from big_data_lab_three_spark.plans import explain_str
REG = load_all()
spark = get_spark()
df = REG["pricing_summary"].spark(spark, "/root/testdata/sf0.001")
df.write.format("noop").mode("overwrite").save()
s = explain_str(df)
print("has WholeStageCodegen:", "WholeStageCodegen" in s)
print(s[:1200])
