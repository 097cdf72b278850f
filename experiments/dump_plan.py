from big_data_lab_three_spark.session import get_spark
from big_data_lab_three_spark.queries import load_all
REG = load_all()
spark = get_spark()
df = REG["pricing_summary"].spark(spark, "/root/testdata/sf0.001")
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    df.explain("formatted")
print(buf.getvalue()[:3000])
