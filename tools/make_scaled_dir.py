import os, sys, shutil
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from geist_spark.session import get_spark
spark = get_spark("sfx10", **{"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
src, dst = "/root/testdata/sf0.1", "/tmp/sfx10"
shutil.rmtree(dst, ignore_errors=True); os.makedirs(dst)
def scale(name, idc, n=10):
    df = spark.read.parquet(f"{src}/{name}.parquet")
    mx = df.agg(F.max(idc)).collect()[0][0] + 1
    out = None
    for i in range(n):
        part = df.withColumn(idc, F.col(idc) + F.lit(i * mx))
        out = part if out is None else out.unionByName(part)
    out.repartition(8).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    print(name, "x%d" % n, "rows:", spark.read.parquet(f"{dst}/{name}.parquet").count())
scale("documents", "doc_id")
scale("embeddings", "vec_id")
scale("customer", "c_custkey")
