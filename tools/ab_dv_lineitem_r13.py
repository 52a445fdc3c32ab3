import sys, os, time, shutil, json
sys.path.insert(0,"/root/repo")
from pyspark.sql import functions as F
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.lakehouse import LakeTable
from appstore_aws_etl_spark.session import get_spark

spark = get_spark("ab_dv2", shuffle_partitions=32, extra_conf={"spark.ui.showConsoleProgress":"false"})
FIX = "/tmp/bench10x/x100"
li = load(spark, FIX, "lineitem").select("l_orderkey","l_linenumber","l_partkey","l_quantity","l_extendedprice","l_shipdate")
n = li.count(); print("rows:", n)

def build(root):
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root, li.schema, stats_cols=["l_orderkey"])
    for part in range(4):
        t.append(li.filter(F.col("l_orderkey") % 4 == part))
    return t

PRED = "l_partkey % 99991 = 7"
res = {}
for mode in ["cow", "dv"]:
    t = build(f"/tmp/ab_dv2_{mode}")
    sn = t.snapshot(); n_files = len(sn.files); tot_b = sum(f.size for f in sn.files)
    t0 = time.perf_counter()
    (t.delete_where_dv if mode=="dv" else t.delete_where)(PRED)
    dml = round(time.perf_counter()-t0, 3)
    t0 = time.perf_counter(); c = t.scan().count(); s1 = round(time.perf_counter()-t0,3)
    t0 = time.perf_counter(); t.scan().count(); s2 = round(time.perf_counter()-t0,3)
    res[mode] = {"files": n_files, "table_mb": round(tot_b/1e6,1), "delete_s": dml,
                 "post_scan_s": min(s1,s2), "rows_after": c}
    print(mode, json.dumps(res[mode]), flush=True)
json.dump({"date":"2026-08-17","fixture":FIX,"predicate":PRED,"table":"lineitem 60M rows",
           "results":res}, open("/root/repo/AB_DV2_r13.json","w"), indent=1)
spark.stop()
