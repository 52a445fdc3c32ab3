"""DV-vs-CoW delete A/B (AB_DV_r13 / AB_DV2_r13): identical tables, one
scattered delete per mode, post-delete scan cost recorded — the merge-on-read
trade measured, not asserted. See BASELINE.md round-13 DV section."""
import sys, os, time, shutil, json, statistics
sys.path.insert(0,"/root/repo")
from pyspark.sql import functions as F
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.lakehouse import LakeTable
from appstore_aws_etl_spark.session import get_spark

spark = get_spark("ab_dv", shuffle_partitions=32, extra_conf={"spark.ui.showConsoleProgress":"false"})
FIX = "/tmp/bench10x/x100"
cust = load(spark, FIX, "customer").select("c_custkey","c_name","c_nationkey","c_acctbal","c_mktsegment")
print("rows:", cust.count())

def build(root):
    shutil.rmtree(root, ignore_errors=True)
    t = LakeTable.create(spark, root, cust.schema, cluster_by=["c_nationkey"], stats_cols=["c_nationkey","c_custkey"])
    for part in range(8):
        t.append(cust.filter(F.col("c_custkey") % 8 == part))
    return t

PRED = "c_custkey % 9973 = 0"   # ~150 scattered rows, hits every file
res = {}
for mode in ["warm", "cow", "dv"]:
    t = build(f"/tmp/ab_dv_{mode}")
    n_files = len(t.snapshot().files)
    t0 = time.perf_counter()
    if mode == "dv":
        t.delete_where_dv(PRED)
    else:
        t.delete_where(PRED)
    dml = round(time.perf_counter()-t0, 3)
    t0 = time.perf_counter(); c = t.scan().count(); scan1 = round(time.perf_counter()-t0,3)
    t0 = time.perf_counter(); t.scan().count(); scan2 = round(time.perf_counter()-t0,3)
    if mode != "warm":
        res[mode] = {"files": n_files, "delete_s": dml, "post_scan_s": min(scan1,scan2), "rows_after": c}
        print(mode, json.dumps(res[mode]), flush=True)
json.dump({"date":"2026-08-17","fixture":FIX,"predicate":PRED,
           "note":"identical 1.5M-row 8-file tables; scattered ~150-row delete; warm build discarded",
           "results":res}, open("/root/repo/AB_DV_r13.json","w"), indent=1)
spark.stop()
