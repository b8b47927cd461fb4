import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from crypto_market_tracker_etl_spark.session import get_session
from crypto_market_tracker_etl_spark import queries as qmod
SF="/root/testdata/sf0.1"
conf = {}
if os.environ.get("PF") == "false":
    conf = {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ.get("ADV", "64m")}
spark = get_session(app_name="probe", extra_conf=conf); spark.sparkContext.setLogLevel("ERROR")
reg = qmod.queries()
reg["kpis"](spark, SF).write.format("noop").mode("overwrite").save()
names = ["tpch_q1","rrf_fusion","cluster_profile","dedup_keep_one_span","gram_novelty","collocations","bm25_topk","sequence_packing","contamination","tpch_q18","curation_pipeline","lm_perplexity_kn"]
out={}
for name in names:
    runs=[]
    for i in range(3):
        t0=time.perf_counter(); reg[name](spark,SF).write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter()-t0,3))
    out[name]=min(runs)
    print(f"{name:24s} {runs} min={min(runs):.3f}", flush=True)
print("TOTAL", round(sum(out.values()),3))
spark.stop()
