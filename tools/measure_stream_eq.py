"""Phase breakdown of curation_stream_eq / curation_delete_eq (the two
sweep monsters: 53 s / 57 s in the committed r12 detail). Times each
process_batch, delete_docs, compact, and the final clean+noop separately
so the optimization targets the measured phase, not a guess (guide §1).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_tracker_etl_spark.session import get_session  # noqa: E402
from crypto_market_tracker_etl_spark.queries_ext import (  # noqa: E402
    _augmented_corpus,
    _documents,
)
from crypto_market_tracker_etl_spark.functions.textstats import (  # noqa: E402
    normalize_ws,
)
from crypto_market_tracker_etl_spark.plans.curation_stream import (  # noqa: E402
    CurationStream,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WHICH = sys.argv[1] if len(sys.argv) > 1 else "stream"  # stream|delete


def main() -> None:
    spark = get_session(app_name="measure_stream_eq")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _augmented_corpus(spark, SF_DIR).unionByName(
        _documents(spark, SF_DIR).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            "source",
            normalize_ws(F.col("text")).alias("text"),
        )
    )
    # warmup
    corpus.write.format("noop").mode("overwrite").save()
    run_token = hashlib.md5(
        f"{SF_DIR}|measure|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:12]
    store = os.path.join(tempfile.gettempdir(), "measure_eq_" + run_token)
    shutil.rmtree(store, ignore_errors=True)

    t_all = time.perf_counter()
    cs = CurationStream(spark, store)
    marks = [("init", time.perf_counter() - t_all)]

    def mark(label, t0):
        marks.append((label, time.perf_counter() - t0))

    for bid, rem in enumerate((2, 1, 0)):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"process_batch {bid}")
        cs.process_batch(corpus.filter(F.col("doc_id") % 3 == rem), batch_id=bid)
        mark(f"batch{bid}", t0)
    if WHICH == "stream":
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("retry batch 1")
        cs.process_batch(corpus.filter(F.col("doc_id") % 3 == 1), batch_id=1)
        mark("retry_b1", t0)
    else:
        victims = corpus.select("doc_id").where(
            (F.col("doc_id") % 100 == 7)
            | ((F.col("doc_id") % 100 == 11) & (F.col("doc_id") < 100000))
        )
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription("delete_docs")
        cs.delete_docs(victims)
        mark("delete_docs", t0)
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("compact")
    cs.compact()
    mark("compact", t0)
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("clean+noop")
    cs.clean().select(
        "doc_id", "source", F.col("n_tok").cast("long").alias("n_tok"),
        "content_fp",
    ).write.format("noop").mode("overwrite").save()
    mark("clean_noop", t0)
    total = time.perf_counter() - t_all
    for label, sec in marks:
        print(f"{label:12s} {sec:7.3f}s")
    print(f"{'TOTAL':12s} {total:7.3f}s")
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
