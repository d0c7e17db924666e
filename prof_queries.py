"""Scratch profiler: first-run vs warm-run split for selected queries.

First run pays the engine-table build (variant cache cold); the warm run
is pure query compute. Not part of the suite.
"""

import os
import sys
import time

from pyspark.sql import SparkSession

names = sys.argv[1:] or [
    "ann_incremental_ivf",
    "tx_dsir_resample",
    "tx_bigram_logloss",
    "tx_bpe_encode",
    "fn_cms_topk_estimate",
    "fn_bloom_membership",
    "dd_cluster_components",
    "dd_cdc_spans",
    "mm_audio_segment",
    "a2_minmax_snapshot",
    "a2_minmax_metadata",
    "dd_url_normalize",
    "dd_ngram_jaccard",
    "ann_ivf_nprobe",
    "emb_pca_topcomponent",
    "emb_outliers",
]

sys.path.insert(0, "/root/repo")
from fluss_spark import registry  # noqa: E402
from fluss_spark.session import get_spark  # noqa: E402

registry.load_all_queries()
spark = get_spark("prof_queries")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# same warmups as bench.py (JVM, python workers)
spark.read.parquet(f"{sf}/region.parquet").count()
spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
    spark.sparkContext.defaultParallelism
).mapInPandas(lambda it: it, schema="id long").count()

for name in names:
    fn = registry.QUERIES[name]
    spark.sparkContext.setJobDescription(f"{name}: first")
    t0 = time.perf_counter()
    n = fn(spark, sf).count()
    t1 = time.perf_counter()
    spark.sparkContext.setJobDescription(f"{name}: warm")
    m = fn(spark, sf).count()
    t2 = time.perf_counter()
    spark.sparkContext.setJobDescription(None)
    print(
        f"{name:28s} first={t1 - t0:7.2f}s warm={t2 - t1:7.2f}s "
        f"build~={t1 - t0 - (t2 - t1):7.2f}s rows={n}",
        flush=True,
    )
