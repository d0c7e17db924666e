"""Round-11 profiling: where do dd_cluster_components, ann_ivfpq_adc,
and the five over-scheduled small-input queries spend their time?

Phase-split timings with labelled jobs (guide §1.5), run at sf0.1 on a
quiet window. Timings to stderr; nothing here feeds the bench.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from fluss_spark import registry  # noqa: E402
from fluss_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:55s} {dt:8.3f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    registry.load_all_queries()
    spark = get_spark("prof_r11")
    sc = spark.sparkContext

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "cc"):
        # dd_cluster_components phase split
        from fluss_spark.operators import dedup

        sc.setJobDescription("cc: shingle_base")
        base = t("cc shingle_base (cached stage)", lambda: dedup.shingle_base(spark, SF))
        t("cc shingle_base count", lambda: base.count())
        sc.setJobDescription("cc: full query warm1")
        q = registry.QUERIES["dd_cluster_components"]
        t("dd_cluster_components run1 (after stage warm)", lambda: q(spark, SF).count())
        t("dd_cluster_components run2", lambda: q(spark, SF).count())
        # isolate the block_pairs kernel
        base2 = dedup.shingle_base(spark, SF).select(
            "doc_id", "lang", "source", F.col("ids").alias("s")
        ).filter(F.col("lang").isNotNull() & F.col("source").isNotNull())
        import pandas as pd  # noqa: F401

        thr = dedup._CLUSTER_JACCARD

        def block_pairs(pdf):
            import pandas as pd
            ids = pdf["doc_id"].to_numpy()
            sets = [frozenset(s) for s in pdf["s"]]
            out_a, out_b = [], []
            n = len(ids)
            for i in range(n):
                si = sets[i]
                li = len(si)
                for j in range(i + 1, n):
                    inter = len(si & sets[j])
                    if inter and inter / (li + len(sets[j]) - inter) >= thr:
                        a, b = ids[i], ids[j]
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
            return pd.DataFrame({"a": pd.Series(out_a, dtype="int64"),
                                 "b": pd.Series(out_b, dtype="int64")})

        sc.setJobDescription("cc: block_pairs kernel only")
        jp = base2.groupBy("lang", "source").applyInPandas(block_pairs, "a long, b long")
        t("cc block_pairs kernel only (noop)", lambda: noop(jp))
        t("cc block_pairs kernel only again", lambda: noop(jp))
        # block size distribution
        print(base2.groupBy("lang", "source").count().orderBy(F.desc("count")).limit(5).collect())

    if which in ("all", "ivfpq"):
        from fluss_spark.operators import similarity as sim

        e = sim._embeddings(spark, SF)
        sc.setJobDescription("ivfpq: train+pack")
        t("pq train+pack (cold)", lambda: sim._pq_train_pack(spark, e, cache_key=None))
        t("pq train+pack (cold again)", lambda: sim._pq_train_pack(spark, e, cache_key=None))
        cb, packed = sim._pq_train_pack(spark, e, cache_key=(sim._skey(spark), SF))
        sc.setJobDescription("ivfpq: search only")
        t("ivfpq search only (warm index)",
          lambda: sim._pq_adc_search(spark, e, packed, cb, same_cell_only=True).count())
        t("ivfpq search only again",
          lambda: sim._pq_adc_search(spark, e, packed, cb, same_cell_only=True).count())

    if which in ("all", "small"):
        # over-scheduled small queries: warm run + first-stage task counts
        for name in ("dd_exact", "tx_curation_pipeline", "tx_bpe_train",
                     "mm_decode_metadata"):
            q = registry.QUERIES[name]
            sc.setJobDescription(f"small: {name}")
            t(f"{name} run1", lambda q=q: q(spark, SF).count())
            t(f"{name} run2", lambda q=q: q(spark, SF).count())

    print("defaultParallelism:", sc.defaultParallelism)
    print("shuffle.partitions:", spark.conf.get("spark.sql.shuffle.partitions"))


if __name__ == "__main__":
    main()
