"""Similarity search over the `embeddings` table: brute-force cosine
top-k (the exact baseline) and an IVF-style partition-restricted top-k
(the scale path).

At 100 TB the brute-force variant is the per-cell scan INSIDE a coarse
quantizer; the IVF variant shows the quantizer restriction (here the
stored `label` is the cell assignment — on a real corpus a k-means job
assigns it; the search-side plan is identical). Dot products are
zip_with/aggregate over double arrays — JVM-side, Arrow-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.registry import load, load_spread, register

_N_QUERIES = 5
_TOP_K = 10


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, z: s + z)


def _embeddings(spark: SparkSession, sf: str) -> DataFrame:
    return load_spread(spark, sf, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def cosine_topk(
    queries: DataFrame, candidates: DataFrame, k: int, same_label_only: bool = False
) -> DataFrame:
    """Generic ANN kernel: broadcast the (small) query set against the
    candidate corpus, rank per query. One pass over candidates, no
    candidate shuffle until the per-query top-k reduction."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("q_norm"),
    )
    c = candidates.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("v").alias("cv"),
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("c_norm"),
    )
    cond = F.col("query_id") != F.col("neighbor_id")
    if same_label_only:
        cond = cond & (F.col("q_label") == F.col("c_label"))
    # norms are per-row columns computed before the join, not per pair
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("q_norm") * F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        c.join(F.broadcast(q), cond)
        .withColumn("__cos", cos)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__cos", 4).alias("cosine"),
            F.col("__rk").alias("rank"),
        )
    )


_ORACLE_TOPK = f"""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT * FROM e WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.v, c.v) /
             (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.v) /
                        (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) DESC,
                        c.vec_id
             ) AS rank
      FROM q JOIN e c ON q.vec_id != c.vec_id {{extra_cond}}
    )
    SELECT query_id, neighbor_id, round(cos, 4) AS cosine, rank::INTEGER AS rank
    FROM scored WHERE rank <= {_TOP_K}
"""


@register("ann_bruteforce_topk", oracle=_ORACLE_TOPK.format(extra_cond=""))
def ann_bruteforce_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × full corpus scan, per-query
    ranked reduction (TakeOrdered per group)."""
    e = _embeddings(spark, sf)
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(q, e, _TOP_K)


@register(
    "ann_ivf_topk",
    oracle=_ORACLE_TOPK.format(extra_cond="AND q.label = c.label"),
)
def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style top-k: search restricted to the query's cell
    (nprobe=1). The cell id prunes the candidate scan — on partitioned
    storage this is partition pruning, turning an O(corpus) scan into
    O(corpus / n_cells)."""
    e = _embeddings(spark, sf)
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(q, e, _TOP_K, same_label_only=True)


def kmeans_assign(e: DataFrame, k: int = 8, iters: int = 5) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column, built
    from groupBy/joins only (no MLlib dependency): centroids start at
    the k lowest vec_ids, each iteration is one broadcast-join assign +
    one groupBy-mean update. Iterative-algorithm shape: the per-round
    result is collected (k × dim doubles — metadata-sized) and re-broadcast.

    Returns (vec_id, cell) — the coarse quantizer assignment a real IVF
    index maintains (the stored `label` column stands in for this in the
    oracle-checked queries; this computes it from scratch)."""
    dim_df = e.select(F.size("v").alias("d")).limit(1).collect()
    if not dim_df:
        return e.select("vec_id", F.lit(0).alias("cell"))
    centroids = [
        (i, r["v"])
        for i, r in enumerate(e.orderBy("vec_id").limit(k).collect())
    ]

    def assign_expr(cents):
        # distances to all centroids in ONE array expression, argmin by
        # array_position of the min — each distance evaluates exactly
        # once (a least()+when chain would re-evaluate every distance)
        dists = []
        for _, cv in cents:
            lit_vec = F.array(*[F.lit(float(x)) for x in cv])
            dists.append(
                F.aggregate(
                    F.zip_with(F.col("v"), lit_vec, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda s, z: s + z,
                )
            )
        darr = F.array(*dists)
        pos = F.array_position(darr, F.array_min(darr))  # 1-based, first=lowest cid on ties
        # map position -> centroid id (ids can be sparse once a cell empties)
        cid_arr = F.array(*[F.lit(int(cid)) for cid, _ in cents])
        return F.element_at(cid_arr, pos.cast("int")).cast("int")

    assigned = None
    for _ in range(iters):
        assigned = e.withColumn("cell", assign_expr(centroids))
        # centroid update = per-(cell, dimension) mean: posexplode to
        # (cell, pos, val) and avg — built-in partial aggregation, no
        # collect_list materialization (which would hold whole cells as
        # arrays in memory; this form distributes at any corpus size)
        new_cents = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda x: x["m"]).alias("c"))
            .collect()
        )
        centroids = [(r["cell"], r["c"]) for r in sorted(new_cents, key=lambda r: r["cell"])]
    return assigned.select("vec_id", "cell")


@register("ann_kmeans_ivf")  # iterative algorithm: rows-only check (no SQL oracle)
def ann_kmeans_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF with a from-scratch k-means coarse quantizer: train cells on
    the corpus (5 Lloyd iterations, deterministic init), then top-k
    search restricted to the query's cell. The iterative trainer is the
    non-SQL-expressible part (driver records a rows-only check)."""
    e = _embeddings(spark, sf)
    cells = kmeans_assign(e, k=8, iters=2)
    indexed = e.join(cells, "vec_id").withColumn("label", F.col("cell")).drop("cell")
    q = indexed.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(q, indexed, _TOP_K, same_label_only=True)


# ---------------------------------------------------------------------- #
# random-hyperplane LSH (SimHash for real vectors), banded
# ---------------------------------------------------------------------- #

_HP_BANDS = 4
_HP_ROWS = 3  # hyperplane bits per band; 4 bands x 3 bits = 12 planes
_DIM = 64
_COS_THRESHOLD = 0.4


def _hyperplanes() -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes (integer components so
    both engines compute bit-identical double dot products). Fixed seed:
    the signature is a stable property of the vector, reproducible
    across runs and engines — the same auditability requirement as
    hash-based sampling."""
    import random

    rng = random.Random(42)
    return [[rng.randint(-1000, 1000) for _ in range(_DIM)] for _ in range(_HP_BANDS * _HP_ROWS)]


_PLANES = _hyperplanes()


def _sql_band_sig(band: int) -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_PLANES[band * _HP_ROWS + r]}::DOUBLE[]) >= 0"
        f" THEN {1 << r} ELSE 0 END)"
        for r in range(_HP_ROWS)
    )


@register(
    "ann_hyperplane_lsh",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), sig AS (
      SELECT vec_id, v,
             {", ".join(f"({_sql_band_sig(b)}) AS band{b}" for b in range(_HP_BANDS))}
      FROM e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
             AS cosine
    FROM sig a JOIN sig b
      ON a.vec_id < b.vec_id
     AND ({" OR ".join(f"a.band{b} = b.band{b}" for b in range(_HP_BANDS))})
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          >= {_COS_THRESHOLD}
    """,
)
def ann_hyperplane_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH near-neighbor pairs, banded like MinHash:
    per band, a 3-bit sign signature (collision prob (1 - theta/pi)^3);
    candidates collide in ANY band; exact cosine verifies. This is the
    embedding-space analog of dd_lsh_verify_pipeline — candidate
    generation is an equi-join on (band, band_sig), so the corpus never
    self-joins, only same-bucket groups do. The oracle writes the same
    candidate set as an OR-join (engine-checkable but quadratic); the
    Spark plan is the scale shape: explode 4 band rows per vector,
    shuffle on the bucket key, dedup pairs, then verify only candidates.
    At 100 TB signatures are computed at ingest and stored, making the
    explode a column read."""
    e = _embeddings(spark, sf).select("vec_id", "v")

    def band_sig(b: int):
        return sum(
            (
                F.when(
                    dot(
                        F.col("v"),
                        F.array(*[F.lit(float(x)) for x in _PLANES[b * _HP_ROWS + r]]),
                    )
                    >= 0,
                    F.lit(1 << r),
                ).otherwise(F.lit(0))
                for r in range(_HP_ROWS)
            ),
            start=F.lit(0),
        )

    bands = F.array(
        *[
            F.struct(F.lit(b).cast("int").alias("band"), band_sig(b).alias("bsig"))
            for b in range(_HP_BANDS)
        ]
    )
    # persist: the signature stage feeds the band self-join AND the
    # vector join-back for the verify step. Vectors are L2-normalized
    # HERE, once per vector — the verify stage then needs ONE dot per
    # candidate pair instead of three (pairs outnumber vectors ~60x with
    # 3-bit band signatures, so per-pair work dominates)
    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    s = (
        e.withColumn("bands", bands)
        .withColumn("vn", F.transform("v", lambda x: x / norm))
        .persist()
    )
    banded = s.select("vec_id", F.explode("bands").alias("b")).select(
        "vec_id", F.col("b.band").alias("band"), F.col("b.bsig").alias("bsig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    vecs = s.select("vec_id", "vn")
    cand = pairs.join(
        vecs.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("vn", "va"), "vec_a"
    ).join(vecs.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("vn", "vb"), "vec_b")
    cos = dot(F.col("va"), F.col("vb"))
    return (
        cand.withColumn("__cos", cos)
        .filter(F.col("__cos") >= _COS_THRESHOLD)
        .select("vec_a", "vec_b", F.round("__cos", 4).alias("cosine"))
    )


@register(
    "emb_label_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vecs,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS min_norm,
           round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def emb_label_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-corpus inspection: per-label vector counts and L2-norm
    distribution (the pre-flight check before cosine ops — un-normalized
    or zero vectors surface here). Norm is one map-side expression; the
    groupBy output is |labels|-sized."""
    e = _embeddings(spark, sf)
    norm = F.sqrt(dot(F.col("v"), F.col("v")))
    return (
        e.select("label", norm.alias("n2"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("n2"), 4).alias("avg_norm"),
            F.round(F.min("n2"), 4).alias("min_norm"),
            F.round(F.max("n2"), 4).alias("max_norm"),
        )
    )
