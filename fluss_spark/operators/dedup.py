"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB: every variant is a bounded-output, shuffle-on-key
plan — shingle/minhash/signature computation is per-row (map-side, JVM
array/md5 built-ins, no Python), candidate generation is an equi-join on
a band/bucket/block key (never an unblocked cross join), and exact
verification runs only on candidates. md5 is the shared hash so the
DuckDB oracle reproduces byte-identical signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.operators.text import _SQL_TOKENS, tokens
from fluss_spark.registry import load, load_spread, register

# ---------------------------------------------------------------------- #
# shared shingling
# ---------------------------------------------------------------------- #

_SHINGLE = 3  # words per shingle

# DuckDB: 3-word shingles from the token array
_SQL_SHINGLES = f"""
    list_distinct([
        list_aggregate(toks[i : i + {_SHINGLE} - 1], 'string_agg', ' ')
        for i in range(1, len(toks) - {_SHINGLE} + 2)
    ])
"""

# DuckDB: 32-bit integer id per shingle (shared PRF: first 8 hex of md5)
_SQL_SHINGLE_IDS = "list_distinct(list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT))"


# Shingle derivation (k-word windows, first-occurrence-distinct, id =
# first 8 md5 hex digits as int) and MinHash signatures both run inside
# the Arrow kernels below; the SQL formulations the oracles use are
# _SQL_SHINGLES/_SQL_SHINGLE_IDS above.



def shingle_base(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, lang, source, ids) — the corpus's distinct shingle-id
    arrays, computed ONCE per session+sf and persisted. Every dedup
    operator derives from this stage; at corpus scale it is the
    signatures-at-ingest table (computed by the write path, stored as a
    column), so sharing it here mirrors the production dataflow rather
    than an artificial cache. Each derivation is staged as a real column
    (Catalyst does not CSE subtrees repeated inside lambdas), and the
    filter is phrased on the cheap token count so it does not inline the
    shingle HOF chain into a pushed-down predicate."""
    from fluss_spark import cache_registry

    return cache_registry.cache_df(
        spark, ("shingle_base", sf), lambda: _shingle_base_plan(spark, sf)
    )


def _shingle_base_plan(spark: SparkSession, sf: str) -> DataFrame:
    d = load_spread(spark, sf, "documents")
    # Arrow kernel, not the HOF chain: the interpreted
    # transform(md5→conv) lambda costs ~25x the same work in a pandas
    # batch (measured 7.0s vs 0.28s at 5k docs) — per-shingle md5 through
    # an interpreted lambda never enters whole-stage codegen. The kernel
    # reproduces the JVM/oracle semantics BIT-EXACTLY: trim = ASCII
    # spaces (Spark/DuckDB trim), split on \s+, first-occurrence-distinct
    # shingles (array_distinct order), id = int(md5(utf8)[:8hex]) — the
    # engine's shared PRF — so every SQL oracle that recomputes ids from
    # text still hash-matches.
    k = _SHINGLE

    def kern(it):
        import hashlib
        import re

        import pandas as pd

        # re.ASCII: Java regex \s and DuckDB's RE2 \s are ASCII-only;
        # Python's default Unicode \s would also split on U+00A0 etc.
        # and silently diverge from the JVM/oracle tokenization
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in it:
            out_doc, out_lang, out_src, out_ids = [], [], [], []
            for did, lang, src, text in zip(
                pdf["doc_id"], pdf["lang"], pdf["source"], pdf["text"]
            ):
                if text is None:
                    continue
                t = text.strip(" ").lower()
                tok = ws.split(t) if t else []
                if len(tok) < k:
                    continue
                sh = dict.fromkeys(
                    " ".join(tok[i : i + k]) for i in range(len(tok) - k + 1)
                )
                ids = dict.fromkeys(
                    int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in sh
                )
                out_doc.append(did)
                out_lang.append(lang)
                out_src.append(src)
                out_ids.append(list(ids))
            yield pd.DataFrame(
                {"doc_id": out_doc, "lang": out_lang, "source": out_src, "ids": out_ids}
            )

    # persist + eager materialization happen in the cache registry:
    # most dedup plans consume the base 2-3 times in ONE job (edge
    # kernel + exact edges + node list); tasks racing a cold cache
    # each compute the kernel lineage
    return d.select("doc_id", "lang", "source", "text").mapInPandas(
        kern, "doc_id long, lang string, source string, ids array<long>"
    )


# ---------------------------------------------------------------------- #
# exact dedup (hash groupBy)
# ---------------------------------------------------------------------- #


@register(
    "dd_exact",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           count(*) AS n_docs,
           min(doc_id) AS canonical_id
    FROM documents
    GROUP BY 1
    HAVING count(*) >= 1
    """,
)
def dd_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: group by normalized-text hash, elect the minimum
    doc_id as canonical. One shuffle on the 16-byte key; at 100 TB this
    is the cheapest possible full-corpus dedup.

    Plain load, not load_spread: the per-row work is one md5 — it rides
    the scan at any corpus size (file count provides the parallelism at
    scale), and the forced cores-wide spread only over-schedules the
    tiny test inputs (the driver's 8-vs-32-core ratio was 0.48 — faster
    on FEWER cores; measured at 32 cores: 0.48s spread vs 0.29s plain).
    The spread crutch stays for the heavy per-row kernels (shingling,
    signatures) that genuinely need pre-compute parallelism at test SF."""
    d = load(spark, sf, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast("binary"))
    return (
        d.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


# ---------------------------------------------------------------------- #
# MinHash + LSH banding
# ---------------------------------------------------------------------- #

_K_HASHES = 8
_BAND_ROWS = 2  # baseline: 4 bands of 2 (rows per band widen with corpus)
# corpus size where the baseline band width starts widening (far above
# every oracle-checked SF; documents tops out at 5k rows in testdata)
_MH_BASE_N = 65536

# universal hashing family h_i(u) = (A_i*u + B_i) mod P over the 32-bit
# shingle ids; A_i < 2^30 keeps A*u < 2^62 (exact in int64 on both engines)
_P = 4294967311  # prime > 2^32


def _ab(k: int) -> list[tuple[int, int]]:
    """First k (A, B) pairs of the hash family — a wider signature
    extends the narrow one (same sequence prefix)."""
    return [
        (((2654435761 * (i + 1)) % (2**30)) | 1, (40503 * (i + 7)) % (2**30))
        for i in range(k)
    ]


_AB = _ab(_K_HASHES)


def lsh_params(sf: str) -> tuple[int, int]:
    """(rows_per_band, n_bands) derived from the corpus row count (free
    Parquet-footer metadata — the same read A1's count(*) pushdown uses).
    Bands stay fixed (the recall lever); rows per band widen by 1 per 4x
    corpus beyond _MH_BASE_N, so the expected false-positive candidate
    mass n^2 * E[s]^rows stays ~linear in n (holds while random-pair
    similarity E[s] <= 1/16 — far above real corpus values; measured
    E[s] ~ 0.01 on the documents table). In the oracle-checked domain
    (n < 64k) the derived width equals the baseline the SQL oracles are
    parameterized with."""
    import math

    from fluss_spark.registry import corpus_rows

    n = corpus_rows(sf, "documents")
    extra = max(0, math.ceil(math.log2(max(1.0, n / _MH_BASE_N)) / 2))
    return _BAND_ROWS + extra, _K_HASHES // _BAND_ROWS


def sig_stage(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, ids, sig) — the corpus's MinHash signatures, computed
    ONCE per session+sf+width and persisted through the cache registry
    (budgeted, LRU-unpersisted), like shingle_base: at corpus scale
    this is the signatures-at-ingest column the write path maintains.
    Four operators (minhash_lsh, lsh_canonical, lsh_verify_pipeline,
    minhash_estimate) consume the identical signature; without the
    shared stage each recomputed the k-hash map over every shingle
    array."""
    from fluss_spark import cache_registry

    r_rows, n_bands = lsh_params(sf)
    k = r_rows * n_bands
    return cache_registry.cache_df(
        spark, ("sig_stage", sf, k), lambda: _sig_stage_plan(spark, sf, k)
    )


def _sig_stage_plan(spark: SparkSession, sf: str, k: int) -> DataFrame:
    # numpy kernel, not the minhash_signature HOF: k interpreted
    # array_min(transform(...)) lambdas per row never enter codegen; the
    # kernel computes the same (A_i*u + B_i) mod P minima as one
    # vectorized (k x |ids|) int64 op per row — exact (A < 2^30,
    # u < 2^32 keeps A*u < 2^62), so the SQL oracles still hash-match.
    ab = _ab(k)

    def kern(it):
        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in ab], dtype=np.int64)[:, None]
        B = np.array([b for _, b in ab], dtype=np.int64)[:, None]
        for pdf in it:
            sigs = [
                ((A * np.asarray(ids, dtype=np.int64) + B) % _P).min(axis=1).tolist()
                for ids in pdf["ids"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "ids": pdf["ids"], "sig": sigs}
            )

    # persist + eager materialization happen in the cache registry
    # (multi-consumer first jobs must not race a cold cache)
    return (
        shingle_base(spark, sf)
        .select("doc_id", "ids")
        .mapInPandas(kern, "doc_id long, ids array<long>, sig array<long>")
    )


def banded_signature(sig: Column, n_bands: int, r_rows: int) -> Column:
    """array<struct<band int, band_sig string>>: md5 over the '|'-joined
    rows of each band — the bucket key for the LSH equi-join. Shared by
    every banded operator so the banding layout has one definition."""
    return F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(sig, b * r_rows + 1, r_rows),
                            lambda x: x.cast("string"),
                        ),
                        "|",
                    ).cast("binary")
                ).alias("band_sig"),
            )
            for b in range(n_bands)
        ]
    )


_SQL_MINHASH = "[" + ", ".join(
    f"list_min(list_transform(ids, u -> ({a} * u + {b}) % {_P}))" for a, b in _AB
) + "]"


@register(
    "dd_minhash_lsh",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    )
    SELECT b AS band, band_sig, count(*) AS n_docs, min(doc_id) AS min_doc_id
    FROM bands
    GROUP BY 1, 2
    HAVING count(*) > 1
    """,
)
def dd_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → k minhashes → band
    signatures → buckets with >1 doc. Output is candidate buckets
    (bounded), not the quadratic pair list; exact verification joins on
    the bucket (see dd_ngram_jaccard for the verify step). Band width
    derives from the corpus row count (lsh_params), so candidate volume
    stays ~linear as the corpus grows."""
    r_rows, n_bands = lsh_params(sf)
    staged = sig_stage(spark, sf).select("doc_id", "sig")
    bands = banded_signature(F.col("sig"), n_bands, r_rows)
    return (
        staged.select("doc_id", F.explode(bands).alias("b"))
        .groupBy(F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
        .select(F.col("band").cast("long"), "band_sig", "n_docs", "min_doc_id")
    )


# ---------------------------------------------------------------------- #
# SimHash
# ---------------------------------------------------------------------- #

_SIMHASH_BITS = 16


@register(
    "dd_simhash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_SQL_TOKENS}) AS toks FROM documents
    ), bits AS (
      SELECT doc_id, b,
             sum(CASE WHEN (('0x' || substr(md5(tok), 1, 4))::INTEGER >> b) & 1 = 1
                      THEN 1 ELSE -1 END) AS w
      FROM t, unnest(toks) u(tok), range(0, {_SIMHASH_BITS}) r(b)
      GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN w > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dd_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash fingerprint: per-token 16-bit md5 hash, bitwise
    majority vote over distinct tokens. Near-dups have small Hamming
    distance; equal fingerprints are dup candidates. Pure array
    expressions — the per-doc work is O(tokens × bits) map-side."""
    d = load_spread(spark, sf, "documents")
    tok = F.array_distinct(tokens(F.col("text")))
    hashes = F.transform(
        tok, lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 4), 16, 10).cast("int")
    )
    def _vote(b: int) -> Column:
        # majority vote on bit b over all token hashes
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )

    simhash = sum(
        (F.when(_vote(b) > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(_SIMHASH_BITS)),
        start=F.lit(0),
    )
    return d.select("doc_id", simhash.cast("long").alias("simhash"))


# ---------------------------------------------------------------------- #
# n-gram Jaccard (blocked exact verification)
# ---------------------------------------------------------------------- #


@register(
    "dd_ngram_jaccard",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, lang, source, {_SQL_SHINGLES} AS sh
      FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, lang, source, {_SQL_SHINGLE_IDS} AS s FROM s0 WHERE len(sh) > 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.s, b.s))::DOUBLE /
                 (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4) AS jaccard
    FROM s1 a JOIN s1 b
      ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.05
    """,
)
def dd_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard similarity on (lang, source)-blocked pairs —
    the verify stage after LSH blocking. The join key bounds the pair
    count; shingle sets ride the shuffle as arrays and intersect
    JVM-side."""
    # both sides of the self-join read the shared persisted shingle stage
    base = shingle_base(spark, sf).select(
        "doc_id", "lang", "source", F.col("ids").alias("s")
    )
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    union = F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("__jac", inter.cast("double") / union)  # computed once per pair
        .filter(F.col("__jac") >= 0.05)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round("__jac", 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------- #
# embedding-cosine near-dup
# ---------------------------------------------------------------------- #


@register(
    "dd_embedding_cosine",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3
    """,
)
def dd_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup: cosine over label-blocked pairs (the label is
    the coarse quantizer / blocking key — at scale this is the
    LSH-or-IVF cell id). Per-block verification is one chunked BLAS
    matmul (cosine_pairs_kernel); only pairs above the threshold leave
    the kernel, so the shuffle moves ~|result| rows."""
    from fluss_spark.operators.similarity import cosine_pairs_kernel

    # NULL blocking keys never pair: the oracle's equi-join drops them
    # (NULL = NULL is false), but groupBy would collect them into one
    # giant unblocked group
    e = (
        load_spread(spark, sf, "embeddings")
        .filter(F.col("label").isNotNull())
        .select("vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    )
    pairs = e.groupBy("label").applyInPandas(
        cosine_pairs_kernel(0.3, id_col="vec_id", vec_col="v", normalize=True),
        "vec_a long, vec_b long, cosine double",
    )
    return pairs.select("vec_a", "vec_b", F.round("cosine", 4).alias("cosine"))


@register(
    "dd_lsh_verify_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, ids, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, ids, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.ids AS ia, b.ids AS ib
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(len(list_intersect(ia, ib))::DOUBLE /
                 (len(ia) + len(ib) - len(list_intersect(ia, ib))), 4) AS jaccard
    FROM cand
    WHERE len(list_intersect(ia, ib))::DOUBLE /
          (len(ia) + len(ib) - len(list_intersect(ia, ib))) >= 0.2
    """,
)
def dd_lsh_verify_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The canonical two-stage near-dup pipeline: LSH banding generates
    candidate pairs (equi-join on band signature — sub-quadratic), exact
    n-gram Jaccard verifies them. Only candidates pay the verify cost;
    at corpus scale this is the shape that replaces the O(n^2) scan."""
    r_rows, n_bands = lsh_params(sf)
    # shared persisted signature stage: feeds BOTH the band self-join
    # and the ids join-back (and the other three LSH operators).
    # MEMORY_AND_DISK default: a 100 TB corpus spills instead of OOMing.
    staged = sig_stage(spark, sf)
    bands = banded_signature(F.col("sig"), n_bands, r_rows)
    # candidate pairs over (doc_id, band_sig) ONLY — the heavy shingle-id
    # arrays join in afterwards, once per deduped pair, instead of riding
    # the band self-join (which multiplies pairs per shared band)
    banded = staged.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ids = staged.select("doc_id", "ids")
    cand = (
        pairs.join(ids.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("ids", "ia"), "doc_a")
        .join(ids.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("ids", "ib"), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("ia"), F.col("ib")))
    union = F.size(F.col("ia")) + F.size(F.col("ib")) - inter
    return (
        cand.withColumn("__jac", inter.cast("double") / union)
        .filter(F.col("__jac") >= 0.2)
        .select("doc_a", "doc_b", F.round("__jac", 4).alias("jaccard"))
    )


@register(
    "dd_contamination",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), bench AS (
      SELECT DISTINCT unnest(ids) AS sid FROM s1 WHERE doc_id % 100 = 0
    ), expanded AS (
      SELECT doc_id, unnest(ids) AS sid FROM s1
    )
    SELECT e.doc_id, count(*) AS n_matched
    FROM expanded e JOIN bench b ON e.sid = b.sid
    GROUP BY e.doc_id
    """,
)
def dd_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination check: count how many of each document's
    n-gram shingles appear in a held-out benchmark set (here: every
    100th doc stands in for the eval suite). The benchmark shingle set
    is small by construction, so it BROADCASTS — the corpus side stays
    map-side (explode + broadcast-hash-join + partial count), no shuffle
    of the 100 TB side at all."""
    sb = shingle_base(spark, sf)
    # the explode reads the PERSISTED shingle column — inlining the
    # shingle HOF chain under a generator re-evaluates it per output row
    # (measured ~10x on this query)
    bench = (
        sb.filter(F.col("doc_id") % 100 == 0)
        .select(F.explode("ids").alias("sid"))
        .distinct()
    )
    expanded = sb.select("doc_id", F.explode("ids").alias("sid"))
    return (
        expanded.join(F.broadcast(bench), on="sid", how="inner")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )


@register(
    "dd_lsh_canonical",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), mins AS (
      SELECT b, band_sig, min(doc_id) AS m FROM bands GROUP BY b, band_sig
    )
    SELECT bands.doc_id, min(mins.m) AS canonical_id,
           (min(mins.m) <> bands.doc_id) AS is_duplicate
    FROM bands JOIN mins ON bands.b = mins.b AND bands.band_sig = mins.band_sig
    GROUP BY bands.doc_id
    """,
)
def dd_lsh_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-safe dedup DECISION step: assign each doc the minimum
    doc_id over all its LSH buckets (one round of min-label
    propagation). Output is exactly one row per document — unlike the
    pair list, which is quadratic per duplicate cluster (measured: a
    corpus of 100-copy clusters makes the pair form emit 27M rows for
    500k docs, while this emits 500k). Plan: the bucket minimum is a
    window over (band, band_sig) — ONE shuffle of the banded rows, no
    self-join or join-back (measured 56s vs 81s for the groupBy+join
    form at 500k docs); the per-doc min is the second, final shuffle. Docs
    whose canonical differs transitively converge by iterating this
    round to fixpoint (the iterative variant is the same job in a
    loop)."""
    r_rows, n_bands = lsh_params(sf)
    staged = sig_stage(spark, sf).select("doc_id", "sig")
    bands = banded_signature(F.col("sig"), n_bands, r_rows)
    banded = staged.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )
    w = Window.partitionBy("band", "band_sig")
    return (
        banded.withColumn("m", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("m").alias("canonical_id"))
        .withColumn("is_duplicate", F.col("canonical_id") != F.col("doc_id"))
    )


@register(
    "tx_split_leakage_safe",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), mins AS (
      SELECT b, band_sig, min(doc_id) AS m FROM bands GROUP BY b, band_sig
    ), canon AS (
      SELECT bands.doc_id, min(mins.m) AS canonical_id
      FROM bands JOIN mins ON bands.b = mins.b AND bands.band_sig = mins.band_sig
      GROUP BY bands.doc_id
    ), assigned AS (
      SELECT d.doc_id, coalesce(c.canonical_id, d.doc_id) AS cluster_id,
             length(d.text) AS n_chars
      FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id
    ), sp AS (
      SELECT cluster_id, n_chars,
             ('0x' || substr(md5(cluster_id::VARCHAR), 1, 8))::BIGINT % 10 AS bkt
      FROM assigned
    )
    SELECT CASE WHEN bkt < 8 THEN 'train' WHEN bkt = 8 THEN 'valid' ELSE 'test' END AS split,
           count(*) AS n_docs,
           count(DISTINCT cluster_id) AS n_clusters,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM sp
    GROUP BY 1
    """,
)
def tx_split_leakage_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/valid/test split: the split is a PRF of the
    near-duplicate CLUSTER id (dd_lsh_canonical's assignment), not of
    the doc id — so a document and its near-copies land in the same
    split BY CONSTRUCTION, the property that stops eval contamination
    when a benchmark doc has paraphrased twins in the corpus (a
    doc-keyed hash split co-locates only exact ids). Docs too short to
    shingle are their own singleton cluster. Plan: the lsh canonical
    stages + ONE doc_id equi-join to attach clusters + the final 3-row
    rollup — no pairwise joins, linear in corpus size. The guard that
    no LSH-bucket pair straddles splits is structural (split = f(cluster))
    and asserted in tests over the banded relation itself."""
    canon = dd_lsh_canonical(spark, sf).select("doc_id", "canonical_id")
    d = load(spark, sf, "documents").select("doc_id", F.length("text").alias("n_chars"))
    assigned = d.join(canon, "doc_id", "left").withColumn(
        "cluster_id", F.coalesce("canonical_id", "doc_id")
    )
    bkt = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % 10
    )
    sp = assigned.withColumn(
        "split",
        F.when(bkt < 8, F.lit("train")).when(bkt == 8, F.lit("valid")).otherwise(F.lit("test")),
    )
    return sp.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------- #
# transitive dedup clusters (connected components)
# ---------------------------------------------------------------------- #

_CLUSTER_JACCARD = 0.02  # edge threshold for the cluster graph
_DRIVER_CC_MAX_EDGES = 2_000_000  # union-find fast path bound (~32 MB driver)


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 15
) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation: label(x) <- min(label(x), min over neighbors' labels),
    repeated until a fixpoint (bounded by the graph diameter, capped at
    `max_iter`). Only edge ENDPOINTS iterate — singleton nodes (the
    overwhelming majority of a dedup graph) join back once at the end as
    their own component. Each round is one equi-join + one groupBy on
    the same key; at extreme component sizes the large-star/small-star
    variant halves the diameter, but the per-round plan is identical.

    nodes: (id), edges: (a, b) one direction; symmetrized internally.
    Returns (id, component) with component = min node id reachable.

    Fast path: a thresholded dedup graph has ~O(duplicates) edges —
    orders of magnitude smaller than the corpus — so when the edge list
    fits comfortably on the driver (bounded COUNT probe, never a Row
    collect), a single union-find pass replaces the iterative rounds;
    the min-label result is identical. The distributed propagation below
    remains the arbitrarily-large-graph path."""
    spark = nodes.sparkSession
    # ONE evaluation decides the path AND feeds the fast path: fetch at
    # most N+1 edges via Arrow (two int64 numpy columns, ~32 MB at the
    # bound — never Row objects). A separate count-probe would run the
    # expensive similarity-join lineage a second time for the fetch.
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    edges = edges.select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    )
    pdf = edges.limit(_DRIVER_CC_MAX_EDGES + 1).toPandas()
    if len(pdf) <= _DRIVER_CC_MAX_EDGES:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for ea, eb in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
            ra, rb = find(int(ea)), find(int(eb))
            if ra != rb:  # min-label union: smaller id becomes the root
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        comp = [(int(x), int(find(x))) for x in parent] + [
            (int(x), int(x)) for x in {find(x) for x in parent}
        ]
        labels = spark.createDataFrame(sorted(set(comp)), "id long, comp long")
        return nodes.join(
            F.broadcast(labels), nodes["id"] == labels["id"], "left"
        ).select(nodes["id"], F.coalesce("comp", nodes["id"]).alias("component"))

    # big-graph path: persist the edge lineage once — sym consumes it
    # twice (both directions) and every propagation round reads sym
    edges = edges.persist()
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.persist()
    labels = (
        sym.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    edges.unpersist()  # sym is materialized and persisted by the eager checkpoint
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .select(F.col("a").alias("id"), F.col("comp").alias("nbr_comp"))
            .groupBy("id")
            .agg(F.min("nbr_comp").alias("nbr_min"))
        )
        stepped = labels.join(nbr, "id", "left").select(
            "id",
            F.col("comp").alias("old_comp"),
            F.least(F.col("comp"), F.coalesce("nbr_min", "comp")).alias("comp"),
        )
        # localCheckpoint, not persist: each round references the prior
        # round TWICE (labels + neighbor lookup), so the logical plan —
        # and Catalyst analysis time — doubles per round even when
        # execution hits the cache (measured: 1.1s -> 25s by round 5).
        # Checkpointing truncates the lineage to the materialized RDD,
        # keeping every round's plan constant-size. Standard practice for
        # iterative DataFrame algorithms.
        stepped = stepped.localCheckpoint(eager=True)
        changed = stepped.filter(F.col("comp") != F.col("old_comp")).count()
        labels = stepped.select("id", "comp")
        if changed == 0:
            break
    # labels is checkpoint-materialized: the returned plan no longer
    # reads sym, so its cached blocks must not outlive this call
    sym.unpersist()
    return (
        nodes.join(labels, nodes["id"] == labels["id"], "left")
        .select(nodes["id"], F.coalesce("comp", nodes["id"]).alias("component"))
    )


def _jaccard_block_pairs_loop(thr: float):
    """Reference all-pairs Jaccard kernel (row-at-a-time Python sets):
    retained as (a) the equivalence baseline for the vectorized kernel
    below (tests/test_text_kernels.py) and (b) its O(1)-memory fallback
    for a pathological block where both vectorized paths would blow the
    per-task memory budget."""
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
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

    return block_pairs


# per-task budgets for the vectorized kernel's two strategies
_JBP_KEY_BUDGET = 1 << 26   # pair-key entries (~512 MB int64 worst case)
_JBP_DENSE_BUDGET = 1 << 27  # dense incidence entries (~512 MB float32)


def jaccard_block_pairs_kernel(thr: float):
    """Vectorized all-pairs Jaccard kernel for one blocking group:
    emits (a, b) doc-id pairs with |s_a ∩ s_b| / |s_a ∪ s_b| >= thr,
    identical to the row-at-a-time set loop (same integer intersection
    counts, same float64 division, same >= comparison — pinned against
    `_jaccard_block_pairs_loop` by test).

    Strategy (guide §4.2 — hand whole batches to vectorized code):
    intersection counts come from the block's inverted index — every
    shingle shared by c docs contributes all C(c,2) ordered pairs,
    generated vectorized per count-class and tallied with one
    np.unique — so the work is Σ_shingle C(c,2), i.e. proportional to
    the DUPLICATE structure, not n² (the set loop pays n² intersections
    of ~500-element sets: measured 12µs/pair -> ~30s/task on the 100x
    stress corpus's 2k-doc blocks; this kernel tallies the same blocks
    in tens of ms). A pathologically shared block (boilerplate shingle
    across the whole group) falls back to a chunked exact-count matmul,
    and past both budgets to the O(1)-memory loop."""
    import numpy as np
    import pandas as pd

    loop = _jaccard_block_pairs_loop(thr)

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
        ids = pdf["doc_id"].to_numpy()
        n = len(ids)
        if n < 2:
            return empty
        uniq = [np.unique(np.asarray(s, dtype=np.int64)) for s in pdf["s"]]
        lens = np.fromiter((u.size for u in uniq), dtype=np.int64, count=n)
        if not lens.sum():
            return empty
        flat = np.concatenate(uniq)
        _, inv = np.unique(flat, return_inverse=True)
        rowidx = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.argsort(inv, kind="stable")
        sid_sorted, row_sorted = inv[order], rowidx[order]
        starts = np.flatnonzero(np.r_[True, sid_sorted[1:] != sid_sorted[:-1]])
        cnt = np.diff(np.r_[starts, sid_sorted.size])
        budget = float((cnt.astype(np.float64) * (cnt - 1) / 2).sum())
        if budget <= _JBP_KEY_BUDGET:
            # inverted-index tally: within a shingle's member list the
            # rows are ascending (stable sort over row-major input), so
            # triu pairs are (i < j) by construction
            keys = []
            for cc in np.unique(cnt):
                if cc < 2:
                    continue
                gsel = np.flatnonzero(cnt == cc)
                idx = starts[gsel][:, None] + np.arange(cc)[None, :]
                mem = row_sorted[idx]
                iu, ju = np.triu_indices(int(cc), k=1)
                keys.append(mem[:, iu].ravel() * n + mem[:, ju].ravel())
            if not keys:
                return empty
            uk, inter = np.unique(np.concatenate(keys), return_counts=True)
            i, j = uk // n, uk % n
        elif n * (int(inv.max()) + 1) <= _JBP_DENSE_BUDGET:
            # heavy sharing -> small vocab: exact integer counts via one
            # binary-incidence matmul (counts < 2^24, exact in float32),
            # row-chunked so G never exceeds the budget
            V = int(inv.max()) + 1
            M = np.zeros((n, V), dtype=np.float32)
            M[rowidx, inv] = 1.0
            rows_i, rows_j, inters = [], [], []
            chunk = max(64, _JBP_DENSE_BUDGET // max(n, 1))
            for lo in range(0, n, chunk):
                hi = min(n, lo + chunk)
                G = M[lo:hi] @ M.T
                ci, cj = np.nonzero(G)
                keep = cj > (ci + lo)  # upper triangle: j > i
                ci, cj = ci[keep], cj[keep]
                rows_i.append(ci + lo)
                rows_j.append(cj)
                inters.append(G[ci, cj].astype(np.int64))
            if not rows_i:
                return empty
            i = np.concatenate(rows_i)
            j = np.concatenate(rows_j)
            inter = np.concatenate(inters)
            nz = inter > 0
            i, j, inter = i[nz], j[nz], inter[nz]
            if i.size == 0:
                return empty
        else:
            return loop(pdf)
        union = lens[i] + lens[j] - inter
        ok = inter / union >= thr
        a_ids, b_ids = ids[i[ok]], ids[j[ok]]
        lo_ = np.minimum(a_ids, b_ids)
        hi_ = np.maximum(a_ids, b_ids)
        return pd.DataFrame(
            {"a": pd.Series(lo_, dtype="int64"), "b": pd.Series(hi_, dtype="int64")}
        )

    return block_pairs


@register(
    "dd_cluster_components",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, lang, source, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, lang, source, {_SQL_SHINGLES} AS sh
      FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, lang, source, {_SQL_SHINGLE_IDS} AS s FROM s0 WHERE len(sh) > 0
    ), jpair AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM s1 a JOIN s1 b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.s, b.s))::DOUBLE /
            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
            >= {_CLUSTER_JACCARD}
    ), xpair AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM documents a JOIN documents b
        ON md5(regexp_replace(lower(trim(a.text)), '\\s+', ' ', 'g')) =
           md5(regexp_replace(lower(trim(b.text)), '\\s+', ' ', 'g'))
       AND a.doc_id < b.doc_id
    ), pair AS (
      SELECT * FROM jpair UNION SELECT * FROM xpair
    ), edges AS (
      SELECT a, b FROM pair UNION ALL SELECT b, a FROM pair
    ), reach(src, dst) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
    )
    SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    """,
)
def dd_cluster_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive dedup clusters: connected components over the union of
    exact-duplicate edges (same fingerprint) and near-duplicate edges
    (blocked n-gram Jaccard >= {0.02}). A doc two hops from a canonical
    still lands in its cluster — the property one-round canonical
    assignment (dd_lsh_canonical) lacks. The oracle states the same
    semantics as a recursive closure (quadratic in component size — fine
    for a checker); the Spark side is min-label propagation, linear per
    round and diameter-bounded, i.e. the shape that survives 100 TB."""
    # plain load for the md5-fingerprint side and the node list (the
    # dd_exact rule: md5 rides the scan; driver 8v32 ratio 0.60 showed
    # the spread over-scheduling these stages). The shingle side below
    # keeps the spread via shingle_base — its kernel is genuinely heavy.
    d = load(spark, sf, "documents")
    base = shingle_base(spark, sf).select(
        "doc_id", "lang", "source", F.col("ids").alias("s")
    )
    # all-pairs Jaccard inside each (lang, source) block, executed as a
    # python-set kernel per block (Arrow batch in, qualifying pairs out).
    # The all-pairs candidate semantics match the oracle exactly; at the
    # 0.02 threshold neither prefix filtering nor an inverted index can
    # prune (an inverted-index join is Σ_shingles n² — quadratic per
    # DUPLICATE CLUSTER times shingle count, measured 4x worse here).
    # Only pairs that pass the threshold leave the kernel, so the
    # downstream shuffle moves ~|edges| rows. At corpus scale the block
    # key is the blocking strategy: blocks are bounded (they partition
    # the corpus by provenance), and a kernel block of n docs x ~500
    # shingle ids is n*4KB of executor memory.
    block_pairs = jaccard_block_pairs_kernel(_CLUSTER_JACCARD)

    # NULL blocking keys never pair (join semantics; see dd_embedding_cosine)
    jpair = (
        base.select("doc_id", "lang", "source", "s")
        .filter(F.col("lang").isNotNull() & F.col("source").isNotNull())
        .groupBy("lang", "source")
        .applyInPandas(block_pairs, "a long, b long")
    )
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast("binary")
    )
    fpd = d.select("doc_id", fp.alias("fp"))
    fa, fb = fpd.alias("fa"), fpd.alias("fb")
    xpair = fa.join(
        fb, (F.col("fa.fp") == F.col("fb.fp")) & (F.col("fa.doc_id") < F.col("fb.doc_id"))
    ).select(F.col("fa.doc_id").alias("a"), F.col("fb.doc_id").alias("b"))
    edges = jpair.union(xpair).distinct()
    nodes = d.select(F.col("doc_id").alias("id"))
    return connected_components(nodes, edges).select(
        F.col("id").alias("doc_id"), "component"
    )


@register(
    "dd_minhash_estimate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, ids, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, ids, mh, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ids AS ia, b.ids AS ib, a.mh AS ma, b.mh AS mb
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(len(list_filter([{", ".join(str(i) for i in range(1, _K_HASHES + 1))}],
                                 i -> ma[i] = mb[i]))::DOUBLE / {_K_HASHES}, 4)
             AS est_jaccard,
           round(len(list_intersect(ia, ib))::DOUBLE /
                 (len(ia) + len(ib) - len(list_intersect(ia, ib))), 4) AS jaccard
    FROM cand
    """,
)
def dd_minhash_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, the MinHash
    Jaccard ESTIMATE (fraction of equal signature components — the
    O(k)-per-pair number a production dedup uses to rank candidates
    without touching shingle sets) next to the exact Jaccard. At corpus
    scale the estimate column is what makes verification cheap: the
    k-component compare reads 2k ints instead of two shingle arrays, and
    only pairs whose estimate clears a margin pay the exact intersect."""
    r_rows, n_bands = lsh_params(sf)
    k = r_rows * n_bands
    staged = sig_stage(spark, sf).select("doc_id", "ids", F.col("sig").alias("mh"))
    bands = banded_signature(F.col("mh"), n_bands, r_rows)
    banded = staged.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = staged.select(
        F.col("doc_id").alias("doc_a"), F.col("ids").alias("ia"), F.col("mh").alias("ma")
    )
    sb = staged.select(
        F.col("doc_id").alias("doc_b"), F.col("ids").alias("ib"), F.col("mh").alias("mb")
    )
    cand = pairs.join(sa, "doc_a").join(sb, "doc_b")
    est = (
        F.size(F.filter(F.zip_with("ma", "mb", lambda x, y: x == y), lambda m: m))
        .cast("double")
        / F.lit(float(k))
    )
    inter = F.size(F.array_intersect("ia", "ib"))
    exact = inter.cast("double") / (F.size("ia") + F.size("ib") - inter)
    return cand.select(
        "doc_a",
        "doc_b",
        F.round(est, 4).alias("est_jaccard"),
        F.round(exact, 4).alias("jaccard"),
    )


_PREFIX_WORDS = 8


@register(
    "dd_prefix_cluster",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, lang,
             md5(array_to_string((string_split(lower(trim(text)), ' '))[1:{_PREFIX_WORDS}], ' '))
               AS prefix_fp
      FROM documents
    )
    SELECT prefix_fp, count(*) AS n_docs, min(doc_id) AS canonical_id,
           count(DISTINCT lang) AS n_langs
    FROM p GROUP BY prefix_fp HAVING count(*) > 1
    """,
)
def dd_prefix_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix-fingerprint dedup (the boilerplate/mirror-detection shape:
    near-identical documents almost always share their opening words,
    e.g. Common Crawl page templates). Fingerprint = md5 of the first
    {_PREFIX_WORDS} normalized words — O(1) text work per doc regardless
    of document length, then ONE shuffle on the 16-byte key; clusters
    with >1 member are candidate template groups. A cheaper pre-filter
    stage for the full MinHash pipeline: at 100 TB this runs at scan
    speed and discards the unique majority before any expensive
    signature computation."""
    d = load_spread(spark, sf, "documents")
    prefix = F.array_join(
        F.slice(F.split(F.lower(F.trim(F.col("text"))), " "), 1, _PREFIX_WORDS), " "
    )
    return (
        d.select(F.md5(prefix.cast("binary")).alias("prefix_fp"), "doc_id", "lang")
        .groupBy("prefix_fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------- #
# passage-level exact dedup
# ---------------------------------------------------------------------- #

_PASSAGE_TOKENS = 16  # tokens per passage window (stride = width)


@register(
    "dd_passage_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    c AS (
      SELECT doc_id, i AS chunk_idx,
             md5(array_to_string(
               tok[(i * {_PASSAGE_TOKENS} + 1):((i + 1) * {_PASSAGE_TOKENS})], ' '))
               AS chunk_fp
      FROM t, unnest(range(CAST(ceil(len(tok) / {_PASSAGE_TOKENS}.0) AS INT))) AS u(i)
    ),
    r AS (
      SELECT doc_id, chunk_idx, chunk_fp,
             row_number() OVER (PARTITION BY chunk_fp ORDER BY doc_id, chunk_idx) AS rn
      FROM c
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_fp
    FROM r WHERE rn = 1
    """,
)
def dd_passage_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Passage-level exact dedup (suffix-array-style substring dedup at
    fixed granularity): each document is cut into {_PASSAGE_TOKENS}-token
    windows, each window is fingerprinted, and only the globally FIRST
    occurrence of each fingerprint (ordered by doc_id, chunk_idx)
    survives — the operator that strips boilerplate passages repeated
    across a web corpus even when the containing documents differ.

    Scale shape: chunking is map-side (tokens staged as a real column so
    the generator does not re-split per output row); the dedup decision
    is ONE shuffle keyed on the 16-byte fingerprint — never on the
    passage text — and the output is linear in surviving passages."""
    d = load_spread(spark, sf, "documents").filter(F.trim("text") != "")
    t = d.select("doc_id", tokens(F.col("text")).alias("tok"))
    n_chunks = F.ceil(F.size("tok") / F.lit(_PASSAGE_TOKENS)).cast("int")
    c = t.select(
        "doc_id",
        "tok",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("tok"),
                    F.col("chunk_idx") * _PASSAGE_TOKENS + 1,
                    _PASSAGE_TOKENS,
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_fp"),
    )
    w = Window.partitionBy("chunk_fp").orderBy("doc_id", "chunk_idx")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "chunk_idx", "chunk_fp")
    )


# ---------------------------------------------------------------------- #
# URL canonicalization dedup
# ---------------------------------------------------------------------- #

# The corpus has no URL column; a deterministic messy URL is derived
# from (source, lang, doc_id) on BOTH sides — mixed-case scheme/host,
# a www. prefix, and utm_*/ref tracking params sandwiched between real
# params. The normalize -> group pipeline below is the actual operator
# (the first dedup pass every web-crawl pipeline runs).
_SQL_URL = """
  concat('HTTPS://WWW.', source, '.Example.com/doc/',
         CAST(doc_id % 25 AS VARCHAR),
         '?id=', CAST(doc_id % 25 AS VARCHAR),
         '&utm_source=feed&ref=', CAST(doc_id % 7 AS VARCHAR),
         '&lang=', lang)
"""
_URL_TRACKING = r"&(utm_[a-z]+|ref)=[^&]*"


@register(
    "dd_url_normalize",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_SQL_URL} AS url FROM documents),
    n AS (
      SELECT doc_id,
             regexp_replace(replace(lower(url), '://www.', '://'),
                            '{_URL_TRACKING}', '', 'g') AS norm_url
      FROM u
    )
    SELECT norm_url, count(*) AS n_docs, min(doc_id) AS canonical_id
    FROM n GROUP BY norm_url HAVING count(*) > 1
    """,
)
def dd_url_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization dedup: lowercase, strip the www. host
    prefix, drop utm_*/ref tracking parameters (whole-param regex, so
    real params around them survive), then ONE shuffle on the
    normalized URL to find pages crawled under many surface forms.
    Map-side normalization at scan speed; output is linear in
    duplicated URLs."""
    d = load(spark, sf, "documents")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.com/doc/"),
        (F.col("doc_id") % 25).cast("string"),
        F.lit("?id="),
        (F.col("doc_id") % 25).cast("string"),
        F.lit("&utm_source=feed&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&lang="),
        F.col("lang"),
    )
    norm = F.regexp_replace(
        F.replace(F.lower(url), F.lit("://www."), F.lit("://")),
        _URL_TRACKING,
        "",
    )
    return (
        d.select("doc_id", norm.alias("norm_url"))
        .groupBy("norm_url")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_id"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------- #
# semantic dedup (SemDeDup): k-means cells + intra-cell cosine pruning
# ---------------------------------------------------------------------- #

_SEM_THR = 0.35


def _semdedup_oracle() -> str:
    """Unrolled SQL derivation: the same 2-round Lloyd chain the
    ann_kmeans_ivf oracle uses, then a correlated EXISTS implementing
    the keep-first-by-id rule within each cell."""
    from fluss_spark.operators.similarity import (
        _KM_K,
        _sql_km_assign,
        _sql_km_update,
    )

    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS c
      FROM e ORDER BY vec_id LIMIT {_KM_K}
    ), a1 AS ({_sql_km_assign("c0")}
    ), c1 AS ({_sql_km_update("a1")}
    ), a2 AS ({_sql_km_assign("c1")}
    ), c2 AS ({_sql_km_update("a2")}
    ), a3 AS ({_sql_km_assign("c2")})
    SELECT a.vec_id, CAST(a.cid AS INT) AS cell,
           NOT EXISTS (
             SELECT 1 FROM a3 b
             WHERE b.cid = a.cid AND b.vec_id < a.vec_id
               AND {cos} >= {_SEM_THR}
           ) AS kept
    FROM a3 a
    """


def _semdedup_kernel(thr: float):
    """Per-cell Arrow kernel: drop a vector iff some LOWER-id vector in
    the same cell has cosine >= thr with it (keep-first-by-id — the
    deterministic, non-chained variant of SemDeDup's per-cluster prune).
    The cosine matrix is computed in column chunks so peak memory is
    |cell| x CHUNK, never |cell|^2 at once."""
    import numpy as np
    import pandas as pd

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        V = np.vstack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        n = len(V)
        dropped = np.zeros(n, dtype=bool)
        # bound the n x chunk score block to ~256 MB regardless of cell
        # size (cells grow with the corpus; the kernel must not)
        chunk = max(128, min(2048, (32 << 20) // max(n, 1)))
        rows = np.arange(n)[:, None]
        for j0 in range(0, n, chunk):
            S = V @ V[j0 : j0 + chunk].T  # n x c
            cols = (j0 + np.arange(S.shape[1]))[None, :]
            hit = (S >= thr) & (rows < cols)
            dropped[j0 : j0 + S.shape[1]] = hit.any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "cell": pdf["cell"].to_numpy(),
                "kept": ~dropped,
            }
        )

    return kernel


@register("dd_semdedup", oracle=_semdedup_oracle())
def dd_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023): cluster embeddings
    with the deterministic k-means coarse quantizer, then within each
    cell drop every vector whose cosine to a lower-id cellmate reaches
    the threshold — near-duplicate *meanings*, not near-duplicate bytes.

    Scale shape: clustering is the IVF trainer (map-side partial sums,
    k x dim driver state), the prune is one shuffle on the cell id and a
    chunked BLAS matmul per cell — at 100 TB the cells bound the
    quadratic term exactly like the IVF search path, and the output is
    one row per vector (linear). Keep-first-by-id makes the result
    order-free and SQL-derivable (correlated EXISTS in the oracle), so
    this is a full hash-match parity entry despite the iterative
    trainer."""
    from fluss_spark.operators.similarity import (
        _KM_ITERS,
        _KM_K,
        assign_cells,
        corpus_centroids,
    )

    e = load_spread(spark, sf, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # the session-cached full-corpus quantizer: identical centroids to
    # training on this frame (same rows, same partition layout for the
    # partial sums) — one training serves this + the ann/emb queries
    cents = corpus_centroids(spark, sf, _KM_K, _KM_ITERS)
    cells = (
        assign_cells(e, cents)
        if cents
        else e.select("vec_id", F.lit(0).alias("cell"))
    )
    assigned = e.join(cells, "vec_id")
    return assigned.groupBy("cell").applyInPandas(
        _semdedup_kernel(_SEM_THR), "vec_id long, cell int, kept boolean"
    )


@register(
    "dd_fuzzy_contamination",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), sig AS (
      SELECT doc_id, ids, {_SQL_MINHASH} AS mh FROM s1
    ), bands AS (
      SELECT doc_id, ids, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), bench0 AS (
      SELECT doc_id + 10000000 AS bench_id,
             list_filter(ids, u -> u % 5 <> 0) AS ids
      FROM s1 WHERE doc_id % 50 = 0
    ), bench_sig AS (
      SELECT bench_id, ids AS ie, {_SQL_MINHASH} AS mh
      FROM bench0 WHERE len(ids) > 0
    ), bench_bands AS (
      SELECT bench_id, ie, b,
             md5(list_aggregate(mh[b * {_BAND_ROWS} + 1 : (b + 1) * {_BAND_ROWS}],
                                'string_agg', '|')) AS band_sig
      FROM bench_sig, range(0, {_K_HASHES // _BAND_ROWS}) r(b)
    ), cand AS (
      SELECT DISTINCT c.doc_id, c.ids AS ic, e.bench_id, e.ie
      FROM bands c JOIN bench_bands e
        ON c.b = e.b AND c.band_sig = e.band_sig
    ), ver AS (
      SELECT doc_id, bench_id,
             len(list_intersect(ic, ie))::DOUBLE /
               (len(ic) + len(ie) - len(list_intersect(ic, ie))) AS jac
      FROM cand
    )
    SELECT doc_id, count(*) AS n_bench_matches,
           round(max(jac), 4) AS max_jaccard
    FROM ver WHERE jac >= 0.2
    GROUP BY doc_id
    """,
)
def dd_fuzzy_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """FUZZY benchmark decontamination: where dd_contamination counts
    exact shingle hits, this flags training documents NEAR-duplicating
    an eval document — paraphrased or lightly-edited leakage that exact
    overlap under-counts. The eval suite is synthesized as a PERTURBED
    copy of every 50th document (~20% of its shingles dropped by a
    value rule), so the leak relationship is real and the LSH must
    recover it through the edit.

    Scale shape: the benchmark side is tiny by construction — its
    perturbed signatures are (re)computed with the interpreted k-hash
    HOF (fine at eval-suite size; the CORPUS signatures come from the
    shared persisted numpy-kernel stage) and its banded form BROADCASTS
    into an asymmetric LSH band join, so the 100-TB corpus side never
    shuffles. Exact Jaccard verifies candidates; output is one row per
    contaminated doc (match count + strongest match), linear in leaks."""
    r_rows, n_bands = lsh_params(sf)
    k = r_rows * n_bands
    staged = sig_stage(spark, sf)
    bands = banded_signature(F.col("sig"), n_bands, r_rows)
    corpus = staged.select("doc_id", "ids", F.explode(bands).alias("b")).select(
        "doc_id", "ids",
        F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"),
    )
    pert = F.filter(F.col("ids"), lambda u: u % 5 != 0)
    bench0 = (
        staged.filter(F.col("doc_id") % 50 == 0)
        .select(
            (F.col("doc_id") + 10_000_000).alias("bench_id"), pert.alias("ie")
        )
        .filter(F.size("ie") > 0)
    )
    def _h(a: int, b: int):
        return lambda u: (F.lit(a) * u + F.lit(b)) % F.lit(_P)

    bench_sig = F.array(
        *[F.array_min(F.transform(F.col("ie"), _h(a, b))) for a, b in _AB[:k]]
    )
    bench = (
        bench0.withColumn("sig", bench_sig)
        .select("bench_id", "ie", F.explode(banded_signature(F.col("sig"), n_bands, r_rows)).alias("b"))
        .select("bench_id", "ie", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"))
    )
    cand = (
        corpus.join(F.broadcast(bench), on=["band", "band_sig"])
        .select("doc_id", "ids", "bench_id", "ie")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("ids"), F.col("ie")))
    union = F.size("ids") + F.size("ie") - inter
    return (
        cand.withColumn("__jac", inter.cast("double") / union)
        .filter(F.col("__jac") >= 0.2)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bench_matches"),
            F.round(F.max("__jac"), 4).alias("max_jaccard"),
        )
    )


# ---------------------------------------------------------------------- #
# tx_ngram_novelty: per-doc data-freshness score
# ---------------------------------------------------------------------- #
@register(
    "tx_ngram_novelty",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), s0 AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sh FROM t WHERE len(toks) >= {_SHINGLE}
    ), s1 AS (
      SELECT doc_id, {_SQL_SHINGLE_IDS} AS ids FROM s0 WHERE len(sh) > 0
    ), ex AS (
      SELECT doc_id, unnest(ids) AS id FROM s1
    ), first AS (
      SELECT id, min(doc_id) AS first_doc FROM ex GROUP BY id
    )
    SELECT ex.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN first_doc = ex.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           round(sum(CASE WHEN first_doc = ex.doc_id THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 4) AS novelty
    FROM ex JOIN first USING (id)
    GROUP BY ex.doc_id
    """,
)
def tx_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Data-freshness scoring for curriculum/selection: a document's
    novelty = the fraction of its distinct {_SHINGLE}-gram shingles
    whose FIRST corpus occurrence (lowest doc_id — ingestion order) is
    this document. High-novelty docs contribute new content; docs whose
    shingles all appeared earlier are redundant even when no single
    earlier document matches them (the gap exact/near dedup leaves
    open). Shares the persisted shingle stage with the whole dd_*
    family; the score itself is one shuffle on the shingle id
    (first-occurrence min) plus the id-keyed join back — both
    map-side-combinable, output linear in documents."""
    base = shingle_base(spark, sf)
    ex = base.select("doc_id", F.explode("ids").alias("id"))
    first = ex.groupBy("id").agg(F.min("doc_id").alias("first_doc"))
    new = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return (
        ex.join(first, "id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(new).cast("bigint").alias("n_new"),
            F.round(F.sum(new) / F.count(F.lit(1)), 4).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------- #
# dd_cdc_spans: offset-invariant duplicated spans (content-defined
# chunking) — the exact-substring dedup of Lee et al. 2022
# (arXiv:2107.06499) re-expressed for a shuffle engine: a suffix array
# is replaced by CDC boundaries, which depend only on local content, so
# the SAME span in two documents chunks identically REGARDLESS of its
# offset (fixed-aligned passage dedup — dd_passage_dedup — only catches
# stride-aligned copies).
# ---------------------------------------------------------------------- #
_CDC_K = 3  # boundary decided by the trigram ending at each position
_CDC_D = 8  # boundary probability 1/D -> mean chunk ~8 tokens
_CDC_MIN = 5  # spans shorter than this are too weak as dup evidence


@register(
    "dd_cdc_spans",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS tok
      FROM documents WHERE trim(text) <> ''
    ),
    nn AS (SELECT doc_id, tok, len(tok) AS n FROM t),
    bs AS (
      SELECT doc_id, tok,
             list_sort(list_distinct(
               [0]
               || [i for i in range({_CDC_K}, n + 1)
                   if ('0x' || substr(md5(array_to_string(
                        tok[(i - {_CDC_K} + 1):i], ' ')), 1, 4))::INTEGER
                      % {_CDC_D} = 0]
               || [n]
             )) AS b
      FROM nn
    ),
    spans AS (
      SELECT doc_id, b[j] AS lo, b[j + 1] AS hi, tok
      FROM bs, unnest(range(1, len(b))) AS u(j)
    ),
    fps AS (
      SELECT doc_id, CAST(lo + 1 AS INT) AS span_start,
             CAST(hi - lo AS INT) AS span_len,
             md5(array_to_string(tok[(lo + 1):hi], ' ')) AS span_fp
      FROM spans WHERE hi - lo >= {_CDC_MIN}
    ),
    dup AS (
      SELECT span_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM fps GROUP BY span_fp
      HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT f.doc_id, f.span_start, f.span_len, f.span_fp, dup.n_docs
    FROM fps f JOIN dup USING (span_fp)
    """,
)
def dd_cdc_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-span detection with content-defined chunk boundaries:
    a position ends a chunk when the md5 of its trailing trigram hashes
    to 0 mod D, so boundaries — and therefore span fingerprints — are a
    pure function of local content and a copied passage produces the
    same chunks at ANY offset in any document. Reports every span (>=
    {_CDC_MIN} tokens) whose fingerprint appears in 2+ distinct
    documents, with the sharing count. Scale shape: chunking is one
    map-side pass of JVM array expressions (zero exchanges), then ONE
    fingerprint-keyed shuffle for the distinct-doc count and the
    id-keyed join back; output is linear in duplicated spans. This is
    the continuous-corpus exact-substring dedup that LSH (whole-doc
    similarity) and aligned passages (stride-locked) both miss."""
    d = load_spread(spark, sf, "documents").filter(F.trim("text") != "")
    tok = tokens(F.col("text"))
    base = d.select("doc_id", tok.alias("tok"), F.size(tok).alias("n"))

    def is_boundary(i):
        gram = F.concat_ws(" ", F.slice("tok", i - _CDC_K + 1, _CDC_K))
        h = F.conv(F.substring(F.md5(gram.cast("binary")), 1, 4), 16, 10).cast("int")
        return h % _CDC_D == 0

    cand = F.when(
        F.col("n") >= _CDC_K,
        F.filter(F.sequence(F.lit(_CDC_K), F.col("n")), is_boundary),
    ).otherwise(F.array().cast("array<int>"))
    bs = F.array_distinct(
        F.concat(F.array(F.lit(0)), cand.cast("array<int>"), F.array(F.col("n")))
    )
    pairs = F.arrays_zip(
        F.slice(bs, 1, F.size(bs) - 1).alias("lo"),
        F.slice(bs, 2, F.size(bs) - 1).alias("hi"),
    )
    spans_plan = (
        base.select("doc_id", "tok", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.col("p.lo").alias("lo"),
            F.col("p.hi").alias("hi"),
            "tok",
        )
        .filter(F.col("hi") - F.col("lo") >= _CDC_MIN)
        .select(
            "doc_id",
            (F.col("lo") + 1).cast("int").alias("span_start"),
            (F.col("hi") - F.col("lo")).cast("int").alias("span_len"),
            F.md5(
                F.concat_ws(
                    " ", F.slice("tok", F.col("lo") + 1, F.col("hi") - F.col("lo"))
                ).cast("binary")
            ).alias("span_fp"),
        )
    )
    # consumed twice (dup aggregate + join back): without the persist
    # the whole chunking chain — per-position md5 through an interpreted
    # HOF — runs once per consumer (the shingle_base lesson). Session-
    # keyed through the cache registry (eagerly materialized there, so
    # the join job's two subtrees never race a cold cache; budgeted and
    # LRU-unpersisted instead of pinned for the session's lifetime).
    from fluss_spark import cache_registry

    spans = cache_registry.cache_df(spark, ("cdc_spans", sf), lambda: spans_plan)
    dup = (
        spans.groupBy("span_fp")
        .agg(F.count_distinct("doc_id").cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )
    return spans.join(dup, "span_fp").select(
        "doc_id", "span_start", "span_len", "span_fp", "n_docs"
    )
