"""Text-analysis operators for training-data pipelines over the
`documents` table: token counting, quality scoring, language ID,
document fingerprinting.

These extend the engine beyond the reference's storage operators
(SURVEY §2 note: large-scale pipeline ops are first-class here). All
computation is JVM-side built-ins (regexp/array functions) — no Python
UDFs — and every formula is mirrored exactly in the DuckDB oracle.

Token convention shared by text/dedup operators:
    tokens(text) = split(lower(trim(text)), /\\s+/), empty text -> [].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_spark.registry import load, load_spread, register

# shared SQL fragment (DuckDB side) for the token array
_SQL_TOKENS = "regexp_split_to_array(lower(trim(text)), '\\s+')"


def tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


@register(
    "tx_token_count",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len({_SQL_TOKENS}) END AS n_tokens,
           n_chars
    FROM documents
    """,
)
def tx_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace token count per document (vectorized split, no UDF)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(tokens(F.col("text"))))
        .alias("n_tokens"),
        "n_chars",
    )


@register(
    "tx_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN trim(text)='' THEN 0 ELSE len({_SQL_TOKENS}) END AS n_tok,
             length(text) AS n,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
             CASE WHEN trim(text)='' THEN 0
                  ELSE len(list_filter({_SQL_TOKENS}, t -> length(t) <= 2)) END AS n_short
      FROM documents
    )
    SELECT doc_id,
           round(
             0.4 * (CASE WHEN n=0 THEN 0 ELSE n_alpha::DOUBLE / n END)
           + 0.3 * least(1.0, n_tok / 100.0)
           + 0.3 * (CASE WHEN n_tok=0 THEN 0 ELSE 1.0 - n_short::DOUBLE / n_tok END),
           4) AS quality
    FROM t
    """,
)
def tx_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic quality score: alphabetic-character ratio, length
    saturation, short-token penalty — the standard cheap pre-filters a
    100 TB corpus pass runs before expensive model scoring."""
    d = load(spark, sf, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(tok))
    n = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_short = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.filter(tok, lambda t: F.length(t) <= 2))
    )
    quality = (
        0.4 * F.when(n == 0, F.lit(0.0)).otherwise(n_alpha.cast("double") / n)
        + 0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.3
        * F.when(n_tok == 0, F.lit(0.0)).otherwise(1.0 - n_short.cast("double") / n_tok)
    )
    return d.select("doc_id", F.round(quality, 4).alias("quality"))


# tiny deterministic stopword lists; priority order breaks ties
_STOPWORDS = [
    ("en", ["the", "a", "and", "of", "to", "is", "in"]),
    ("es", ["el", "la", "de", "y", "que", "los", "una"]),
    ("de", ["der", "die", "und", "das", "ist", "ein", "nicht"]),
    ("fr", ["le", "la", "et", "les", "des", "un", "une"]),
]


@register(
    "tx_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKENS} AS toks FROM documents
    ), c AS (
      SELECT doc_id, lang,
        {", ".join(
            f"len(list_filter(toks, t -> list_contains({words!r}, t))) AS c_{code}"
            for code, words in _STOPWORDS
        )}
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr AND c_en > 0 THEN 'en'
             WHEN c_es >= c_de AND c_es >= c_fr AND c_es > 0 THEN 'es'
             WHEN c_de >= c_fr AND c_de > 0 THEN 'de'
             WHEN c_fr > 0 THEN 'fr'
             ELSE 'unknown'
           END AS predicted
    FROM c
    """,
)
def tx_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram/stopword language ID heuristic: count stopword hits per
    candidate language, argmax with fixed priority tiebreak."""
    d = load(spark, sf, "documents")
    tok = tokens(F.col("text"))
    def _hits(words: list[str]):
        return F.size(F.filter(tok, lambda t: t.isin(*words)))

    counts = {code: _hits(words) for code, words in _STOPWORDS}
    c_en, c_es, c_de, c_fr = counts["en"], counts["es"], counts["de"], counts["fr"]
    predicted = (
        F.when((c_en >= c_es) & (c_en >= c_de) & (c_en >= c_fr) & (c_en > 0), F.lit("en"))
        .when((c_es >= c_de) & (c_es >= c_fr) & (c_es > 0), F.lit("es"))
        .when((c_de >= c_fr) & (c_de > 0), F.lit("de"))
        .when(c_fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return d.select("doc_id", "lang", predicted.alias("predicted"))


@register(
    "tx_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def tx_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the exact-dedup key (dedup.py builds on it)."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast("binary")
        ).alias("fingerprint"),
    )


@register(
    "tx_corpus_stats",
    oracle=f"""
    WITH t AS (
      SELECT lang, source, n_chars,
             CASE WHEN trim(text)='' THEN 0 ELSE len({_SQL_TOKENS}) END AS n_tok
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           round(avg(n_tok), 4) AS avg_tokens,
           max(n_chars) AS max_chars,
           round(quantile_cont(n_chars, 0.5), 1) AS median_chars,
           count(DISTINCT source) AS n_sources
    FROM t GROUP BY lang
    """,
)
def tx_corpus_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level rollup: the summary pass a pipeline runs before
    sampling decisions (exact median via interpolated percentile —
    identical definition in both engines)."""
    d = load(spark, sf, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(tok))
    return (
        d.select("lang", "source", "n_chars", n_tok.alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 1).alias("median_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "tx_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS term
      FROM documents WHERE trim(text) <> ''
    ), cnt AS (
      SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term
    ), ranked AS (
      SELECT lang, term, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rnk
      FROM cnt
    )
    SELECT lang, term, n, rnk FROM ranked WHERE rnk <= 20
    """,
)
def tx_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary head: top-20 terms per language by frequency
    (deterministic tie-break on the term). explode -> two-level
    aggregation: the (lang, term) count combines map-side before the
    shuffle, then the per-lang top-k is a partial top-n window — the
    standard plan that survives a 100 TB corpus because no stage ever
    materializes the full vocabulary on one node."""
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    tok = d.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
    cnt = tok.groupBy("lang", "term").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("term"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("lang", "term", "n", "rnk")
    )


@register(
    "tx_hash_sample",
    oracle="""
    WITH s AS (
      SELECT lang, source, doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS h
      FROM documents
    )
    SELECT lang, source, count(*) AS n_sampled,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM s WHERE h < 10
    GROUP BY lang, source
    """,
)
def tx_hash_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~10% corpus sample: keep rows whose key-hash bucket
    (md5 of doc_id, the engine's shared PRF with the oracle) falls under
    the rate. Unlike rand()-based sampling this is reproducible across
    runs, engines, and re-partitions — the property a training-data
    pipeline needs for auditable subsets. Pure map-side filter; the
    stratum rollup here just summarizes what got sampled."""
    d = load(spark, sf, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    return (
        d.withColumn("__h", h)
        .filter(F.col("__h") < 10)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_SHARD_TOKENS = 50_000  # token budget per training shard


@register(
    "tx_shard_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CASE WHEN trim(text) = '' THEN 0 ELSE len({_SQL_TOKENS}) END AS n_tok
      FROM documents
    ), r AS (
      SELECT doc_id, lang, n_tok,
             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM t
    )
    SELECT lang, CAST((running - n_tok) // {_SHARD_TOKENS} AS BIGINT) AS shard,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens
    FROM r GROUP BY lang, shard
    """,
)
def tx_shard_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget shard packing: documents are packed into training
    shards of ~{50k} tokens per language by running-sum assignment
    (shard = cumulative tokens before the doc DIV budget) — the
    deterministic layout step before writing tokenized training files.
    Integer arithmetic end to end. One shuffle (the per-lang window);
    at 100 TB the window key becomes (lang, date-bucket) so no single
    partition holds a whole language."""
    d = load(spark, sf, "documents")
    n_tok = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(tokens(F.col("text"))))
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = d.select("doc_id", "lang", n_tok.alias("n_tok")).withColumn(
        "running", F.sum("n_tok").over(w)
    )
    return (
        r.withColumn("shard", F.expr(f"(running - n_tok) DIV {_SHARD_TOKENS}"))
        .groupBy("lang", "shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("shard_tokens"))
    )


@register(
    "tx_repetition_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents WHERE trim(text) <> ''
    ), b AS (
      SELECT doc_id, toks, len(toks) AS n,
             list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
      FROM t
    )
    SELECT doc_id,
           round(len(list_distinct(toks))::DOUBLE / n, 4) AS distinct_ratio,
           CASE WHEN len(bg) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(bg))::DOUBLE / len(bg), 4)
           END AS dup_bigram_frac
    FROM b
    """,
)
def tx_repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-token
    ratio and duplicate-bigram fraction (boilerplate/spam detector).
    Entirely array HOFs on a staged token column — zero shuffles, zero
    Python; the per-doc work is independent, so the pass is
    embarrassingly parallel at any corpus size. Bigrams = zip_with of
    the two shifted slices (no index lambda, stays in codegen)."""
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    # stage arrays as real columns: Catalyst does not CSE subtrees inside
    # lambda functions (NOTES.md) — toks/bg must not be re-derived per use
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    b = t.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n"),
        F.zip_with(
            F.slice(F.col("toks"), F.lit(1), F.size("toks") - 1),
            F.slice(F.col("toks"), F.lit(2), F.size("toks") - 1),
            lambda a, x: F.concat(a, F.lit(" "), x),
        ).alias("bg"),
    )
    return b.select(
        "doc_id",
        F.round(F.size(F.array_distinct("toks")).cast("double") / F.col("n"), 4).alias(
            "distinct_ratio"
        ),
        F.when(F.size("bg") == 0, F.lit(0.0))
        .otherwise(
            F.round(1.0 - F.size(F.array_distinct("bg")).cast("double") / F.size("bg"), 4)
        )
        .alias("dup_bigram_frac"),
    )


@register(
    "tx_word_entropy",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term
      FROM documents WHERE trim(text) <> ''
    ), cnt AS (
      SELECT doc_id, term, count(*)::DOUBLE AS c FROM tok GROUP BY doc_id, term
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def tx_word_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram Shannon entropy per document (H = log2(n) - sum(c*log2 c)/n
    — the one-pass identity needing no per-term probability column).
    explode -> (doc, term) count -> per-doc reduce: both aggregations
    combine map-side, and both key on doc_id, so the second is
    shuffle-free after the first. Low entropy = repetitive/templated
    text; pairs with tx_repetition_score as a quality gate."""
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    cnt = tok.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 4
        ).alias("entropy"),
    )


_HIST_BIN = 100  # chars per histogram bucket


@register(
    "tx_length_histogram",
    oracle=f"""
    SELECT lang, (n_chars // {_HIST_BIN}) * {_HIST_BIN} AS bin_lo,
           count(*) AS n_docs,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY lang, bin_lo
    """,
)
def tx_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language document-length histogram (fixed-width integer
    binning — the corpus-inspection primitive before choosing length
    filters). Pure map-side bin + one groupBy; bin count is bounded, so
    the shuffle is metadata-sized at any corpus size."""
    d = load(spark, sf, "documents")
    return (
        d.withColumn("bin_lo", (F.col("n_chars") / _HIST_BIN).cast("long") * _HIST_BIN)
        .groupBy("lang", "bin_lo")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
    )


# GPT-2-style pre-tokenizer shape, restricted to a Java/RE2-portable
# subset: runs of letters, runs of digits, runs of other symbols (each
# with an optional leading space), or whitespace runs
_BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


@register(
    "tx_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +'))
             AS n_bpe_tokens,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END
             AS n_ws_tokens
    FROM documents
    """,
)
def tx_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex (letter
    runs / digit runs / symbol runs, optional leading space) counted
    next to the whitespace count — the ratio between the two is the
    standard tokens-per-word sanity metric for training-data budgeting.
    regexp_count is a single vectorized JVM pass; no Python."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.lower("text"), F.lit(_BPE_PAT)).alias("n_bpe_tokens"),
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(tokens(F.col("text"))))
        .alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------- #
# corpus curation: stratified sampling + blocklist redaction
# ---------------------------------------------------------------------- #

# per-language keep rates: downsample the over-represented language,
# keep the tail. At 100 TB this is THE data-mixing primitive (domain /
# language re-weighting before training).
_STRATA_RATES = {"en": 0.25, "zh": 0.75, "fr": 0.75, "es": 0.75, "de": 0.75}
_DEFAULT_RATE = 0.5


@register(
    "tx_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0
          < CASE lang
              {" ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
              ELSE {_DEFAULT_RATE} END
    """,
)
def tx_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: uniform-in-[0,1) from
    md5(doc_id), compared to a per-stratum keep rate. Hash-based (not
    rand()) so the sample is reproducible across runs, engines, and
    retries — the auditability requirement for training-data lineage.
    Map-side filter only: no shuffle, prunes to (doc_id, lang) columns."""
    d = load(spark, sf, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    rate = F.lit(_DEFAULT_RATE)
    for k, v in _STRATA_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return d.filter(u < rate).select("doc_id", "lang")


# whole-word blocklist for masking (corpus-frequent terms stand in for a
# real PII / unsafe-term list; the mechanics are identical)
_BLOCKLIST = ("slow", "fail", "error")
_BLOCK_PAT = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


@register(
    "tx_blocklist_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{_BLOCK_PAT}')) AS INT)
             AS n_redacted,
           md5(regexp_replace(lower(text), '{_BLOCK_PAT}', '<MASKED>', 'g'))
             AS redacted_fp
    FROM documents
    WHERE len(regexp_extract_all(lower(text), '{_BLOCK_PAT}')) > 0
    """,
)
def tx_blocklist_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Blocklist masking (the PII/unsafe-term redaction shape): count and
    replace whole-word matches in one vectorized regex pass, emit only
    touched docs. The output carries a fingerprint of the redacted text
    (not the text itself) so the check stays value-exact without hashing
    megabytes through the comparator. Map-side only; the regex runs
    inside whole-stage codegen, and the match-count filter prunes the
    untouched (overwhelming) majority before any downstream shuffle."""
    d = load(spark, sf, "documents")
    n = F.regexp_count(F.lower("text"), F.lit(_BLOCK_PAT))
    return (
        d.select(
            "doc_id",
            n.alias("n_redacted"),
            F.md5(
                F.regexp_replace(F.lower("text"), _BLOCK_PAT, "<MASKED>").cast("binary")
            ).alias("redacted_fp"),
        )
        .filter(F.col("n_redacted") > 0)
    )


@register(
    "tx_domain_mix",
    oracle="""
    WITH w AS (
      SELECT source, count(*) AS n_orig,
             CAST(substr(source, 4) AS INT) + 1 AS wt
      FROM documents GROUP BY source
    ), t AS (
      SELECT sum(n_orig) AS total, sum(wt) AS wsum FROM w
    ), r AS (
      SELECT w.source, w.n_orig,
             least(1.0, (w.wt / t.wsum) * t.total / w.n_orig) AS keep_rate
      FROM w, t
    )
    SELECT d.source, max(r.n_orig) AS n_orig,
           CAST(round(max(r.keep_rate), 6) AS DOUBLE) AS keep_rate,
           count(*) AS n_kept
    FROM documents d JOIN r ON d.source = r.source
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT / 4294967296.0
          < r.keep_rate
    GROUP BY d.source
    """,
)
def tx_domain_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Target-mixture (domain-reweighting) sampling: each source gets a
    target share proportional to a per-domain weight; the keep rate is
    min(1, target_n / actual_n) and rows are kept by the deterministic
    md5 PRF. This is the DoReMi/data-mixture shape of a training
    pipeline: per-domain stats are a TINY aggregate (one row per
    domain), broadcast back onto the corpus so the actual sampling is a
    map-side filter — no corpus shuffle at any scale."""
    d = load(spark, sf, "documents")
    w = d.groupBy("source").agg(F.count("*").alias("n_orig"))
    w = w.withColumn("wt", F.substring("source", 4, 10).cast("int") + 1)
    tot = w.agg(
        F.sum("n_orig").alias("total"), F.sum("wt").alias("wsum")
    )
    rates = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_orig",
        F.least(
            F.lit(1.0), (F.col("wt") / F.col("wsum")) * F.col("total") / F.col("n_orig")
        ).alias("keep_rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(u < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.max("n_orig").alias("n_orig"),
            F.round(F.max("keep_rate"), 6).cast("double").alias("keep_rate"),
            F.count("*").alias("n_kept"),
        )
    )


@register(
    "tx_unigram_logloss",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term
      FROM documents WHERE trim(text) <> ''
    ), freq AS (
      SELECT term, count(*)::DOUBLE AS n FROM tok GROUP BY term
    ), tot AS (
      SELECT sum(n) AS nt FROM freq
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           round(-avg(ln(f.n / tot.nt)), 4) AS avg_logloss
    FROM tok t JOIN freq f USING (term), tot
    GROUP BY t.doc_id
    """,
)
def tx_unigram_logloss(spark: SparkSession, sf: str) -> DataFrame:
    """Perplexity-proxy quality score: per-document average negative
    log-probability of its tokens under the CORPUS unigram distribution
    (high = rare/atypical vocabulary, low = common/templated text) — the
    cheap stand-in for an LM-based quality filter. Two passes: corpus
    term frequencies (one shuffle on term, vocabulary-sized output,
    broadcast back), then a map-side score + per-doc reduce. The unigram
    LM is exactly the artifact a production filter precomputes once and
    broadcasts to every scoring executor."""
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").cast("double").alias("n"))
    tot = freq.agg(F.sum("n").alias("nt"))
    lm = freq.crossJoin(F.broadcast(tot)).select(
        "term", F.log(F.col("n") / F.col("nt")).alias("logp")
    )
    return (
        tok.join(F.broadcast(lm), on="term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg("logp"), 4).alias("avg_logloss"),
        )
    )


# -- PII scrubbing --------------------------------------------------------
# Patterns restricted to syntax Java regex and RE2 (DuckDB) agree on:
# character classes, bounded repetition, \b word boundaries — no
# backrefs/lookaround.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"

# The synthetic corpus carries no real PII, so the query injects a
# deterministic doc_id-derived contact block first (concat_ws drops the
# NULL branches) — the detect/redact pipeline downstream is the real
# operator under test, and the oracle recomputes the same injection.
_SQL_PII_AUG = """
  concat_ws(' ', text,
    concat('user', CAST(doc_id AS VARCHAR), '@mail.example.com'),
    CASE WHEN doc_id % 3 = 0 THEN concat('192.168.',
         CAST(doc_id % 256 AS VARCHAR), '.', CAST((doc_id * 7) % 256 AS VARCHAR)) END,
    CASE WHEN doc_id % 5 = 0 THEN concat('555-',
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) END)
"""


@register(
    "tx_pii_scrub",
    oracle=f"""
    WITH a AS (SELECT doc_id, {_SQL_PII_AUG} AS aug FROM documents),
    r AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS INT) AS n_email,
             CAST(len(regexp_extract_all(aug, '{_PII_IP}')) AS INT) AS n_ip,
             CAST(len(regexp_extract_all(aug, '{_PII_PHONE}')) AS INT) AS n_phone,
             regexp_replace(regexp_replace(regexp_replace(aug,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS red
      FROM a
    )
    SELECT doc_id, n_email, n_ip, n_phone, md5(red) AS redacted_fp FROM r
    """,
)
def tx_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII detection + redaction (emails, IPv4, phone-like tokens): count
    matches per class, then mask them in a fixed order (email -> IP ->
    phone, so a longer pattern never leaves fragments for a shorter one)
    and fingerprint the scrubbed text. Everything is vectorized JVM
    regex inside whole-stage codegen — the standard pre-training scrub
    pass, map-side only, no shuffle at any corpus size."""
    d = load(spark, sf, "documents")
    aug = F.concat_ws(
        " ",
        F.col("text"),
        F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@mail.example.com")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ),
    )
    # stage aug as a real column: the three counts + redact chain below
    # each reference it, and Catalyst does not CSE inside regex args
    a = d.select("doc_id", aug.alias("aug"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>"), _PII_IP, "<IP>"
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return a.select(
        "doc_id",
        F.regexp_count(F.col("aug"), F.lit(_PII_EMAIL)).cast("int").alias("n_email"),
        F.regexp_count(F.col("aug"), F.lit(_PII_IP)).cast("int").alias("n_ip"),
        F.regexp_count(F.col("aug"), F.lit(_PII_PHONE)).cast("int").alias("n_phone"),
        F.md5(red.cast("binary")).alias("redacted_fp"),
    )


@register(
    "tx_curation_pipeline",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text)='' THEN 0 ELSE len({_SQL_TOKENS}) END AS n_tok,
             round(
               0.4 * (CASE WHEN length(text)=0 THEN 0
                      ELSE length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE / length(text) END)
             + 0.3 * least(1.0, (CASE WHEN trim(text)='' THEN 0 ELSE len({_SQL_TOKENS}) END) / 100.0)
             + 0.3 * (CASE WHEN trim(text)='' THEN 0
                      ELSE 1.0 - len(list_filter({_SQL_TOKENS}, x -> length(x) <= 2))::DOUBLE
                               / len({_SQL_TOKENS}) END),
             4) AS q,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS h
      FROM documents
    ), f AS (
      SELECT *,
             q >= 0.70 AS q_pass,
             (q >= 0.70 AND doc_id = min(CASE WHEN q >= 0.70 THEN doc_id END)
                              OVER (PARTITION BY fp)) AS is_canon
      FROM t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(n_tok) AS BIGINT) AS tok_raw,
           CAST(count(CASE WHEN q_pass THEN 1 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN q_pass THEN n_tok ELSE 0 END) AS BIGINT) AS tok_quality,
           CAST(count(CASE WHEN is_canon THEN 1 END) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN is_canon THEN n_tok ELSE 0 END) AS BIGINT) AS tok_unique,
           CAST(count(CASE WHEN is_canon AND h < 50 THEN 1 END) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN is_canon AND h < 50 THEN n_tok ELSE 0 END) AS BIGINT) AS tok_sampled
    FROM f
    """,
)
def tx_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The composed corpus-curation funnel (the C4/Dolma preprocessing
    shape): quality filter -> exact dedup among survivors -> hash
    sample, reporting doc and token counts AFTER EVERY STAGE — the
    funnel report every training-data run ships with its output.

    Each stage reuses the engine's certified primitive: the
    tx_quality_score formula (threshold on the ROUNDED value — the
    float-filter determinism rule), dd_exact's normalized-md5
    fingerprint with min-doc_id canonical election restricted to
    quality survivors, tx_hash_sample's deterministic md5 bucket.

    Scale shape: ONE pass over the corpus; the only exchange is the
    fingerprint window for canonical election (hash-partitioned,
    map-side projected), then a scalar aggregate. The funnel costs one
    shuffle at any corpus size — no per-stage re-scans."""
    from pyspark.sql.window import Window

    # plain load (the dd_exact rule): per-row work is md5 + one
    # tokenize — it rides the scan; the cores-wide spread only
    # over-schedules tiny inputs (driver 8v32 ratio 0.64)
    d = load(spark, sf, "documents")
    tok = tokens(F.col("text"))
    n_tok = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(tok))
    n = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_short = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.filter(tok, lambda t: F.length(t) <= 2))
    )
    quality = F.round(
        0.4 * F.when(n == 0, F.lit(0.0)).otherwise(n_alpha.cast("double") / n)
        + 0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.3
        * F.when(n_tok == 0, F.lit(0.0)).otherwise(
            1.0 - n_short.cast("double") / n_tok
        ),
        4,
    )
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").cast("binary")
    )
    h = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    staged = d.select(
        "doc_id", n_tok.alias("n_tok"), quality.alias("q"), fp.alias("fp"), h.alias("h")
    )
    w = Window.partitionBy("fp")
    q_pass = F.col("q") >= 0.70
    canon = F.min(F.when(q_pass, F.col("doc_id"))).over(w)
    flags = staged.select(
        "n_tok",
        "h",
        q_pass.alias("q_pass"),
        (q_pass & (F.col("doc_id") == canon)).alias("is_canon"),
    )
    b = lambda c: c.cast("bigint")  # noqa: E731
    return flags.agg(
        b(F.count("*")).alias("n_raw"),
        b(F.sum("n_tok")).alias("tok_raw"),
        b(F.count(F.when(F.col("q_pass"), 1))).alias("n_quality"),
        b(F.sum(F.when(F.col("q_pass"), F.col("n_tok")).otherwise(0))).alias("tok_quality"),
        b(F.count(F.when(F.col("is_canon"), 1))).alias("n_unique"),
        b(F.sum(F.when(F.col("is_canon"), F.col("n_tok")).otherwise(0))).alias("tok_unique"),
        b(F.count(F.when(F.col("is_canon") & (F.col("h") < 50), 1))).alias("n_sampled"),
        b(
            F.sum(
                F.when(F.col("is_canon") & (F.col("h") < 50), F.col("n_tok")).otherwise(0)
            )
        ).alias("tok_sampled"),
    )


# -- perplexity buckets (CCNet-style head/middle/tail) --------------------

# z-score band half-width (in corpus std units) separating the buckets
_PPL_BAND = 0.4

_SQL_PPL_DOC = f"""
    tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term
      FROM documents WHERE trim(text) <> ''
    ), freq AS (
      SELECT term, count(*)::DOUBLE AS n FROM tok GROUP BY term
    ), tot AS (
      SELECT sum(n) AS nt FROM freq
    ), doc AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             round(-avg(ln(f.n / tot.nt)), 4) AS avg_logloss
      FROM tok t JOIN freq f USING (term), tot
      GROUP BY t.doc_id
    )
"""


@register(
    "tx_perplexity_buckets",
    oracle=f"""
    WITH {_SQL_PPL_DOC}, q AS (
      SELECT doc_id, n_tokens, avg_logloss,
             CAST(round(avg_logloss * 10000) AS BIGINT) AS ql
      FROM doc
    ), st AS (
      SELECT count(*) AS n, CAST(sum(ql) AS BIGINT) AS s,
             CAST(sum(ql * ql) AS BIGINT) AS ss
      FROM q
    )
    SELECT doc_id, n_tokens, avg_logloss,
           CASE WHEN CAST(ql AS DOUBLE) <=
                     CAST(s AS DOUBLE) / n - {_PPL_BAND} *
                     sqrt(CAST(ss AS DOUBLE) / n -
                          (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                THEN 'head'
                WHEN CAST(ql AS DOUBLE) <=
                     CAST(s AS DOUBLE) / n + {_PPL_BAND} *
                     sqrt(CAST(ss AS DOUBLE) / n -
                          (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM q, st
    """,
)
def tx_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus-unigram logloss, then split the corpus into head (most
    fluent), middle, and tail around the corpus mean ± {_PPL_BAND}·std.

    Scale shape: no global sort/ntile — the cutoffs come from a
    2-number corpus aggregate computed over the QUANTIZED score
    (round(logloss·1e4) as long), so the power sums are exact integers
    (the filtered-aggregate determinism pattern from op_anomaly_zscore:
    double addition is order-dependent, integer addition is not) and the
    bucket edges are bit-identical on both engines. The aggregate
    broadcasts back onto the corpus, so bucketing is map-side — the
    plan is score (one term shuffle, vocabulary-sized), reduce to one
    stats row, stamp buckets with zero further exchanges."""
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    freq = tok.groupBy("term").agg(F.count("*").cast("double").alias("n"))
    tot = freq.agg(F.sum("n").alias("nt"))
    lm = freq.crossJoin(F.broadcast(tot)).select(
        "term", F.log(F.col("n") / F.col("nt")).alias("logp")
    )
    doc = (
        tok.join(F.broadcast(lm), on="term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg("logp"), 4).alias("avg_logloss"),
        )
    )
    q = doc.withColumn(
        "ql", F.round(F.col("avg_logloss") * 10000).cast("long")
    )
    st = q.agg(
        F.count("*").alias("n"),
        F.sum("ql").alias("s"),
        F.sum(F.col("ql") * F.col("ql")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    std = F.sqrt(F.col("ss").cast("double") / F.col("n") - mean * mean)
    return (
        q.crossJoin(F.broadcast(st))
        .select(
            "doc_id",
            "n_tokens",
            "avg_logloss",
            F.when(
                F.col("ql").cast("double") <= mean - _PPL_BAND * std, "head"
            )
            .when(F.col("ql").cast("double") <= mean + _PPL_BAND * std, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# -- temperature-scaled domain sampling -----------------------------------

_TEMP_ALPHA = 0.3  # sampling temperature exponent (multilingual-LM style)


@register(
    "tx_temperature_sample",
    oracle=f"""
    WITH w AS (
      SELECT source, count(*) AS n_orig FROM documents GROUP BY source
    ), t AS (
      SELECT CAST(sum(n_orig) AS BIGINT) AS total FROM w
    ), wq AS (
      SELECT source, n_orig,
             CAST(round(pow(CAST(n_orig AS DOUBLE) / total, {_TEMP_ALPHA}) * 1000000000) AS BIGINT) AS wq
      FROM w, t
    ), ws AS (
      SELECT CAST(sum(wq) AS BIGINT) AS wsum FROM wq
    ), rates AS (
      SELECT source, n_orig,
             least(1.0, (CAST(wq AS DOUBLE) / wsum) * (total / 2.0) / n_orig) AS keep_rate
      FROM wq, ws, t
    )
    SELECT d.source, max(r.n_orig) AS n_orig,
           round(max(r.keep_rate), 6) AS keep_rate,
           count(*) AS n_kept
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
          < r.keep_rate
    GROUP BY d.source
    """,
)
def tx_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled domain sampling (the multilingual/data-mixture
    rule p_d ∝ (n_d/N)^α): raising small domains and damping large ones
    with α={_TEMP_ALPHA}, targeting N/2 sampled rows overall. Unlike
    tx_domain_mix's fixed per-domain weights, the weights here derive
    from the observed shares — the Gopher/PaLM sampling-temperature
    shape.

    Scale + determinism: the per-domain frame is domain-sized (tiny);
    the temperature weight is QUANTIZED to an integer (round(share^α ·
    1e9)) before the normalizing sum so the aggregate is exact, then the
    keep decision is the shared md5 PRF against a broadcast rate —
    map-side filter, no corpus shuffle at any scale."""
    d = load(spark, sf, "documents")
    w = d.groupBy("source").agg(F.count("*").alias("n_orig"))
    tot = w.agg(F.sum("n_orig").alias("total"))
    wq = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_orig",
        "total",
        F.round(
            F.pow(F.col("n_orig").cast("double") / F.col("total"), F.lit(_TEMP_ALPHA))
            * 1000000000
        )
        .cast("long")
        .alias("wq"),
    )
    ws = wq.agg(F.sum("wq").alias("wsum"))
    rates = wq.crossJoin(F.broadcast(ws)).select(
        "source",
        "n_orig",
        F.least(
            F.lit(1.0),
            (F.col("wq").cast("double") / F.col("wsum"))
            * (F.col("total") / F.lit(2.0))
            / F.col("n_orig"),
        ).alias("keep_rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        d.join(F.broadcast(rates), on="source")
        .filter(u < F.col("keep_rate"))
        .groupBy("source")
        .agg(
            F.max("n_orig").alias("n_orig"),
            F.round(F.max("keep_rate"), 6).alias("keep_rate"),
            F.count("*").alias("n_kept"),
        )
    )


# -- BPE tokenizer training (unrolled merge rounds) -----------------------

_BPE_ROUNDS = 3


def _sql_bpe_round(prev: str, n: int) -> str:
    """One unrolled BPE round over the vocabulary CTE `prev`
    (wid, freq, syms): count adjacent pairs weighted by word frequency,
    pick the argmax (count DESC, then pair lexicographically), then
    apply it greedily left-to-right. Greedy = within each island of
    consecutive hit positions (hits can only conflict when adjacent),
    keep alternating positions starting from the island's first — the
    leftmost-first rule as a window expression."""
    return f"""
    p{n} AS (
      SELECT syms[i] AS l, syms[i + 1] AS r,
             CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq, syms, CAST(unnest(range(1, len(syms))) AS INT) AS i
        FROM {prev}
      )
      GROUP BY 1, 2
    ), m{n} AS (
      SELECT l, r, cnt FROM p{n} ORDER BY cnt DESC, l, r LIMIT 1
    ), e{n} AS (
      SELECT wid, freq, i, syms[i] AS a,
             CASE WHEN i < len(syms) THEN syms[i + 1] END AS b
      FROM (
        SELECT wid, freq, syms,
               CAST(unnest(range(1, len(syms) + 1)) AS INT) AS i
        FROM {prev}
      )
    ), h{n} AS (
      SELECT wid, i, i - row_number() OVER (PARTITION BY wid ORDER BY i) AS grp
      FROM e{n}
      WHERE a = (SELECT l FROM m{n}) AND b = (SELECT r FROM m{n})
    ), sel{n} AS (
      SELECT wid, i, true AS sel FROM h{n}
      QUALIFY (i - min(i) OVER (PARTITION BY wid, grp)) % 2 = 0
    ), v{n} AS (
      SELECT wid, freq,
             list(CASE WHEN sel THEN a || b ELSE a END ORDER BY i) AS syms
      FROM (
        SELECT e.wid, e.freq, e.i, e.a, e.b,
               coalesce(s.sel, false) AS sel,
               coalesce(lag(coalesce(s.sel, false))
                        OVER (PARTITION BY e.wid ORDER BY e.i), false) AS prev_sel
        FROM e{n} e LEFT JOIN sel{n} s USING (wid, i)
      ) WHERE NOT prev_sel
      GROUP BY wid, freq
    )"""


def _bpe_oracle() -> str:
    rounds = "".join(
        "," + _sql_bpe_round(f"v{n - 1}", n) for n in range(1, _BPE_ROUNDS + 1)
    )
    union = "\nUNION ALL ".join(
        f"SELECT {n} AS round, l AS merge_left, r AS merge_right, cnt AS pair_count FROM m{n}"
        for n in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH w0 AS (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest({_SQL_TOKENS}) AS word
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY word
    ), v0 AS (
      SELECT row_number() OVER (ORDER BY word) AS wid, freq,
             [substr(word, CAST(i AS INT), 1) for i in range(1, len(word) + 1)] AS syms
      FROM w0
    ){rounds}
    {union}
    """


def _bpe_merge_kernel(l: str, r: str):
    """Apply one learned merge to the vocabulary, greedy left-to-right —
    map-side over the (distinct-word) vocab table, never the corpus."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            merged = []
            for syms in pdf["syms"]:
                s = list(syms)
                out = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                merged.append(out)
            yield pd.DataFrame(
                {"word": pdf["word"], "freq": pdf["freq"], "syms": merged}
            )

    return kernel


_BPE_CACHE: dict = {}


def _bpe_train(spark: SparkSession, sf: str):
    """Shared trainer stage: (merge rows, encoded vocab word->syms).
    Cached per (session, corpus) — tx_bpe_train returns the merge
    table, tx_bpe_encode applies the final vocabulary to the corpus;
    both read the SAME trained state (one training pass, like the PQ
    index cache)."""
    from fluss_spark.registry import session_key

    key = (session_key(spark), sf)
    if key in _BPE_CACHE:
        return _BPE_CACHE[key]
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    words = (
        d.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    vocab = words.select(
        "word",
        "freq",
        F.filter(F.split(F.col("word"), ""), lambda x: x != "").alias("syms"),
    )
    out_rows = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    )
                ).alias("pr"),
            )
            .select(F.col("pr.0").alias("l"), F.col("pr.1").alias("r"), "freq")
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.col("cnt").desc(), "l", "r").limit(1).collect()[0]
        out_rows.append((rnd, top["l"], top["r"], top["cnt"]))
        vocab = vocab.mapInPandas(
            _bpe_merge_kernel(top["l"], top["r"]),
            "word string, freq long, syms array<string>",
        ).localCheckpoint()
    _BPE_CACHE[key] = (out_rows, vocab)
    return out_rows, vocab


@register("tx_bpe_train", oracle=_bpe_oracle())
def tx_bpe_train(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer TRAINING (the GPT-2/SentencePiece merge loop, not
    just tokenization): {_BPE_ROUNDS} unrolled rounds of count-adjacent-
    pairs -> merge-the-argmax, returning the learned merge table.

    Scale shape: training runs over the VOCABULARY (distinct words +
    frequencies — one corpus shuffle, then vocabulary-sized forever),
    which is how production BPE trainers stay tractable: a 100 TB corpus
    has a ~100M-row vocab. Each round is one map-side pair explode +
    partial-agg shuffle on the pair key, a 1-row argmax collect
    (metadata-sized, like the k-means trainer), and a broadcast-closure
    Arrow kernel applying the merge greedily left-to-right. The oracle
    unrolls all rounds in SQL, expressing the greedy merge as an
    islands-window selection — full hash-match parity for an iterative
    trainer. Ties break (count DESC, pair ASC) on both sides."""
    out_rows, _vocab = _bpe_train(spark, sf)
    return spark.createDataFrame(
        out_rows, "round int, merge_left string, merge_right string, pair_count long"
    )


def _bpe_encode_oracle() -> str:
    rounds = "".join(
        "," + _sql_bpe_round(f"v{n - 1}", n) for n in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH w0 AS (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest({_SQL_TOKENS}) AS word
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY word
    ), v0 AS (
      SELECT row_number() OVER (ORDER BY word) AS wid, freq,
             [substr(word, CAST(i AS INT), 1) for i in range(1, len(word) + 1)] AS syms
      FROM w0
    ), v0w AS (
      SELECT row_number() OVER (ORDER BY word) AS wid, word FROM w0
    ){rounds}, vmap AS (
      SELECT v0w.word, v{_BPE_ROUNDS}.syms
      FROM v{_BPE_ROUNDS} JOIN v0w USING (wid)
    ), dt0 AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE trim(text) <> ''
    ), dt AS (
      SELECT doc_id, pos, toks[pos] AS word FROM (
        SELECT doc_id, toks, CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos
        FROM dt0
      )
    ), flat AS (
      SELECT doc_id, pos, si, syms[si] AS sym FROM (
        SELECT dt.doc_id, dt.pos, vm.syms,
               CAST(unnest(range(1, len(vm.syms) + 1)) AS INT) AS si
        FROM dt JOIN vmap vm USING (word)
      )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bpe,
           md5(string_agg(sym, ' ' ORDER BY pos, si)) AS bpe_fp
    FROM flat GROUP BY doc_id
    """


@register("tx_bpe_encode", oracle=_bpe_encode_oracle())
def tx_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale: encode every document with
    the trained BPE merges (the step that actually runs over 100 TB —
    training is vocabulary-sized, encoding is corpus-sized). The
    trained vocabulary maps word -> merged symbols, so encoding is a
    token explode + one join on the word (broadcast-able while the
    vocab is small; a plain shuffle join at 100M-word vocab scale) +
    per-doc reassembly. Output = per-doc BPE token count and an
    md5 fingerprint of the exact symbol stream — hash-match proves
    symbol-level identity, not just counts. Shares ONE trained state
    with tx_bpe_train (session cache)."""
    _rows, vocab = _bpe_train(spark, sf)
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    toks = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word")
    )
    enc = toks.join(F.broadcast(vocab.select("word", "syms")), "word")
    ordered = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "syms"))),
            lambda s: s["syms"],
        )
    )
    return enc.groupBy("doc_id").agg(
        F.sum(F.size("syms")).cast("bigint").alias("n_bpe"),
        F.md5(F.concat_ws(" ", ordered).cast("binary")).alias("bpe_fp"),
    )


@register(
    "tx_boilerplate_removal",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text)='' THEN CAST([] AS VARCHAR[])
                  ELSE {_SQL_TOKENS} END AS toks
      FROM documents
    ),
    seg AS (
      SELECT doc_id, i AS pos,
             array_to_string(toks[(i*3+1):(i*3+3)], ' ') AS seg,
             md5(array_to_string(toks[(i*3+1):(i*3+3)], ' ')) AS fp
      FROM t, unnest(range(0, CAST(ceil(len(toks)/3.0) AS BIGINT))) AS g(i)
    ),
    boiler AS (
      SELECT fp FROM seg GROUP BY fp HAVING count(DISTINCT doc_id) >= 3
    ),
    kept AS (
      SELECT s.doc_id, s.pos, s.seg FROM seg s ANTI JOIN boiler b USING (fp)
    ),
    agg AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS cleaned_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(a.cleaned_text, '') AS cleaned_text,
           coalesce(a.n_kept, 0) AS n_kept,
           CAST(ceil(len(t.toks)/3.0) AS BIGINT) - coalesce(a.n_kept, 0)
             AS n_removed
    FROM t LEFT JOIN agg a USING (doc_id)
    """,
)
def tx_boilerplate_removal(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style boilerplate removal by CORPUS FREQUENCY: split every
    document into non-overlapping 3-token segments, count how many
    distinct documents each segment appears in, and strip segments seen
    in >= 3 documents (headers/footers/navigation chrome — the
    repeated-everywhere text that passage dedup's first-occurrence rule
    deliberately keeps once). Documents are reassembled in segment
    order; empty docs survive with empty cleaned text.

    Scale shape: the segment explode is map-side; frequency is ONE
    shuffle on the 16-byte fingerprint with map-side partial distinct;
    the boilerplate set (frequency >= threshold) is tiny by definition,
    so the removal join broadcasts it; reassembly reuses the doc_id
    aggregation. The exploded stage is persisted because it feeds both
    the frequency count and the removal side (at 100 TB this is the
    stage you'd checkpoint — recomputing it means a second corpus
    scan)."""
    d = load_spread(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        F.when(F.trim("text") == "", F.array().cast("array<string>"))
        .otherwise(tokens(F.col("text")))
        .alias("toks"),
    )
    # stage the segment array as a real column BEFORE the generator:
    # an explode over an inlined HOF chain re-evaluates it per output
    # row (see NOTES.md), and sequence(0, -1) on empty docs would
    # descend — guard with an explicit empty array
    segs = toks.select(
        "doc_id",
        F.when(F.size("toks") == 0, F.array().cast("array<string>"))
        .otherwise(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / F.lit(3.0)).cast("int") - 1,
                ),
                lambda i: F.array_join(F.slice("toks", i * 3 + 1, 3), " "),
            )
        )
        .alias("segs"),
    )
    # consumed by the boilerplate aggregate AND the join back; session-
    # keyed through the cache registry (budgeted + LRU-unpersisted)
    from fluss_spark import cache_registry

    ex = cache_registry.cache_df(
        spark,
        ("boiler_segs", sf),
        lambda: segs.select("doc_id", F.posexplode("segs").alias("pos", "seg"))
        .withColumn("fp", F.md5("seg")),
        # lazy (the pre-registry behavior): both consumers sit in ONE
        # job, which materializes the cache as a side effect — an eager
        # count here measurably re-ran the explode chain (bench +0.4s)
        eager=False,
    )
    boiler = (
        ex.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 3)
        .select("fp")
    )
    kept = ex.join(F.broadcast(boiler), "fp", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("cleaned_text"),
        F.count("*").alias("n_kept"),
    )
    totals = segs.select("doc_id", F.size("segs").cast("bigint").alias("n_segs"))
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_segs") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


@register(
    "tx_bigram_logloss",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    vocab AS (
      SELECT count(DISTINCT term)::DOUBLE AS v
      FROM (SELECT unnest(toks) AS term FROM t)
    ),
    bg AS (
      SELECT doc_id, toks[i+1] AS w1,
             toks[i+1] || ' ' || toks[i+2] AS b
      FROM t, unnest(range(0, len(toks) - 1)) AS g(i)
    ),
    cb AS (SELECT b, count(*)::DOUBLE AS nb FROM bg GROUP BY b),
    cu AS (SELECT w1, count(*)::DOUBLE AS n1 FROM bg GROUP BY w1)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           round(-avg(ln((cb.nb + 0.5) / (cu.n1 + 0.5 * vocab.v))), 4)
             AS avg_logloss
    FROM bg JOIN cb USING (b) JOIN cu USING (w1), vocab
    GROUP BY bg.doc_id
    """,
)
def tx_bigram_logloss(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM perplexity proxy with add-k smoothing (k=0.5): the
    CCNet-style quality signal one order up from tx_unigram_logloss —
    templated text scores low (its bigrams repeat corpus-wide), unusual
    word SEQUENCES score high even when each word is common.

    Scale shape: bigram counts are ONE shuffle on the bigram key
    (map-side combine); the conditional denominator C(w1) aggregates
    the SAME bigram rows by their first token (vocabulary-sized). The
    scoring join is a plain equi-join on the bigram — unlike the
    unigram LM the bigram table is vocab²-bounded, too big to assume
    broadcastable at 100 TB, so the plan keeps it shuffle-joined; the
    smoothing constant V (distinct unigrams) is a broadcast 1-row
    stat."""
    toks, pre = _bigram_stage(spark, sf)
    vocab = (
        toks.select(F.explode("toks").alias("term"))
        .agg(F.countDistinct("term").cast("double").alias("v"))
    )
    cb = pre.groupBy("b").agg(F.sum("cnt").cast("double").alias("nb"))
    cu = pre.groupBy("w1").agg(F.sum("cnt").cast("double").alias("n1"))
    return (
        pre.join(cb, on="b")
        .join(F.broadcast(cu), on="w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.round(
                -F.sum(
                    F.col("cnt")
                    * F.log((F.col("nb") + 0.5) / (F.col("n1") + 0.5 * F.col("v")))
                )
                / F.sum("cnt"),
                4,
            ).alias("avg_logloss"),
        )
    )


def _bigram_stage(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    """(toks, pre) — the tokenized corpus and its per-doc distinct
    bigram counts, persisted ONCE per session+sf through the cache
    registry (budgeted + LRU-unpersisted; the sig_stage pattern):
    repeated invocations reuse one cached pair instead of stacking a
    new persist per call."""
    from fluss_spark import cache_registry

    d = load_spread(spark, sf, "documents").filter(F.trim("text") != "")
    # ONE tokenize pass feeds both the bigram staging and the vocab
    # count (previously the regex tokenizer ran twice over the corpus —
    # the single most expensive map stage in the query)
    toks = cache_registry.cache_df(
        spark,
        ("bigram_toks", sf),
        lambda: d.select("doc_id", tokens(F.col("text")).alias("toks")),
        eager=False,  # pre-registry behavior: lazy, first job materializes
    )
    # stage the bigram structs before the generator (NOTES: an explode
    # over an inlined HOF chain re-evaluates it per output row)
    staged = toks.select(
        "doc_id",
        F.when(F.size("toks") < 2, F.array().cast("array<struct<w1:string,b:string>>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    F.col("toks")[i].alias("w1"),
                    F.concat(F.col("toks")[i], F.lit(" "), F.col("toks")[i + 1]).alias("b"),
                ),
            )
        )
        .alias("bgs"),
    )
    bg = staged.select("doc_id", F.explode("bgs").alias("g")).select(
        "doc_id", F.col("g.w1").alias("w1"), F.col("g.b").alias("b")
    )
    # collapse occurrences to per-doc DISTINCT bigrams first: the one
    # full-corpus exchange carries map-side-combined (doc, bigram, cnt)
    # rows, and every downstream shuffle (bigram counts, conditional
    # denominators, the scoring join) moves the deduped relation, not
    # |tokens| occurrence rows. The per-doc average becomes the
    # cnt-weighted mean — identical math, smaller shuffles.
    pre = cache_registry.cache_df(
        spark,
        ("bigram_pre", sf),
        lambda: bg.groupBy("doc_id", "w1", "b").agg(F.count("*").alias("cnt")),
        eager=False,  # pre-registry behavior: lazy, first job materializes
    )
    return toks, pre


@register(
    "tx_dataset_card",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN trim(text)='' THEN 0 ELSE len({_SQL_TOKENS}) END) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs,
           round(avg((lang = 'en')::INT), 4) AS pct_en,
           round(1.0 - count(DISTINCT md5(text)) / count(*)::DOUBLE, 4) AS dup_rate,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY source
    """,
)
def tx_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset card: the per-source summary a corpus release ships with
    — document/token counts, language mix, exact-duplicate rate, size
    profile. ONE shuffle on source (the two DISTINCT aggregates share
    it via Spark's expand-based multi-distinct planning); every metric
    is a map-side-combinable aggregate, so the query scales as a single
    pass over the corpus regardless of source cardinality."""
    d = load_spread(spark, sf, "documents")
    n_tok = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(tokens(F.col("text")))
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok.cast("bigint")).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg((F.col("lang") == "en").cast("int")), 4).alias("pct_en"),
        F.round(
            F.lit(1.0) - F.countDistinct(F.md5("text")) / F.count("*"), 4
        ).alias("dup_rate"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


_SEQ_LEN = 256  # tokens per packed training sequence


@register(
    "tx_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 8 AS shard,
             len({_SQL_TOKENS}) AS n_tok
      FROM documents WHERE trim(text) <> ''
    ), r AS (
      SELECT doc_id, shard, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n_tok AS start
      FROM t
    )
    SELECT shard, CAST(s AS BIGINT) AS seq_no, doc_id,
           CAST(greatest(start, s * {_SEQ_LEN}) - s * {_SEQ_LEN} AS BIGINT)
             AS seg_start,
           CAST(least(start + n_tok, (s + 1) * {_SEQ_LEN})
                - greatest(start, s * {_SEQ_LEN}) AS BIGINT) AS seg_len
    FROM r, unnest(range(CAST(start // {_SEQ_LEN} AS BIGINT),
                         CAST((start + n_tok - 1) // {_SEQ_LEN} + 1 AS BIGINT)))
                AS g(s)
    """,
)
def tx_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-length training-sequence packing — the final layout stage
    of a pretraining pipeline: per shard (md5 PRF of doc_id, the shared
    oracle convention), documents are concatenated in doc_id order and
    cut into {256}-token sequences; the output maps every document to
    the sequence(s) it lands in with its token span inside each
    (the attention-boundary / span metadata a loader needs when a doc
    straddles a cut).

    ONE exchange (the per-shard running-sum window; at 100 TB the shard
    count rises so no partition holds a whole shard's doc list), then a
    map-side interval explode — a doc spanning k sequences emits k
    rows. Integer arithmetic end to end, so the layout is reproducible
    across engines and re-partitions."""
    from pyspark.sql.window import Window

    d = load_spread(spark, sf, "documents").filter(F.trim("text") != "")
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16, 10,
        ).cast("long") % 8
    )
    base = d.select(
        "doc_id", shard.alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = base.select(
        "doc_id", "shard", "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
    )
    # stage the sequence bounds as real columns before the generator
    r = r.withColumn("first_s", F.floor(F.col("start") / _SEQ_LEN)).withColumn(
        "last_s", F.floor((F.col("start") + F.col("n_tok") - 1) / _SEQ_LEN)
    )
    ex = r.select(
        "shard", "doc_id", "start", "n_tok",
        F.explode(F.sequence("first_s", "last_s")).alias("s"),
    )
    lo = F.greatest(F.col("start"), F.col("s") * _SEQ_LEN)
    hi = F.least(F.col("start") + F.col("n_tok"), (F.col("s") + 1) * _SEQ_LEN)
    return ex.select(
        "shard",
        F.col("s").cast("bigint").alias("seq_no"),
        "doc_id",
        (lo - F.col("s") * _SEQ_LEN).cast("bigint").alias("seg_start"),
        (hi - lo).cast("bigint").alias("seg_len"),
    )


@register(
    "tx_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text)='' THEN [] ELSE {_SQL_TOKENS} END AS toks,
             list_filter(list_transform(regexp_split_to_array(text, '\n'), l -> trim(l)),
                         l -> l <> '') AS lines
      FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS sum_len,
             len(list_filter(toks, x -> contains(x, '#') OR contains(x, '...'))) AS n_sym,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
             len(list_filter(['the','a','and','of','to','in','is','that'],
                             w -> list_contains(toks, w))) AS stop_hits,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> substr(l, 1, 1) IN ('-', '*', '•'))) AS n_bullet,
             len(list_filter(lines, l -> right(l, 3) = '...')) AS n_ellip
      FROM t
    ), r AS (
      SELECT doc_id,
             n_tok BETWEEN 20 AND 100000 AS r_word_count,
             n_tok > 0 AND (sum_len::DOUBLE / n_tok) BETWEEN 3 AND 10 AS r_mean_word_len,
             n_tok > 0 AND n_sym::DOUBLE / n_tok <= 0.1 AS r_symbol_ratio,
             n_lines = 0 OR n_bullet::DOUBLE / n_lines <= 0.9 AS r_bullet_ratio,
             n_lines = 0 OR n_ellip::DOUBLE / n_lines <= 0.3 AS r_ellipsis_ratio,
             n_tok > 0 AND n_alpha::DOUBLE / n_tok >= 0.8 AS r_alpha_ratio,
             stop_hits >= 2 AS r_stopwords
      FROM s
    )
    SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet_ratio,
           r_ellipsis_ratio, r_alpha_ratio, r_stopwords,
           CAST(NOT r_word_count AS INT) + CAST(NOT r_mean_word_len AS INT)
           + CAST(NOT r_symbol_ratio AS INT) + CAST(NOT r_bullet_ratio AS INT)
           + CAST(NOT r_ellipsis_ratio AS INT) + CAST(NOT r_alpha_ratio AS INT)
           + CAST(NOT r_stopwords AS INT) AS n_failed,
           r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_ratio
           AND r_ellipsis_ratio AND r_alpha_ratio AND r_stopwords AS keep
    FROM r
    """,
)
def tx_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, appendix A1.1 —
    the published heuristic set MassiveText was filtered with): word
    count bounds, mean word length 3-10, symbol-to-word ratio, bullet /
    ellipsis line ratios, alphabetic-token ratio, minimum stop-word
    hits. The thresholds and stop set are corpus/language parameters in
    practice; here the word-count floor is 20 (the synthetic docs run
    10-100 tokens) and the stop set is the corpus's function words — the
    rule STRUCTURE is Gopher's. One map-side pass of JVM array HOFs —
    zero exchanges, zero
    Python — emitting per-rule booleans plus the composed keep decision,
    so a pipeline can audit WHICH rule kills a document (the per-rule
    breakdown is what turns a filter into a tunable curation report).
    Ratio comparisons are single IEEE divisions of exact integers —
    deterministic on both engines, and the output is all booleans/ints
    (no float hashing surface)."""
    d = load(spark, sf, "documents")
    tok = F.when(F.trim("text") == "", F.array().cast("array<string>")).otherwise(
        tokens(F.col("text"))
    )
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    s = d.select(
        "doc_id",
        F.size(tok).alias("n_tok"),
        F.aggregate(tok, F.lit(0), lambda a, x: a + F.length(x)).alias("sum_len"),
        F.size(
            F.filter(tok, lambda x: x.contains("#") | x.contains("..."))
        ).alias("n_sym"),
        F.size(F.filter(tok, lambda x: x.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.filter(
                F.array(*[F.lit(w) for w in ("the", "a", "and", "of", "to", "in", "is", "that")]),
                lambda w: F.array_contains(tok, w),
            )
        ).alias("stop_hits"),
        F.size(lines).alias("n_lines"),
        F.size(
            F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "*", "•"))
        ).alias("n_bullet"),
        F.size(F.filter(lines, lambda l: l.endswith("..."))).alias("n_ellip"),
    )
    r = s.select(
        "doc_id",
        F.col("n_tok").between(20, 100000).alias("r_word_count"),
        (
            (F.col("n_tok") > 0)
            & (F.col("sum_len").cast("double") / F.col("n_tok")).between(3, 10)
        ).alias("r_mean_word_len"),
        (
            (F.col("n_tok") > 0)
            & (F.col("n_sym").cast("double") / F.col("n_tok") <= 0.1)
        ).alias("r_symbol_ratio"),
        (
            (F.col("n_lines") == 0)
            | (F.col("n_bullet").cast("double") / F.col("n_lines") <= 0.9)
        ).alias("r_bullet_ratio"),
        (
            (F.col("n_lines") == 0)
            | (F.col("n_ellip").cast("double") / F.col("n_lines") <= 0.3)
        ).alias("r_ellipsis_ratio"),
        (
            (F.col("n_tok") > 0)
            & (F.col("n_alpha").cast("double") / F.col("n_tok") >= 0.8)
        ).alias("r_alpha_ratio"),
        (F.col("stop_hits") >= 2).alias("r_stopwords"),
    )
    rules = [
        "r_word_count",
        "r_mean_word_len",
        "r_symbol_ratio",
        "r_bullet_ratio",
        "r_ellipsis_ratio",
        "r_alpha_ratio",
        "r_stopwords",
    ]
    n_failed = sum((~F.col(c)).cast("int") for c in rules)
    keep_col = F.col(rules[0])
    for c in rules[1:]:
        keep_col = keep_col & F.col(c)
    return r.select(
        "doc_id", *rules, n_failed.alias("n_failed"), keep_col.alias("keep")
    )


def _fertility_oracle() -> str:
    rounds = "".join(
        "," + _sql_bpe_round(f"v{n - 1}", n) for n in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
    WITH w0 AS (
      SELECT word, count(*)::BIGINT AS freq FROM (
        SELECT unnest({_SQL_TOKENS}) AS word
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY word
    ), v0 AS (
      SELECT row_number() OVER (ORDER BY word) AS wid, freq,
             [substr(word, CAST(i AS INT), 1) for i in range(1, len(word) + 1)] AS syms
      FROM w0
    ), v0w AS (
      SELECT row_number() OVER (ORDER BY word) AS wid, word FROM w0
    ){rounds}, vmap AS (
      SELECT v0w.word, len(v{_BPE_ROUNDS}.syms) AS n_syms
      FROM v{_BPE_ROUNDS} JOIN v0w USING (wid)
    ), dt AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS word
      FROM documents WHERE trim(text) <> ''
    ), enc AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n_syms) AS BIGINT) AS n_bpe
      FROM dt JOIN vmap USING (word) GROUP BY lang
    ), byt AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(strlen(text)) AS BIGINT) AS n_bytes
      FROM documents WHERE trim(text) <> '' GROUP BY lang
    )
    SELECT lang, n_docs, n_words, n_bpe,
           round(n_bpe / n_words::DOUBLE, 4) AS fertility,
           round(n_bytes / n_bpe::DOUBLE, 4) AS bytes_per_token
    FROM enc JOIN byt USING (lang)
    """


@register("tx_tokenizer_fertility", oracle=_fertility_oracle())
def tx_tokenizer_fertility(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-equity audit: per-language fertility (BPE tokens per
    word) and compression (bytes per BPE token) of the TRAINED
    tokenizer — the standard multilingual-tokenizer metric: a BPE vocab
    trained on an en-dominant corpus fragments other languages into
    more symbols per word, which inflates their effective sequence
    lengths and training cost. Shares the one trained state with
    tx_bpe_train/tx_bpe_encode (session cache); the audit itself is a
    corpus word explode + broadcast vocab join + two per-lang integer
    aggregations (exact sums; ratios rounded at the end), so it costs
    one shuffle keyed by a handful of languages."""
    _rows, vocab = _bpe_train(spark, sf)
    d = load(spark, sf, "documents").filter(F.trim("text") != "")
    words = d.select("lang", F.explode(tokens(F.col("text"))).alias("word"))
    enc = (
        words.join(
            F.broadcast(vocab.select("word", F.size("syms").alias("n_syms"))), "word"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe"),
        )
    )
    byt = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.octet_length("text")).cast("bigint").alias("n_bytes"),
    )
    return enc.join(byt, "lang").select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe",
        F.round(F.col("n_bpe") / F.col("n_words"), 4).alias("fertility"),
        F.round(F.col("n_bytes") / F.col("n_bpe"), 4).alias("bytes_per_token"),
    )
