"""Greedy BPE-merge semantics: the Arrow kernel and the oracle's
islands-window SQL must agree on the hard cases — overlapping hits in
same-symbol runs, where leftmost-first merging is order-sensitive."""

from __future__ import annotations

import duckdb
import pandas as pd

from fluss_spark.operators.text import _bpe_merge_kernel, _sql_bpe_round


def _kernel_merge(syms: list[str], l: str, r: str) -> list[str]:
    k = _bpe_merge_kernel(l, r)
    out = list(
        k(iter([pd.DataFrame({"word": ["w"], "freq": [1], "syms": [syms]})]))
    )
    return list(out[0]["syms"][0])


def test_kernel_greedy_leftmost():
    # runs of identical symbols: leftmost-first, no re-merge of output
    assert _kernel_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _kernel_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _kernel_merge(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    # merged token never cascades within the same round
    assert _kernel_merge(list("abab"), "a", "b") == ["ab", "ab"]
    assert _kernel_merge(list("aab"), "a", "b") == ["a", "ab"]
    # multi-char symbols match exactly, not by prefix
    assert _kernel_merge(["x", "ab", "b"], "a", "b") == ["x", "ab", "b"]


def test_sql_round_matches_kernel_on_runs():
    """The islands-window SQL (one unrolled round) reproduces the
    kernel's greedy merge on run-heavy vocabularies."""
    vocab = [
        (1, 40, list("aaaa")),
        (2, 30, list("aaa")),
        (3, 20, list("aaaaa")),
        (4, 10, list("baab")),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE v0 (wid BIGINT, freq BIGINT, syms VARCHAR[])")
    con.executemany("INSERT INTO v0 VALUES (?, ?, ?)", vocab)
    sql = f"WITH {_sql_bpe_round('v0', 1)[5:]} SELECT wid, syms FROM v1 ORDER BY wid"
    got = dict(con.sql(sql).fetchall())
    # argmax pair is (a, a): freq-weighted cnt = 3*40 + 2*30 + 4*20 + 1*10
    top = con.sql(
        f"WITH {_sql_bpe_round('v0', 1)[5:]} SELECT l, r, cnt FROM m1"
    ).fetchone()
    assert top == ("a", "a", 270)
    for wid, freq, syms in vocab:
        assert got[wid] == _kernel_merge(syms, "a", "a"), (wid, got[wid])


def test_leakage_safe_split_no_cross_split_bucket_pairs(spark, sf_dir):
    """The leakage guard itself, checked over the banded LSH relation:
    any two docs sharing an LSH bucket (band, band_sig) — i.e. every
    candidate near-dup pair — must land in the SAME split. A doc-keyed
    hash split violates this; the cluster-keyed split cannot."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fluss_spark.operators.dedup import (
        banded_signature,
        dd_lsh_canonical,
        lsh_params,
        sig_stage,
        tx_split_leakage_safe,
    )

    # rebuild the per-doc split exactly as the query assigns it
    canon = dd_lsh_canonical(spark, sf_dir).select("doc_id", "canonical_id")
    bkt = (
        F.conv(
            F.substring(F.md5(F.col("canonical_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("long")
        % 10
    )
    split_of = canon.withColumn(
        "split",
        F.when(bkt < 8, F.lit("train")).when(bkt == 8, F.lit("valid")).otherwise(F.lit("test")),
    ).select("doc_id", "split")

    r_rows, n_bands = lsh_params(sf_dir)
    staged = sig_stage(spark, sf_dir).select("doc_id", "sig")
    banded = staged.select(
        "doc_id", F.explode(banded_signature(F.col("sig"), n_bands, r_rows)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.band_sig").alias("band_sig"))
    per_bucket = (
        banded.join(split_of, "doc_id")
        .groupBy("band", "band_sig")
        .agg(F.countDistinct("split").alias("n_splits"))
    )
    assert per_bucket.filter(F.col("n_splits") > 1).count() == 0

    # sanity: the split partitions the whole corpus (every doc assigned once)
    from fluss_spark.registry import load

    n_docs = load(spark, sf_dir, "documents").count()
    agg = tx_split_leakage_safe(spark, sf_dir).agg(F.sum("n_docs")).first()[0]
    assert agg == n_docs


def test_jaccard_block_pairs_kernel_matches_loop():
    """The vectorized all-pairs Jaccard kernel (inverted-index tally and
    dense-matmul arms) must emit exactly the pairs the reference set
    loop emits — same intersection counts, same float64 threshold
    comparison — on random blocks with duplicate clusters, empty sets,
    and a heavily shared (boilerplate) shingle."""
    import random

    import pandas as pd

    from fluss_spark.operators import dedup as D

    rng = random.Random(7)

    def mk_block(n, vocab, set_len, dup_clusters=0, boilerplate=False):
        rows = []
        for i in range(n):
            s = rng.sample(range(vocab), min(set_len, vocab))
            if boilerplate:
                s.append(0)  # one shingle shared by every doc
            rows.append((1000 + i, s))
        for _ in range(dup_clusters):
            # identical 4-doc clusters
            proto = rng.sample(range(vocab), min(set_len, vocab))
            base = 1000 + len(rows)
            for k in range(4):
                rows.append((base + k, list(proto)))
        return pd.DataFrame({"doc_id": [r[0] for r in rows],
                             "s": [r[1] for r in rows]})

    for thr in (0.02, 0.2, 0.5):
        loop = D._jaccard_block_pairs_loop(thr)
        vec = D.jaccard_block_pairs_kernel(thr)
        for blk in (
            mk_block(40, 5000, 50, dup_clusters=3),
            mk_block(60, 200, 30, boilerplate=True),   # heavy sharing
            mk_block(25, 80, 10, dup_clusters=2, boilerplate=True),
            pd.DataFrame({"doc_id": [1], "s": [[1, 2]]}),  # n < 2
            pd.DataFrame({"doc_id": [1, 2], "s": [[], []]}),  # empty sets
        ):
            want = sorted(map(tuple, loop(blk).to_numpy().tolist()))
            got = sorted(map(tuple, vec(blk).to_numpy().tolist()))
            assert got == want, f"thr={thr}: {got[:5]} vs {want[:5]}"
        # force the dense arm: shrink the key budget so the tally path
        # is skipped, and check it still matches
        old = D._JBP_KEY_BUDGET
        D._JBP_KEY_BUDGET = 0
        try:
            vec2 = D.jaccard_block_pairs_kernel(thr)
            blk = mk_block(50, 300, 25, dup_clusters=2, boilerplate=True)
            want = sorted(map(tuple, loop(blk).to_numpy().tolist()))
            got = sorted(map(tuple, vec2(blk).to_numpy().tolist()))
            assert got == want
            # and past both budgets -> the loop fallback
            old_d = D._JBP_DENSE_BUDGET
            D._JBP_DENSE_BUDGET = 0
            try:
                vec3 = D.jaccard_block_pairs_kernel(thr)
                got3 = sorted(map(tuple, vec3(blk).to_numpy().tolist()))
                assert got3 == want
            finally:
                D._JBP_DENSE_BUDGET = old_d
        finally:
            D._JBP_KEY_BUDGET = old
