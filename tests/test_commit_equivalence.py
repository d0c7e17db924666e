"""Single-action commit ≡ two-pass commit.

The round-7 fused commit (`KvStore._commit_single_action`: one write
action producing WAL + snapshot as sibling partition dirs) must produce
the SAME commit artifacts as the retained two-pass WAL-first path
(`_commit_twopass`, still used by partitioned / auto-increment pk
tables) for any batch sequence:

  - identical snapshot rows,
  - identical per-bucket high-water marks,
  - identical changelog EVENT MULTISET (change type, fold seq/sub, data),
  - per-key WAL offset order == fold (seq, sub) order in both.

Offsets are NOT compared across keys: the two paths assign per-bucket
offsets in different (both valid) within-bucket orders — two-pass sorts
by (seq, sub, pk), single-action by (pk, seq, sub); the contract is
per-KEY changelog order (all events of a key share a bucket since
bucket key ⊆ pk), which both preserve.
"""

from __future__ import annotations

import types as pytypes

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluss_spark.catalog import Catalog
from fluss_spark.sources.kv import KvStore
from fluss_spark.table import create_table
from fluss_spark.types import (
    BUCKET_COL,
    CHANGE_TYPE_COL,
    OFFSET_COL,
    TIMESTAMP_COL,
    Field,
    TableSchema,
)


def _schema():
    return TableSchema(
        fields=[
            Field("k", "INT", nullable=False),
            Field("v", "STRING"),
            Field("n", "BIGINT"),
        ],
        primary_key=["k"],
        num_buckets=4,
        properties={},
    )


def _force_twopass(t):
    """Route every commit of this table through the two-pass path."""
    t.kv._commit_changelog = pytypes.MethodType(
        lambda self, spark, cl, ts, bb=None: KvStore._commit_twopass(
            self, spark, cl, ts
        ),
        t.kv,
    )


def _mk_tables(spark, tmp_path, name):
    cat = Catalog(str(tmp_path / f"wh_{name}"))
    ta = create_table(cat, "db", "two_pass", _schema())
    tb = create_table(cat, "db", "single_action", _schema())
    _force_twopass(ta)
    return ta, tb


def _batch_df(spark, rows):
    """rows: list of (k, v, n, op)."""
    return spark.createDataFrame(rows, "k int, v string, n long, __op string")


def _nskey(tup):
    """None-safe sort key (v/n columns are nullable)."""
    return tuple((x is None, x) for x in tup)


def _snap(t, spark):
    return sorted(
        ((r["k"], r["v"], r["n"]) for r in t.snapshot(spark).collect()),
        key=_nskey,
    )


def _events(t, spark):
    """Changelog event multiset + per-key offset-order check."""
    rows = t.kv.log.scan(spark).select(
        BUCKET_COL, OFFSET_COL, CHANGE_TYPE_COL, TIMESTAMP_COL,
        "__seq", "__sub", "k", "v", "n",
    ).collect()
    ev = sorted(
        (
            (r[BUCKET_COL], r[CHANGE_TYPE_COL], r["__seq"], r["__sub"], r["k"], r["v"], r["n"])
            for r in rows
        ),
        key=_nskey,
    )
    # per (key, commit), WAL offset order must equal (seq, sub) order —
    # the fold seq restarts every commit, so the scope is one commit
    # (distinguished by its commit timestamp, unique per test batch)
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r["k"], r[TIMESTAMP_COL]), []).append(
            (r[OFFSET_COL], r["__seq"], r["__sub"])
        )
    for k, lst in by_key.items():
        lst.sort()
        assert [(s, u) for _, s, u in lst] == sorted(
            (s, u) for _, s, u in lst
        ), f"key {k}: offset order != fold order"
    return ev


def _hwm(t):
    st_ = t.catalog.current_commit(t.db, t.name)
    return {int(b): o for b, o in st_.log_hwm.items()}


def _assert_equal_state(ta, tb, spark):
    assert _snap(ta, spark) == _snap(tb, spark)
    assert _hwm(ta) == _hwm(tb)
    assert _events(ta, spark) == _events(tb, spark)


def test_commit_paths_equivalent_scripted(spark, tmp_path):
    """Fixed scenario covering the fused path's routing branches:
    inserts, updates, deletes, a commit whose only input deletes ABSENT
    keys (no change events at all -> empty WAL dir branch), and a
    commit that deletes every key of a touched bucket (snapshot side
    empty for that bucket)."""
    ta, tb = _mk_tables(spark, tmp_path, "scripted")
    ts = 1_700_000_000_000

    batches = [
        # bulk insert over all buckets
        [(k, f"v{k}", k * 10, "U") for k in range(20)],
        # mixed: updates + deletes + a new key
        [(1, "x", 111, "U"), (2, None, 222, "U"), (3, "d", 0, "D"), (99, "new", 9, "U")],
        # deletes of ABSENT keys only -> commit with zero change events
        [(1000, None, None, "D"), (1001, None, None, "D")],
        # delete every key of bucket(k=...) plus update elsewhere; also
        # re-insert a previously deleted key
        [(k, None, None, "D") for k in range(20) if k % 4 == 0]
        + [(3, "back", 33, "U")],
    ]
    for i, rows in enumerate(batches):
        df_a = _batch_df(spark, rows)
        df_b = _batch_df(spark, rows)
        ta.kv.upsert(df_a, ordering=None, commit_ts_ms=ts + i)
        tb.kv.upsert(df_b, ordering=None, commit_ts_ms=ts + i)
        _assert_equal_state(ta, tb, spark)


def test_commit_paths_equivalent_partial_update(spark, tmp_path):
    """Partial-update commits (target-column folds) through both paths."""
    ta, tb = _mk_tables(spark, tmp_path, "partial")
    ts = 1_700_000_100_000
    full = [(k, f"v{k}", k, "U") for k in range(8)]
    ta.kv.upsert(_batch_df(spark, full), commit_ts_ms=ts)
    tb.kv.upsert(_batch_df(spark, full), commit_ts_ms=ts)
    part = spark.createDataFrame([(2, 222), (3, 333), (50, 500)], "k int, n long")
    ta.kv.upsert(part, partial_update_cols=["k", "n"], commit_ts_ms=ts + 1)
    part2 = spark.createDataFrame([(2, 222), (3, 333), (50, 500)], "k int, n long")
    tb.kv.upsert(part2, partial_update_cols=["k", "n"], commit_ts_ms=ts + 1)
    _assert_equal_state(ta, tb, spark)


_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # key
        st.sampled_from(["U", "D"]),
        st.sampled_from(["a", "b", None]),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(seqs=st.lists(_ops, min_size=1, max_size=3))
def test_commit_paths_equivalent_property(spark_session, tmp_path_factory, seqs):
    """Random multi-commit sequences through both paths; each example
    pays full commits, so the budget is small — the scripted tests above
    cover the known branch points, this sweeps interleavings."""
    spark = spark_session
    tmp_path = tmp_path_factory.mktemp("commit_eq")
    ta, tb = _mk_tables(spark, tmp_path, "prop")
    ts = 1_700_000_200_000
    for i, seq in enumerate(seqs):
        rows = [(k, v, n, op) for (k, op, v, n) in seq]
        ta.kv.upsert(_batch_df(spark, rows), ordering=None, commit_ts_ms=ts + i)
        tb.kv.upsert(_batch_df(spark, rows), ordering=None, commit_ts_ms=ts + i)
    _assert_equal_state(ta, tb, spark)
