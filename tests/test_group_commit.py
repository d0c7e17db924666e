"""Group commit (upsert_many) ≡ N sequential upserts.

The grouped transaction folds N batches through ONE fused exchange and
ONE write action, publishing N commit versions. Against a sequentially
committed twin table the following must match:

  - the full WAL event multiset INCLUDING per-row offsets, __seq/__sub
    and per-batch commit timestamps (byte-level WAL equivalence),
  - per-bucket high-water marks after every version,
  - the final snapshot rows,
  - time travel to EVERY intermediate version (grouped intermediates
    are WAL-only states served by the offset-bounded tail fold),
  - the changelog() read surface.

Shapes covered: plain pk, WAL changelog image, DeleteBehavior.IGNORE,
partitioned (pair-granular manifest), cross-batch key chains, a batch
with zero change events, and a batch deleting every key of a bucket.
Fallback: shapes the group gate excludes (auto-increment) must still
commit correctly via the sequential path.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401

from fluss_spark.catalog import Catalog
from fluss_spark.table import create_table
from fluss_spark.types import (
    BUCKET_COL,
    CHANGE_TYPE_COL,
    OFFSET_COL,
    TIMESTAMP_COL,
    Field,
    TableSchema,
)


def _nskey(tup):
    return tuple((x is None, x) for x in tup)


def _events(t, spark, cols):
    rows = (
        t.kv.log.scan(spark)
        .select(BUCKET_COL, OFFSET_COL, CHANGE_TYPE_COL, TIMESTAMP_COL, "__seq", "__sub", *cols)
        .collect()
    )
    return sorted(
        (
            (
                r[BUCKET_COL], r[OFFSET_COL], r[CHANGE_TYPE_COL], r[TIMESTAMP_COL],
                r["__seq"], r["__sub"], *[r[c] for c in cols],
            )
            for r in rows
        ),
        key=_nskey,
    )


def _snap(t, spark, cols, version=None):
    return sorted(
        (tuple(r[c] for c in cols) for r in t.snapshot(spark, version=version).collect()),
        key=_nskey,
    )


def _hwm(t):
    st = t.catalog.current_commit(t.db, t.name)
    return {int(b): o for b, o in st.log_hwm.items()}


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def _run_shape(spark, tmp_path, name, props, parts, batches, ddl, cols, ordering):
    cat = Catalog(str(tmp_path / f"wh_{name}"))
    fields = [
        Field("k", "INT", nullable=False),
        Field("v", "STRING"),
        Field("n", "BIGINT"),
    ]
    pk = ["k"]
    if parts:
        fields = [Field("dt", "STRING", nullable=False)] + fields
        pk = ["dt", "k"]
    schema = TableSchema(
        fields=fields, primary_key=pk, partition_keys=parts or [],
        num_buckets=4, properties=dict(props),
    )
    ts0 = 1_700_000_000_000
    ts_list = [ts0 + 1000 * i for i in range(len(batches))]

    seq = create_table(cat, "db", f"seq_{name}", schema)
    for rows, ts in zip(batches, ts_list):
        seq.upsert(_mk(spark, rows, ddl), ordering=ordering, commit_ts_ms=ts)

    grp = create_table(cat, "db", f"grp_{name}", schema)
    states = grp.upsert_many(
        [_mk(spark, rows, ddl) for rows in batches],
        ordering=ordering,
        commit_ts_ms=ts_list,
    )
    assert len(states) == len(batches), name
    assert [s.version for s in states] == list(range(1, len(batches) + 1)), name
    # intermediates are WAL-only; the final version materializes
    assert all(s.snapshot_version <= 0 for s in states[:-1]), name
    assert states[-1].snapshot_version == states[-1].version, name

    assert _hwm(seq) == _hwm(grp), name
    assert _events(seq, spark, cols) == _events(grp, spark, cols), name
    assert _snap(seq, spark, cols) == _snap(grp, spark, cols), name
    # per-version time travel (intermediates fold the bounded WAL slice)
    for v in range(1, len(batches) + 1):
        assert _snap(seq, spark, cols, version=v) == _snap(
            grp, spark, cols, version=v
        ), f"{name} @v{v}"
    # per-version HWMs recorded in the catalog
    for v in range(1, len(batches) + 1):
        sa = seq.catalog.commit_at(seq.db, seq.name, v)
        sb = grp.catalog.commit_at(grp.db, grp.name, v)
        assert sa.log_hwm == sb.log_hwm, f"{name} hwm @v{v}"
        assert sa.ts_ms == sb.ts_ms, f"{name} ts @v{v}"
    # changelog read surface
    ca = sorted((tuple(r) for r in seq.changelog(spark).collect()), key=_nskey)
    cb = sorted((tuple(r) for r in grp.changelog(spark).collect()), key=_nskey)
    assert ca == cb, name


def test_group_commit_matches_sequential_plain(spark, tmp_path):
    ddl = "k int, v string, n long, __op string"
    batches = [
        [(k, f"v{k}", k * 10, "U") for k in range(20)],
        # cross-batch chains: update 1 twice, delete 3, insert 99
        [(1, "x", 111, "U"), (1, "y", 112, "U"), (3, None, 0, "D"), (99, "new", 9, "U")],
        # delete every key of one bucket + re-insert a deleted key
        [(k, None, None, "D") for k in range(20) if k % 4 == 0] + [(3, "back", 33, "U")],
    ]
    _run_shape(
        spark, tmp_path, "plain", {}, None, batches, ddl, ["k", "v", "n"], ["n"]
    )


@pytest.mark.slow
def test_group_commit_matches_sequential_empty_middle(spark, tmp_path):
    ddl = "k int, v string, n long, __op string"
    batches = [
        [(k, f"v{k}", k * 10, "U") for k in range(8)],
        # deletes of ABSENT keys only -> zero change events for this version
        [(1000, None, None, "D"), (1001, None, None, "D")],
        [(2, "z", 22, "U")],
    ]
    _run_shape(
        spark, tmp_path, "emptymid", {}, None, batches, ddl, ["k", "v", "n"], ["n"]
    )


@pytest.mark.slow
def test_group_commit_matches_sequential_wal_image(spark, tmp_path):
    ddl = "k int, v string, n long, __op string"
    batches = [
        [(k, f"v{k}", k * 10, "U") for k in range(12)],
        [(1, "x", 111, "U"), (5, None, 0, "D"), (77, "new", 7, "U")],
    ]
    _run_shape(
        spark, tmp_path, "walimg", {"table.changelog.image": "wal"}, None,
        batches, ddl, ["k", "v", "n"], ["n"],
    )


@pytest.mark.slow
def test_group_commit_matches_sequential_delete_ignore(spark, tmp_path):
    ddl = "k int, v string, n long, __op string"
    batches = [
        [(k, f"v{k}", k * 10, "U") for k in range(10)],
        [(1, "x", 111, "U"), (5, None, 0, "D")],
        [(5, "still", 55, "U"), (2, None, 0, "D")],
    ]
    _run_shape(
        spark, tmp_path, "delign", {"table.delete.behavior": "ignore"}, None,
        batches, ddl, ["k", "v", "n"], ["n"],
    )


def test_group_commit_matches_sequential_partitioned(spark, tmp_path):
    ddl = "dt string, k int, v string, n long, __op string"
    base = [("a", k, f"v{k}", k * 10, "U") for k in range(10)] + [
        ("b", k, f"w{k}", k, "U") for k in range(4)
    ]
    batches = [
        base,
        # touch only partition a in this batch
        [("a", 1, "x", 111, "U"), ("a", 3, None, 0, "D")],
        # touch only partition b; also delete all of one (part, bucket)
        [("b", 2, "bx", 22, "U"), ("b", 0, None, 0, "D")],
    ]
    _run_shape(
        spark, tmp_path, "part", {}, ["dt"], batches, ddl,
        ["dt", "k", "v", "n"], ["n"],
    )


def test_group_commit_fallback_auto_increment(spark, tmp_path):
    """Auto-increment id packing is per commit — the group gate must
    fall back to sequential upserts and still produce correct ids."""
    cat = Catalog(str(tmp_path / "wh_ai"))
    schema = TableSchema(
        fields=[
            Field("k", "INT", nullable=False),
            Field("v", "STRING"),
            Field("rid", "BIGINT", auto_increment=True),
        ],
        primary_key=["k"],
        num_buckets=4,
    )
    t = create_table(cat, "db", "ai", schema)
    ddl = "k int, v string"
    states = t.upsert_many(
        [
            _mk(spark, [(1, "a"), (2, "b")], ddl),
            _mk(spark, [(3, "c"), (1, "a2")], ddl),
        ],
        commit_ts_ms=[1_700_000_000_000, 1_700_000_001_000],
    )
    assert [s.version for s in states] == [1, 2]
    rows = sorted(
        ((r["k"], r["v"], r["rid"]) for r in t.snapshot(spark).collect())
    )
    assert [r[0] for r in rows] == [1, 2, 3]
    assert sorted(r[2] for r in rows) == [0, 1, 2] or len({r[2] for r in rows}) == 3


def test_group_commit_then_single_upsert(spark, tmp_path):
    """A plain upsert after a group commit folds against the group's
    final state (current state has no pending tail)."""
    cat = Catalog(str(tmp_path / "wh_after"))
    schema = TableSchema(
        fields=[Field("k", "INT", nullable=False), Field("v", "STRING"), Field("n", "BIGINT")],
        primary_key=["k"], num_buckets=4,
    )
    t = create_table(cat, "db", "after", schema)
    ddl = "k int, v string, n long"
    t.upsert_many(
        [
            _mk(spark, [(1, "a", 1), (2, "b", 2)], ddl),
            _mk(spark, [(1, "a2", 11)], ddl),
        ],
        ordering=["n"],
        commit_ts_ms=[1_700_000_000_000, 1_700_000_001_000],
    )
    st = t.upsert(_mk(spark, [(2, "b2", 22)], ddl), ordering=["n"], commit_ts_ms=1_700_000_002_000)
    assert st.version == 3 and st.snapshot_version == 3
    rows = sorted((r["k"], r["v"]) for r in t.snapshot(spark).collect())
    assert rows == [(1, "a2"), (2, "b2")]
