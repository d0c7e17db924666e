"""Fluent client facade parity (client/table/Table.java:39-76):
newScan/newLookup/newAppend/newUpsert builders over the engine."""

from __future__ import annotations

import pytest

from fluss_spark import predicates as P
from fluss_spark.client import connect
from fluss_spark.types import Field, TableSchema


@pytest.fixture()
def conn(tmp_path):
    return connect(str(tmp_path / "wh"))


def _make_log(conn, spark):
    admin = conn.get_admin()
    t = admin.create_table(
        "db", "lg", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=2)
    )
    t.append(
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "a int, b string"),
        ordering=["a"],
    )
    return conn.get_table("db", "lg")


def test_scan_builder_project_filter_limit(spark, conn):
    table = _make_log(conn, spark)
    base = table.new_scan()
    scan = base.project(["b"]).filter(P.greater_than("a", 15))
    assert base._project is None  # immutable refinement (Scan.java:35)
    rows = {r["b"] for r in scan.create_batch_scanner(spark).collect()}
    assert rows == {"v16", "v17", "v18", "v19"}
    assert scan.create_batch_scanner(spark).columns == ["b"]
    # index-based projection resolves against the declared column order
    assert table.new_scan().project([1]).create_batch_scanner(spark).columns == ["b"]
    assert table.new_scan().limit(3).create_batch_scanner(spark).count() == 3


def test_log_scanner_with_projection(spark, conn):
    table = _make_log(conn, spark)
    rdr = table.new_scan().project(["a"]).create_log_scanner(spark, startup_mode="earliest")
    df, _bid = rdr.poll()
    assert df.columns == ["a"] and df.count() == 20
    with pytest.raises(ValueError, match="limit"):
        table.new_scan().limit(5).create_log_scanner(spark)


def test_append_writer_buffers_one_commit(spark, conn):
    admin = conn.get_admin()
    admin.create_table("db", "aw", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1))
    table = conn.get_table("db", "aw")
    w = table.new_append().create_writer(spark)
    w.append({"a": 1, "b": "x"})
    w.append((2, "y"))  # positional binding
    w.flush()
    w.flush()  # empty flush is a no-op, not an empty commit
    t = conn.catalog.current_commit("db", "aw")
    assert t.version == 1
    df = table.new_scan().create_batch_scanner(spark)
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(1, "x"), (2, "y")]
    with pytest.raises(ValueError, match="unknown columns"):
        w.append({"nope": 1})
    with pytest.raises(ValueError, match="Primary Key"):
        table.new_upsert()


def test_upsert_writer_order_and_delete(spark, conn):
    admin = conn.get_admin()
    admin.create_table(
        "db", "uw",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING"), Field("n", "INT")],
            primary_key=["k"], num_buckets=2,
        ),
    )
    table = conn.get_table("db", "uw")
    w = table.new_upsert().create_writer(spark)
    w.upsert({"k": 1, "v": "a", "n": 1})
    w.upsert({"k": 2, "v": "b", "n": 2})
    w.upsert({"k": 1, "v": "a2", "n": 10})  # same key again: later wins
    w.delete({"k": 2})
    w.flush()
    snap = {r["k"]: (r["v"], r["n"]) for r in table.new_scan().create_batch_scanner(spark).collect()}
    assert snap == {1: ("a2", 10)}
    with pytest.raises(ValueError, match="Log Table"):
        table.new_append()


def test_partial_update_writer(spark, conn):
    admin = conn.get_admin()
    admin.create_table(
        "db", "pw",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING"), Field("n", "INT")],
            primary_key=["k"], num_buckets=1,
        ),
    )
    table = conn.get_table("db", "pw")
    full = table.new_upsert().create_writer(spark)
    full.upsert({"k": 1, "v": "a", "n": 5})
    full.flush()
    pw = table.new_upsert().partial_update("k", "v").create_writer(spark)
    pw.upsert({"k": 1, "v": "patched"})
    pw.flush()
    snap = {r["k"]: (r["v"], r["n"]) for r in table.new_scan().create_batch_scanner(spark).collect()}
    assert snap == {1: ("patched", 5)}  # n untouched by the partial write
    with pytest.raises(ValueError, match="outside the target set"):
        pw.upsert({"k": 1, "n": 9})


def test_lookuper_and_prefix_lookuper(spark, conn):
    admin = conn.get_admin()
    admin.create_table(
        "db", "lk",
        TableSchema(
            fields=[Field("acct", "BIGINT"), Field("seq", "BIGINT"), Field("v", "STRING")],
            primary_key=["acct", "seq"], bucket_keys=["acct"], num_buckets=2,
        ),
    )
    table = conn.get_table("db", "lk")
    w = table.new_upsert().create_writer(spark)
    for s in range(3):
        w.upsert({"acct": 7, "seq": s, "v": f"r{s}"})
    w.upsert({"acct": 8, "seq": 0, "v": "other"})
    w.flush()
    lk = table.new_lookup().create_lookuper(spark)
    got = lk.lookup(7, 2).collect()
    assert len(got) == 1 and got[0]["v"] == "r2"
    plk = table.new_lookup().lookup_by("acct").create_lookuper(spark)
    assert plk.lookup(7).count() == 3
    with pytest.raises(ValueError, match="expected values"):
        lk.lookup(7)


def test_snapshot_and_bucket_scan(spark, conn):
    admin = conn.get_admin()
    admin.create_table(
        "db", "sv",
        TableSchema(fields=[Field("k", "BIGINT"), Field("v", "STRING")], primary_key=["k"], num_buckets=2),
    )
    table = conn.get_table("db", "sv")
    w = table.new_upsert().create_writer(spark)
    w.upsert({"k": 1, "v": "old"})
    w.flush()
    first_snap = conn.catalog.current_commit("db", "sv").snapshot_version
    w.upsert({"k": 1, "v": "new"})
    w.flush()
    assert table.new_scan().create_batch_scanner(spark).collect()[0]["v"] == "new"
    # time travel via snapshot id (Scan.java:99-104)
    assert table.new_scan().create_batch_scanner(spark, snapshot_id=first_snap).collect()[0]["v"] == "old"


def test_writer_arity_validated(spark, conn):
    admin = conn.get_admin()
    admin.create_table(
        "db", "ar",
        TableSchema(fields=[Field("k", "BIGINT"), Field("v", "STRING"), Field("n", "INT")], primary_key=["k"], num_buckets=1),
    )
    table = conn.get_table("db", "ar")
    w = table.new_upsert().create_writer(spark)
    with pytest.raises(ValueError, match="expected"):
        w.upsert((1, "x"))  # missing n: must raise, not write NULLs
    with pytest.raises(ValueError, match="delete key"):
        w.delete((1, "extra"))
    admin.create_table("db", "ar2", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1))
    aw = conn.get_table("db", "ar2").new_append().create_writer(spark)
    with pytest.raises(ValueError, match="values, table has"):
        aw.append((1, "x", "extra"))


def test_projecting_log_scanner_checkpoint_resume(spark, conn, tmp_path):
    """The projection wrapper must not break exactly-once resume: a new
    scanner on the same checkpoint dir continues from the committed
    offsets and still applies the projection per batch."""
    admin = conn.get_admin()
    admin.create_table("db", "ck", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1))
    raw = conn.get_table("db", "ck")._t
    raw.append(spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string"), ordering=["a"])
    table = conn.get_table("db", "ck")
    ckpt = str(tmp_path / "ck")
    rdr = table.new_scan().project(["a"]).create_log_scanner(
        spark, checkpoint_dir=ckpt, startup_mode="earliest"
    )
    df, bid = rdr.poll()
    assert df.columns == ["a"] and sorted(r["a"] for r in df.collect()) == [1, 2]
    rdr.commit_batch()
    raw.append(spark.createDataFrame([(3, "z")], "a int, b string"), ordering=["a"])
    # a FRESH scanner on the same checkpoint resumes past batch 0
    rdr2 = table.new_scan().project(["a"]).create_log_scanner(
        spark, checkpoint_dir=ckpt, startup_mode="earliest"
    )
    df2, bid2 = rdr2.poll()
    assert bid2 == bid + 1
    assert df2.columns == ["a"] and [r["a"] for r in df2.collect()] == [3]


def test_writer_preserves_binary_and_nonfinite_doubles(spark, conn):
    """The buffered writers must round-trip BINARY values and NaN/inf
    doubles bit-faithfully (a JSON-serialized drain turned bytes into
    repr strings and silently nulled non-finite rows)."""
    import math

    admin = conn.get_admin()
    admin.create_table(
        "db", "bin",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("payload", "BYTES"), Field("x", "DOUBLE")],
            primary_key=["k"],
            num_buckets=1,
        ),
    )
    table = conn.get_table("db", "bin")
    w = table.new_upsert().create_writer(spark)
    w.upsert({"k": 1, "payload": b"\x00\xffbin", "x": float("nan")})
    w.upsert({"k": 2, "payload": b"", "x": float("inf")})
    w.upsert({"k": 3, "payload": None, "x": 2})  # int literal for DOUBLE
    w.flush()
    rows = {r["k"]: r for r in table.new_scan().create_batch_scanner(spark).collect()}
    assert bytes(rows[1]["payload"]) == b"\x00\xffbin" and math.isnan(rows[1]["x"])
    assert bytes(rows[2]["payload"]) == b"" and math.isinf(rows[2]["x"])
    assert rows[3]["payload"] is None and rows[3]["x"] == 2.0


def test_projecting_log_scanner_checkpointed_redelivery(spark, conn, tmp_path):
    """Exactly-once re-delivery THROUGH the projecting wrapper: the
    checkpointed drain applies projection+filter on every path (poll and
    process_available), and a scanner resumed from the same checkpoint
    re-delivers nothing old and exactly the new rows."""
    table = _make_log(conn, spark)
    ckpt = str(tmp_path / "cl_ckpt")
    scan = table.new_scan().project(["a"]).filter(P.greater_than("a", 9))

    seen: list[list[int]] = []
    rdr = scan.create_log_scanner(spark, startup_mode="earliest", checkpoint_dir=ckpt)
    n = rdr.process_available(lambda df, bid: seen.append(sorted(r["a"] for r in df.collect())))
    assert n == 1
    assert seen == [[10, 11, 12, 13, 14, 15, 16, 17, 18, 19]]
    # projection applied on the drain path: only column 'a' arrives
    rdr2 = scan.create_log_scanner(spark, checkpoint_dir=ckpt)
    cols: list[list[str]] = []
    assert rdr2.process_available(lambda df, bid: cols.append(df.columns)) == 0  # caught up
    from fluss_spark.table import FlussTable

    t = FlussTable(conn.catalog, "db", "lg")
    t.append(spark.createDataFrame([(5, "low"), (42, "hi")], "a int, b string"), ordering=["a"])
    got: list[tuple[list[str], list[int]]] = []
    assert rdr2.process_available(
        lambda df, bid: got.append((df.columns, sorted(r["a"] for r in df.collect())))
    ) == 1
    # filter drops a=5, projection keeps only 'a' — through the wrapper
    assert got == [(["a"], [42])]


def test_delete_with_not_null_non_key_column(spark, conn):
    """delete() buffers only the key — non-key NOT NULL columns arrive
    as None in the drain and must not be rejected there (the engine
    owns nullability enforcement at its own boundary)."""
    admin = conn.get_admin()
    admin.create_table(
        "db", "nn",
        TableSchema(
            fields=[
                Field("k", "BIGINT"),
                Field("v", "STRING", nullable=False),
            ],
            primary_key=["k"],
            num_buckets=1,
        ),
    )
    table = conn.get_table("db", "nn")
    w = table.new_upsert().create_writer(spark)
    w.upsert({"k": 1, "v": "a"})
    w.upsert({"k": 2, "v": "b"})
    w.delete({"k": 2})
    w.flush()
    rows = {r["k"]: r["v"] for r in table.new_scan().create_batch_scanner(spark).collect()}
    assert rows == {1: "a"}
