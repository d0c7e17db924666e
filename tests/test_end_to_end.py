"""End-to-end scenario (the reference's ITCase narrative style,
ClientToServerITCaseBase): one test walks the full engine lifecycle —
DDL → log ingest → stream replication into a PK table → changelog/
binlog → lookups → row-level ops → maintenance — asserting state at
every step."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluss_spark.admin import Admin
from fluss_spark.catalog import Catalog
from fluss_spark.maintenance import compact_log, expire_snapshots
from fluss_spark.registry import load
from fluss_spark.streaming.reader import LogStreamReader
from fluss_spark.streaming.sink import upsert_sink
from fluss_spark.table import FlussTable, register_sql_views
from fluss_spark.types import Field, TableSchema


def test_full_lifecycle(spark, tmp_path):
    catalog = Catalog(str(tmp_path / "wh"))
    admin = Admin(catalog)

    # 1. DDL
    admin.create_database("prod")
    raw = admin.create_table(
        "prod", "events_raw",
        TableSchema(
            fields=[
                Field("event_id", "BIGINT"),
                Field("user_id", "BIGINT"),
                Field("event_type", "STRING"),
                Field("value", "DOUBLE"),
            ],
            num_buckets=4,
        ),
    )
    state = admin.create_table(
        "prod", "user_state",
        TableSchema(
            fields=[Field("user_id", "BIGINT"), Field("event_type", "STRING"), Field("value", "DOUBLE")],
            primary_key=["user_id"],
            num_buckets=4,
        ),
    )

    # 2. ingest the raw log in three commits
    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    for lo, hi in [(0, 300), (300, 700), (700, 1000)]:
        raw.append(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)),
            ordering=["event_id"],
        )
    assert raw.count() == 1000  # metadata count, no scan

    # 3. stream-replicate log -> PK table (micro-batches, exactly-once)
    reader = LogStreamReader(raw, spark, startup_mode="earliest",
                             checkpoint_dir=str(tmp_path / "ckpt"))
    n_batches = reader.process_available(upsert_sink(state, "replicator", ordering=["event_id"]))
    assert n_batches == 1  # caught up in one poll over all three commits

    # 4. snapshot = last event per user (checked against a window query)
    from pyspark.sql.window import Window

    expected = (
        ev.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user_id").orderBy(F.col("event_id").desc())),
        )
        .filter("rn = 1")
        .select("user_id", "event_type", "value")
    )
    got = state.snapshot(spark)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))

    # 5. changelog accounting: +I once per user, -U/+U pairs for the rest
    cl = state.changelog(spark)
    counts = {r["_change_type"]: r["n"] for r in cl.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    n_users = got.count()
    assert counts["+I"] == n_users
    assert counts["-U"] == counts["+U"] == 1000 - n_users

    # 6. binlog pairs fuse correctly
    bl = state.binlog(spark)
    assert bl.filter("op_type = 'UPDATE'").count() == 1000 - n_users
    assert bl.filter("op_type = 'INSERT'").count() == n_users

    # 7. lookups
    some_user = got.limit(1).collect()[0]["user_id"]
    assert state.lookup(spark, {"user_id": some_user}).count() == 1

    # 8. SQL views
    register_sql_views(catalog, spark, "prod", ["user_state"])
    assert (
        spark.sql("SELECT count(*) AS n FROM `prod_user_state__snapshot`").collect()[0]["n"]
        == n_users
    )

    # 9. row-level update + delete
    state.update_where(spark, F.col("user_id") == some_user, {"event_type": F.lit("patched")})
    assert state.lookup(spark, {"user_id": some_user}).collect()[0]["event_type"] == "patched"
    state.delete_where(spark, F.col("user_id") == some_user)
    assert state.lookup(spark, {"user_id": some_user}).count() == 0

    # 10. maintenance: compact the raw log, expire old snapshots
    assert compact_log(raw, spark, target_commits=2) == 3
    assert raw.scan(spark).count() == 1000
    expire_snapshots(state, keep=1)
    assert state.snapshot(spark).count() == n_users - 1  # deleted user gone

    # 11. time travel on the raw log still works post-compaction
    offs = raw.offsets_for_timestamp(spark, 0)
    assert sum(offs.values()) == 0  # earliest
