"""Admin API surface parity: partitions, table stats, KV snapshot
metadata, remote log manifests, database info (Admin.java:140-819),
and sorted (clustered) log compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluss_spark.admin import Admin, DatabaseSummary, PartitionInfo
from fluss_spark.catalog import Catalog
from fluss_spark.table import FlussTable
from fluss_spark.types import Field, TableSchema


@pytest.fixture()
def admin(tmp_path):
    return Admin(Catalog(str(tmp_path / "wh")))


def test_partition_lifecycle(spark, admin):
    t = admin.create_table(
        "db", "pt",
        TableSchema(
            fields=[Field("a", "INT"), Field("p", "STRING")],
            partition_keys=["p"],
            num_buckets=2,
        ),
    )
    # materialize two partitions by writing
    t.append(
        spark.createDataFrame([(1, "2024"), (2, "2025")], "a int, p string"), ordering=["a"]
    )
    # pre-create a third (registered, no data yet)
    admin.create_partition("db", "pt", {"p": "2026"})
    got = admin.list_partitions("db", "pt")
    assert got == [
        PartitionInfo(spec={"p": "2024"}),
        PartitionInfo(spec={"p": "2025"}),
        PartitionInfo(spec={"p": "2026"}),
    ]
    assert admin.list_partitions("db", "pt", {"p": "2025"}) == [
        PartitionInfo(spec={"p": "2025"})
    ]
    # duplicate create: idempotent unless told otherwise
    admin.create_partition("db", "pt", {"p": "2026"})
    with pytest.raises(ValueError, match="exists"):
        admin.create_partition("db", "pt", {"p": "2026"}, ignore_if_exists=False)
    # drop removes BOTH the registration and the data dirs
    admin.drop_partition("db", "pt", {"p": "2024"})
    assert {p.spec["p"] for p in admin.list_partitions("db", "pt")} == {"2025", "2026"}
    t2 = FlussTable(admin.catalog, "db", "pt")
    assert {r["p"] for r in t2.scan(spark).collect()} == {"2025"}
    with pytest.raises(ValueError, match="no such partition"):
        admin.drop_partition("db", "pt", {"p": "1999"}, ignore_if_not_exists=False)
    with pytest.raises(ValueError, match="spec must be"):
        admin.create_partition("db", "pt", {"wrong": "x"})
    # non-partitioned table rejects partition ops
    admin.create_table("db", "np", TableSchema(fields=[Field("a", "INT")], num_buckets=1))
    with pytest.raises(ValueError, match="not a partitioned"):
        admin.list_partitions("db", "np")


def test_table_stats_and_remote_manifests(spark, admin):
    from fluss_spark import maintenance

    t = admin.create_table(
        "db", "st", TableSchema(fields=[Field("a", "INT")], num_buckets=2)
    )
    for i in range(4):
        t.append(spark.createDataFrame([(i,), (i + 10,)], "a int"), ordering=["a"])
    stats = admin.get_table_stats("db", "st")
    assert stats.num_rows == 8
    assert stats.num_files > 0 and stats.size_bytes > 0
    # tiering moves sealed commits to remote; manifests list their files
    assert maintenance.tier_log(t, local_segments=1) == 3
    manifests = admin.list_remote_log_manifests("db", "st")
    assert sorted(manifests) == [1, 2, 3]
    assert all(fs and all(f.endswith(".parquet") for f in fs) for fs in manifests.values())
    # stats still see both tiers
    assert admin.get_table_stats("db", "st").num_rows == 8


def test_kv_snapshot_metadata(spark, admin):
    t = admin.create_table(
        "db", "kvm",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING")],
            primary_key=["k"],
            num_buckets=2,
        ),
    )
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), ordering=["k"])
    t.upsert(spark.createDataFrame([(2, "b2")], "k long, v string"), ordering=["k"])
    latest = admin.get_latest_kv_snapshot("db", "kvm")
    md = admin.get_kv_snapshot_metadata("db", "kvm", latest.snapshot_id)
    assert md.snapshot_id == latest.snapshot_id
    assert md.log_offsets == latest.log_offsets
    assert md.files and all(f.endswith(".parquet") for f in md.files)
    assert set(md.bucket_dirs) <= {0, 1}
    with pytest.raises(ValueError, match="no such snapshot"):
        admin.get_kv_snapshot_metadata("db", "kvm", 999)


def test_database_info_and_summaries(admin):
    admin.create_database("analytics", comment="training data", properties={"owner": "ml"})
    admin.create_table("analytics", "t1", TableSchema(fields=[Field("a", "INT")]))
    admin.create_table("analytics", "t2", TableSchema(fields=[Field("a", "INT")]))
    info = admin.get_database_info("analytics")
    assert info.comment == "training data" and info.properties == {"owner": "ml"}
    info2 = admin.alter_database("analytics", {"owner": "data-eng", "tier": "gold"})
    assert info2.properties == {"owner": "data-eng", "tier": "gold"}
    assert admin.alter_database("analytics", {"tier": None}).properties == {"owner": "data-eng"}
    assert DatabaseSummary(name="analytics", table_count=2) in admin.list_database_summaries()


@pytest.mark.slow
def test_sorted_compaction_clusters_row_groups(spark, admin, tmp_path):
    """compact_log(sort_columns=[...]) must leave each bucket's rows
    clustered: row-group min/max on the sort column become disjoint, so
    a point/range predicate prunes row groups instead of scanning them.
    Scan results (incl. offset order) are unchanged."""
    import os

    import pyarrow.parquet as pq

    from fluss_spark import maintenance

    t = admin.create_table(
        "db", "zc", TableSchema(fields=[Field("a", "INT"), Field("grp", "INT")], num_buckets=1)
    )
    # interleaved grp values across commits -> wide stats before compaction
    for c in range(3):
        df = spark.range(200).select(
            (F.col("id") + 1000 * c).cast("int").alias("a"),
            (F.col("id") % 10).cast("int").alias("grp"),
        )
        t.append(df, ordering=["a"])
    before = {(r["a"], r["grp"]) for r in t.scan(spark).collect()}
    assert maintenance.compact_log(t, spark, target_commits=2, sort_columns=["grp"]) == 3
    t2 = FlussTable(admin.catalog, "db", "zc")
    assert {(r["a"], r["grp"]) for r in t2.scan(spark).collect()} == before
    # physical check: within each compacted file, rows are sorted by grp
    # (row-group stats monotone non-overlapping when multiple groups)
    files = []
    for dirpath, _d, names in os.walk(t2.log.log_dir):
        files += [os.path.join(dirpath, f) for f in names if f.endswith(".parquet")]
    assert files
    for f in files:
        md = pq.read_metadata(f)
        gi = md.schema.names.index("grp")
        prev_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(gi).statistics
            if prev_max is not None:
                assert st.min >= prev_max  # clustered: no overlap going back
            prev_max = st.max
        # the FILE itself must be fully sorted by grp even with 1 row group
        tbl = pq.read_table(f, columns=["grp"])["grp"].to_pylist()
        assert tbl == sorted(tbl)
    with pytest.raises(ValueError, match="unknown sort column"):
        maintenance.compact_log(t2, spark, target_commits=1, sort_columns=["nope"])


@pytest.mark.slow
def test_kv_snapshot_lease_pins_against_gc(spark, admin):
    """A lease keeps its snapshot (manifest + referenced data dirs)
    through expire_snapshots; release or expiry lifts the pin."""
    from fluss_spark import maintenance

    t = admin.create_table(
        "db", "lease",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING")],
            primary_key=["k"],
            num_buckets=1,
        ),
    )
    for i in range(4):
        t.upsert(
            spark.createDataFrame([(1, f"v{i}"), (i + 10, "x")], "k long, v string"),
            ordering=["k"],
        )
    first_snap = admin.list_kv_snapshots("db", "lease")[0]
    lease = admin.create_kv_snapshot_lease("db", "lease", "reader-1", 60_000, first_snap)
    assert lease.snapshot_id == first_snap
    assert [l.lease_id for l in admin.list_kv_snapshot_leases("db", "lease")] == ["reader-1"]
    assert maintenance.expire_snapshots(t, keep=1) >= 0
    # leased snapshot survived: time travel still reads it
    assert first_snap in admin.list_kv_snapshots("db", "lease")
    rows = {r["k"]: r["v"] for r in t.snapshot(spark, version=first_snap).collect()}
    assert rows == {1: "v0", 10: "x"}
    # release -> next expiry collects it
    admin.release_kv_snapshot_lease("db", "lease", "reader-1")
    maintenance.expire_snapshots(t, keep=1)
    assert first_snap not in admin.list_kv_snapshots("db", "lease")
    # an EXPIRED lease does not pin (duration already elapsed)
    mid = admin.list_kv_snapshots("db", "lease")[0]
    admin.create_kv_snapshot_lease("db", "lease", "stale", -1, mid)
    assert admin.list_kv_snapshot_leases("db", "lease") == []
    with pytest.raises(ValueError, match="no such snapshot"):
        admin.create_kv_snapshot_lease("db", "lease", "x", 1000, 999)


def test_schema_history_by_id(spark, admin):
    from fluss_spark.admin import AddColumn, RenameColumn

    admin.create_table(
        "db", "hist", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    )
    admin.alter_table("db", "hist", [AddColumn("c", "DOUBLE")])
    admin.alter_table("db", "hist", [RenameColumn("b", "label")])
    cur = admin.get_table_info("db", "hist")
    assert cur.properties["schema.id"] == "2"
    v0 = admin.get_table_info("db", "hist", schema_id=0)
    assert [f.name for f in v0.fields] == ["a", "b"]
    v1 = admin.get_table_info("db", "hist", schema_id=1)
    assert [f.name for f in v1.fields] == ["a", "b", "c"]
    assert [f.name for f in admin.get_table_info("db", "hist", schema_id=2).fields] == [
        "a", "label", "c",
    ]
    # field ids stable across the whole history
    assert {f.name: f.field_id for f in v1.fields}["b"] == {
        f.name: f.field_id for f in cur.fields
    }["label"]
    with pytest.raises(ValueError, match="no such schema id"):
        admin.get_table_info("db", "hist", schema_id=9)


def test_table_stats_pk_table(spark, admin):
    """Stats on a PRIMARY KEY table: num_rows = live snapshot rows
    (footer sums over exactly the manifest's bucket dirs), not the
    log-offset count (which counts every changelog event)."""
    t = admin.create_table(
        "db", "stpk",
        TableSchema(fields=[Field("k", "BIGINT"), Field("v", "STRING")], primary_key=["k"], num_buckets=2),
    )
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"), ordering=["k"])
    t.upsert(spark.createDataFrame([(2, "b2")], "k long, v string"), ordering=["k"])
    stats = admin.get_table_stats("db", "stpk")
    assert stats.num_rows == 3  # 3 live keys, not 5 changelog events
    assert stats.num_files > 0 and stats.size_bytes > 0


def test_drop_partition_pk_table_rewrites_snapshot(spark, admin):
    """Dropping a partition of a PK table must remove its rows from the
    SNAPSHOT too (they live there keyed by data columns), not just the
    log dirs — otherwise snapshot and changelog permanently disagree."""
    t = admin.create_table(
        "db", "ppk",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("p", "STRING"), Field("v", "STRING")],
            primary_key=["k", "p"],
            bucket_keys=["k"],
            partition_keys=["p"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame(
            [(1, "2024", "a"), (2, "2024", "b"), (3, "2025", "c")],
            "k long, p string, v string",
        ),
        ordering=["k"],
    )
    with pytest.raises(ValueError, match="pass spark"):
        admin.drop_partition("db", "ppk", {"p": "2024"})
    admin.drop_partition("db", "ppk", {"p": "2024"}, spark=spark)
    t2 = FlussTable(admin.catalog, "db", "ppk")
    assert {r["p"] for r in t2.snapshot(spark).collect()} == {"2025"}
    assert {p.spec["p"] for p in admin.list_partitions("db", "ppk")} == {"2025"}


def test_create_database_does_not_clobber_info(admin):
    admin.create_database("d1", comment="orig", properties={"owner": "ml"})
    admin.create_database("d1", ignore_if_exists=True, comment="other")
    info = admin.get_database_info("d1")
    assert info.comment == "orig" and info.properties == {"owner": "ml"}
    from fluss_spark.catalog import DatabaseNotFoundError

    with pytest.raises(DatabaseNotFoundError):
        admin.get_database_info("ghost")


def test_table_stats_after_partition_drop(spark, admin):
    """drop_partition deletes files without rebasing offsets — stats on
    a partitioned log table must count SURVIVING rows (what scan()
    returns), not the offset watermarks."""
    t = admin.create_table(
        "db", "stp",
        TableSchema(
            fields=[Field("a", "INT"), Field("p", "STRING")],
            partition_keys=["p"],
            num_buckets=2,
        ),
    )
    t.append(
        spark.createDataFrame(
            [(1, "2024"), (2, "2024"), (3, "2025")], "a int, p string"
        ),
        ordering=["a"],
    )
    assert admin.get_table_stats("db", "stp").num_rows == 3
    admin.drop_partition("db", "stp", {"p": "2024"})
    t2 = FlussTable(admin.catalog, "db", "stp")
    assert t2.scan(spark).count() == 1
    assert admin.get_table_stats("db", "stp").num_rows == 1


@pytest.mark.slow
def test_latest_lake_snapshot(spark, admin):
    """Admin.getLatestLakeSnapshot parity (Admin.java:485-529): the
    returned file set IS a consistent external read — re-reading the
    listed files with a plain Parquet reader reproduces scan()/
    snapshot() exactly, and offsets resume the stream."""
    from fluss_spark import maintenance

    t = admin.create_table(
        "db", "lake_log", TableSchema(fields=[Field("a", "INT")], num_buckets=2)
    )
    for i in range(3):
        t.append(spark.createDataFrame([(i,), (i + 10,)], "a int"), ordering=["a"])
    maintenance.tier_log(t, local_segments=1)  # snapshot spans both tiers
    snap = admin.get_latest_lake_snapshot("db", "lake_log")
    assert snap.snapshot_id == 3 and len(snap.files) > 0
    external = spark.read.parquet(*snap.files)  # plain reader, no engine
    assert sorted(r["a"] for r in external.collect()) == sorted(
        r["a"] for r in t.scan(spark).select("a").collect()
    )
    assert sum(snap.table_bucket_offsets.values()) == 6

    pk = admin.create_table(
        "db", "lake_pk",
        TableSchema(
            fields=[Field("k", "INT", nullable=False), Field("v", "STRING")],
            primary_key=["k"], num_buckets=2,
        ),
    )
    pk.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    pk.upsert(spark.createDataFrame([(1, "a2")], "k int, v string"))
    ps = admin.get_latest_lake_snapshot("db", "lake_pk")
    got = {r["k"]: r["v"] for r in spark.read.parquet(*ps.files).select("k", "v").collect()}
    assert got == {1: "a2", 2: "b"}


def test_lake_snapshot_and_stats_dedupe_tier_overlap(spark, admin):
    """A crashed cross-device tier_log leaves a commit in BOTH tiers
    (scan dedups local-wins) — the lake-snapshot file set and the
    partitioned-log footer row count must dedupe the same way."""
    import shutil

    t = admin.create_table(
        "db", "ovl",
        TableSchema(
            fields=[Field("a", "INT"), Field("p", "STRING")],
            partition_keys=["p"],
            num_buckets=1,
        ),
    )
    for i in range(3):
        t.append(
            spark.createDataFrame([(i, "x"), (i + 10, "y")], "a int, p string"),
            ordering=["a"],
        )
    # simulate the crash state: commit 1 COPIED to remote, local not
    # yet deleted
    import os

    src = os.path.join(t.log.log_dir, "__commit=1")
    dst = os.path.join(t.log.remote_dir, "__commit=1")
    os.makedirs(t.log.remote_dir, exist_ok=True)
    shutil.copytree(src, dst)
    assert t.scan(spark).count() == 6  # scan dedups (local wins)
    snap = admin.get_latest_lake_snapshot("db", "ovl")
    assert spark.read.parquet(*snap.files).count() == 6  # no double count
    assert admin.get_table_stats("db", "ovl").num_rows == 6


def test_delta_log_export_incremental(spark, admin, tmp_path):
    """export_delta_log must mirror the lake snapshot as a valid Delta
    transaction log: version 0 carries protocol + metaData + adds;
    re-export after an append adds only the new files; re-export after
    compaction removes every superseded file and adds the compacted
    ones. Replaying add/remove across all commits must land an external
    reader on exactly the live file set."""
    import json
    import os
    import urllib.parse

    import duckdb

    t = admin.create_table(
        "db", "dl",
        TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=2),
    )
    for i in range(3):
        t.append(
            spark.createDataFrame([(i, f"v{i}"), (i + 10, f"w{i}")], "a int, b string"),
            ordering=["a"],
        )
    target = str(tmp_path / "delta")

    e0 = admin.export_delta_log("db", "dl", target)
    assert (e0.version, e0.n_remove) == (0, 0) and e0.n_add > 0
    acts = [json.loads(l) for l in open(e0.log_path)]
    kinds = [next(iter(a)) for a in acts]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    meta = acts[1]["metaData"]
    schema = json.loads(meta["schemaString"])
    names = [f["name"] for f in schema["fields"]]
    assert {"a", "b"} <= set(names) and set(meta["partitionColumns"]) <= set(names)
    snap = admin.get_latest_lake_snapshot("db", "dl")
    adds = {a["add"]["path"] for a in acts if "add" in a}
    assert len(adds) == len(snap.files)
    for a in acts:
        if "add" in a:
            p = urllib.parse.unquote(a["add"]["path"][len("file://"):])
            assert os.path.getsize(p) == a["add"]["size"]
            for k, v in a["add"]["partitionValues"].items():
                assert f"{k}={v}" in p

    # no-change export: a commit with zero adds/removes
    e1 = admin.export_delta_log("db", "dl", target)
    assert (e1.version, e1.n_add, e1.n_remove) == (1, 0, 0)

    # append -> incremental adds only
    t.append(spark.createDataFrame([(99, "x")], "a int, b string"))
    e2 = admin.export_delta_log("db", "dl", target)
    assert e2.version == 2 and e2.n_add > 0 and e2.n_remove == 0

    # compaction swaps the whole file set
    from fluss_spark.maintenance import compact_log

    assert compact_log(t, spark, target_commits=2) == 4
    e3 = admin.export_delta_log("db", "dl", target)
    assert e3.n_remove == e0.n_add + e2.n_add and e3.n_add > 0

    # replay the full log; the live set must read back as the table
    live: set[str] = set()
    for v in range(4):
        for line in open(os.path.join(target, "_delta_log", f"{v:020d}.json")):
            a = json.loads(line)
            if "add" in a:
                live.add(a["add"]["path"])
            elif "remove" in a:
                live.discard(a["remove"]["path"])
    paths = [urllib.parse.unquote(u[len("file://"):]) for u in sorted(live)]
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet({paths!r})"
    ).fetchone()[0]
    assert n == t.scan(spark).count() == 7


def test_pk_snapshot_minmax_metadata(spark, tmp_path):
    """kv.minmax_from_metadata answers over LIVE rows only: after an
    upsert replaces a key's value and a delete removes the extreme key,
    the metadata min/max tracks the snapshot, not the WAL history."""
    from fluss_spark.catalog import Catalog
    from fluss_spark.table import FlussTable, create_table
    from fluss_spark.types import Field, TableSchema

    cat = Catalog(str(tmp_path / "wh"))
    schema = TableSchema(
        fields=[Field("k", "BIGINT"), Field("v", "BIGINT"), Field("s", "STRING")],
        primary_key=["k"],
        num_buckets=4,
    )
    t = create_table(cat, "db", "mm", schema)
    t.upsert(spark.createDataFrame([(i, i * 10, f"x{i}") for i in range(1, 11)], "k long, v long, s string"))
    assert t.minmax_metadata("v") == (10, 100)
    # replace the max and delete the min -> metadata follows the live state
    t.upsert(spark.createDataFrame([(10, 55, "y")], "k long, v long, s string"))
    t.delete(spark.createDataFrame([(1, 0, "z")], "k long, v long, s string"))
    assert t.minmax_metadata("v") == (20, 90)
    assert t.minmax_metadata("s") is None  # strings refuse (truncatable stats)
    assert t.minmax_metadata("nope") is None
    # the WAL path must refuse pk tables outright
    assert t.log.minmax_from_metadata("v") is None
    # matches a real snapshot aggregate
    row = t.snapshot(spark).agg({"v": "min"}).first()
    assert row[0] == 20
