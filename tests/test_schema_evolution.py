"""ALTER TABLE / schema evolution (Admin.alterTable, Admin.java:310;
change kinds metadata/TableChange.java:28-131).

Name-based evolution over Parquet: add/drop never rewrites files — old
files read NULL for added columns, dropped columns in old files are
ignored. Field IDs persist in schema JSON as the identity anchor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluss_spark.admin import (
    AddColumn,
    Admin,
    DropColumn,
    InvalidAlterTableException,
    ResetOption,
    SetOption,
)
from fluss_spark.catalog import Catalog
from fluss_spark.table import FlussTable, create_table
from fluss_spark.types import Field, TableSchema


@pytest.fixture()
def admin(tmp_path):
    return Admin(Catalog(str(tmp_path / "wh")))


def test_add_column_log_table(spark, admin):
    t = admin.create_table(
        "db", "ev", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=2)
    )
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "ev", [AddColumn("c", "DOUBLE")])
    t2 = FlussTable(admin.catalog, "db", "ev")  # re-open to see new schema
    t2.append(spark.createDataFrame([(3, "z", 1.5)], "a int, b string, c double"), ordering=["a"])
    rows = {r["a"]: r["c"] for r in t2.scan(spark).collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    # filter on the evolved column still pushes down over mixed files
    assert t2.scan(spark).filter(F.col("c") > 1.0).count() == 1
    # field ids are stable and the new column got a fresh one
    sch = admin.get_table_info("db", "ev")
    ids = {f.name: f.field_id for f in sch.fields}
    assert ids["c"] == max(ids.values())


def test_drop_column_log_table(spark, admin):
    admin.create_table(
        "db", "d", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    ).append(spark.createDataFrame([(1, "x")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "d", [DropColumn("b")])
    t2 = FlussTable(admin.catalog, "db", "d")
    assert "b" not in t2.scan(spark).columns
    t2.append(spark.createDataFrame([(2,)], "a int"), ordering=["a"])
    assert sorted(r["a"] for r in t2.scan(spark).collect()) == [1, 2]


def test_add_column_pk_table_across_upserts(spark, admin):
    t = admin.create_table(
        "db", "pk",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING")],
            primary_key=["k"],
            num_buckets=2,
        ),
    )
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), ordering=["k"])
    admin.alter_table("db", "pk", [AddColumn("score", "DOUBLE")])
    t2 = FlussTable(admin.catalog, "db", "pk")
    t2.upsert(
        spark.createDataFrame([(2, "b2", 0.5), (3, "c", 0.9)], "k long, v string, score double"),
        ordering=["k"],
    )
    snap = {r["k"]: (r["v"], r["score"]) for r in t2.snapshot(spark).collect()}
    assert snap == {1: ("a", None), 2: ("b2", 0.5), 3: ("c", 0.9)}
    # point lookup resolves the evolved row from the single bucket dir
    got = t2.lookup(spark, {"k": 3}).collect()
    assert len(got) == 1 and got[0]["score"] == 0.9


def test_set_reset_option(spark, admin):
    admin.create_table(
        "db", "opt", TableSchema(fields=[Field("a", "INT")], num_buckets=1)
    )
    admin.alter_table("db", "opt", [SetOption("table.log.ttl", "7d")])
    assert admin.get_table_info("db", "opt").properties["table.log.ttl"] == "7d"
    admin.alter_table("db", "opt", [ResetOption("table.log.ttl")])
    assert "table.log.ttl" not in admin.get_table_info("db", "opt").properties


def test_invalid_alters_rejected(spark, admin):
    admin.create_table(
        "db", "inv",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING")],
            primary_key=["k"],
            num_buckets=1,
            properties={"table.merge-engine": "first_row"},
        ),
    )
    with pytest.raises(InvalidAlterTableException):
        admin.alter_table("db", "inv", [DropColumn("k")])  # pk column
    with pytest.raises(InvalidAlterTableException):
        admin.alter_table("db", "inv", [AddColumn("v", "INT")])  # duplicate
    with pytest.raises(InvalidAlterTableException):
        admin.alter_table("db", "inv", [SetOption("table.merge-engine", "versioned")])
    with pytest.raises(InvalidAlterTableException):
        admin.alter_table("db", "inv", [DropColumn("nope")])
    # a failed multi-change list leaves the schema untouched (atomicity)
    with pytest.raises(InvalidAlterTableException):
        admin.alter_table("db", "inv", [AddColumn("w", "INT"), DropColumn("k")])
    assert [f.name for f in admin.get_table_info("db", "inv").fields] == ["k", "v"]


def test_dropped_column_name_stays_retired(spark, admin):
    """Re-adding a dropped name would resurrect old values from pre-drop
    files (reads are name-based) — the name is permanently retired."""
    t = admin.create_table(
        "db", "ret", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    )
    t.append(spark.createDataFrame([(1, "old-secret")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "ret", [DropColumn("b")])
    with pytest.raises(InvalidAlterTableException, match="previously dropped"):
        admin.alter_table("db", "ret", [AddColumn("b", "STRING")])
    with pytest.raises(InvalidAlterTableException, match="previously dropped"):
        admin.alter_table("db", "ret", [AddColumn("b", "INT")])  # retype worse
    # a fresh name is fine
    admin.alter_table("db", "ret", [AddColumn("b2", "STRING")])
    from fluss_spark.table import FlussTable

    assert FlussTable(admin.catalog, "db", "ret").scan(spark).select("b2").first()["b2"] is None


def test_tiering_option_validated_at_alter_and_create(spark, admin):
    """Invalid table.log.tiered.local-segments must fail at DEFINITION
    time, not after a later append's commit already succeeded."""
    admin.create_table("db", "tv", TableSchema(fields=[Field("a", "INT")], num_buckets=1))
    for bad in ("0", "-3", "two"):
        with pytest.raises(InvalidAlterTableException):
            admin.alter_table("db", "tv", [SetOption("table.log.tiered.local-segments", bad)])
    admin.alter_table("db", "tv", [SetOption("table.log.tiered.local-segments", "3")])
    with pytest.raises(ValueError):
        admin.create_table(
            "db", "tv2",
            TableSchema(
                fields=[Field("a", "INT")],
                num_buckets=1,
                properties={"table.log.tiered.local-segments": "0"},
            ),
        )


def test_alter_missing_table(admin):
    from fluss_spark.catalog import TableNotFoundError

    with pytest.raises(TableNotFoundError):
        admin.alter_table("db", "ghost", [AddColumn("x", "INT")])
    assert admin.alter_table("db", "ghost", [AddColumn("x", "INT")], ignore_if_not_exists=True) is None


# -- rename / retype: field-ID read resolution ----------------------------


def test_rename_column_log_table(spark, admin):
    """Files written before the rename keep the old physical name; scans
    resolve by field id and surface the CURRENT name for every era."""
    t = admin.create_table(
        "db", "rn", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=2)
    )
    t.append(spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string"), ordering=["a"])
    from fluss_spark.admin import RenameColumn

    admin.alter_table("db", "rn", [RenameColumn("b", "label")])
    t2 = FlussTable(admin.catalog, "db", "rn")
    t2.append(spark.createDataFrame([(3, "z")], "a int, label string"), ordering=["a"])
    rows = {r["a"]: r["label"] for r in t2.scan(spark).collect()}
    assert rows == {1: "x", 2: "y", 3: "z"}
    assert "b" not in t2.scan(spark).columns
    # old physical name is retired: re-adding would resurrect old values
    with pytest.raises(InvalidAlterTableException, match="previously dropped"):
        admin.alter_table("db", "rn", [AddColumn("b", "STRING")])


def test_retype_widen_log_table(spark, admin):
    t = admin.create_table(
        "db", "wd", TableSchema(fields=[Field("a", "INT"), Field("v", "INT")], num_buckets=1)
    )
    t.append(spark.createDataFrame([(1, 10), (2, 20)], "a int, v int"), ordering=["a"])
    from fluss_spark.admin import AlterColumnType

    admin.alter_table("db", "wd", [AlterColumnType("v", "BIGINT")])
    t2 = FlussTable(admin.catalog, "db", "wd")
    t2.append(
        spark.createDataFrame([(3, 30_000_000_000)], "a int, v long"), ordering=["a"]
    )
    df = t2.scan(spark)
    assert dict(df.dtypes)["v"] == "bigint"
    assert {r["a"]: r["v"] for r in df.collect()} == {1: 10, 2: 20, 3: 30_000_000_000}


def test_rename_and_retype_pk_table_across_commits(spark, admin):
    """Upserts before AND after a rename+widen fold into one state; the
    seed read-old maps old snapshot/WAL files onto the current schema."""
    t = admin.create_table(
        "db", "rp",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "STRING"), Field("n", "INT")],
            primary_key=["k"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "k long, v string, n int"),
        ordering=["k"],
    )
    from fluss_spark.admin import AlterColumnType, RenameColumn

    admin.alter_table(
        "db", "rp", [RenameColumn("v", "name"), AlterColumnType("n", "BIGINT")]
    )
    t2 = FlussTable(admin.catalog, "db", "rp")
    t2.upsert(
        spark.createDataFrame([(2, "b2", 20), (3, "c", 30)], "k long, name string, n long"),
        ordering=["k"],
    )
    snap = {r["k"]: (r["name"], r["n"]) for r in t2.snapshot(spark).collect()}
    assert snap == {1: ("a", 1), 2: ("b2", 20), 3: ("c", 30)}
    # lookups resolve pre-rename rows from the old-era snapshot dir
    got = t2.lookup(spark, {"k": 1}).collect()
    assert len(got) == 1 and got[0]["name"] == "a" and got[0]["n"] == 1
    # changelog view is era-mapped too (WAL rows from both eras)
    cl = t2.kv.changelog(spark)
    assert "name" in cl.columns and cl.count() == 5  # 2(+I) + 2(+I/-U+U=3) ... see below


def test_rename_era_then_compact_migrates_files(spark, admin):
    """compact_log rewrites old-era files under the CURRENT names (the
    new commit dir maps to the current era), after which the scan is
    back to a single-era read."""
    from fluss_spark import maintenance
    from fluss_spark.admin import RenameColumn
    from fluss_spark.types import evolution_eras

    t = admin.create_table(
        "db", "cm", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    )
    for i in range(3):
        t.append(spark.createDataFrame([(i, f"r{i}")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "cm", [RenameColumn("b", "label")])
    t2 = FlussTable(admin.catalog, "db", "cm")
    assert maintenance.compact_log(t2, spark, target_commits=2) == 3
    rows = {r["a"]: r["label"] for r in t2.scan(spark).collect()}
    assert rows == {0: "r0", 1: "r1", 2: "r2"}
    assert evolution_eras(t2.schema)  # history stays; files are migrated


def test_invalid_rename_retype_rejected(spark, admin):
    from fluss_spark.admin import AlterColumnType, RenameColumn

    admin.create_table(
        "db", "bad",
        TableSchema(
            fields=[Field("k", "BIGINT"), Field("v", "INT"), Field("p", "STRING")],
            primary_key=["k", "p"],
            bucket_keys=["k"],
            partition_keys=["p"],
            num_buckets=2,
        ),
    )
    with pytest.raises(InvalidAlterTableException, match="partition"):
        admin.alter_table("db", "bad", [RenameColumn("p", "p2")])
    with pytest.raises(InvalidAlterTableException, match="bucket key"):
        admin.alter_table("db", "bad", [AlterColumnType("k", "BIGINT")])
    with pytest.raises(InvalidAlterTableException, match="widening"):
        admin.alter_table("db", "bad", [AlterColumnType("v", "SMALLINT")])
    with pytest.raises(InvalidAlterTableException, match="widening"):
        admin.alter_table("db", "bad", [AlterColumnType("v", "STRING")])
    with pytest.raises(InvalidAlterTableException, match="no such column"):
        admin.alter_table("db", "bad", [RenameColumn("ghost", "g2")])
    # renaming pk (non-partition) IS allowed and updates the key lists
    admin.alter_table("db", "bad", [RenameColumn("k", "key_id")])
    sch = admin.get_table_info("db", "bad")
    assert sch.primary_key == ["key_id", "p"] and sch.bucket_keys == ["key_id"]
    # internal bookkeeping props cannot be set by hand
    with pytest.raises(InvalidAlterTableException, match="immutable"):
        admin.alter_table("db", "bad", [SetOption("schema.evolution", "[]")])


def test_stream_reader_era_transparent_file_source_refuses(spark, admin, tmp_path):
    """LogStreamReader replays both eras under current names; the
    file-source read_stream refuses (one fixed schema can't map eras)."""
    from fluss_spark.admin import RenameColumn
    from fluss_spark.streaming.reader import LogStreamReader, read_stream

    t = admin.create_table(
        "db", "sev", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    )
    t.append(spark.createDataFrame([(1, "x")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "sev", [RenameColumn("b", "label")])
    t2 = FlussTable(admin.catalog, "db", "sev")
    t2.append(spark.createDataFrame([(2, "y")], "a int, label string"), ordering=["a"])
    with pytest.raises(ValueError, match="renamed/retyped"):
        read_stream(t2, spark)
    reader = LogStreamReader(t2, spark, startup_mode="earliest")
    polled = reader.poll()
    assert polled is not None
    batch, _bid = polled
    assert {r["a"]: r["label"] for r in batch.collect()} == {1: "x", 2: "y"}
    # the guard gates on surviving FILES, not the permanent era records:
    # compact_log rewrites every pre-alter local segment under the
    # current schema, after which read_stream re-enables
    from fluss_spark.maintenance import compact_log

    assert compact_log(t2, spark, target_commits=1) == 2
    sdf = read_stream(t2, spark)
    assert sdf.isStreaming and "label" in sdf.schema.names


# -- property test: random alter/write interleavings vs a Python model ----


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# an action = (kind, selector); selectors index into current state so
# every generated action is interpreted against the live schema
_actions = st.lists(
    st.tuples(
        st.sampled_from(["append", "add", "drop", "rename", "widen"]),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(actions=_actions)
def test_random_alter_write_interleavings_match_model(spark_session, actions, tmp_path_factory):
    """Any interleaving of appends with add/drop/rename/widen alters must
    read back exactly what a trivial Python model predicts — every era's
    files resolved by field id onto the final schema."""
    spark = spark_session
    admin = Admin(Catalog(str(tmp_path_factory.mktemp("wh"))))
    admin.create_table(
        "db", "p",
        TableSchema(fields=[Field("k", "BIGINT"), Field("c0", "INT")], num_buckets=2),
    )
    from fluss_spark.admin import AlterColumnType, RenameColumn

    # model: ordered columns (name -> spark dtype) + rows as dicts keyed
    # by FINAL name via a field-identity map (same anchor as field ids)
    cols: list[str] = ["k", "c0"]  # identity keys, stable across renames
    names: dict[str, str] = {"k": "k", "c0": "c0"}  # identity -> current name
    types: dict[str, str] = {"k": "bigint", "c0": "int"}
    rows: list[dict[str, object]] = []  # keyed by identity
    next_col, next_val, wrote = 1, 0, False

    for kind, sel in actions:
        live = [c for c in cols if names[c] is not None]
        if kind == "append":
            t = FlussTable(admin.catalog, "db", "p")
            vals = {}
            for c in live:
                if types[c] == "string":
                    vals[c] = f"s{next_val}"
                elif types[c] in ("double", "float"):
                    vals[c] = float(next_val)  # model mirrors Spark's float
                else:
                    vals[c] = next_val
                next_val += 1
            ddl = ", ".join(f"`{names[c]}` {types[c]}" for c in live)
            t.append(
                spark.createDataFrame([tuple(vals[c] for c in live)], ddl),
                ordering=[names["k"]],
            )
            rows.append(vals)
            wrote = True
        elif kind == "add":
            ident = f"n{next_col}"
            next_col += 1
            typ = ["int", "string", "double"][sel % 3]
            admin.alter_table("db", "p", [AddColumn(ident, typ.upper())])
            cols.append(ident)
            names[ident], types[ident] = ident, typ
            for r in rows:
                r[ident] = None
        elif kind == "drop":
            droppable = [c for c in cols if names[c] is not None and c != "k"]
            if not droppable:
                continue
            c = droppable[sel % len(droppable)]
            admin.alter_table("db", "p", [DropColumn(names[c])])
            names[c] = None
        elif kind == "rename":
            renameable = [c for c in cols if names[c] is not None]
            c = renameable[sel % len(renameable)]
            new = f"r{next_col}"
            next_col += 1
            admin.alter_table("db", "p", [RenameColumn(names[c], new)])
            names[c] = new
        elif kind == "widen":
            widenable = [
                c for c in cols
                if names[c] is not None and types[c] in ("int", "float")
            ]
            if not widenable:
                continue
            c = widenable[sel % len(widenable)]
            new_t = {"int": "bigint", "float": "double"}[types[c]]
            admin.alter_table("db", "p", [AlterColumnType(names[c], new_t.upper())])
            types[c] = new_t

    t = FlussTable(admin.catalog, "db", "p")
    df = t.scan(spark)
    live = [c for c in cols if names[c] is not None]
    assert [f.name for f in t.schema.fields] == [names[c] for c in live]
    got = sorted(
        (tuple(r[names[c]] for c in live) for r in df.collect()), key=repr
    )
    want = sorted((tuple(r.get(c) for c in live) for r in rows), key=repr)
    assert got == want
    if wrote:
        dtypes = dict(df.dtypes)
        assert all(dtypes[names[c]] == types[c] for c in live)


def test_era_reads_span_tiers(spark, admin):
    """Rename mid-life, then tier old commits to remote: the scan must
    era-map BOTH tiers (old-era remote files, old-era local files, and
    new-era local files all project onto the current name)."""
    from fluss_spark import maintenance
    from fluss_spark.admin import RenameColumn

    t = admin.create_table(
        "db", "et", TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=1)
    )
    for i in range(3):  # commits 1-3 under the original schema
        t.append(spark.createDataFrame([(i, f"old{i}")], "a int, b string"), ordering=["a"])
    admin.alter_table("db", "et", [RenameColumn("b", "label")])
    t2 = FlussTable(admin.catalog, "db", "et")
    t2.append(spark.createDataFrame([(3, "new3")], "a int, label string"), ordering=["a"])
    # tier the two oldest commits (both old-era) to remote
    assert maintenance.tier_log(t2, local_segments=2) == 2
    rows = {r["a"]: r["label"] for r in t2.scan(spark).collect()}
    assert rows == {0: "old0", 1: "old1", 2: "old2", 3: "new3"}
    # offsets/time travel still fence correctly across tiers + eras
    tt = t2.log.scan(spark, as_of_commit=2)
    assert {r["a"]: r["label"] for r in tt.collect()} == {0: "old0", 1: "old1"}


def test_field_ids_never_reused_after_drop(spark, admin):
    """Era reads resolve BY id: dropping the highest-id column and then
    adding a new one must mint a FRESH id, or the new column would
    resurrect the dropped column's values from old-era files."""
    from fluss_spark.admin import RenameColumn

    t = admin.create_table(
        "db", "idr",
        TableSchema(fields=[Field("a", "INT"), Field("b", "STRING"), Field("c", "STRING")], num_buckets=1),
    )
    t.append(
        spark.createDataFrame([(1, "bee", "secret")], "a int, b string, c string"),
        ordering=["a"],
    )
    # create an era record (rename), so old files resolve by id
    admin.alter_table("db", "idr", [RenameColumn("a", "a2")])
    old_c_id = next(
        f.field_id for f in admin.get_table_info("db", "idr").fields if f.name == "c"
    )
    admin.alter_table("db", "idr", [DropColumn("c")])
    admin.alter_table("db", "idr", [AddColumn("d", "STRING")])
    sch = admin.get_table_info("db", "idr")
    new_d_id = next(f.field_id for f in sch.fields if f.name == "d")
    assert new_d_id != old_c_id  # id not recycled
    rows = FlussTable(admin.catalog, "db", "idr").scan(spark).collect()
    assert rows[0]["d"] is None  # NOT 'secret' resurrected from the old file


def test_sort_columns_follow_rename_and_drop(spark, admin):
    from fluss_spark import maintenance
    from fluss_spark.admin import RenameColumn

    t = admin.create_table(
        "db", "sc",
        TableSchema(
            fields=[Field("a", "INT"), Field("grp", "INT")],
            num_buckets=1,
            properties={"table.log.compaction.sort-columns": "grp"},
        ),
    )
    for i in range(2):
        t.append(spark.createDataFrame([(i, i % 2)], "a int, grp int"), ordering=["a"])
    admin.alter_table("db", "sc", [RenameColumn("grp", "bucketed")])
    sch = admin.get_table_info("db", "sc")
    assert sch.properties["table.log.compaction.sort-columns"] == "bucketed"
    t2 = FlussTable(admin.catalog, "db", "sc")
    assert maintenance.compact_log(t2, spark, target_commits=2) == 2  # no stale-name crash
    admin.alter_table("db", "sc", [DropColumn("bucketed")])
    assert "table.log.compaction.sort-columns" not in admin.get_table_info("db", "sc").properties
    with pytest.raises(InvalidAlterTableException, match="unknown sort column"):
        admin.alter_table(
            "db", "sc", [SetOption("table.log.compaction.sort-columns", "nope")]
        )
