"""Iceberg v2 metadata export: Avro codec round-trips, snapshot
export/read-back row identity, incremental re-export across appends
and compaction, pk-table snapshots, and the CALL surface.

Reference surface: fluss-lake/fluss-lake-iceberg tiering
(IcebergLakeTieringFactory.java:39) — the engine's committed files
become an Iceberg table an external reader resolves through the
HadoopTableOperations layout."""

from __future__ import annotations

import io
import json
import os

import pytest

from fluss_spark.admin import Admin
from fluss_spark.catalog import Catalog
from fluss_spark.functions.avro import (
    decode,
    encode,
    read_container,
    write_container,
)
from fluss_spark.iceberg import read_iceberg_snapshot, read_iceberg_table
from fluss_spark.types import Field, TableSchema


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


@pytest.fixture()
def admin(catalog):
    return Admin(catalog)


# --------------------------------------------------------------------- #
# avro codec
# --------------------------------------------------------------------- #
def test_avro_binary_roundtrip_all_types():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "i", "type": "int"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "b", "type": "boolean"},
            {"name": "by", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
            {"name": "arr", "type": {"type": "array", "items": ["null", "string"]}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "nest",
                "type": {
                    "type": "record",
                    "name": "n",
                    "fields": [{"name": "x", "type": ["null", "int"]}],
                },
            },
        ],
    }
    rec = {
        "s": "héllo ☃",
        "opt": None,
        "i": -(2**31),
        "d": -2.5,
        "f": 1.5,
        "b": True,
        "by": b"\x00\xff\x7f",
        "fx": b"abcd",
        "arr": ["a", None, ""],
        "m": {"k1": 2**62, "k2": -1},
        "nest": {"x": None},
    }
    buf = io.BytesIO()
    encode(schema, rec, buf)
    buf.seek(0)
    assert decode(schema, buf) == rec


@pytest.mark.parametrize("n", [0, 1, 999, 1000, 1001, 2500])
def test_avro_container_block_boundaries(tmp_path, n):
    """Multi-block container files (1000 records/block) round-trip at
    every boundary shape, metadata included."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    recs = [{"v": i * 7 - 3} for i in range(n)]
    p = str(tmp_path / "t.avro")
    size = write_container(p, schema, recs, {"meta-k": "meta-v"})
    assert size == os.path.getsize(p)
    s2, r2, m2 = read_container(p)
    assert s2 == schema and r2 == recs and m2["meta-k"] == b"meta-v"


def test_avro_zigzag_extremes(tmp_path):
    schema = {"type": "record", "name": "r", "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 2**63 - 1, -(2**63), 12345678901234]
    p = str(tmp_path / "z.avro")
    write_container(p, schema, [{"v": v} for v in vals])
    _, recs, _ = read_container(p)
    assert [r["v"] for r in recs] == vals


# --------------------------------------------------------------------- #
# export + read-back
# --------------------------------------------------------------------- #
def _mk_log_table(admin, spark, name="ice", commits=3):
    t = admin.create_table(
        "db", name,
        TableSchema(fields=[Field("a", "INT"), Field("b", "STRING")], num_buckets=2),
    )
    for i in range(commits):
        t.append(
            spark.createDataFrame(
                [(i, f"v{i}"), (i + 10, f"w{i}")], "a int, b string"
            ),
            ordering=["a"],
        )
    return t


def test_iceberg_export_metadata_shape(spark, admin, tmp_path):
    _mk_log_table(admin, spark)
    target = str(tmp_path / "ice")
    e = admin.export_iceberg_metadata("db", "ice", target)
    assert (e.version, e.n_remove) == (1, 0) and e.n_add > 0

    meta = json.load(open(e.metadata_path))
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == e.snapshot_id
    schema = meta["schemas"][meta["current-schema-id"]]
    names = [f["name"] for f in schema["fields"]]
    ids = [f["id"] for f in schema["fields"]]
    assert {"a", "b"} <= set(names) and len(ids) == len(set(ids))
    spec = meta["partition-specs"][meta["default-spec-id"]]["fields"]
    by_id = {f["id"]: f["name"] for f in schema["fields"]}
    for pf in spec:
        assert pf["transform"] == "identity"
        assert by_id[pf["source-id"]] == pf["name"]  # source resolves
    # version-hint resolution lands on this metadata file
    hint = open(os.path.join(target, "metadata", "version-hint.text")).read()
    assert int(hint) == 1

    # manifest entries carry real per-file stats and typed partitions
    ice = read_iceberg_snapshot(target)
    snap = admin.get_latest_lake_snapshot("db", "ice")
    assert {e_["data_file"]["file_path"] for e_ in ice.entries} == {
        os.path.abspath(p) for p in snap.files
    }
    for e_ in ice.entries:
        df_ = e_["data_file"]
        assert df_["file_size_in_bytes"] == os.path.getsize(df_["file_path"])
        assert df_["record_count"] > 0
        for k, v in df_["partition"].items():
            assert f"{k}={v}" in df_["file_path"]


def test_iceberg_read_back_row_identical(spark, admin, tmp_path):
    _mk_log_table(admin, spark)
    target = str(tmp_path / "ice")
    admin.export_iceberg_metadata("db", "ice", target)
    got = read_iceberg_table(spark, target)
    rows = {(r["a"], r["b"]) for r in got.select("a", "b").collect()}
    want = {(i, f"v{i}") for i in range(3)} | {(i + 10, f"w{i}") for i in range(3)}
    assert rows == want
    # identity partition columns are projected from manifest metadata
    assert {"__commit", "__bucket"} <= set(got.columns)
    assert got.filter("__commit IS NULL OR __bucket IS NULL").count() == 0
    assert got.select("__commit").distinct().count() == 3


def test_iceberg_incremental_export_and_compaction(spark, admin, tmp_path):
    t = _mk_log_table(admin, spark)
    target = str(tmp_path / "ice")
    e1 = admin.export_iceberg_metadata("db", "ice", target)

    # no-change export: a snapshot with zero adds/removes
    e2 = admin.export_iceberg_metadata("db", "ice", target)
    assert (e2.version, e2.n_add, e2.n_remove) == (2, 0, 0)
    assert e2.snapshot_id != e1.snapshot_id

    # append -> only the new files enter as ADDED
    t.append(spark.createDataFrame([(99, "z")], "a int, b string"), ordering=["a"])
    e3 = admin.export_iceberg_metadata("db", "ice", target)
    assert e3.version == 3 and e3.n_add >= 1 and e3.n_remove == 0

    # compaction rewrites the file set: removes supersede, adds replace
    from fluss_spark.maintenance import compact_log

    assert compact_log(t, spark, target_commits=2) > 0
    e4 = admin.export_iceberg_metadata("db", "ice", target)
    assert e4.version == 4 and e4.n_add > 0 and e4.n_remove > 0

    # replaying the CURRENT metadata lands exactly on the live file set
    ice = read_iceberg_snapshot(target)
    snap = admin.get_latest_lake_snapshot("db", "ice")
    assert {x["data_file"]["file_path"] for x in ice.entries} == {
        os.path.abspath(p) for p in snap.files
    }
    rows = {
        (r["a"], r["b"])
        for r in read_iceberg_table(spark, target).select("a", "b").collect()
    }
    want = (
        {(i, f"v{i}") for i in range(3)}
        | {(i + 10, f"w{i}") for i in range(3)}
        | {(99, "z")}
    )
    assert rows == want
    # snapshot lineage is recorded across all four exports
    meta = json.load(open(os.path.join(target, "metadata", "v4.metadata.json")))
    assert len(meta["snapshots"]) == 4
    assert meta["snapshots"][-1]["parent-snapshot-id"] == e3.snapshot_id
    assert meta["snapshots"][-1]["summary"]["operation"] == "overwrite"


def test_iceberg_export_pk_table_snapshot(spark, admin, tmp_path):
    t = admin.create_table(
        "db", "icepk",
        TableSchema(
            fields=[Field("id", "BIGINT", nullable=False), Field("v", "STRING")],
            primary_key=["id"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame(
            [(i, f"x{i}") for i in range(20)], "id bigint, v string"
        ),
        ordering=["id"],
    )
    t.upsert(
        spark.createDataFrame([(3, "updated")], "id bigint, v string"),
        ordering=["id"],
    )
    target = str(tmp_path / "icepk")
    admin.export_iceberg_metadata("db", "icepk", target)
    got = {
        (r["id"], r["v"])
        for r in read_iceberg_table(spark, target).select("id", "v").collect()
    }
    want = {(i, f"x{i}") for i in range(20) if i != 3} | {(3, "updated")}
    assert got == want


def test_iceberg_call_procedure(spark, tmp_path):
    from fluss_spark.sql_ddl import FlussSqlSession

    fsql = FlussSqlSession(Catalog(str(tmp_path / "wh")), spark, default_db="fluss")
    fsql.sql("""
        CREATE TABLE icet (a INT, b STRING) WITH ('bucket.num' = '1')
    """)
    fsql.sql("INSERT INTO icet VALUES (1, 'x'), (2, 'y')")
    target = str(tmp_path / "icet")
    out = fsql.sql(
        f"CALL sys.export_iceberg_metadata(table => 'icet', "
        f"target_dir => '{target}')"
    ).collect()
    assert "iceberg_version=1" in out[0][0]
    got = {
        (r["a"], r["b"])
        for r in read_iceberg_table(spark, target).select("a", "b").collect()
    }
    assert got == {(1, "x"), (2, "y")}


def test_iceberg_export_requires_alter_and_read(spark, tmp_path):
    """CALL sys.export_iceberg_metadata hands data files to an external
    reader — ALTER alone must not authorize it (same rule as the Delta
    export): the caller needs ALTER + READ on the table."""
    from fluss_spark import security as sec
    from fluss_spark.security import (
        AccessControlEntry,
        AclBinding,
        FlussPrincipal,
        Resource,
    )
    from fluss_spark.sql_ddl import FlussSqlSession

    cat = Catalog(str(tmp_path / "wh"))
    root = FlussSqlSession(cat, spark, principal="root", super_users=["User:root"])
    root.sql("CREATE TABLE fluss.ice_auth (a INT) WITH ('bucket.num' = '1')")
    root.sql("INSERT INTO fluss.ice_auth VALUES (1)")

    res = Resource.table("fluss", "ice_auth")
    sec.create_acls(
        cat,
        [AclBinding(res, AccessControlEntry(FlussPrincipal.parse("ops"), "ALTER", "*"))],
    )
    ops = FlussSqlSession(cat, spark, principal="ops")
    target = str(tmp_path / "exp")
    with pytest.raises(sec.AuthorizationError, match="READ"):
        ops.sql(
            f"CALL sys.export_iceberg_metadata(table => 'ice_auth', "
            f"target_dir => '{target}')"
        )
    sec.create_acls(
        cat,
        [AclBinding(res, AccessControlEntry(FlussPrincipal.parse("ops"), "READ", "*"))],
    )
    out = ops.sql(
        f"CALL sys.export_iceberg_metadata(table => 'ice_auth', "
        f"target_dir => '{target}')"
    ).collect()
    assert "iceberg_version=1" in out[0][0]


def test_avro_property_roundtrip():
    """Property test: random records under a fixed nested schema
    round-trip bit-exact through the container format."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "p",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "opt", "type": ["null", "long"], "default": None},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "by", "type": "bytes"},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": ["null", "string"]}},
        ],
    }
    rec_st = st.fixed_dictionaries(
        {
            "s": st.text(max_size=40),
            "opt": st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            "d": st.floats(allow_nan=False, allow_infinity=False),
            "b": st.booleans(),
            "by": st.binary(max_size=24),
            "arr": st.lists(st.integers(-(2**63), 2**63 - 1), max_size=8),
            "m": st.dictionaries(
                st.text(max_size=8), st.one_of(st.none(), st.text(max_size=8)),
                max_size=5,
            ),
        }
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rec_st, max_size=12))
    def check(recs):
        buf = io.BytesIO()
        for r in recs:
            encode(schema, r, buf)
        buf.seek(0)
        got = [decode(schema, buf) for _ in recs]
        assert got == recs

    check()


def test_iceberg_snapshot_time_travel(spark, admin, tmp_path):
    """VERSION AS OF: each export's manifest list is self-contained, so
    an older snapshot-id replays exactly its own file set after later
    appends (the data files still exist; expiring them is the caller's
    retention policy, as in Iceberg proper)."""
    t = _mk_log_table(admin, spark, name="icett")
    target = str(tmp_path / "icett")
    e1 = admin.export_iceberg_metadata("db", "icett", target)
    t.append(spark.createDataFrame([(99, "z")], "a int, b string"), ordering=["a"])
    e2 = admin.export_iceberg_metadata("db", "icett", target)

    cur = {(r["a"], r["b"]) for r in read_iceberg_table(spark, target).select("a", "b").collect()}
    assert (99, "z") in cur
    old = {
        (r["a"], r["b"])
        for r in read_iceberg_table(spark, target, snapshot_id=e1.snapshot_id)
        .select("a", "b").collect()
    }
    assert old == cur - {(99, "z")}
    with pytest.raises(ValueError, match="no such snapshot-id"):
        read_iceberg_snapshot(target, snapshot_id=12345)


def test_exports_refuse_schema_evolution_eras(spark, admin, tmp_path):
    """Files written before a rename carry old physical column names;
    name-resolving external readers would mislabel them — both lake
    exports must refuse with the compact-first remedy."""
    from fluss_spark.sql_ddl import FlussSqlSession

    fsql = FlussSqlSession(admin.catalog, spark, default_db="db")
    t = _mk_log_table(admin, spark, name="icev", commits=1)
    fsql.sql("ALTER TABLE db.icev RENAME COLUMN b TO label")
    with pytest.raises(ValueError, match="compact"):
        admin.export_iceberg_metadata("db", "icev", str(tmp_path / "x"))
    with pytest.raises(ValueError, match="compact"):
        admin.export_delta_log("db", "icev", str(tmp_path / "y"))
    # compaction rewrites every file under the current schema -> export OK
    from fluss_spark.maintenance import compact_log
    from fluss_spark.table import FlussTable

    t = FlussTable(admin.catalog, "db", "icev")  # fresh handle post-ALTER
    assert compact_log(t, spark, target_commits=1) > 0
    e = admin.export_iceberg_metadata("db", "icev", str(tmp_path / "x"))
    got = {
        (r["a"], r["label"])
        for r in read_iceberg_table(spark, str(tmp_path / "x"))
        .select("a", "label").collect()
    }
    assert got == {(0, "v0"), (10, "w0")}


# --------------------------------------------------------------------- #
# spec conformance (no repo reader in the loop) + field-id stability
# --------------------------------------------------------------------- #

# the public Iceberg spec's reserved field-ids (spec "Manifests" and
# "Manifest Lists" tables) — typed here as literal constants so a writer
# regression cannot self-validate
_SPEC_ENTRY_IDS = {
    "status": 0,
    "snapshot_id": 1,
    "data_file": 2,
    "sequence_number": 3,
    "file_sequence_number": 4,
}
_SPEC_DATA_FILE_IDS = {
    "content": 134,
    "file_path": 100,
    "file_format": 101,
    "partition": 102,
    "record_count": 103,
    "file_size_in_bytes": 104,
}
_SPEC_MANIFEST_FILE_IDS = {
    "manifest_path": 500,
    "manifest_length": 501,
    "partition_spec_id": 502,
    "content": 517,
    "sequence_number": 515,
    "min_sequence_number": 516,
    "added_snapshot_id": 503,
    "added_files_count": 504,
    "existing_files_count": 505,
    "deleted_files_count": 506,
    "added_rows_count": 512,
    "existing_rows_count": 513,
    "deleted_rows_count": 514,
}


def _header_schema_json(path):
    """Extract the embedded writer schema from a raw Avro container file
    with ONLY the stdlib: the header metadata stores `avro.schema` as
    plain JSON bytes, so locate the key and raw_decode the JSON that
    follows. Deliberately avoids the repo's own Avro reader so a shared
    writer+reader bug cannot self-validate."""
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01", "not an Avro object container"
    i = raw.index(b"avro.schema")
    j = raw.index(b"{", i)
    obj, _ = json.JSONDecoder().raw_decode(raw[j : j + 1_000_000].decode("utf-8", "replace"))
    return obj


def test_iceberg_manifest_avro_spec_field_ids(spark, admin, tmp_path):
    """The written manifest and manifest-list Avro schemas must carry the
    Iceberg spec's reserved field-ids — external readers resolve these
    structs BY ID, so a wrong id is silent data corruption for them even
    when the repo's own reader round-trips."""
    _mk_log_table(admin, spark)
    target = str(tmp_path / "ice")
    e = admin.export_iceberg_metadata("db", "ice", target)
    meta_dir = os.path.join(target, "metadata")
    manifest = next(
        os.path.join(meta_dir, f) for f in os.listdir(meta_dir) if f.endswith("-m0.avro")
    )
    mlist = next(
        os.path.join(meta_dir, f)
        for f in os.listdir(meta_dir)
        if f.startswith(f"snap-{e.snapshot_id}-")
    )

    entry = _header_schema_json(manifest)
    got = {f["name"]: f["field-id"] for f in entry["fields"]}
    for name, fid in _SPEC_ENTRY_IDS.items():
        assert got[name] == fid, f"manifest_entry.{name}: {got[name]} != spec {fid}"
    data_file = next(f for f in entry["fields"] if f["name"] == "data_file")
    df_type = data_file["type"]
    df_type = df_type[1] if isinstance(df_type, list) else df_type  # unwrap union
    got_df = {f["name"]: f["field-id"] for f in df_type["fields"]}
    for name, fid in _SPEC_DATA_FILE_IDS.items():
        assert got_df[name] == fid, f"data_file.{name}: {got_df[name]} != spec {fid}"

    mf = _header_schema_json(mlist)
    got_mf = {f["name"]: f["field-id"] for f in mf["fields"]}
    for name, fid in _SPEC_MANIFEST_FILE_IDS.items():
        assert got_mf[name] == fid, f"manifest_file.{name}: {got_mf[name]} != spec {fid}"

    # the manifest header also carries the table schema and the
    # partition-spec id it was written under (spec: required manifest
    # key-value metadata)
    raw = open(manifest, "rb").read()
    meta = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    current_schema = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    assert json.dumps(current_schema).encode() in raw
    assert b"partition-spec-id" in raw


def test_iceberg_corrupted_manifest_rejected(spark, admin, tmp_path):
    """Bit-flips inside a manifest must fail loudly on read (sync-marker
    / decode error), never yield silently wrong file lists."""
    _mk_log_table(admin, spark)
    target = str(tmp_path / "ice")
    admin.export_iceberg_metadata("db", "ice", target)
    meta_dir = os.path.join(target, "metadata")
    manifest = next(
        os.path.join(meta_dir, f) for f in os.listdir(meta_dir) if f.endswith("-m0.avro")
    )
    raw = bytearray(open(manifest, "rb").read())
    # truncate mid-block: records become undecodable / sync marker lost
    open(manifest, "wb").write(bytes(raw[: len(raw) // 2]))
    with pytest.raises((ValueError, EOFError, KeyError, IndexError)):
        read_iceberg_snapshot(target)


def test_iceberg_stable_field_ids_and_add_column(spark, admin, tmp_path):
    """Field-id stability across exports (Iceberg's by-id resolution
    contract) and the ADD COLUMN case the round-6 review flagged: with
    pre-add files still LIVE, the export must carry the new column (ids
    appended, prior ids untouched, schema APPENDED under a new
    schema-id) and the union read must surface NULLs for it on old
    files instead of dropping the column."""
    from fluss_spark.admin import AddColumn

    t = _mk_log_table(admin, spark, name="iceadd", commits=2)
    target = str(tmp_path / "ice")
    e1 = admin.export_iceberg_metadata("db", "iceadd", target)
    meta1 = json.load(open(e1.metadata_path))
    s1 = next(s for s in meta1["schemas"] if s["schema-id"] == meta1["current-schema-id"])
    ids1 = {f["name"]: f["id"] for f in s1["fields"]}

    admin.alter_table("db", "iceadd", [AddColumn("c", "DOUBLE")])
    from fluss_spark.table import FlussTable

    t = FlussTable(admin.catalog, "db", "iceadd")  # fresh handle post-ALTER
    t.append(
        spark.createDataFrame([(50, "new", 1.5)], "a int, b string, c double"),
        ordering=["a"],
    )
    e2 = admin.export_iceberg_metadata("db", "iceadd", target)
    meta2 = json.load(open(e2.metadata_path))
    s2 = next(s for s in meta2["schemas"] if s["schema-id"] == meta2["current-schema-id"])
    ids2 = {f["name"]: f["id"] for f in s2["fields"]}

    # prior ids verbatim; new column appended past last-column-id
    for name, fid in ids1.items():
        assert ids2[name] == fid, f"{name}: id drifted {fid} -> {ids2[name]}"
    assert "c" in ids2 and ids2["c"] > meta1["last-column-id"]
    # schema history appended, never overwritten
    assert meta2["current-schema-id"] != meta1["current-schema-id"]
    assert any(s["schema-id"] == meta1["current-schema-id"] for s in meta2["schemas"])
    # older snapshots still resolve THEIR schema
    old = read_iceberg_snapshot(target, snapshot_id=e1.snapshot_id)
    assert "c" not in {f["name"] for f in old.schema["fields"]}

    # union read: the new column is present; pre-add files surface NULLs
    got = read_iceberg_table(spark, target)
    assert "c" in got.columns
    rows = {(r["a"], r["c"]) for r in got.select("a", "c").collect()}
    assert (50, 1.5) in rows
    assert all(c is None for a, c in rows if a != 50)
    assert len(rows) == 5  # 2 commits x 2 rows + the new one


def test_iceberg_pk_export_schema_is_declared_columns_only(spark, admin, tmp_path):
    """ADVICE r7 (high): fused pk-table snapshot files carry the WAL
    system columns (as nulls) in their parquet footers; the exported
    Iceberg schema must surface ONLY the declared columns plus the path
    partition column(s) — never _change_type/__seq/__sub/__offset/
    __timestamp."""
    t = admin.create_table(
        "db", "icepk_clean",
        TableSchema(
            fields=[Field("id", "BIGINT", nullable=False), Field("v", "STRING")],
            primary_key=["id"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame([(i, f"x{i}") for i in range(10)], "id bigint, v string"),
        ordering=["id"],
    )
    t.upsert(
        spark.createDataFrame([(3, "updated")], "id bigint, v string"), ordering=["id"]
    )
    # precondition: the snapshot footers DO contain the system columns
    import pyarrow.parquet as pq

    snap_files = admin.get_latest_lake_snapshot("db", "icepk_clean").files
    footer_names = set()
    for p in snap_files:
        footer_names |= set(pq.read_schema(p).names)
    assert "_change_type" in footer_names and "__offset" in footer_names

    target = str(tmp_path / "icepk_clean")
    admin.export_iceberg_metadata("db", "icepk_clean", target)
    meta_dir = os.path.join(target, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    cur = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    assert {f["name"] for f in cur["fields"]} == {"id", "v", "__bucket"}
    # read-back surfaces exactly the exported columns
    df = read_iceberg_table(spark, target)
    assert set(df.columns) == {"id", "v", "__bucket"}
    got = {(r["id"], r["v"]) for r in df.select("id", "v").collect()}
    assert got == {(i, f"x{i}") for i in range(10) if i != 3} | {(3, "updated")}


def test_iceberg_pk_export_heals_polluted_prior_schema(spark, admin, tmp_path):
    """A pre-fix export that leaked WAL system columns into the Iceberg
    schema is healed by the next export: the carried prior fields drop
    the internal names (a new schema-id is appended; the old snapshot
    still resolves its own recorded schema-id)."""
    t = admin.create_table(
        "db", "icepk_heal",
        TableSchema(
            fields=[Field("id", "BIGINT", nullable=False), Field("v", "STRING")],
            primary_key=["id"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame([(i, f"x{i}") for i in range(6)], "id bigint, v string"),
        ordering=["id"],
    )
    target = str(tmp_path / "icepk_heal")
    admin.export_iceberg_metadata("db", "icepk_heal", target)
    meta_dir = os.path.join(target, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read().strip())
    mpath = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mpath) as f:
        meta = json.load(f)
    # simulate the r7 pollution: inject system columns into the current
    # schema as a pre-fix export would have recorded them
    cur = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    nid = meta["last-column-id"]
    for name in ("_change_type", "__seq", "__offset"):
        nid += 1
        cur["fields"].append(
            {"id": nid, "name": name, "required": False, "type": "string"}
        )
    meta["last-column-id"] = nid
    with open(mpath, "w") as f:
        json.dump(meta, f)

    # next commit + export must carry ONLY the clean fields forward
    t.upsert(
        spark.createDataFrame([(1, "updated")], "id bigint, v string"), ordering=["id"]
    )
    admin.export_iceberg_metadata("db", "icepk_heal", target)
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v2 = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{v2}.metadata.json")) as f:
        meta2 = json.load(f)
    cur2 = next(
        s for s in meta2["schemas"] if s["schema-id"] == meta2["current-schema-id"]
    )
    assert {f["name"] for f in cur2["fields"]} == {"id", "v", "__bucket"}
    # stable ids: the surviving fields keep their original ids
    old_ids = {f["name"]: f["id"] for f in cur["fields"]}
    assert all(f["id"] == old_ids[f["name"]] for f in cur2["fields"])
    got = {
        (r["id"], r["v"])
        for r in read_iceberg_table(spark, target).select("id", "v").collect()
    }
    assert got == {(i, f"x{i}") for i in range(6) if i != 1} | {(1, "updated")}


def test_delta_pk_export_schema_clean_and_heals(spark, admin, tmp_path):
    """export_delta_log on a pk table: the v0 metaData schema holds only
    declared columns + partition path cols; a polluted prior metaData
    (pre-fix export) is corrected by appending a cleaned metaData action
    on the next export."""
    t = admin.create_table(
        "db", "dlpk",
        TableSchema(
            fields=[Field("id", "BIGINT", nullable=False), Field("v", "STRING")],
            primary_key=["id"],
            num_buckets=2,
        ),
    )
    t.upsert(
        spark.createDataFrame([(i, f"x{i}") for i in range(6)], "id bigint, v string"),
        ordering=["id"],
    )
    target = str(tmp_path / "dlpk")
    admin.export_delta_log("db", "dlpk", target)
    log_dir = os.path.join(target, "_delta_log")

    def _schema_fields(fn):
        out = None
        with open(os.path.join(log_dir, fn)) as f:
            for line in f:
                act = json.loads(line)
                if "metaData" in act:
                    out = [
                        fl["name"]
                        for fl in json.loads(act["metaData"]["schemaString"])["fields"]
                    ]
        return out

    assert set(_schema_fields("00000000000000000000.json")) == {"id", "v", "__bucket"}

    # simulate a pre-fix polluted v0 metaData, then re-export
    p0 = os.path.join(log_dir, "00000000000000000000.json")
    lines = open(p0).read().splitlines()
    out_lines = []
    for line in lines:
        act = json.loads(line)
        if "metaData" in act:
            sch = json.loads(act["metaData"]["schemaString"])
            sch["fields"] += [
                {"name": "_change_type", "nullable": True, "metadata": {}, "type": "string"},
                {"name": "__offset", "nullable": True, "metadata": {}, "type": "long"},
            ]
            act["metaData"]["schemaString"] = json.dumps(sch)
        out_lines.append(json.dumps(act))
    with open(p0, "w") as f:
        f.write("\n".join(out_lines) + "\n")

    t.upsert(
        spark.createDataFrame([(1, "updated")], "id bigint, v string"), ordering=["id"]
    )
    admin.export_delta_log("db", "dlpk", target)
    healed = _schema_fields("00000000000000000001.json")
    assert healed is not None and set(healed) == {"id", "v", "__bucket"}


def test_iceberg_mixed_partition_layout_guard_and_per_snapshot_spec(
    spark, admin, tmp_path
):
    """ADVICE r7 (low) + upgrade hygiene. (a) The mixed-layout guard:
    a live file set where a user partition column appears in only SOME
    paths (possible only for data written before the partitioned
    layouts — every current writer nests partition dirs) must refuse
    export. (b) Per-snapshot partition-spec resolution: a retained
    snapshot reads under the spec recorded by ITS manifest
    (partition_spec_id), not the table-level default — verified by
    appending a changed default spec to the metadata the way a later
    export would."""
    from fluss_spark.iceberg import _check_no_mixed_partition_layout

    # (a) guard unit: one file missing the dt= segment -> refuse;
    # system segments (__bucket/__commit) are exempt
    ok = [
        "snapshot/data-v1/dt=d1/__bucket=0/f1.parquet",
        "snapshot/data-v1/dt=d2/__bucket=1/f2.parquet",
    ]
    _check_no_mixed_partition_layout(["dt", "__bucket"], ok, "t")  # no raise
    mixed = ok + ["snapshot/data-v0/__bucket=0/f0.parquet"]
    with pytest.raises(ValueError, match="partition-dir layout"):
        _check_no_mixed_partition_layout(["dt", "__bucket"], mixed, "t")
    _check_no_mixed_partition_layout(["__bucket"], mixed, "t")  # system-only: ok

    # (b) per-snapshot spec: export a partitioned pk table (spec =
    # [dt, __bucket]), then simulate a later export that changed the
    # default spec — the OLD snapshot must still resolve ITS spec
    t = admin.create_table(
        "db", "icespec",
        TableSchema(
            fields=[
                Field("dt", "STRING", nullable=False),
                Field("id", "BIGINT", nullable=False),
                Field("v", "STRING"),
            ],
            primary_key=["dt", "id"],
            partition_keys=["dt"],
            num_buckets=2,
        ),
    )
    rows = [("d1", i, f"x{i}") for i in range(6)] + [("d2", i, f"y{i}") for i in range(6)]
    t.upsert(spark.createDataFrame(rows, "dt string, id bigint, v string"), ordering=["id"])
    target = str(tmp_path / "icespec")
    e1 = admin.export_iceberg_metadata("db", "icespec", target)
    meta_dir = os.path.join(target, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read().strip())
    mpath = os.path.join(meta_dir, f"v{v}.metadata.json")
    with open(mpath) as f:
        meta = json.load(f)
    assert [pf["name"] for s in meta["partition-specs"] for pf in s["fields"]] == [
        "dt", "__bucket",
    ]
    # simulate a later spec change: append spec-id 1 with different
    # fields and advance the default — exactly what a future export
    # with a changed path layout would write
    meta["partition-specs"].append(
        {"spec-id": 1, "fields": [{"name": "__bucket", "transform": "identity",
                                   "source-id": 99, "field-id": 1001}]}
    )
    meta["default-spec-id"] = 1
    with open(mpath, "w") as f:
        json.dump(meta, f)
    # the snapshot's manifest recorded spec-id 0 -> read projects dt
    # from manifests despite the new table-level default
    snap = read_iceberg_snapshot(target, snapshot_id=e1.snapshot_id)
    assert [pf["name"] for pf in snap.partition_fields] == ["dt", "__bucket"]
    got = {
        (r["dt"], r["id"], r["v"])
        for r in read_iceberg_table(spark, target, snapshot_id=e1.snapshot_id)
        .select("dt", "id", "v")
        .collect()
    }
    assert got == set(rows)


def test_iceberg_export_partitioned_pk_pair_layout(spark, admin, tmp_path):
    """Partitioned pk snapshots (pair-granular manifests, partition dirs
    above bucket dirs) export to Iceberg with an identity spec over
    (dt, __bucket) and read back row-identical — including after a
    second commit that rewrote only ONE partition's pairs."""
    t = admin.create_table(
        "db", "icepart",
        TableSchema(
            fields=[
                Field("dt", "STRING", nullable=False),
                Field("id", "BIGINT", nullable=False),
                Field("v", "STRING"),
            ],
            primary_key=["dt", "id"],
            partition_keys=["dt"],
            num_buckets=2,
        ),
    )
    rows = [("d1", i, f"x{i}") for i in range(5)] + [("d2", i, f"y{i}") for i in range(5)]
    t.upsert(spark.createDataFrame(rows, "dt string, id bigint, v string"), ordering=["id"])
    t.upsert(
        spark.createDataFrame([("d1", 0, "upd")], "dt string, id bigint, v string"),
        ordering=["id"],
    )
    target = str(tmp_path / "icepart")
    admin.export_iceberg_metadata("db", "icepart", target)
    snap = read_iceberg_snapshot(target)
    assert [pf["name"] for pf in snap.partition_fields] == ["dt", "__bucket"]
    got = {
        (r["dt"], r["id"], r["v"])
        for r in read_iceberg_table(spark, target).select("dt", "id", "v").collect()
    }
    want = {r for r in rows if r != ("d1", 0, "x0")} | {("d1", 0, "upd")}
    assert got == want
    # schema surfaces only declared columns + path partition cols
    assert {f["name"] for f in snap.schema["fields"]} == {"dt", "id", "v", "__bucket"}
