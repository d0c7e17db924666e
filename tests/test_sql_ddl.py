"""SQL front-end: the reference's Flink-SQL statement surface mapped
onto the engine (DDL -> Admin, INSERT -> append/upsert, SELECT ->
Spark SQL over the registered views)."""

from __future__ import annotations

import pytest

from fluss_spark.catalog import Catalog
from fluss_spark.sql_ddl import FlussSqlSession, SqlParseError


@pytest.fixture()
def fsql(spark, tmp_path):
    return FlussSqlSession(Catalog(str(tmp_path / "wh")), spark, default_db="fluss")


def test_create_insert_select_log_table(spark, fsql):
    fsql.sql("""
        CREATE TABLE events_log (
            id BIGINT NOT NULL,
            kind STRING,
            score DOUBLE
        ) WITH ('bucket.num' = '2', 'table.log.ttl' = '7d')
    """)
    assert fsql.sql("SHOW TABLES").collect()[0]["table_name"] == "events_log"
    fsql.sql("INSERT INTO events_log VALUES (1, 'click', 0.5), (2, 'view', 1.5)")
    got = fsql.sql(
        "SELECT kind, score FROM fluss_events_log WHERE score > 1.0"
    ).collect()
    assert [(r["kind"], r["score"]) for r in got] == [("view", 1.5)]
    desc = {r["name"]: (r["type"], r["nullable"]) for r in fsql.sql("DESCRIBE events_log").collect()}
    assert desc["id"] == ("BIGINT", False) and desc["score"][0] == "DOUBLE"


def test_pk_table_upsert_and_merge_engine(spark, fsql):
    fsql.sql("""
        CREATE TABLE kv (
            k BIGINT,
            v STRING,
            PRIMARY KEY (k) NOT ENFORCED
        ) WITH ('bucket.num' = '2')
    """)
    fsql.sql("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
    fsql.sql("INSERT INTO kv VALUES (2, 'b2')")
    rows = {r["k"]: r["v"] for r in fsql.sql("SELECT * FROM fluss_kv__snapshot").collect()}
    assert rows == {1: "a", 2: "b2"}
    # changelog virtual table visible through SQL too
    assert fsql.sql(
        "SELECT count(*) AS c FROM fluss_kv__changelog WHERE _change_type = '+U'"
    ).collect()[0]["c"] == 1


def test_insert_select_between_tables(spark, fsql):
    fsql.sql("CREATE TABLE src (a INT, b STRING) WITH ('bucket.num' = '1')")
    fsql.sql("CREATE TABLE dst (a INT, b STRING) WITH ('bucket.num' = '1')")
    fsql.sql("INSERT INTO src VALUES (1, 'x'), (2, 'y'), (3, 'z')")
    fsql.sql("INSERT INTO dst SELECT a, b FROM fluss_src WHERE a >= 2")
    assert fsql.sql("SELECT count(*) AS c FROM fluss_dst").collect()[0]["c"] == 2
    with pytest.raises(SqlParseError, match="arity"):
        fsql.sql("INSERT INTO dst SELECT a FROM fluss_src")


def test_alter_statements_and_show_create(spark, fsql):
    fsql.sql("CREATE TABLE ev (a INT, b STRING) WITH ('bucket.num' = '1')")
    fsql.sql("INSERT INTO ev VALUES (1, 'pre')")
    fsql.sql("ALTER TABLE ev ADD COLUMN c DOUBLE")
    fsql.sql("ALTER TABLE ev RENAME COLUMN b TO label")
    fsql.sql("ALTER TABLE ev ALTER COLUMN a TYPE BIGINT")
    fsql.sql("ALTER TABLE ev SET ('table.log.ttl' = '1d')")
    fsql.sql("INSERT INTO ev VALUES (2, 'post', 0.5)")
    got = {r["a"]: (r["label"], r["c"]) for r in fsql.sql("SELECT * FROM fluss_ev").collect()}
    assert got == {1: ("pre", None), 2: ("post", 0.5)}
    stmt = fsql.sql("SHOW CREATE TABLE ev").collect()[0]["create_statement"]
    assert "`label` STRING" in stmt and "'table.log.ttl' = '1d'" in stmt
    fsql.sql("ALTER TABLE ev RESET ('table.log.ttl')")
    assert "table.log.ttl" not in fsql.sql("SHOW CREATE TABLE ev").collect()[0]["create_statement"]
    fsql.sql("ALTER TABLE ev DROP COLUMN c")
    assert "c" not in fsql.sql("SELECT * FROM fluss_ev").columns


def test_partitioned_table_and_show_partitions(spark, fsql):
    fsql.sql("""
        CREATE TABLE pt (a INT, p STRING) PARTITIONED BY (p)
        WITH ('bucket.num' = '1')
    """)
    fsql.sql("INSERT INTO pt VALUES (1, '2024'), (2, '2025')")
    parts = [r["partition"] for r in fsql.sql("SHOW PARTITIONS pt").collect()]
    assert parts == ["p=2024", "p=2025"]


def test_databases_and_qualified_names(spark, fsql):
    fsql.sql("CREATE DATABASE IF NOT EXISTS ml COMMENT 'training corpora'")
    assert "ml" in [r["database_name"] for r in fsql.sql("SHOW DATABASES").collect()]
    fsql.sql("CREATE TABLE ml.docs (id BIGINT, body STRING) WITH ('bucket.num' = '1')")
    fsql.sql("INSERT INTO ml.docs VALUES (1, 'hello')")
    assert fsql.sql("SELECT count(*) AS c FROM ml_docs").collect()[0]["c"] == 1
    assert [r["table_name"] for r in fsql.sql("SHOW TABLES IN ml").collect()] == ["docs"]
    fsql.sql("DROP TABLE ml.docs")
    fsql.sql("DROP TABLE IF EXISTS ml.docs")  # idempotent with IF EXISTS
    assert fsql.sql("SHOW TABLES IN ml").count() == 0
    with pytest.raises(SqlParseError):
        fsql.sql("GRANT ALL ON x TO y")


def test_create_with_decimal_and_pk_bucket_key(spark, fsql):
    fsql.sql("""
        CREATE TABLE ledger (
            acct BIGINT,
            seq BIGINT,
            amount DECIMAL(10,2),
            PRIMARY KEY (acct, seq) NOT ENFORCED
        ) WITH ('bucket.num' = '4', 'bucket.key' = 'acct')
    """)
    sch = fsql.admin.get_table_info("fluss", "ledger")
    assert sch.primary_key == ["acct", "seq"] and sch.bucket_keys == ["acct"]
    assert sch.num_buckets == 4
    fsql.sql("INSERT INTO ledger VALUES (7, 1, 12.50)")
    # prefix lookup works on the SQL-defined bucket key
    from fluss_spark.table import FlussTable

    t = FlussTable(fsql.catalog, "fluss", "ledger")
    assert t.prefix_lookup(spark, {"acct": 7}).count() == 1


def test_show_partitions_non_partitioned_clean_error(spark, fsql):
    fsql.sql("CREATE TABLE flat (a INT) WITH ('bucket.num' = '1')")
    with pytest.raises(ValueError, match="not a partitioned"):
        fsql.sql("SHOW PARTITIONS flat")


def test_select_view_refresh_is_case_insensitive(spark, fsql):
    """Spark resolves temp view names case-insensitively; the scoped
    view-refresh match must too, or a differently-cased SELECT reads the
    stale plan bound at a previous registration."""
    fsql.sql("CREATE TABLE cased (a INT) WITH ('bucket.num' = '1')")
    fsql.sql("INSERT INTO cased VALUES (1)")
    assert fsql.sql("SELECT count(*) AS c FROM fluss_cased").collect()[0]["c"] == 1
    fsql.sql("INSERT INTO cased VALUES (2)")
    # another registered table also matching keeps hit=True (no
    # conservative full refresh masking the miss)
    fsql.sql("CREATE TABLE other (b INT) WITH ('bucket.num' = '1')")
    got = fsql.sql("SELECT count(*) AS c FROM FLUSS_CASED, fluss_other").collect()
    # fluss_other is empty -> the cross join yields 0 rows (c=0), but
    # the cased view must have refreshed; observe via a direct re-query
    assert got[0]["c"] == 0
    assert fsql.sql("SELECT count(*) AS c FROM FLUSS_CASED").collect()[0]["c"] == 2
