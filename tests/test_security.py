"""ACL surface + authorizer semantics (Admin.java:573-600,
DefaultAuthorizer.java decision procedure) and SQL-session enforcement."""

from __future__ import annotations

import os

import pytest

from fluss_spark import security as sec
from fluss_spark.catalog import Catalog
from fluss_spark.security import (
    AccessControlEntry,
    AclBinding,
    AclBindingFilter,
    AuthorizationError,
    Authorizer,
    FlussPrincipal,
    Resource,
)


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "wh"))


def _grant(catalog, principal, op, res, host="*"):
    return sec.create_acls(
        catalog,
        [AclBinding(res, AccessControlEntry(FlussPrincipal.parse(principal), op, host))],
    )


def test_acl_crud_and_filters(catalog):
    alice = FlussPrincipal("alice")
    b1 = AclBinding(Resource.table("db", "t1"), AccessControlEntry(alice, "READ"))
    b2 = AclBinding(Resource.database("db"), AccessControlEntry(alice, "WRITE"))
    b3 = AclBinding(Resource.cluster(), AccessControlEntry(FlussPrincipal("bob"), "ALL"))
    assert sec.create_acls(catalog, [b1, b2, b3]) == [b1, b2, b3]
    # idempotent: re-creating an existing binding adds nothing
    assert sec.create_acls(catalog, [b1]) == []
    assert len(sec.list_acls(catalog)) == 3
    # filters narrow by principal / resource / operation
    assert sec.list_acls(catalog, AclBindingFilter(principal=alice)) == [b1, b2]
    assert sec.list_acls(catalog, AclBindingFilter(resource_type=sec.TABLE)) == [b1]
    assert sec.list_acls(catalog, AclBindingFilter(operation="ALL")) == [b3]
    # drop returns what it removed
    dropped = sec.drop_acls(catalog, [AclBindingFilter(principal=alice)])
    assert dropped == [b1, b2] and sec.list_acls(catalog) == [b3]
    # only ALLOW is grantable (reference: DENY is a future todo)
    with pytest.raises(ValueError, match="ALLOW"):
        sec.create_acls(
            catalog,
            [AclBinding(Resource.cluster(), AccessControlEntry(alice, "READ", permission="DENY"))],
        )


def test_authorizer_hierarchy_and_implication(catalog):
    a = Authorizer(catalog)
    t = Resource.table("db", "t")
    # empty ACLs -> deny everyone (SHOULD_ALLOW_EVERYONE_IF_NO_ACL_IS_FOUND=false)
    assert not a.authorized("alice", "READ", t)
    # database-level READ covers the table (resource hierarchy)
    _grant(catalog, "alice", "READ", Resource.database("db"))
    assert a.authorized("alice", "READ", t)
    assert a.authorized("alice", "READ", Resource.database("db"))
    assert not a.authorized("alice", "WRITE", t)
    assert not a.authorized("alice", "READ", Resource.table("other", "t"))
    # READ implies DESCRIBE (OPS_MAPPING), not the reverse
    assert a.authorized("alice", "DESCRIBE", t)
    _grant(catalog, "carol", "DESCRIBE", t)
    assert a.authorized("carol", "DESCRIBE", t)
    assert not a.authorized("carol", "READ", t)
    # cluster-level ALL covers everything
    _grant(catalog, "bob", "ALL", Resource.cluster())
    assert a.authorized("bob", "ALTER", t)
    assert a.authorized("bob", "CREATE", Resource.database("x"))
    # wildcard principal and host scoping
    _grant(catalog, "*:*", "READ", Resource.table("pub", "open"))
    assert a.authorized("anyone", "READ", Resource.table("pub", "open"))
    _grant(catalog, "dan", "WRITE", t, host="10.0.0.5")
    assert a.authorized("dan", "WRITE", t, host="10.0.0.5")
    assert not a.authorized("dan", "WRITE", t, host="10.0.0.6")
    # super-users bypass every check
    su = Authorizer(catalog, super_users=["User:root"])
    assert su.authorized("root", "DROP", Resource.table("any", "thing"))


def test_sql_session_enforcement(spark, tmp_path):
    from fluss_spark.sql_ddl import FlussSqlSession

    catalog = Catalog(str(tmp_path / "wh"))
    admin_s = FlussSqlSession(catalog, spark, principal="root", super_users=["User:root"])
    admin_s.sql("CREATE TABLE fluss.t (a INT, b STRING) WITH ('bucket.num' = '1')")
    admin_s.sql("INSERT INTO fluss.t VALUES (1, 'x')")
    _grant(catalog, "reader", "READ", Resource.table("fluss", "t"))

    reader = FlussSqlSession(catalog, spark, principal="reader")
    assert reader.sql("SELECT count(*) AS c FROM fluss_t").collect()[0]["c"] == 1
    reader.sql("DESCRIBE t")  # READ implies DESCRIBE
    with pytest.raises(AuthorizationError, match="WRITE"):
        reader.sql("INSERT INTO fluss.t VALUES (2, 'y')")
    with pytest.raises(AuthorizationError, match="DROP"):
        reader.sql("DROP TABLE fluss.t")
    with pytest.raises(AuthorizationError, match="CREATE"):
        reader.sql("CREATE TABLE fluss.t2 (a INT) WITH ('bucket.num' = '1')")
    # stranger with no grants is denied even reads
    stranger = FlussSqlSession(catalog, spark, principal="nobody")
    with pytest.raises(AuthorizationError, match="READ"):
        stranger.sql("SELECT * FROM fluss_t")
    # Admin facade exposes the same surface
    from fluss_spark.admin import Admin

    adm = Admin(catalog)
    assert len(adm.list_acls()) == 1
    adm.drop_acls([AclBindingFilter()])
    assert adm.list_acls() == []
    with pytest.raises(AuthorizationError):
        reader.sql("SELECT * FROM fluss_t")  # grants are gone


def test_sql_session_rejects_path_reads_and_like_leak(spark, tmp_path):
    """ADVICE r4: (1) FROM parquet.`/path` names no engine view, so the
    per-table READ checks never fired — full read bypass; now rejected
    outright for authenticated sessions. (2) CREATE TABLE ... LIKE
    db.tbl never matched the db_tbl substring rule — a principal with
    only CREATE could copy any table's schema; now checks DESCRIBE on
    the source."""
    from fluss_spark.sql_ddl import FlussSqlSession

    catalog = Catalog(str(tmp_path / "wh"))
    root = FlussSqlSession(catalog, spark, principal="root", super_users=["User:root"])
    root.sql("CREATE TABLE fluss.secrets (a INT) WITH ('bucket.num' = '1')")
    root.sql("INSERT INTO fluss.secrets VALUES (42)")

    # zero-grant principal: path-based read bypass is closed
    nobody = FlussSqlSession(catalog, spark, principal="nobody")
    log_dir = os.path.join(catalog.table_dir("fluss", "secrets"), "log")
    for stmt in (
        f"SELECT * FROM parquet.`{log_dir}`",
        f"SELECT * FROM fluss_secrets x JOIN parquet.`{log_dir}` y ON 1=1",
        f"EXPLAIN SELECT * FROM parquet.`{log_dir}`",
        f"WITH c AS (SELECT * FROM parquet.`{log_dir}`) SELECT * FROM c",
    ):
        with pytest.raises(AuthorizationError, match="path-based"):
            nobody.sql(stmt)
    # an unauthenticated session (authorizer disabled) still may
    open_s = FlussSqlSession(catalog, spark)
    assert open_s.sql(f"SELECT count(*) AS c FROM parquet.`{log_dir}`").collect()[0]["c"] == 1

    # CREATE on one database must not allow copying another database's
    # schema via LIKE (within the SAME db, CREATE implies DESCRIBE by
    # the reference's OPS_MAPPING hierarchy — that part is by design)
    root.sql("CREATE DATABASE priv")
    root.sql("CREATE TABLE priv.vault (s STRING) WITH ('bucket.num' = '1')")
    _grant(catalog, "builder", "CREATE", Resource.database("fluss"))
    builder = FlussSqlSession(catalog, spark, principal="builder")
    with pytest.raises(AuthorizationError, match="DESCRIBE"):
        builder.sql("CREATE TABLE fluss.copy LIKE priv.vault")
    # with DESCRIBE on the source it works
    _grant(catalog, "builder", "DESCRIBE", Resource.table("priv", "vault"))
    builder.sql("CREATE TABLE fluss.copy LIKE priv.vault")
    assert catalog.table_exists("fluss", "copy")
    # a LIKE '%pattern%' predicate inside CTAS is NOT a LIKE-copy:
    # no spurious DESCRIBE check on a column name
    _grant(catalog, "builder", "READ", Resource.table("fluss", "secrets"))
    builder.sql(
        "CREATE TABLE fluss.copy2 AS SELECT a FROM fluss_secrets "
        "WHERE CAST(a AS STRING) LIKE '4%'"
    )
    assert catalog.table_exists("fluss", "copy2")


def test_wildcard_principal_is_star_star_not_user_star(tmp_path):
    """ADVICE r4: 'User:*' is a user literally named '*', not a
    wildcard — only '*:*' (WILD_CARD_PRINCIPAL) matches anyone."""
    catalog = Catalog(str(tmp_path / "wh"))
    t = Resource.table("db", "x")
    _grant(catalog, "User:*", "READ", t)
    a = Authorizer(catalog)
    assert not a.authorized("alice", "READ", t)  # NOT a wildcard grant
    assert a.authorized("*", "READ", t)  # the literal user named '*'
    _grant(catalog, "*:*", "READ", t)
    assert a.authorized("alice", "READ", t)  # the real wildcard
