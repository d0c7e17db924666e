"""ACL surface + authorizer semantics (Admin.java:573-600,
DefaultAuthorizer.java decision procedure) and SQL-session enforcement."""

from __future__ import annotations

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
