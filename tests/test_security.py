"""Users / roles / GRANT-REVOKE (sql_parser.h:251-256 surface)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def acl(spark):
    from griddb_spark.security import AccessControl

    return (
        AccessControl(spark)
        .create_user("alice", "pw1")
        .create_user("bob", "pw2")
        .create_role("readers")
    )


def test_authenticate_and_set_password(acl):
    assert acl.authenticate("alice", "pw1")
    assert not acl.authenticate("alice", "wrong")
    acl.set_password("alice", "pw9")
    assert acl.authenticate("alice", "pw9") and not acl.authenticate("alice", "pw1")
    assert not acl.authenticate("readers", "")  # roles never authenticate


def test_grant_implies_and_revoke(acl):
    from griddb_spark.security import SecurityError

    acl.grant("ALL", "db1", "alice")
    acl.authorize("alice", "db1", "READ")   # ALL implies READ
    acl.authorize("alice", "db1", "ALL")
    with pytest.raises(SecurityError):
        acl.authorize("bob", "db1", "READ")
    acl.grant("READ", "db1", "bob")
    acl.authorize("bob", "db1", "READ")
    with pytest.raises(SecurityError):
        acl.authorize("bob", "db1", "ALL")  # READ does not imply ALL
    acl.revoke("READ", "db1", "bob")
    with pytest.raises(SecurityError):
        acl.authorize("bob", "db1", "READ")


def test_role_membership_and_drop(acl):
    from griddb_spark.security import SecurityError

    acl.grant("READ", "db2", "readers").grant_role("readers", "bob")
    acl.authorize("bob", "db2", "READ")
    acl.drop_user("readers")  # dropping the role severs bob's access
    with pytest.raises(SecurityError):
        acl.authorize("bob", "db2", "READ")


def test_catalog_enforces_read(acl, spark, catalog):
    from griddb_spark.security import SecurityError

    secured = catalog.with_access(acl, "bob")
    with pytest.raises(SecurityError):
        secured.load("region")
    acl.grant("READ", "public", "bob")
    assert secured.load("region").count() == 5


def test_meta_tables_shape(acl):
    users = {r.user_name: r for r in acl.meta_users().collect()}
    assert users["readers"].is_role and not users["alice"].is_role
    acl.grant("ALL", "dbx", "alice")
    grants = [tuple(r) for r in acl.meta_access().collect()]
    assert ("alice", "dbx", "ALL") in grants


def test_register_all_enforces_read_on_warm_cache(acl, spark, catalog):
    """ADVICE r7 (high): register_all's cache skip must not bypass the READ
    check — with_access() shares _df_cache, so once any catalog warms the
    cache an unauthorized user's register_all (the griddb_sql path) must
    still be refused."""
    from griddb_spark.security import SecurityError

    catalog.register_all()  # warm the shared cache as the unsecured owner
    secured = catalog.with_access(acl, "bob")
    with pytest.raises(SecurityError):
        secured.register_all()
    # and the full SQL front-end path stays closed too
    from griddb_spark.sql.translate import griddb_sql

    with pytest.raises(SecurityError):
        griddb_sql(spark, secured, "SELECT count(*) AS n FROM region")
