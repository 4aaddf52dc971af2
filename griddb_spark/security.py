"""Users / roles / GRANT-REVOKE access control (database-level).

Reference surface: ``CMD_CREATE_USER / CMD_CREATE_ROLE / CMD_DROP_USER /
CMD_SET_PASSWORD / CMD_GRANT / CMD_REVOKE`` (``sql_parser.h:251-256``),
executed as ``PUT_PRIVILEGE`` / ``DROP_PRIVILEGE`` statements
(``transaction_statement_message.h:1466-1470``). GridDB grants ``ALL`` or
``READ`` on a *database* to a user; general users cannot see objects in
databases they hold no grant on.

Spark mapping: access control is catalog metadata, not an execution
concern — a 1000-executor job never consults it per row. The registry
lives driver-side; enforcement is a load-time check in
:meth:`AccessControl.authorize` (wired through ``ContainerCatalog`` via
``with_access``), and the registry itself is queryable as meta-table
DataFrames (``#users`` / ``#access`` in the reference's meta scheme).

Passwords are stored as salted SHA-256 (stdlib only) — enough to model
``SET PASSWORD`` semantics; production deployments delegate to the
cluster's real authn (Kerberos/OAuth) anyway.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

#: GridDB database privileges (GRANT ALL / GRANT READ)
PRIVILEGES = ("ALL", "READ")

#: privileges implied by each grant (ALL ⊃ READ)
_IMPLIES = {"ALL": {"ALL", "READ"}, "READ": {"READ"}}


class SecurityError(Exception):
    """Authorization / authentication failure (GS_ERROR_*_AUTH family)."""


def _pw_hash(user: str, password: str) -> str:
    return hashlib.sha256(f"{user}\x00{password}".encode()).hexdigest()


class AccessControl:
    """Driver-side user/role registry with database-level grants."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._users: dict[str, dict] = {}   # name -> {hash, is_role, roles}
        self._grants: set[tuple[str, str, str]] = set()  # (grantee, db, priv)

    # -- DDL: users and roles ---------------------------------------------

    def create_user(self, name: str, password: str) -> "AccessControl":
        if name in self._users:
            raise SecurityError(f"user already exists: {name}")
        self._users[name] = {
            "hash": _pw_hash(name, password), "is_role": False, "roles": set()
        }
        return self

    def create_role(self, name: str) -> "AccessControl":
        """CMD_CREATE_ROLE: a grantable name with no credentials."""
        if name in self._users:
            raise SecurityError(f"role already exists: {name}")
        self._users[name] = {"hash": None, "is_role": True, "roles": set()}
        return self

    def drop_user(self, name: str) -> "AccessControl":
        self._users.pop(name, None)
        self._grants = {g for g in self._grants if g[0] != name}
        for u in self._users.values():
            u["roles"].discard(name)
        return self

    def set_password(self, name: str, password: str) -> "AccessControl":
        self._require(name)
        self._users[name]["hash"] = _pw_hash(name, password)
        return self

    def authenticate(self, name: str, password: str) -> bool:
        u = self._users.get(name)
        return bool(u) and not u["is_role"] and u["hash"] == _pw_hash(name, password)

    # -- GRANT / REVOKE ----------------------------------------------------

    def grant(self, priv: str, db: str, grantee: str) -> "AccessControl":
        priv = priv.upper()
        if priv not in PRIVILEGES:
            raise SecurityError(f"unknown privilege: {priv}")
        self._require(grantee)
        self._grants.add((grantee, db, priv))
        return self

    def revoke(self, priv: str, db: str, grantee: str) -> "AccessControl":
        self._grants.discard((grantee, db, priv.upper()))
        return self

    def grant_role(self, role: str, user: str) -> "AccessControl":
        self._require(role)
        self._require(user)
        if not self._users[role]["is_role"]:
            raise SecurityError(f"not a role: {role}")
        self._users[user]["roles"].add(role)
        return self

    def authorize(self, user: str, db: str, priv: str = "READ") -> None:
        """Raise :class:`SecurityError` unless ``user`` (directly or via a
        granted role) holds a privilege on ``db`` implying ``priv``."""
        self._require(user)
        want = priv.upper()
        grantees = {user} | self._users[user]["roles"]
        for grantee, gdb, gpriv in self._grants:
            if gdb == db and grantee in grantees and want in _IMPLIES[gpriv]:
                return
        raise SecurityError(f"{user} has no {want} on database {db}")

    def _require(self, name: str) -> None:
        if name not in self._users:
            raise SecurityError(f"no such user/role: {name}")

    # -- meta tables -------------------------------------------------------

    def meta_users(self) -> DataFrame:
        rows = [
            (n, u["is_role"], sorted(u["roles"]))
            for n, u in sorted(self._users.items())
        ]
        return self.spark.createDataFrame(
            rows, "user_name string, is_role boolean, member_of array<string>"
        )

    def meta_access(self) -> DataFrame:
        rows = sorted(self._grants)
        return self.spark.createDataFrame(
            rows, "user_name string, db_name string, privilege string"
        )
