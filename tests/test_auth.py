"""Authorization primitive (operators/auth.py): the compiled
permission_filter Column must decide every (path, level) exactly like the
reference's Authorization.isAllowedForUser (Authorization.scala:67-103),
pinned against an independent pure-Python twin of the Scala logic."""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.auth import (
    ANONYMOUS_USER,
    authorize_priority_write,
    is_operation_allowed,
    permission_filter,
    visible,
)


# ---- independent twin of Authorization.isAllowedForUser -------------------


def _append_slash(s):
    return s if s.endswith("/") else s + "/"


def _is_subfolder(child, parent):
    np = _append_slash(parent)
    return _append_slash(child) == np or (len(parent) < len(child) and child.startswith(np))


def _is_same(a, b):
    return _append_slash(a) == _append_slash(b)


def _twin_allowed(path, level, user, roles=None, username=None):
    def relevant(rule):
        if level not in rule.get("permissions", ""):
            return False
        rid = rule["id"]
        rec = rule.get("recursive", False)
        return _is_same(path, rid) or (rec and _is_subfolder(path, rid))

    if username is not None and path == f"/meta/auth/users/{username}" and level == "r":
        return True
    specific = [r for r in user.get("paths", []) or [] if relevant(r)]
    allow = [r for r in specific if r.get("sign", "+") == "+"]
    deny = [r for r in specific if r.get("sign", "+") == "-"]
    if specific and allow and not deny:
        return True
    role_rules = [
        r
        for name in user.get("roles", []) or []
        for r in ((roles or {}).get(name, {}) or {}).get("paths", []) or []
        if relevant(r)
    ]
    r_allow = [r for r in role_rules if r.get("sign", "+") == "+"]
    r_deny = [r for r in role_rules if r.get("sign", "+") == "-"]
    return bool(r_allow) and not r_deny


PATHS = [
    "/",
    "/foo",
    "/foo/bar",
    "/foobar/bar",  # the isSubfolderOf boundary case (:37-41)
    "/tpch",
    "/tpch/nation/1",
    "/tpch/supplier",
    "/tpch/supplier/10",
    "/tpch/supplier/10/sub",
    "/meta/ns/x",
    "/meta/auth",
    "/meta/auth/users/alice",
    "/meta/auth/users/bob",
]

USERS = {
    "anonymous": (ANONYMOUS_USER, None),
    "foo_reader": (
        {"paths": [{"id": "/foo", "recursive": True, "sign": "+", "permissions": "r"}]},
        None,
    ),
    "exact_only": (
        {"paths": [{"id": "/foo", "recursive": False, "sign": "+", "permissions": "r"}]},
        None,
    ),
    "deny_over_allow": (
        {
            "paths": [
                {"id": "/tpch", "recursive": True, "sign": "+", "permissions": "r"},
                {"id": "/tpch/supplier", "recursive": True, "sign": "-", "permissions": "rw"},
            ]
        },
        None,
    ),
    "role_overrides_user_deny": (
        {
            "paths": [
                {"id": "/tpch", "recursive": True, "sign": "+", "permissions": "r"},
                {"id": "/tpch/supplier", "recursive": True, "sign": "-", "permissions": "rw"},
            ],
            "roles": ["auditor", "ghost_role"],
        },
        {
            "auditor": {
                "paths": [
                    {"id": "/tpch/supplier/10", "recursive": False, "sign": "+", "permissions": "r"}
                ]
            }
        },
    ),
    "writer": (
        {"paths": [{"id": "/foo", "recursive": True, "sign": "+", "permissions": "rw"}]},
        None,
    ),
    "alice": ({"paths": []}, None),
}


@pytest.mark.parametrize("uname", sorted(USERS))
@pytest.mark.parametrize("level", ["r", "w"])
def test_permission_filter_matches_reference_twin(spark, uname, level):
    user, roles = USERS[uname]
    username = "alice" if uname == "alice" else None
    df = spark.createDataFrame([(p,) for p in PATHS], "path STRING")
    got = {
        r["path"]
        for r in df.where(
            permission_filter(user, level, roles=roles, username=username)
        ).collect()
    }
    want = {p for p in PATHS if _twin_allowed(p, level, user, roles, username)}
    assert got == want, f"{uname}/{level}: spark={sorted(got)} twin={sorted(want)}"


def test_twin_sanity_pins():
    """The twin itself pins the reference's documented decisions."""
    foo_reader, _ = USERS["foo_reader"]
    assert _twin_allowed("/foo/bar", "r", foo_reader)
    assert not _twin_allowed("/foobar/bar", "r", foo_reader)  # :37-41
    assert not _twin_allowed("/foo/bar", "w", foo_reader)
    anon = ANONYMOUS_USER
    assert _twin_allowed("/tpch/nation/1", "r", anon)
    assert not _twin_allowed("/meta/auth/users/x", "r", anon)
    assert not _twin_allowed("/", "w", anon)
    over, over_roles = USERS["role_overrides_user_deny"]
    assert not _twin_allowed("/tpch/supplier/11", "r", over, over_roles)
    assert _twin_allowed("/tpch/supplier/10", "r", over, over_roles)  # :88-99
    assert _twin_allowed("/meta/auth/users/alice", "r", {"paths": []}, username="alice")


def test_visible_pushes_prefix_to_scan(infotons):
    """The compiled filter rides the parquet scan: recursive allows
    compile to startswith, visible on the doc table prunes with pushed
    string predicates and no Python in the row path."""
    user, roles = USERS["deny_over_allow"]
    df = visible(infotons.where(F.col("current")), user, roles=roles).select("path")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan" in plan or "FileScan" in plan or "Scan parquet" in plan
    assert "pythonUDF" not in plan.lower()
    got = {r["path"] for r in df.collect()}
    assert any(p.startswith("/tpch/nation/") for p in got)
    assert not any(p.startswith("/tpch/supplier") for p in got)


def test_operation_gate_and_priority_403():
    user = {"operations": ["Admin"], "roles": ["writers"]}
    roles = {"writers": {"operations": ["PriorityWrite"]}}
    assert is_operation_allowed(user, "Admin")
    assert is_operation_allowed(user, "PriorityWrite", roles)
    assert not is_operation_allowed(user, "PriorityWrite")
    authorize_priority_write(user, roles)  # no raise
    with pytest.raises(PermissionError, match="User not authorized for priority write"):
        authorize_priority_write({"paths": []})
