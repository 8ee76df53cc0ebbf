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


# ---------------------------------------------------------------------------
# Token machinery (operators/tokens.py — security/Token.scala,
# Authentication.scala, LoginHandler.scala; VERDICT r10 item 5)
# ---------------------------------------------------------------------------

NOW = 1_700_000_000_000  # fixed clock: every check is deterministic


def test_token_roundtrip_and_signature():
    from cm_well_spark.operators import tokens as tk

    t = tk.generate_token("alice", "k1", now_ms=NOW)
    claims = tk.decode_claims(t)
    assert claims["sub"] == "alice"
    assert claims["exp"] == NOW + 24 * 3600 * 1000  # default now+1d, MILLIS
    assert claims["rev"] == 0
    assert tk.is_token_valid(t, "k1", now_ms=NOW)
    assert not tk.is_token_valid(t, "wrong-secret", now_ms=NOW)
    # two-key acceptance (Token.scala:49): old tokens survive rotation
    assert tk.is_token_valid(t, ["new-secret", "k1"], now_ms=NOW)


def test_token_forged_expired_and_malformed():
    import base64
    import json

    from cm_well_spark.operators import tokens as tk

    t = tk.generate_token("alice", "k1", now_ms=NOW)
    head, payload, sig = t.split(".")
    evil = json.loads(base64.urlsafe_b64decode(payload + "=="))
    evil["sub"] = "root"
    forged = (
        head
        + "."
        + base64.urlsafe_b64encode(json.dumps(evil).encode()).rstrip(b"=").decode()
        + "."
        + sig
    )
    assert not tk.is_token_valid(forged, "k1", now_ms=NOW)
    # expiry is exclusive: at exp it is already invalid
    assert not tk.is_token_valid(t, "k1", now_ms=NOW + 24 * 3600 * 1000)
    with pytest.raises(ValueError, match="Given string was not in JWT format"):
        tk.decode_claims("not-a-jwt")
    t2 = tk.generate_token("alice", "k1", now_ms=NOW)
    # strip the exp claim -> the reference's missing-claims message
    c = json.loads(base64.urlsafe_b64decode(t2.split(".")[1] + "=="))
    del c["exp"]
    nop = base64.urlsafe_b64encode(json.dumps(c).encode()).rstrip(b"=").decode()
    with pytest.raises(ValueError, match="Mandatory claims are missing from token"):
        tk.decode_claims(t2.split(".")[0] + "." + nop + ".x")


def test_token_rev_revocation_root_immune():
    from cm_well_spark.operators import tokens as tk

    t = tk.generate_token("alice", "k1", user_rev=2, now_ms=NOW)
    assert tk.is_token_valid(t, "k1", user_rev=2, now_ms=NOW)
    # password change bumps the stored rev -> outstanding tokens die
    assert not tk.is_token_valid(t, "k1", user_rev=3, now_ms=NOW)
    rt = tk.generate_token("root", "k1", user_rev=0, now_ms=NOW)
    assert tk.is_token_valid(rt, "k1", user_rev=99, now_ms=NOW)  # Token.scala:52


def test_token_generate_guards():
    from cm_well_spark.operators import tokens as tk

    with pytest.raises(ValueError, match="Token expiry must be less than 60 days"):
        tk.generate_token("a", "k", expiry_ms=NOW + 61 * 24 * 3600 * 1000, now_ms=NOW)
    with pytest.raises(ValueError, match="rev should only be supplied in Admin mode"):
        tk.generate_token("a", "k", rev=5, now_ms=NOW)
    # admin mode lifts both guards (Token.scala:73-79)
    t = tk.generate_token(
        "a", "k", expiry_ms=NOW + 400 * 24 * 3600 * 1000, rev=5, is_admin=True, now_ms=NOW
    )
    assert tk.decode_claims(t)["rev"] == 5


def test_short_format_duration_and_login():
    from cm_well_spark.operators import tokens as tk

    assert tk.parse_short_format_duration("1d2h3m", NOW) == NOW + (
        24 * 3600 + 2 * 3600 + 3 * 60
    ) * 1000
    assert tk.parse_short_format_duration("2H", NOW) == NOW + 2 * 3600 * 1000  # (?i)
    assert tk.parse_short_format_duration("", NOW) == NOW

    users = {"bob": {"digest2": tk.digest2("bob", "hunter2"), "rev": 1}}
    granted = tk.login_basic(users, "bob", "hunter2", "k1", exp="2d", now_ms=NOW)
    claims = tk.decode_claims(granted["token"])
    assert claims["sub"] == "bob" and claims["rev"] == 1
    assert claims["exp"] == NOW + 2 * 24 * 3600 * 1000
    with pytest.raises(PermissionError, match="Not authenticated."):
        tk.login_basic(users, "bob", "wrong", "k1", now_ms=NOW)
    with pytest.raises(PermissionError, match="Not authenticated."):
        tk.login_basic(users, "nobody", "x", "k1", now_ms=NOW)


def test_extract_token_precedence():
    from cm_well_spark.operators import tokens as tk

    assert (
        tk.extract_token(
            {"X-CM-WELL-TOKEN2": "t2", "X-CM-WELL-TOKEN": "t1"}, {"token": "q"}, {"X-CM-WELL-TOKEN": "c1"}
        )
        == "t2"
    )
    assert tk.extract_token({"x-cm-well-token": "t1"}, {"token": "q"}) == "t1"
    assert tk.extract_token({}, {"token": "q"}, {"X-CM-WELL-TOKEN2": "c2"}) == "q"
    assert tk.extract_token({}, {}, {"X-CM-WELL-TOKEN": "c1"}) == "c1"
    assert tk.extract_token() is None


def test_token_to_visibility_end_to_end(spark, infotons):
    """login -> token -> validation -> principal -> row-level security:
    the full AuthFilter composition. A revoked token falls back to the
    anonymous principal (still sees /tpch, denied /meta/auth)."""
    from cm_well_spark.operators import tokens as tk
    from cm_well_spark.operators.auth import ANONYMOUS_USER, visible

    users = {
        "carol": {
            "digest2": tk.digest2("carol", "pw"),
            "rev": 0,
            "paths": [
                {"id": "/tpch/region", "recursive": True, "sign": "+", "permissions": "r"}
            ],
        }
    }
    token = tk.login_basic(users, "carol", "pw", "k1", now_ms=NOW)["token"]
    user, name = tk.principal_for_token(token, users, ["k2", "k1"], now_ms=NOW + 1000)
    assert name == "carol"
    got = {
        r["path"]
        for r in visible(infotons.where(F.col("current")), user, username=name)
        .select("path")
        .collect()
    }
    assert got and all(p.startswith("/tpch/region/") for p in got)

    users["carol"]["rev"] = 1  # revoke
    user2, name2 = tk.principal_for_token(token, users, "k1", now_ms=NOW + 1000)
    assert user2 is None and name2 is None
    anon = visible(infotons.where(F.col("current")), ANONYMOUS_USER)
    assert anon.where(F.col("path").startswith("/meta/auth")).count() == 0
