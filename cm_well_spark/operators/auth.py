"""Authorization: path-level visibility as a compiled Column predicate.

The reference's auth surface (security/Authorization.scala, AuthFilter.scala,
/meta/auth/users/<name> + /meta/auth/roles/<name> infotons) decides one
(path, permission-level) request at a time against a user's signed path
rules. The Spark-first analog turns the SAME rule semantics into a single
boolean Column over the `path` column — row-level security that rides any
scan (search, stream, consume, qstream) as an ordinary filter, with the
prefix matches pushed to parquet as StringStartsWith predicates. One
compile per request principal, zero per-row Python.

Rule semantics (Authorization.isAllowedForUser:67-103, replicated exactly):
  - a rule {id, recursive, sign '+'/'-', permissions 'r'/'w'/'rw'} is
    RELEVANT to (path, level) when level ∈ permissions and (path isSameAs
    id, or recursive and path isSubfolderOf id). isSubfolderOf appends
    slashes so "/foobar/bar" is NOT under "/foo" (:37-44).
  - user-level: allowed iff some relevant '+' rule matches and NO relevant
    '-' rule matches.
  - otherwise fall through to the union of the user's roles' rules with
    the same allow-and-no-deny test (:88-99 — a user-level deny IS
    overridable by a clean role allow; faithful to the reference).
  - a user may always READ their own /meta/auth/users/<username> (:85).

The default anonymous principal (+r on / recursive; -rw on /meta/ns and
/meta/auth, both recursive — Authorization.defaultAnonymousUser:25-31) is
exported as ANONYMOUS_USER.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANONYMOUS_USER: dict = {
    "paths": [
        {"id": "/", "recursive": True, "sign": "+", "permissions": "r"},
        {"id": "/meta/ns", "recursive": True, "sign": "-", "permissions": "rw"},
        {"id": "/meta/auth", "recursive": True, "sign": "-", "permissions": "rw"},
    ],
    "roles": [],
}


def _norm(path_id: str) -> str:
    """Rule ids normalized driver-side: no trailing slash (the
    appendSlash equalization happens once here, not per row)."""
    return path_id.rstrip("/") if path_id != "/" else "/"


def _rule_match(rule: dict, level: str, path_col: Column) -> Column | None:
    """One rule -> a Column matching the rows it is RELEVANT to, or None
    when the rule can never apply to this permission level."""
    if level not in rule.get("permissions", ""):
        return None
    rid = _norm(rule["id"])
    if rid == "/":
        same = path_col == "/"
        under = F.lit(True)  # every path is under the root
    else:
        same = path_col == rid
        under = path_col.startswith(rid + "/")
    if rule.get("recursive", False):
        return same | under
    return same


def _side(rules: list[dict], level: str, sign: str, path_col: Column) -> Column:
    """OR of all `sign`-signed relevant-rule matches (False when none)."""
    cols = [
        m
        for r in rules
        if r.get("sign", "+") == sign
        for m in [_rule_match(r, level, path_col)]
        if m is not None
    ]
    out = F.lit(False)
    for c in cols:
        out = out | c
    return out


def permission_filter(
    user: dict,
    level: str = "r",
    roles: dict[str, dict] | None = None,
    username: str | None = None,
    path_col: str = "path",
) -> Column:
    """Compile one principal's rule set into a boolean Column over
    `path_col` — True exactly where Authorization.isAllowedForUser would
    grant (path, level). Usable as a row-level-security filter on any
    path-keyed relation; the startswith branches push down to the
    parquet scan.

    `roles` maps role name -> role document ({"paths": [...]}) — the
    resolver the reference's EagerAuthCache provides; unknown role names
    are skipped with the same forgiveness as the reference (:94-97)."""
    p = F.col(path_col)
    rules = user.get("paths", []) or []
    allowed = _side(rules, level, "+", p) & ~_side(rules, level, "-", p)

    role_rules = [
        r
        for name in (user.get("roles", []) or [])
        for r in ((roles or {}).get(name, {}) or {}).get("paths", []) or []
    ]
    if role_rules:
        allowed = allowed | (
            _side(role_rules, level, "+", p) & ~_side(role_rules, level, "-", p)
        )
    if username and level == "r":
        allowed = allowed | (p == f"/meta/auth/users/{username}")
    return allowed


def visible(
    df: DataFrame,
    user: dict | None = None,
    level: str = "r",
    roles: dict[str, dict] | None = None,
    username: str | None = None,
    path_col: str = "path",
) -> DataFrame:
    """Row-level-security wrapper: the relation restricted to the rows
    the principal may see (user=None -> the anonymous principal). Apply
    UNDER any search/consume/traversal composition — it is an ordinary
    Column filter, so Catalyst pushes it with everything else."""
    return df.where(
        permission_filter(user or ANONYMOUS_USER, level, roles, username, path_col)
    )


def is_operation_allowed(
    user: dict, op: str, roles: dict[str, dict] | None = None
) -> bool:
    """Driver-side operation gate (Authorization.isOperationAllowedForUser
    :105-110): named operations ('PriorityWrite', 'Admin', ...) granted
    on the user or any of its roles. The blp-700 priority write path
    checks this before routing to the priority topic."""
    ops = set(user.get("operations", []) or [])
    if op in ops:
        return True
    for name in user.get("roles", []) or []:
        if op in set(((roles or {}).get(name, {}) or {}).get("operations", []) or []):
            return True
    return False


def authorize_priority_write(user: dict, roles: dict[str, dict] | None = None) -> None:
    """blp-700 §API: a priority write without the PriorityWrite operation
    is rejected with the reference's exact 403 message."""
    if not is_operation_allowed(user, "PriorityWrite", roles):
        raise PermissionError("User not authorized for priority write")


def load_auth(infotons: DataFrame) -> tuple[dict[str, dict], dict[str, dict]]:
    """Read /meta/auth/users/* and /meta/auth/roles/* principals from the
    store — the EagerAuthCache analog, one bounded collect over the
    auth subtree (file-infoton `data` holds the JSON document). Returns
    ({username: doc}, {rolename: doc})."""
    import json

    rows = (
        infotons.where(
            F.col("current") & F.col("path").startswith("/meta/auth/")
        )
        .select("path", "data")
        .collect()
    )
    users: dict[str, dict] = {}
    roles: dict[str, dict] = {}
    for r in rows:
        if r["data"] is None:
            continue
        try:
            doc = json.loads(bytes(r["data"]).decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            continue
        name = r["path"].rsplit("/", 1)[-1]
        if r["path"].startswith("/meta/auth/users/"):
            users[name] = doc
        elif r["path"].startswith("/meta/auth/roles/"):
            roles[name] = doc
    return users, roles
