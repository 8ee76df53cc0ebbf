"""Authentication: signed-token issuance and validation (the other half
of the reference's security surface, complementing operators/auth.py's
authorization rules).

Reference semantics replicated exactly (file:line citations):
  - security/Token.scala:27-56 — a token is an HS256 JWT whose claims
    MUST carry `sub` and `exp`; `exp` is epoch-MILLIS (the reference
    builds `new DateTime(claims("exp").num.toLong)` — non-standard JWT,
    which uses seconds; we keep the reference's millis). Validity =
    signature verifies under EITHER configured secret (two-key
    acceptance for rotation, :49) AND expiry is in the future AND the
    token's `rev` claim (default 0) >= the user's current revision —
    the revocation mechanism — with "root" immune to rev revoking
    (:50-52).
  - security/Token.scala:70-88 (generate) — non-admin callers may not
    set expiry beyond `authorization.token.expiry.maxDays` (60 in the
    shipped config) nor supply `rev`; default expiry is now + 1 day;
    default rev is the user's current revision.
  - security/Authentication.scala:24-27 — password check against the
    user document's bcrypt `digest`; AuthUtils.scala:40-42 also
    maintains `digest2` = md5("<user>:cmwell:<pass>") (the HTTP digest
    HA1), which we use as the fallback when bcrypt is unavailable in
    the environment.
  - controllers/LoginHandler.scala:44-121 — login exchanges Basic
    credentials for {"token": jwt}; the `exp` query parameter is a
    short-format duration "1d2h3m" (parseShortFormatDuration:116-121);
    failures answer "Not authenticated.".
  - security/AuthUtils.scala:57-70 (extractTokenFrom) — token lookup
    precedence: X-CM-WELL-TOKEN2 header, X-CM-WELL-TOKEN header,
    `token` query param, then the same two cookies.

Everything is pure driver-side work over stdlib hmac/hashlib/base64 —
no per-row cost; the output principal feeds auth.visible()'s compiled
row-level-security Column.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import time

MAX_TOKEN_DAYS = 60  # authorization.token.expiry.maxDays (application.conf:166)
_DAY_MS = 24 * 3600 * 1000

NOT_JWT_MSG = "Given string was not in JWT format"
MISSING_CLAIMS_MSG = "Mandatory claims are missing from token"


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode("ascii")


def _unb64url(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _now_ms(now_ms: int | None) -> int:
    return int(time.time() * 1000) if now_ms is None else int(now_ms)


def _sign(signing_input: bytes, secret: str) -> str:
    return _b64url(hmac.new(secret.encode("utf-8"), signing_input, hashlib.sha256).digest())


def generate_token(
    username: str,
    secret: str,
    *,
    expiry_ms: int | None = None,
    rev: int | None = None,
    is_admin: bool = False,
    user_rev: int = 0,
    now_ms: int | None = None,
    max_days: int = MAX_TOKEN_DAYS,
) -> str:
    """Token.generate (Token.scala:70-88): HS256 JWT with millis `exp`.
    Non-admin guards: expiry capped at `max_days` out; `rev` is
    admin-only. `user_rev` stands in for getUserRevNum's cache lookup."""
    now = _now_ms(now_ms)
    if not is_admin and expiry_ms is not None and expiry_ms > now + max_days * _DAY_MS:
        raise ValueError(f"Token expiry must be less than {max_days} days")
    if not is_admin and rev is not None:
        raise ValueError("rev should only be supplied in Admin mode (i.e. manually via console)")
    claims = {
        "sub": username,
        "exp": int(expiry_ms if expiry_ms is not None else now + _DAY_MS),
        "rev": int(rev if rev is not None else user_rev),
    }
    header = {"typ": "JWT", "alg": "HS256"}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    ).encode("ascii")
    return signing_input.decode("ascii") + "." + _sign(signing_input, secret)


def decode_claims(token: str) -> dict:
    """Unverified claim extraction (Token.scala:30-43): malformed JWT and
    missing sub/exp raise with the reference's exact messages."""
    parts = token.split(".")
    if len(parts) != 3:
        raise ValueError(NOT_JWT_MSG)
    try:
        claims = json.loads(_unb64url(parts[1]))
    except Exception:
        raise ValueError(NOT_JWT_MSG) from None
    if not isinstance(claims, dict):
        raise ValueError(NOT_JWT_MSG)
    if not {"sub", "exp"} <= set(claims):
        raise ValueError(MISSING_CLAIMS_MSG)
    return claims


def is_token_valid(
    token: str,
    secrets: str | list[str],
    *,
    user_rev: int = 0,
    now_ms: int | None = None,
) -> bool:
    """Token.isValid (Token.scala:48-52): signature under ANY secret,
    unexpired, and rev-claim >= the user's current revision (root
    immune). `user_rev` stands in for the auth-cache lookup."""
    try:
        claims = decode_claims(token)
    except ValueError:
        return False
    if isinstance(secrets, str):
        secrets = [secrets]
    head, payload, sig = token.split(".")
    signing_input = (head + "." + payload).encode("ascii")
    if not any(hmac.compare_digest(_sign(signing_input, s), sig) for s in secrets):
        return False
    if int(claims["exp"]) <= _now_ms(now_ms):
        return False
    username = claims["sub"]
    rev = claims.get("rev", 0)
    try:
        rev = int(rev)
    except (TypeError, ValueError):
        rev = 0
    return rev >= user_rev or username == "root"


def validated_username(
    token: str | None,
    secrets: str | list[str],
    *,
    user_rev_of=None,
    now_ms: int | None = None,
) -> str | None:
    """The AuthFilter step: None unless the token parses AND validates;
    `user_rev_of(username)` resolves the stored revision (default 0)."""
    if not token:
        return None
    try:
        username = decode_claims(token)["sub"]
    except ValueError:
        return None
    rev = int(user_rev_of(username) or 0) if user_rev_of else 0
    if not is_token_valid(token, secrets, user_rev=rev, now_ms=now_ms):
        return None
    return username


def extract_token(
    headers: dict | None = None,
    query: dict | None = None,
    cookies: dict | None = None,
) -> str | None:
    """AuthUtils.extractTokenFrom (AuthUtils.scala:57-70) precedence:
    TOKEN2 header, TOKEN header, `token` query param, TOKEN2 cookie,
    TOKEN cookie."""
    headers = {k.lower(): v for k, v in (headers or {}).items()}
    cookies = cookies or {}
    return (
        headers.get("x-cm-well-token2")
        or headers.get("x-cm-well-token")
        or (query or {}).get("token")
        or cookies.get("X-CM-WELL-TOKEN2")
        or cookies.get("X-CM-WELL-TOKEN")
    )


def digest2(username: str, password: str) -> str:
    """AuthUtils.changePassword:41 — md5("<user>:cmwell:<pass>"), the
    HTTP-digest HA1 the reference stores alongside the bcrypt digest."""
    return hashlib.md5(f"{username}:cmwell:{password}".encode("utf-8")).hexdigest()


def password_matches(user: dict, password: str, username: str | None = None) -> bool:
    """Authentication.passwordMatches (Authentication.scala:24-27):
    bcrypt check against the user document's `digest`. When the bcrypt
    library is absent (this environment), fall back to the document's
    `digest2` md5 — the same credential the reference's HTTP digest
    path authenticates with."""
    stored = user.get("digest") or ""
    try:
        import bcrypt  # noqa: PLC0415 — optional dependency

        if stored:
            return bcrypt.checkpw(password.encode("utf-8"), stored.encode("utf-8"))
    except ImportError:
        pass
    d2 = user.get("digest2") or ""
    name = username or user.get("username") or ""
    return bool(d2) and hmac.compare_digest(digest2(name, password), d2)


def parse_short_format_duration(spec: str, now_ms: int | None = None) -> int:
    """LoginHandler.parseShortFormatDuration (:116-121): "1d2h3m" ->
    expiry millis; absent units contribute 0; first match per unit."""
    now = _now_ms(now_ms)
    ms = 0
    for unit, scale in (("d", _DAY_MS), ("h", 3600 * 1000), ("m", 60 * 1000)):
        m = re.search(rf"(\d+)(?i:{unit})", spec)
        ms += int(m.group(1)) * scale if m else 0
    return now + ms


def login_basic(
    users: dict[str, dict],
    username: str,
    password: str,
    secret: str,
    *,
    exp: str | None = None,
    now_ms: int | None = None,
) -> dict:
    """LoginHandler.loginBasic (:60-66): credentials against the stored
    user documents -> {"token": jwt}; failures raise with the
    reference's "Not authenticated." body."""
    user = users.get(username)
    if user is None or not password_matches(user, password, username):
        raise PermissionError("Not authenticated.")
    expiry = parse_short_format_duration(exp, now_ms) if exp else None
    token = generate_token(
        username,
        secret,
        expiry_ms=expiry,
        user_rev=int(user.get("rev", 0) or 0),
        now_ms=now_ms,
    )
    return {"token": token}


def principal_for_token(
    token: str | None,
    users: dict[str, dict],
    secrets: str | list[str],
    *,
    now_ms: int | None = None,
) -> tuple[dict | None, str | None]:
    """Token -> (user document, username) for auth.visible(); anonymous
    (None, None) when the token is absent, forged, expired, or revoked
    — the AuthUtils.getUser composition."""
    name = validated_username(
        token,
        secrets,
        user_rev_of=lambda u: (users.get(u) or {}).get("rev", 0),
        now_ms=now_ms,
    )
    if name is None:
        return None, None
    return users.get(name), name
