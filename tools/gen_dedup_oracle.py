"""Generate pure-Python twins for the dedup_minhash_lsh and dedup_simhash
oracles.

Both operators are fully deterministic — every hash is Spark xxhash64
(XXH64, seed 42; multi-arg = iterated with the previous hash as seed),
reimplemented here from the public xxHash spec — but their banding
machinery is not practical to replay in SQL. Following the
multimodal-dHash precedent:

  minhash  the banded CANDIDATE pairs come from the twin (banding is
           probabilistic, so candidates define the answer); the exact
           jaccard VERIFY is recomputed from the documents table in SQL.
  simhash  only the 64-bit SIGNATURES come from the twin; the oracle
           replays brute-force all-pairs hamming<=3 in SQL, which also
           proves the 16-bit-block pigeonhole banding dropped no pair.

Writes cm_well_spark/operators/dedup_twin.py. Rerun after changing the
operators or the fixture slice:

    python tools/gen_dedup_oracle.py
"""

from __future__ import annotations

import re

import duckdb

SF_DIR = "/root/testdata/sf0.01"
MAX_DOC_ID = 300
NUM_HASHES = 64
BANDS = 16
K = 3
OUT = "cm_well_spark/operators/dedup_twin.py"

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 over bytes (Collet's spec) — Spark xxhash64's string path."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M

        def rnd(v: int, chunk: bytes) -> int:
            v = (v + int.from_bytes(chunk, "little") * P2) & M
            return (_rotl(v, 31) * P1) & M

        while i <= n - 32:
            v1, v2 = rnd(v1, data[i : i + 8]), rnd(v2, data[i + 8 : i + 16])
            v3, v4 = rnd(v3, data[i + 16 : i + 24]), rnd(v4, data[i + 24 : i + 32])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * P2) & M, 31) * P1) & M
        h ^= k
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def xxh64_int(x: int, seed: int) -> int:
    """Spark xxhash64's 4-byte-int path (an int literal column)."""
    h = (seed + P5 + 4) & M
    h ^= ((x & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def normalize(text: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()


def shingles(text: str, k: int = K) -> list[str]:
    words = normalize(text).split(" ")
    n = len(words)
    out, seen = [], set()
    for i in range(max(n - k, 0) + 1):
        sh = " ".join(words[i : i + k])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def main() -> None:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet') "
        f"WHERE doc_id < {MAX_DOC_ID} ORDER BY doc_id"
    ).fetchall()

    # ---- minhash: signatures -> banded buckets -> candidate pairs ----
    sigs: dict[int, list[int]] = {}
    for doc_id, text in rows:
        shs = shingles(text)
        base = [xxh64_bytes(s.encode("utf-8"), 42) for s in shs]
        sigs[doc_id] = [
            min(signed(xxh64_int(i, b)) for b in base) for i in range(NUM_HASHES)
        ]
    rpb = NUM_HASHES // BANDS
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for band in range(BANDS):
            key = ",".join(str(sig[band * rpb + r]) for r in range(rpb))
            bucket = signed(xxh64_bytes(key.encode("utf-8"), 42))
            buckets.setdefault((band, bucket), []).append(doc_id)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cands.add((a, b))

    # ---- simhash: 64-bit sign-sum signatures over the token stream ----
    sim: dict[int, int] = {}
    for doc_id, text in rows:
        tokens = normalize(text).split(" ")
        hashes = [xxh64_bytes(t.encode("utf-8"), 42) for t in tokens]
        sig = 0
        for b in range(64):
            s = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            if s > 0:
                sig |= 1 << b
        sim[doc_id] = signed(sig)

    cv = ", ".join(f"({a}, {b})" for a, b in sorted(cands))
    sv = ", ".join(f"({i}, {sim[i]})" for i in sorted(sim))
    body = (
        '"""Precomputed pure-Python twins for the dedup_minhash_lsh and\n'
        "dedup_simhash oracles — GENERATED by tools/gen_dedup_oracle.py, do not\n"
        f'edit by hand. Pinned to sf0.01 documents, doc_id < {MAX_DOC_ID}."""\n\n'
        f'MINHASH_CAND_VALUES = "{cv}"\n\n'
        f'SIMHASH_SIG_VALUES = "{sv}"\n'
    )
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}: {len(cands)} minhash candidate pairs, {len(sim)} simhash sigs")


if __name__ == "__main__":
    main()
