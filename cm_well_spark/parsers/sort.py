"""sort-by grammar (O1) — `-`=Desc, `*` or bare=Asc, comma-separated.

Reference: SortByParser, cmwell-ws/app/Parsers.scala:734-757; evaluation
RawFieldFilter.scala:150-215; applySortToRequest FTSService.scala:302-314.
Default sort when none given: system.lastModified DESC. `system.score`
(relevance) has no analog here — accepted and ignored with deterministic
order (documented divergence, SURVEY §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SortKey:
    field: str
    desc: bool


DEFAULT_SORT = (SortKey("system.lastModified", True),)


def parse_sort_by(s: str | None) -> tuple[SortKey, ...]:
    if not s:
        return DEFAULT_SORT
    out = []
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        desc = part.startswith("-")
        if part.startswith(("-", "*")):
            part = part[1:]
        out.append(SortKey(part, desc))
    return tuple(out) or DEFAULT_SORT
