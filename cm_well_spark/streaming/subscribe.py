"""op=subscribe — real-time pub/sub on ingest (T6, SURVEY.md §2.9).

The reference fans out newly-indexed infotons to subscribers whose RULE
matches (cmwell-rts Rule.scala:27-97): a rule is a path prefix (optionally
recursive) and/or a field->values match map (ANY listed field matching ANY
listed value fires — MatchMap.check is an OR over entries). The rule
grammar (RTSQueryPredicate, Parsers.scala:303-351):

    rule    := ('*' | '-')? matches?
    matches := field ':' (value | '[' value,... ']') (',' ...)*
    '*'  -> ignore path (match map only; bare '*' = NoFilter)
    '-'  -> path non-recursive; default -> path recursive

Spark-first: the ingest feed is a Structured Streaming source (file
source over the lakehouse append dir, or Kafka in a deployment); a
subscription is the same declarative filter applied on the stream.
Tumbling/sliding windows deliberately do NOT exist — the reference's
subscribe is filtered fan-out only.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cm_well_spark.model.schema import INFOTON_SCHEMA


class RuleParseError(ValueError):
    pass


@dataclass(frozen=True)
class Rule:
    path: str | None  # None = NoFilter / MatchFilter ('*' prefix)
    recursive: bool = True
    match_map: tuple = ()  # ((field, (values...)), ...); empty values = existence


_FIELD_RE = re.compile(r"\w[\w\-.]*")
_VALUE_RE = re.compile(r"[^,\[\]]+")


def parse_rule(rule_str: str, path: str) -> Rule:
    """RTSQueryPredicate.parseRule re-expressed."""
    s = rule_str.strip()
    star = s.startswith("*")
    dash = s.startswith("-")
    if star or dash:
        s = s[1:]
    entries = []
    i = 0
    while i < len(s):
        m = _FIELD_RE.match(s, i)
        if not m:
            raise RuleParseError(f"expected field name at {s[i:]!r}")
        f = m.group(0)
        i = m.end()
        if i >= len(s) or s[i] != ":":
            raise RuleParseError(f"expected ':' after field {f!r}")
        i += 1
        vals = []
        if i < len(s) and s[i] == "[":
            i += 1
            while True:
                vm = _VALUE_RE.match(s, i)
                if vm:
                    vals.append(vm.group(0))
                    i = vm.end()
                if i < len(s) and s[i] == ",":
                    i += 1
                    continue
                if i < len(s) and s[i] == "]":
                    i += 1
                    break
                raise RuleParseError("expected ',' or ']' in value list")
        else:
            vm = _VALUE_RE.match(s, i)
            if not vm:
                raise RuleParseError(f"expected value after {f!r}:")
            vals.append(vm.group(0))
            i = vm.end()
        entries.append((f, tuple(vals)))
        if i < len(s) and s[i] == ",":
            i += 1
    if star:
        return Rule(None, True, tuple(entries))
    return Rule(path, not dash, tuple(entries))


def rule_filter(rule: Rule) -> Column:
    """Compile a Rule to a Column over the canonical infoton schema."""
    cond = F.lit(True)
    if rule.path is not None and rule.path != "/":
        if rule.recursive:
            cond = cond & (
                (F.col("path") == rule.path)
                | F.col("path").startswith(rule.path + "/")
            )
        else:
            cond = cond & (F.col("parent") == rule.path)
    if rule.match_map:
        # MatchMap.check: OR over entries; entry fires if the field exists
        # and (no values listed, or any value intersects)
        entry_conds = []
        for fname, values in rule.match_map:
            vals = F.col("fields").getItem(fname)
            exists = vals.isNotNull() & (F.size(vals) > 0)
            if values:
                hit = F.exists(vals, lambda v: v["value"].isin(*values))
                entry_conds.append(exists & F.coalesce(hit, F.lit(False)))
            else:
                entry_conds.append(exists)
        ored = entry_conds[0]
        for c in entry_conds[1:]:
            ored = ored | c
        cond = cond & ored
    return cond


def ingest_stream(spark: SparkSession, feed_dir: str) -> DataFrame:
    """The ingest feed as a Structured Streaming source: new parquet files
    appended under feed_dir (the write-path publishes each micro-batch
    here — the Spark analog of the reference's Kafka index-topic)."""
    return spark.readStream.schema(INFOTON_SCHEMA).parquet(feed_dir)


def subscribe(
    feed: DataFrame,
    rule_str: str,
    path: str = "/",
) -> DataFrame:
    """A subscription = the rule filter on the (streaming or batch) feed.
    Sink choice (push callback via foreachBatch / pull queue / memory)
    belongs to the caller."""
    rule = parse_rule(rule_str, path)
    return feed.where(rule_filter(rule))
