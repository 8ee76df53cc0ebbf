"""User-function surface (§2.7/§2.10) — the Spark analog of CM-Well's
Jena function imports and stored queries.

Reference: `_sp` lets users register .jar / hot-compiled .scala functions
into Jena's FunctionRegistry (SpHandler.scala:525-548) and import stored
SPARQL snippets from CM-Well paths with `%var%` placeholder substitution
(SpHandler.scala:467-473).

Spark-first: user functions are Spark SQL UDFs (python callables or SQL
lambda expressions) registered per-session; stored queries live in a
small `queries` table (name -> text) with the same `%var%` substitution,
usable for both SPARQL and SQL texts.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class FunctionRegistry:
    """Session-scoped registry of user functions (python UDFs or SQL
    expression macros)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.registered: dict[str, str] = {}

    def register_python(self, name: str, fn: Callable, return_type: str = "string") -> None:
        self.spark.udf.register(name, fn, return_type)
        self.registered[name] = f"python:{return_type}"

    def register_sql(self, name: str, params: list[str], body_sql: str) -> None:
        """SQL macro via CREATE TEMPORARY FUNCTION-like semantics
        (implemented as a SQL function in Spark 3.4+)."""
        plist = ", ".join(f"{p} STRING" for p in params)
        self.spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({plist}) RETURNS STRING RETURN {body_sql}")
        self.registered[name] = "sql"


class StoredQueries:
    """Named query snippets with `%var%` placeholder substitution."""

    def __init__(self):
        self._store: dict[str, str] = {}

    def put(self, name: str, text: str) -> None:
        self._store[name] = text

    def get(self, name: str, **params: str) -> str:
        if name not in self._store:
            raise KeyError(f"no stored query named {name!r}")
        text = self._store[name]
        for k, v in params.items():
            text = text.replace(f"%{k}%", v)
        missing = re.findall(r"%([A-Za-z_][A-Za-z0-9_]*)%", text)
        if missing:
            raise ValueError(f"unsubstituted placeholders in {name!r}: {sorted(set(missing))}")
        return text

    def run_sql(self, spark: SparkSession, name: str, **params: str) -> DataFrame:
        return spark.sql(self.get(name, **params))

    def run_sparql(self, triples: DataFrame, name: str, **params: str) -> DataFrame:
        from cm_well_spark.operators.sparql import sparql_query

        return sparql_query(triples, self.get(name, **params))
