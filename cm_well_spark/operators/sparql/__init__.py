from cm_well_spark.operators.sparql.compiler import (  # noqa: F401
    SparqlCompileError,
    sparql_explain,
    sparql_query,
)
