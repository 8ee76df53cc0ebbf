from cm_well_spark.operators.sparql.compiler import sparql_explain, sparql_query  # noqa: F401
