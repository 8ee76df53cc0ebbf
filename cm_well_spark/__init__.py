"""cm_well_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CM-Well (Thomson Reuters / Refinitiv's
Linked-Data repository), re-expressed Spark-first.

The reference system (studied at /root/reference, cited by file:line in
docstrings throughout) is an Akka/Cassandra/Elasticsearch/Kafka engine; this
package replaces that machinery wholesale with DataFrame/SQL plans compiled
for Catalyst, plus Structured Streaming for the change-feed surface.

Layout:
  model/      canonical `infotons` lakehouse schema + `triples` EAV view
  parsers/    the reference's query grammars (qp, ap, xg/yg/gqp, tokens)
  plans/      grammar ASTs -> Catalyst Column/DataFrame plans
  operators/  search, aggregations, traversal, sparql, merge, consume,
              dedup, similarity, text, multimodal
  sources/    RDF (N-Triples/N-Quads) reader, test-table adapters
  formats/    output renderers (json/jsonl/csv/tsv/ntriples/nquads)
  streaming/  subscribe (pub/sub rules), SPARQL-triggered materializer
"""

__version__ = "0.1.0"
