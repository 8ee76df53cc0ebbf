import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.sparql import sparql_query
from cm_well_spark.operators.sparql.compiler import SparqlCompileError
from cm_well_spark.operators.sparql.parser import SparqlParseError, parse_sparql


# ---- parser --------------------------------------------------------------


def test_parse_select():
    q = parse_sparql("SELECT ?s ?o WHERE { ?s <name> ?o }")
    assert q.form == "select"
    assert [v.name for v in q.variables] == ["s", "o"]
    assert len(q.where.triples) == 1


def test_parse_prefix_and_a():
    q = parse_sparql("PREFIX ex: <http://ex.org/> SELECT ?s WHERE { ?s a ex:Thing }")
    tp = q.where.triples[0]
    assert tp.p.value.endswith("#type")
    assert tp.o.value == "http://ex.org/Thing"


def test_parse_modifiers():
    q = parse_sparql("SELECT DISTINCT ?s WHERE { ?s <x> ?o } ORDER BY DESC(?s) LIMIT 5 OFFSET 2")
    assert q.distinct and q.limit == 5 and q.offset == 2
    assert q.order_by[0][1] is True


def test_parse_rejects_other_forms():
    with pytest.raises(SparqlParseError, match="SELECT or CONSTRUCT"):
        parse_sparql("ASK { ?s <x> ?o }")


@pytest.mark.parametrize(
    "q",
    [
        "ASK { ?s <x> ?o }",
        "DESCRIBE <http://ex.org/thing>",
        "INSERT DATA { <a> <b> <c> }",
    ],
)
def test_rejection_error_text_matches_reference(q):
    """Error-text parity contract (VERDICT r9 item 6): the reference
    rejects non-SELECT/CONSTRUCT forms with the exact message
    `This query type is not supported.` (SpHandler.scala:630-631) —
    a reference user switching engines sees the same error string."""
    with pytest.raises(SparqlParseError) as exc:
        parse_sparql(q)
    assert str(exc.value).startswith("This query type is not supported.")


def test_parse_semicolon_comma_sugar():
    q = parse_sparql('SELECT * WHERE { ?s <a> ?x ; <b> "v1", "v2" . }')
    assert len(q.where.triples) == 3


# ---- compiler over the engine's triples ----------------------------------


def test_bgp_join(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        """
        SELECT ?c ?n WHERE {
          ?c <inNation> ?nat .
          ?nat <name> ?n .
          ?c <mktsegment> "BUILDING" .
        }
        """,
    )
    raw_c = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    assert out.count() == raw_c.count()


def test_const_subject(triples):
    out = sparql_query(triples, "SELECT ?o WHERE { </tpch/nation/3> <name> ?o }")
    rows = out.collect()
    assert len(rows) == 1


def test_filter_numeric(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT ?c ?b WHERE { ?c <acctbal> ?b . ?c <rdfType> \"Customer\" . FILTER(?b > 5000) }",
    )
    raw = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    assert out.count() == raw.count()


def test_optional_left_join(triples, spark, sf_dir):
    # every region, optionally a nation that points at it
    out = sparql_query(
        triples,
        """
        SELECT ?r ?n WHERE {
          ?r <rdfType> "Region" .
          OPTIONAL { ?n <ofRegion> ?r }
        }
        """,
    )
    from cm_well_spark.sources import tables as tbl

    n_nation = tbl.load_table(spark, sf_dir, "nation").count()
    assert out.count() == n_nation  # all 5 regions referenced; one row per nation
    assert out.where(F.col("n").isNull()).count() == 0


def test_union(triples):
    out = sparql_query(
        triples,
        """
        SELECT ?x WHERE {
          { ?x <rdfType> "Region" } UNION { ?x <rdfType> "Nation" }
        }
        """,
    )
    assert out.count() == 30


def test_regex_filter(triples):
    out = sparql_query(
        triples,
        'SELECT ?n WHERE { ?x <rdfType> "Region" . ?x <name> ?n . FILTER(regex(?n, "^A")) }',
    )
    names = {r["n"] for r in out.collect()}
    assert all(n.startswith("A") for n in names) and names


def test_order_limit(triples):
    out = sparql_query(
        triples,
        'SELECT ?n WHERE { ?x <rdfType> "Nation" . ?x <name> ?n } ORDER BY ?n LIMIT 5',
    )
    names = [r["n"] for r in out.collect()]
    assert names == sorted(names) and len(names) == 5


def test_construct(triples):
    out = sparql_query(
        triples,
        """
        CONSTRUCT { ?n <locatedIn> ?r } WHERE { ?n <ofRegion> ?r }
        """,
    )
    assert out.columns == ["s", "p", "o"]
    assert out.count() == 25
    assert out.select("p").distinct().first()["p"] == "locatedIn"


def test_fully_unbound_rejected(triples):
    with pytest.raises(SparqlCompileError, match="fully unbound"):
        sparql_query(triples, "SELECT ?s WHERE { ?s ?p ?o }").count()


def test_select_unknown_var_rejected(triples):
    with pytest.raises(SparqlCompileError, match="not bound"):
        sparql_query(triples, "SELECT ?zz WHERE { ?s <name> ?o }")


def test_var_predicate(triples):
    # bound subject, unbound predicate: enumerate one infoton's triples
    out = sparql_query(triples, "SELECT ?p ?o WHERE { </tpch/region/0> ?p ?o }")
    ps = {r["p"] for r in out.collect()}
    assert {"name", "regionkey", "rdfType"} <= ps


def test_results_cap(triples):
    out = sparql_query(triples, "SELECT ?s ?o WHERE { ?s <rdfType> ?o }")
    assert out.count() <= 10_000


def test_group_by_count(triples):
    out = sparql_query(
        triples,
        'SELECT ?t (COUNT(*) AS ?n) WHERE { ?x <rdfType> ?t } GROUP BY ?t ORDER BY ?t',
    )
    rows = {r["t"]: r["n"] for r in out.collect()}
    assert rows["Region"] == 5 and rows["Nation"] == 25


def test_group_by_sum_avg(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl
    from pyspark.sql import functions as F

    out = sparql_query(
        triples,
        'SELECT ?seg (SUM(?b) AS ?total) (AVG(?b) AS ?mean) WHERE { ?c <mktsegment> ?seg . ?c <acctbal> ?b } GROUP BY ?seg',
    )
    got = {r["seg"]: round(r["total"], 2) for r in out.collect()}
    raw = tbl.load_table(spark, sf_dir, "customer")
    exp_rows = raw.groupBy("c_mktsegment").agg(F.sum("c_acctbal").alias("s")).collect()
    exp = {r["c_mktsegment"]: round(r["s"], 2) for r in exp_rows}
    assert got == exp


def test_count_distinct(triples):
    out = sparql_query(
        triples,
        'SELECT (COUNT(DISTINCT ?seg) AS ?n) WHERE { ?c <mktsegment> ?seg }',
    )
    assert out.first()["n"] == 5


def test_ungrouped_var_rejected(triples):
    with pytest.raises(SparqlCompileError, match="GROUP BY"):
        sparql_query(triples, 'SELECT ?x (COUNT(*) AS ?n) WHERE { ?x <rdfType> ?t } GROUP BY ?t')


# ---- SPARQL 1.1 surface added in r2: MINUS / BIND / VALUES / paths / fns ----


def test_minus_shared_var(triples):
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Nation" MINUS { ?s <nationkey> 3 } }',
    )
    paths = {r["s"] for r in out.collect()}
    assert len(paths) == 24 and "/tpch/nation/3" not in paths


def test_minus_disjoint_removes_nothing(triples):
    # W3C §8.3: MINUS with no shared variables removes nothing
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Region" MINUS { ?x <rdfType> "Nation" } }',
    )
    assert out.count() == 5


def test_bind_and_builtins(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?u WHERE { ?s <rdfType> "Region" . ?s <name> ?n . '
        "BIND(CONCAT(LCASE(?n), \"!\") AS ?u) FILTER(STRLEN(?n) > 3) }",
    )
    rows = out.collect()
    assert len(rows) == 5 and all(r["u"].endswith("!") and r["u"][:-1].islower() for r in rows)


def test_bind_numeric_filterable(triples):
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        "BIND(STRLEN(?n) AS ?l) FILTER(?l >= 9) }",
    )
    # NATION_10..NATION_24 have length 9
    assert out.count() == 15


def test_values_single_and_multi(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?n WHERE { ?s <name> ?n . VALUES ?n { "NATION_3" "NATION_7" } }',
    )
    assert out.count() == 2
    out2 = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <name> ?n . ?s <nationkey> ?k . '
        'VALUES (?n) { ("NATION_3") } }',
    )
    assert out2.first()["s"] == "/tpch/nation/3"


def test_values_undef_wildcard(triples):
    # UNDEF matches anything: (n=NATION_3, k=*) OR (n=*, k=7)
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <name> ?n . ?s <nationkey> ?k . '
        'VALUES (?n ?k) { ("NATION_3" UNDEF) (UNDEF "7") } }',
    )
    assert {r["s"] for r in out.collect()} == {"/tpch/nation/3", "/tpch/nation/7"}


def test_values_undef_needs_bound_vars(triples):
    with pytest.raises(SparqlCompileError, match="UNDEF"):
        sparql_query(
            triples,
            'SELECT ?s WHERE { ?s <name> ?n . VALUES (?n ?zz) { ("NATION_3" UNDEF) } }',
        ).count()


def test_path_sequence(triples):
    out = sparql_query(
        triples,
        "SELECT DISTINCT ?r WHERE { </tpch/customer/1> <inNation>/<ofRegion> ?r }",
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["r"].startswith("/tpch/region/")


def test_path_plus_bounded(triples):
    out = sparql_query(
        triples,
        "SELECT DISTINCT ?r WHERE { </tpch/nation/3> <ofRegion>+ ?r }",
    )
    assert out.count() == 1


def test_path_internal_vars_hidden(triples):
    out = sparql_query(
        triples,
        "SELECT * WHERE { ?c <inNation>/<ofRegion> ?r . ?c <rdfType> \"Supplier\" }",
    )
    assert set(out.columns) == {"c", "r"}


def test_group_concat_and_sample(triples):
    out = sparql_query(
        triples,
        'SELECT ?r (GROUP_CONCAT(?n; SEPARATOR="|") AS ?names) (SAMPLE(?n) AS ?one) '
        'WHERE { ?s <ofRegion> ?r . ?s <name> ?n . ?s <rdfType> "Nation" } GROUP BY ?r',
    )
    rows = out.collect()
    assert len(rows) == 5
    for r in rows:
        parts = r["names"].split("|")
        assert parts == sorted(parts) and r["one"] == parts[0]


def test_aggregate_respects_cap_and_offset(triples):
    # ADVICE r1: aggregate SELECT must flow through the shared cap/offset
    out = sparql_query(
        triples,
        'SELECT ?t (COUNT(*) AS ?n) WHERE { ?s <rdfType> ?t } GROUP BY ?t ORDER BY ?t LIMIT 2 OFFSET 1',
    )
    rows = out.collect()
    assert len(rows) == 2
    all_rows = sparql_query(
        triples,
        'SELECT ?t (COUNT(*) AS ?n) WHERE { ?s <rdfType> ?t } GROUP BY ?t ORDER BY ?t',
    ).collect()
    assert [r["t"] for r in rows] == [r["t"] for r in all_rows[1:3]]


def test_constant_pattern_existence_gate(triples):
    # ADVICE r1: a fully-constant pattern must not multiply solutions
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Region" . </tpch/nation/3> <nationkey> 3 }',
    )
    assert out.count() == 5


def test_squash_by_subject_one_doc_scan(triples, infotons):
    """Same-subject const-predicate groups route to ONE doc-table scan
    (squashBySubject, JenaArqExtensionsUtils.scala:84-106) instead of N
    triples self-joins — and the connected join order never cross joins."""
    out = sparql_query(
        triples,
        'SELECT ?c ?n WHERE { ?c <inNation> ?nat . ?nat <name> ?n . ?c <mktsegment> "BUILDING" }',
        infotons=infotons,
    )
    baseline = sparql_query(
        triples,
        'SELECT ?c ?n WHERE { ?c <inNation> ?nat . ?nat <name> ?n . ?c <mktsegment> "BUILDING" }',
    )
    assert out.count() == baseline.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("/infotons") == 1  # the squashed ?c group: one doc scan
    assert "NestedLoop" not in plan


def test_builtin_string_fns_2(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?pre ?post ?sub WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'BIND(STRBEFORE(?n, "_") AS ?pre) BIND(STRAFTER(?n, "_") AS ?post) '
        'BIND(SUBSTR(?n, 1, 3) AS ?sub) FILTER(STRAFTER(?n, "_") = "3") }',
    )
    r = out.first()
    assert r["pre"] == "NATION" and r["post"] == "3" and r["sub"] == "NAT"


def test_builtin_replace_if_coalesce(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?x ?flag WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'BIND(REPLACE(?n, "_[0-9]+", "") AS ?x) '
        'BIND(IF(STRLEN(?n) > 8, "long", "short") AS ?flag) }',
    )
    rows = out.collect()
    assert all(r["x"] == "NATION" for r in rows)
    # NATION_0..9 are 8 chars (short), NATION_10..24 are 9 (long)
    assert {r["flag"] for r in rows} == {"long", "short"}
    out2 = sparql_query(
        triples,
        'SELECT ?s ?v WHERE { ?s <rdfType> "Region" . OPTIONAL { ?s <nosuch> ?m } '
        'BIND(COALESCE(?m, "fallback") AS ?v) }',
    )
    assert {r["v"] for r in out2.collect()} == {"fallback"}


def test_path_inverse_and_alternatives(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    members = sparql_query(triples, "SELECT ?m WHERE { </tpch/nation/3> ^<inNation> ?m }")
    cust = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3).count()
    supp = tbl.load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3).count()
    assert members.count() == cust + supp
    alts = sparql_query(
        triples, 'SELECT ?s ?n WHERE { ?s <rdfType> "Nation" . ?s <name>|<nationkey> ?n }'
    )
    assert alts.count() == 50  # 25 names + 25 keys
    chain = sparql_query(
        triples, "SELECT DISTINCT ?o WHERE { </tpch/nation/3> ^<inNation>/^<byCustomer> ?o }"
    )
    # orders of nation-3 customers
    ok = tbl.load_table(spark, sf_dir, "orders").join(
        tbl.load_table(spark, sf_dir, "customer").where(F.col("c_nationkey") == 3),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    ).count()
    assert chain.count() == ok


def test_path_mixed_inverse_alternative(triples):
    # '^' binds tighter than '|': ^inNation|ofRegion = members OR region
    out = sparql_query(
        triples, "SELECT DISTINCT ?x WHERE { </tpch/nation/3> ^<inNation>|<ofRegion> ?x }"
    )
    xs = {r["x"] for r in out.collect()}
    assert "/tpch/region/3" in xs and len(xs) == 7


def test_path_star_includes_identity(triples):
    out = sparql_query(triples, "SELECT DISTINCT ?x WHERE { </tpch/nation/3> <ofRegion>* ?x }")
    xs = {r["x"] for r in out.collect()}
    assert xs == {"/tpch/nation/3", "/tpch/region/3"}
    # var-var star: every node pairs with itself (plus 1-hop edges)
    out2 = sparql_query(
        triples, 'SELECT ?a ?b WHERE { ?a <ofRegion>* ?b . ?a <rdfType> "Region" }'
    )
    rows = {(r["a"], r["b"]) for r in out2.collect()}
    assert all(a == b for a, b in rows) and len(rows) == 5  # regions have no ofRegion edge


# ---- round-4 surface: EXISTS / subqueries / HAVING / p? / !(...) ---------


def _supplier_nations(triples):
    sup = triples.where(F.col("current") & (F.col("p") == "rdfType") & (F.col("o") == "Supplier"))
    inn = triples.where(F.col("current") & (F.col("p") == "inNation"))
    return (
        sup.select("s").join(inn, "s", "inner").select("o").distinct()
    )


def test_filter_exists(triples):
    out = sparql_query(
        triples,
        """
        SELECT ?n WHERE {
          ?n <rdfType> "Nation" .
          FILTER EXISTS { ?s <inNation> ?n . ?s <rdfType> "Supplier" }
        }
        """,
    )
    assert out.count() == _supplier_nations(triples).count()


def test_filter_not_exists(triples):
    out = sparql_query(
        triples,
        """
        SELECT ?n WHERE {
          ?n <rdfType> "Nation" .
          FILTER NOT EXISTS { ?s <inNation> ?n . ?s <rdfType> "Supplier" }
        }
        """,
    )
    all_nations = triples.where(
        F.col("current") & (F.col("p") == "rdfType") & (F.col("o") == "Nation")
    ).count()
    assert out.count() == all_nations - _supplier_nations(triples).count()


def test_not_exists_disjoint_gate(triples):
    # no shared variables: the inner pattern is a global gate; an empty
    # inner match keeps every solution
    out = sparql_query(
        triples,
        """
        SELECT ?n WHERE {
          ?n <rdfType> "Region" .
          FILTER NOT EXISTS { ?x <noSuchPredicate> ?y }
        }
        """,
    )
    assert out.count() == 5


def test_subquery_join(triples):
    out = sparql_query(
        triples,
        """
        SELECT ?name ?cnt WHERE {
          { SELECT ?nat (COUNT(?c) AS ?cnt) WHERE {
              ?c <inNation> ?nat . ?c <rdfType> "Customer" }
            GROUP BY ?nat }
          ?nat <name> ?name .
        }
        """,
    )
    cust = triples.where(F.col("current") & (F.col("p") == "rdfType") & (F.col("o") == "Customer"))
    inn = triples.where(F.col("current") & (F.col("p") == "inNation"))
    exp = cust.select("s").join(inn, "s").groupBy("o").count()
    got = {(r["name"], r["cnt"]) for r in out.collect()}
    assert len(got) == exp.count()
    assert sum(c for _, c in got) == exp.agg(F.sum("count")).first()[0]


def test_subquery_inner_limit(triples):
    # inner LIMIT slices the subquery, not the outer pattern
    out = sparql_query(
        triples,
        """
        SELECT ?nat WHERE {
          { SELECT ?nat WHERE { ?nat <rdfType> "Nation" } ORDER BY ?nat LIMIT 3 }
        }
        """,
    )
    assert out.count() == 3


def test_having(triples):
    rows = sparql_query(
        triples,
        """
        SELECT ?nat (COUNT(?c) AS ?cnt) WHERE {
          ?c <inNation> ?nat . ?c <rdfType> "Customer" }
        GROUP BY ?nat HAVING (?cnt >= 8)
        """,
    ).collect()
    cust = triples.where(F.col("current") & (F.col("p") == "rdfType") & (F.col("o") == "Customer"))
    inn = triples.where(F.col("current") & (F.col("p") == "inNation"))
    exp = cust.select("s").join(inn, "s").groupBy("o").count().where(F.col("count") >= 8)
    assert {(r["nat"], r["cnt"]) for r in rows} == {(r["o"], r["count"]) for r in exp.collect()}


def test_having_without_agg_rejected(triples):
    with pytest.raises(SparqlCompileError, match="HAVING requires aggregation"):
        sparql_query(triples, "SELECT ?s WHERE { ?s <name> ?o } HAVING (?s > 1)")


def test_path_zero_or_one(triples):
    out = sparql_query(triples, "SELECT DISTINCT ?x WHERE { </tpch/nation/3> <ofRegion>? ?x }")
    xs = {r["x"] for r in out.collect()}
    assert xs == {"/tpch/nation/3", "/tpch/region/3"}


def test_negated_property_set(triples):
    out = sparql_query(
        triples, "SELECT ?o WHERE { </tpch/nation/3> !(<name>|<rdfType>) ?o }"
    )
    exp = triples.where(
        F.col("current") & (F.col("s") == "/tpch/nation/3") & ~F.col("p").isin("name", "rdfType")
    )
    assert out.count() == exp.count() > 0


def test_negated_single_predicate(triples):
    out = sparql_query(triples, "SELECT ?o WHERE { </tpch/region/0> !<rdfType> ?o }")
    exp = triples.where(
        F.col("current") & (F.col("s") == "/tpch/region/0") & (F.col("p") != "rdfType")
    )
    assert out.count() == exp.count() > 0


def test_negated_set_rejects_inverse(triples):
    with pytest.raises(SparqlParseError, match="forward predicates only"):
        parse_sparql("SELECT ?o WHERE { ?s !(<a>|^<b>) ?o }")


# ---- lang-tagged + typed literals ----------------------------------------


@pytest.fixture()
def lang_triples(spark):
    return spark.createDataFrame(
        [
            ("s1", "name", "bonjour", None, "fr", True),
            ("s1", "name", "hello", None, "en", True),
            ("s2", "name", "hallo", None, "de", True),
            ("s2", "age", "7", 7.0, None, True),
        ],
        "s string, p string, o string, num double, lang string, current boolean",
    )


def test_lang_tagged_constant_match(lang_triples):
    out = sparql_query(lang_triples, 'SELECT ?s WHERE { ?s <name> "bonjour"@fr }')
    assert [r["s"] for r in out.collect()] == ["s1"]
    # same lexical form, wrong language -> no match
    out2 = sparql_query(lang_triples, 'SELECT ?s WHERE { ?s <name> "bonjour"@de }')
    assert out2.count() == 0


def test_langmatches_filter(lang_triples):
    out = sparql_query(
        lang_triples,
        'SELECT ?s ?n WHERE { ?s <name> ?n . FILTER(LANGMATCHES(LANG(?n), "en")) }',
    )
    assert [(r["s"], r["n"]) for r in out.collect()] == [("s1", "hello")]
    star = sparql_query(
        lang_triples,
        'SELECT ?n WHERE { ?s <name> ?n . FILTER(LANGMATCHES(LANG(?n), "*")) }',
    )
    assert star.count() == 3


def test_typed_literal_numeric(lang_triples):
    out = sparql_query(
        lang_triples,
        'PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
        'SELECT ?s WHERE { ?s <age> "7"^^xsd:int }',
    )
    assert [r["s"] for r in out.collect()] == ["s2"]


def test_typed_literal_parse_forms():
    q = parse_sparql('PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> '
                     'SELECT ?s WHERE { ?s <p> "x"^^xsd:string . ?s <q> "y"@en-US }')
    lit_s = q.where.triples[0].o
    lit_l = q.where.triples[1].o
    assert lit_s.dtype is None and lit_s.lang is None
    assert lit_l.lang == "en-US"


def test_filter_in_and_not_in(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?n WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'FILTER(?n IN ("NATION_3", "NATION_7")) }',
    )
    assert {r["n"] for r in out.collect()} == {"NATION_3", "NATION_7"}
    out2 = sparql_query(
        triples,
        'SELECT ?n WHERE { ?s <rdfType> "Region" . ?s <name> ?n . '
        'FILTER(?n NOT IN ("AFRICA")) }',
    )
    assert out2.count() == 4


def test_filter_in_numeric_shadow(triples):
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <nationkey> ?k . FILTER(?k IN (3, 7)) }',
    )
    assert out.count() == 2


def test_hash_builtins(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?h WHERE { ?s <rdfType> "Region" . ?s <name> ?n . BIND(MD5(?n) AS ?h) }',
    )
    import hashlib
    rows = {r["s"]: r["h"] for r in out.collect()}
    assert len(rows) == 5
    # spot-check one value against hashlib
    name = sparql_query(triples, "SELECT ?n WHERE { </tpch/region/0> <name> ?n }").first()["n"]
    got = sparql_query(
        triples, 'SELECT ?h WHERE { </tpch/region/0> <name> ?n . BIND(SHA256(?n) AS ?h) }'
    ).first()["h"]
    assert got == hashlib.sha256(name.encode()).hexdigest()


# ---- GRAPH clause (named-graph scoping, SPARQL 1.1 §13.3) ----------------


def test_graph_const_scopes_to_one_graph(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT ?d ?src WHERE { GRAPH </graphs/src3> { ?d <source> ?src } }",
    )
    rows = out.collect()
    raw = tbl.load_table(spark, sf_dir, "documents").where(F.col("source") == "src3")
    assert len(rows) == raw.count()
    assert all(r["src"] == "src3" for r in rows)


def test_default_graph_is_union(triples):
    # non-GRAPH patterns keep matching quad-tagged triples (the reference's
    # whole-graph engine maps named-graph lookups to the union graph —
    # JenaArqExtensions.scala:361-364)
    scoped = sparql_query(
        triples, "SELECT ?d WHERE { GRAPH </graphs/src3> { ?d <source> ?src } }"
    ).count()
    union = sparql_query(triples, 'SELECT ?d WHERE { ?d <source> "src3" }').count()
    assert scoped == union > 0


def test_graph_var_binds_graph_column(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?d <source> ?src } }",
    )
    n_sources = (
        tbl.load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    rows = out.collect()
    assert len(rows) == n_sources
    assert all(r["g"].startswith("/graphs/") for r in rows)


def test_graph_var_joins_outer_pattern(triples):
    # ?d is shared between the graph-scoped pattern and an outer pattern
    out = sparql_query(
        triples,
        """
        SELECT ?d ?g WHERE {
          GRAPH ?g { ?d <source> ?src }
          ?d <lang> "en" .
        }
        """,
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["g"].startswith("/graphs/") for r in rows)


def test_graph_var_excludes_untagged_triples(triples):
    # rdfType values carry no quad tag -> inside GRAPH ?g they match nothing
    out = sparql_query(
        triples,
        'SELECT ?d WHERE { GRAPH ?g { ?d <source> ?src . ?d <rdfType> "Document" } }',
    )
    assert out.count() == 0


def test_graph_nested_supported(triples):
    """r6: nested GRAPH no longer rejects — the inner constant re-scopes
    and ?g iterates the full named-graph domain (see the dedicated
    composition tests at the end of this file)."""
    out = sparql_query(
        triples,
        "SELECT ?d WHERE { GRAPH ?g { GRAPH </graphs/src1> { ?d <source> ?src } } }",
    )
    assert out.count() > 0


def test_graph_const_with_path(triples, spark, sf_dir):
    # property paths inside a constant GRAPH scope work (pre-filtered scan);
    # the <lang> alternative matches nothing (lang values are untagged)
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT ?d ?v WHERE { GRAPH </graphs/src2> { ?d <source>|<lang> ?v } }",
    )
    raw = tbl.load_table(spark, sf_dir, "documents").where(F.col("source") == "src2")
    assert out.count() == raw.count()


# ---- unbounded p+ / p* fixpoint closure ----------------------------------


def test_path_plus_deep_chain(triples):
    # /events/31 -prevEvent-> 30 -> ... -> 16 (15 hops; the old depth-6
    # bound answered this incompletely)
    out = sparql_query(triples, "SELECT ?e WHERE { </events/31> <prevEvent>+ ?e }")
    got = sorted(r["e"] for r in out.collect())
    assert got == sorted(f"/events/{i}" for i in range(16, 31))


def test_path_plus_reverse_deep(triples):
    # constant OBJECT: walk backwards — all events that reach /events/16
    out = sparql_query(triples, "SELECT ?e WHERE { ?e <prevEvent>+ </events/16> }")
    got = sorted(r["e"] for r in out.collect())
    assert got == sorted(f"/events/{i}" for i in range(17, 32))


def test_path_plus_both_const_gate(triples):
    hit = sparql_query(
        triples, "SELECT ?n WHERE { </events/31> <prevEvent>+ </events/16> . </tpch/nation/3> <name> ?n }"
    )
    assert hit.count() == 1
    miss = sparql_query(
        triples, "SELECT ?n WHERE { </events/31> <prevEvent>+ </events/15> . </tpch/nation/3> <name> ?n }"
    )
    assert miss.count() == 0


def test_path_plus_intermediate_limit_warning(triples, monkeypatch):
    import warnings

    from cm_well_spark.operators.sparql import compiler as C

    monkeypatch.setattr(C, "INTERMEDIATE_LIMIT", 5)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = sparql_query(
            triples, "SELECT ?e WHERE { </events/31> <prevEvent>+ ?e }"
        )
        n = out.count()
    assert any("intermediate-results" in str(x.message) for x in w)
    assert 0 < n < 15  # partial results, per the reference's contract


# ---- round-5 builtin widening (§17.4: datetime accessors, term fns) ------


def test_datetime_accessors(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?m ?d WHERE { ?s <rdfType> "Order" . ?s <orderdate> ?dt . '
        "BIND(MONTH(?dt) AS ?m) BIND(DAY(?dt) AS ?d) FILTER(YEAR(?dt) = 1995) }",
    )
    rows = out.collect()
    assert rows and all(1 <= int(r["m"]) <= 12 and 1 <= int(r["d"]) <= 31 for r in rows)


def test_tz_accessor(triples):
    out = sparql_query(
        triples,
        'SELECT ?z WHERE { </tpch/orders/1> <orderdate> ?d . BIND(TZ(?d) AS ?z) }',
    )
    assert out.first()["z"] == "Z"


def test_datatype_typed_and_langstring(triples):
    out = sparql_query(
        triples,
        "SELECT ?dt WHERE { </tpch/region/0> <regionkey> ?k . BIND(DATATYPE(?k) AS ?dt) }",
    )
    assert out.first()["dt"] == "http://www.w3.org/2001/XMLSchema#long"
    # documents text carries a lang tag -> rdf:langString
    out2 = sparql_query(
        triples,
        "SELECT ?dt WHERE { </docs/0> <text> ?t . BIND(DATATYPE(?t) AS ?dt) }",
    )
    assert out2.first()["dt"] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def test_isiri_isliteral_partition(triples):
    # ofRegion values are reference IRIs; name values are plain literals
    iri = sparql_query(
        triples,
        "SELECT ?v WHERE { </tpch/nation/3> <ofRegion> ?v . FILTER(ISIRI(?v)) }",
    ).count()
    lit = sparql_query(
        triples,
        "SELECT ?v WHERE { </tpch/nation/3> <name> ?v . FILTER(ISLITERAL(?v)) }",
    ).count()
    not_iri = sparql_query(
        triples,
        "SELECT ?v WHERE { </tpch/nation/3> <name> ?v . FILTER(ISIRI(?v)) }",
    ).count()
    assert iri == 1 and lit == 1 and not_iri == 0


def test_sameterm_and_isnumeric(triples):
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Nation" . ?s <name> ?n . '
        'FILTER(SAMETERM(?n, "NATION_3")) }',
    )
    assert out.first()["s"] == "/tpch/nation/3"
    n = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Nation" . ?s <nationkey> ?k . FILTER(ISNUMERIC(?k)) }',
    ).count()
    assert n == 25


# ---- grouped-sequence closures (p1/p2)+ ----------------------------------


def test_grouped_sequence_closure(triples):
    # double-hop closure over the prevEvent chain: 40 -> 38 -> 36 -> 34 -> 32
    out = sparql_query(
        triples,
        "SELECT ?e WHERE { </events/40> (<prevEvent>/<prevEvent>)+ ?e }",
    )
    got = sorted(r["e"] for r in out.collect())
    assert got == [f"/events/{i}" for i in (32, 34, 36, 38)]


def test_grouped_sequence_single_step_equiv(triples):
    plain = sparql_query(
        triples, "SELECT DISTINCT ?c ?r WHERE { ?c <inNation>/<ofRegion> ?r }"
    )
    grouped = sparql_query(
        triples, "SELECT DISTINCT ?c ?r WHERE { ?c (<inNation>/<ofRegion>)+ ?r }"
    )
    # regions have no inNation edge, so the closure adds nothing
    assert plain.count() == grouped.count()


def test_ungrouped_sequence_plus_still_rejected(triples):
    with pytest.raises(SparqlParseError, match="group the sequence"):
        sparql_query(triples, "SELECT ?r WHERE { ?c <inNation>/<ofRegion>+ ?r }")


def test_grouped_zero_or_one(triples):
    out = sparql_query(
        triples,
        "SELECT ?x WHERE { </tpch/customer/5> (<inNation>/<ofRegion>)? ?x }",
    )
    got = {r["x"] for r in out.collect()}
    assert "/tpch/customer/5" in got  # zero-length identity
    assert any(x.startswith("/tpch/region/") for x in got)


# ---- arithmetic expressions, SELECT exprs, CONSTRUCT WHERE ---------------


def test_arithmetic_in_filter(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        'SELECT ?c WHERE { ?c <rdfType> "Customer" . ?c <acctbal> ?b . FILTER(?b * 2 > 19000) }',
    )
    raw = tbl.load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") * 2 > 19000)
    assert out.count() == raw.count()


def test_select_expression_projection(triples):
    out = sparql_query(
        triples,
        'SELECT ?s (?k * 10 + 1 AS ?scaled) WHERE { ?s <rdfType> "Region" . ?s <regionkey> ?k }',
    )
    got = {r["s"]: float(r["scaled"]) for r in out.collect()}
    assert got["/tpch/region/3"] == 31.0


def test_sum_over_expression(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT (SUM(?p * (1 - ?d)) AS ?rev) WHERE { ?li <extendedprice> ?p . ?li <discount> ?d }",
    )
    li = tbl.load_table(spark, sf_dir, "lineitem")
    exp = li.select(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")).first()["r"]
    assert abs(out.first()["rev"] - exp) < 1e-6


def test_expression_over_aggregates(triples):
    out = sparql_query(
        triples,
        'SELECT ?t (COUNT(*) AS ?n) (?n * 2 AS ?n2) WHERE { ?x <rdfType> ?t } GROUP BY ?t',
    )
    rows = {r["t"]: (r["n"], float(r["n2"])) for r in out.collect()}
    assert rows["Region"] == (5, 10.0)


def test_bind_arithmetic(triples):
    out = sparql_query(
        triples,
        'SELECT ?s ?v WHERE { ?s <rdfType> "Region" . ?s <regionkey> ?k . '
        "BIND((?k + 1) * (?k + 1) AS ?v) }",
    )
    got = {r["s"]: float(r["v"]) for r in out.collect()}
    assert got["/tpch/region/2"] == 9.0


def test_construct_where_shorthand(triples):
    out = sparql_query(triples, 'CONSTRUCT WHERE { ?n <ofRegion> ?r }')
    assert out.columns == ["s", "p", "o"] and out.count() == 25


def test_order_by_expression(triples):
    out = sparql_query(
        triples,
        'SELECT ?n WHERE { ?x <rdfType> "Nation" . ?x <name> ?n } '
        "ORDER BY DESC(STRLEN(?n)) ?n LIMIT 3",
    )
    names = [r["n"] for r in out.collect()]
    assert all(len(n) == 9 for n in names)  # NATION_1x are the longest
    assert names == sorted(names)


# ---- dataset clauses: FROM / FROM NAMED ----------------------------------


def test_from_scopes_default_graph(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT ?d ?src FROM </graphs/src2> WHERE { ?d <source> ?src }",
    )
    raw = tbl.load_table(spark, sf_dir, "documents").where(F.col("source") == "src2")
    assert out.count() == raw.count()
    # untagged triples are NOT in the constructed default graph
    assert sparql_query(
        triples, 'SELECT ?x FROM </graphs/src2> WHERE { ?x <rdfType> "Region" }'
    ).count() == 0


def test_from_named_restricts_graph_iteration(triples):
    out = sparql_query(
        triples,
        "SELECT DISTINCT ?g FROM NAMED </graphs/src1> FROM NAMED </graphs/src4> "
        "WHERE { GRAPH ?g { ?d <source> ?src } }",
    )
    assert {r["g"] for r in out.collect()} == {"/graphs/src1", "/graphs/src4"}


def test_from_only_means_no_named_graphs(triples):
    out = sparql_query(
        triples,
        "SELECT ?g FROM </graphs/src1> WHERE { GRAPH ?g { ?d <source> ?src } }",
    )
    assert out.count() == 0


# ---- blank-node property lists -------------------------------------------


def test_blank_node_object(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        'SELECT ?n WHERE { ?x <rdfType> "Nation" . ?x <ofRegion> [ <name> ?n ] }',
    )
    names = {r["n"] for r in out.collect()}
    regions = {
        r["r_name"] for r in tbl.load_table(spark, sf_dir, "region").collect()
    }
    assert names == regions


def test_blank_node_subject(triples):
    out = sparql_query(
        triples,
        'SELECT ?n WHERE { [ <rdfType> "Nation" ; <name> ?n ] }',
    )
    assert out.count() == 25


def test_blank_node_not_projected(triples):
    out = sparql_query(
        triples, 'SELECT * WHERE { ?x <ofRegion> [ <name> ?n ] }'
    )
    assert set(out.columns) == {"x", "n"}  # the blank node stays internal


def test_sparql_explain_only(triples):
    from cm_well_spark.operators.sparql import sparql_explain

    plan = sparql_explain(
        triples, "SELECT ?d WHERE { GRAPH </graphs/src1> { ?d <source> ?s } }"
    )
    # compiled, not executed; the quad filter reaches the scan
    assert "Scan" in plan and "src1" in plan


# ---- property pin: fixpoint closure vs pure-Python BFS -------------------


def test_closure_matches_bfs_on_random_graphs(spark):
    """p+ fixpoint vs a BFS oracle over random digraphs (cycles, fan-out,
    self-loops included) — the shapes the synthetic chain fixture can't
    produce. Deterministic seeds; a handful of graphs is plenty since
    every graph exercises many (source, target) pairs at once."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 12
        edges = set()
        for _ in range(24):
            edges.add((rng.randrange(n), rng.randrange(n)))
        rows = [
            (f"/g/{a}", "nxt", f"/g/{b}", None, "s", None, None, None, None, 1, True, "obj")
            for a, b in edges
        ]
        tri = spark.createDataFrame(
            rows,
            "s string, p string, o string, g string, vtype string, num double, "
            "ts timestamp, bool boolean, lang string, index_time long, current boolean, kind string",
        )
        # BFS closure
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
        start = min(a for a, _ in edges)
        seen, frontier = set(), {start}
        while frontier:
            nxt = set()
            for x in frontier:
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        nxt.add(y)
            frontier = nxt
        out = sparql_query(tri, f"SELECT ?x WHERE {{ </g/{start}> <nxt>+ ?x }}")
        got = {r["x"] for r in out.collect()}
        assert got == {f"/g/{i}" for i in seen}, f"seed {seed}"
        # var-var closure: every reachable pair
        pairs_expected = set()
        for src in {a for a, _ in edges}:
            s2, f2 = set(), {src}
            while f2:
                nx = set()
                for x in f2:
                    for y in adj.get(x, ()):
                        if y not in s2:
                            s2.add(y)
                            nx.add(y)
                f2 = nx
            pairs_expected |= {(src, t) for t in s2}
        out2 = sparql_query(tri, "SELECT ?a ?b WHERE { ?a <nxt>+ ?b }")
        got2 = {(int(r["a"][3:]), int(r["b"][3:])) for r in out2.collect()}
        assert got2 == pairs_expected, f"seed {seed} var-var"


def test_min_max_term_aggregates(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        'SELECT (MIN(?n) AS ?lo) (MAX(?n) AS ?hi) WHERE { ?x <rdfType> "Nation" . ?x <name> ?n }',
    )
    row = out.first()
    names = [r["n_name"] for r in tbl.load_table(spark, sf_dir, "nation").collect()]
    assert row["lo"] == min(names) and row["hi"] == max(names)
    # numeric fields keep numeric ordering, result is the lexical form
    out2 = sparql_query(
        triples,
        'SELECT (MAX(?b) AS ?top) WHERE { ?c <rdfType> "Customer" . ?c <acctbal> ?b }',
    )
    top_lex = out2.first()["top"]
    exp = tbl.load_table(spark, sf_dir, "customer").agg(F.max("c_acctbal")).first()[0]
    assert float(top_lex) == exp


def test_having_inline_aggregate(triples):
    out = sparql_query(
        triples,
        'SELECT ?r WHERE { ?n <ofRegion> ?r } GROUP BY ?r HAVING (COUNT(*) >= 5)',
    )
    # every region hosts exactly 5 nations
    assert out.count() == 5
    out2 = sparql_query(
        triples,
        'SELECT ?seg WHERE { ?c <mktsegment> ?seg . ?c <acctbal> ?b } '
        "GROUP BY ?seg HAVING (SUM(?b) > 0 && COUNT(*) > 1)",
    )
    assert out2.count() == 5


def test_having_alias_still_works(triples):
    out = sparql_query(
        triples,
        'SELECT ?r (COUNT(*) AS ?n) WHERE { ?x <ofRegion> ?r } GROUP BY ?r HAVING (?n >= 5)',
    )
    assert out.count() == 5


def test_group_by_expression(triples, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    out = sparql_query(
        triples,
        "SELECT ?y (COUNT(*) AS ?n) WHERE { ?o <rdfType> \"Order\" . ?o <orderdate> ?d } "
        "GROUP BY (YEAR(?d) AS ?y) ORDER BY ?y",
    )
    got = {int(r["y"]): r["n"] for r in out.collect()}
    raw = tbl.load_table(spark, sf_dir, "orders")
    exp = {
        r["y"]: r["n"]
        for r in raw.groupBy(F.year("o_orderdate").alias("y")).agg(F.count("*").alias("n")).collect()
    }
    assert got == exp


# ---- parser robustness: malformed input never escapes the error contract --


def test_parser_fuzz_error_contract():
    """Random token soup must either parse or raise SparqlParseError —
    never IndexError/AttributeError/etc. (the reference returns a clean
    400 on bad syntax; our error contract is the exception type)."""
    import random

    vocab = [
        "SELECT", "WHERE", "{", "}", "(", ")", "[", "]", "?x", "?y", "<p>",
        '"v"', "FILTER", "OPTIONAL", "UNION", "GRAPH", "BIND", "AS", "+",
        "*", "/", ".", ";", ",", "a", "5", "GROUP", "BY", "HAVING", "ORDER",
        "LIMIT", "COUNT", "MINUS", "VALUES", "FROM", "NAMED", "^", "|", "!",
    ]
    rng = random.Random(1234)
    for _ in range(300):
        q = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25)))
        try:
            parse_sparql(q)
        except SparqlParseError:
            pass  # the contract
        # any other exception type fails the test by propagating


def test_sameterm_unbound_is_type_error(triples):
    """SAMETERM on an unbound (OPTIONAL-produced null) argument is a
    SPARQL type error -> the FILTER drops the row (ADVICE r5: plain
    null-propagating equality, not eqNullSafe)."""
    # suppliers have no <mktsegment>; OPTIONAL leaves ?m unbound for all
    out = sparql_query(
        triples,
        'SELECT ?s WHERE { ?s <rdfType> "Supplier" . '
        "OPTIONAL { ?s <mktsegment> ?m } OPTIONAL { ?s <nosuchpred> ?x } "
        "FILTER(SAMETERM(?m, ?x)) }",
    )
    assert out.count() == 0


def test_projection_alias_must_be_var():
    """(expr AS alias) without ?/$ is a parse error, not a silently
    mangled alias (ADVICE r5)."""
    import pytest

    with pytest.raises(SparqlParseError):
        parse_sparql("SELECT (1 + 2 AS x) WHERE { ?s <p> ?o }")
    with pytest.raises(SparqlParseError):
        parse_sparql("SELECT (COUNT(*) AS n) WHERE { ?s <p> ?o }")
    # the valid forms still parse
    parse_sparql("SELECT (1 + 2 AS ?x) WHERE { ?s <p> ?o }")
    parse_sparql("SELECT (COUNT(*) AS ?n) WHERE { ?s <p> ?o }")


# ---- GRAPH ?var composition (r6: closes the r5 rejections) ----------------


def _docs_per_graph(triples):
    out = sparql_query(
        triples,
        "SELECT ?g (COUNT(?d) AS ?n) WHERE { GRAPH ?g { ?d <source> ?src } } GROUP BY ?g",
        limit_cap=None,
    )
    return {r["g"]: r["n"] for r in out.collect()}


def test_graph_var_zero_length_paths(triples):
    """`p*` / `p?` inside GRAPH ?var: zero-length solutions pair every
    node of THAT graph with itself (per-graph node domain), so pairs per
    graph = n one-step + (n docs + 1 source value) identities = 2n+1."""
    base = _docs_per_graph(triples)
    for path_op in ("*", "?"):
        out = sparql_query(
            triples,
            "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?d <source>%s ?x } } GROUP BY ?g"
            % path_op,
            limit_cap=None,
        )
        got = {r["g"]: r["n"] for r in out.collect()}
        assert got == {g: 2 * n + 1 for g, n in base.items()}


def test_graph_var_zero_length_const_endpoint(triples):
    """Constant endpoint under GRAPH ?var: the zero-length case yields
    one row per named graph (liberal constant behavior, per-graph)."""
    base = _docs_per_graph(triples)
    out = sparql_query(
        triples,
        "SELECT ?g ?x WHERE { GRAPH ?g { </docs/1> <source>* ?x } }",
        limit_cap=None,
    )
    rows = [(r["g"], r["x"]) for r in out.collect()]
    # every graph has the zero-length row (?x = /docs/1); exactly one
    # graph adds the one-step row to its source value
    assert sum(1 for _, x in rows if x == "/docs/1") == len(base)
    assert sum(1 for _, x in rows if x != "/docs/1") == 1


def test_graph_var_subselect(triples):
    """Sub-SELECT inside GRAPH ?var (§13.3.2): evaluated per named graph
    — the graph var threads through as a hidden group key."""
    base = _docs_per_graph(triples)
    out = sparql_query(
        triples,
        "SELECT ?g ?src ?n WHERE { GRAPH ?g "
        "{ SELECT ?src (COUNT(?d) AS ?n) WHERE { ?d <source> ?src } GROUP BY ?src } }",
        limit_cap=None,
    )
    got = {(r["g"], r["src"]): r["n"] for r in out.collect()}
    assert len(got) == len(base)
    for (g, src), n in got.items():
        assert g == f"/graphs/{src}" and n == base[g]


def test_graph_var_subselect_per_graph_limit(triples):
    """LIMIT inside a GRAPH ?var sub-SELECT slices PER GRAPH, not
    globally."""
    from collections import Counter

    base = _docs_per_graph(triples)
    out = sparql_query(
        triples,
        "SELECT ?g ?d WHERE { GRAPH ?g "
        "{ SELECT ?d WHERE { ?d <source> ?src } ORDER BY ?d LIMIT 2 } }",
        limit_cap=None,
    )
    c = Counter(r["g"] for r in out.collect())
    assert len(c) == len(base) and set(c.values()) == {2}


def test_graph_nested_constant_overrides(triples):
    """Nested GRAPH: the inner constant graph re-scopes its patterns
    independently of the outer var; correlation happens through shared
    solution vars (?d here), so only the matching outer graph survives."""
    out = sparql_query(
        triples,
        "SELECT ?g ?d WHERE { GRAPH ?g { ?d <source> ?s1 . "
        "GRAPH </graphs/src1> { ?d <source> ?s2 } } }",
        limit_cap=None,
    )
    rows = out.collect()
    assert rows and all(r["g"] == "/graphs/src1" for r in rows)


def test_graph_var_only_nested_constant_iterates_domain(triples):
    """GRAPH ?g wrapping ONLY a nested constant GRAPH still iterates ?g
    over every named graph (§13.3 union semantics) — the graph-name
    domain crosses the inner solutions."""
    base = _docs_per_graph(triples)
    out = sparql_query(
        triples,
        "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g "
        "{ GRAPH </graphs/src1> { ?d <source> ?s2 } } } GROUP BY ?g",
        limit_cap=None,
    )
    got = {r["g"]: r["n"] for r in out.collect()}
    assert set(got) == set(base)
    assert set(got.values()) == {base["/graphs/src1"]}


def test_nondeterministic_builtins(spark, triples):
    """SPARQL 1.1 NOW()/UUID()/STRUUID()/RAND(): NOW is query-constant
    (§17.4.5.1 — one value for the whole query), UUID/STRUUID are
    per-solution distinct, RAND lands in [0,1)."""
    import re

    from cm_well_spark.operators.sparql import sparql_query

    rows = sparql_query(
        triples,
        """
        SELECT ?x ?t ?u ?su ?r WHERE {
          ?x <name> ?n . ?x <rdfType> "Region" .
          BIND(NOW() AS ?t) BIND(UUID() AS ?u) BIND(STRUUID() AS ?su) BIND(RAND() AS ?r)
        }
        """,
    ).collect()
    assert len(rows) == 5
    assert len({r["t"] for r in rows}) == 1  # query-constant
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", rows[0]["t"])
    assert len({r["u"] for r in rows}) == 5 and all(r["u"].startswith("urn:uuid:") for r in rows)
    assert len({r["su"] for r in rows}) == 5
    assert all(0.0 <= float(r["r"]) < 1.0 for r in rows)


# ---------------------------------------------------------------------------
# parser error contract (fuzz) — same pin as the qp/_sp/gremlin parsers
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=150))
def test_sparql_parser_never_leaks_foreign_exceptions(payload):
    """Arbitrary input either parses or raises SparqlParseError — never
    an IndexError/KeyError/AttributeError out of the tokenizer, the
    recursive descent, or the r7 custom-function call path."""
    from cm_well_spark.operators.sparql.parser import SparqlParseError, parse_sparql

    try:
        parse_sparql(payload)
    except SparqlParseError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=60))
def test_sparql_parser_fuzzed_filter_exprs(payload):
    """Same contract with the payload embedded in a FILTER expression —
    exercises value_expr / arith_expr / the nullary-builtin arity guard."""
    from cm_well_spark.operators.sparql.parser import SparqlParseError, parse_sparql

    try:
        parse_sparql("SELECT ?x WHERE { ?x <p> ?v . FILTER(" + payload + ") }")
    except SparqlParseError:
        pass
