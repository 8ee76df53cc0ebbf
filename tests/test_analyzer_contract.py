"""Tokenizer-contract tests: pin exactly WHERE the engine's analyzer
(lowercase + collapse non-alphanumerics to spaces, plans/compile.py
analyze_expr) diverges from Lucene's StandardAnalyzer (UAX#29 word
break), which backs the reference's `:` Contains (matchPhraseQuery,
FTSService.scala:898-905) and `~` fuzzy (fuzzyQuery).

The point is not parity — it is that every divergence is ENUMERATED and
asserted, so a behavior change in either direction fails a test instead
of shifting recall silently. The same table lives in SURVEY.md §7.3.
"""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.plans.compile import analyze_expr

# (input, our tokens, Lucene StandardAnalyzer tokens, diverges?)
# Lucene column per UAX#29: apostrophes/periods INSIDE words are kept
# (MidLetter/MidNum), underscores join (ExtendNumLet), CJK emits unigrams.
CONTRACT = [
    ("Hello, World!", "hello world", ["hello", "world"], False),
    ("state-of-the-art", "state of the art", ["state", "of", "the", "art"], False),
    ("O'Brien", "o brien", ["o'brien"], True),
    ("dog's", "dog s", ["dog's"], True),
    ("3.14 rounds", "3 14 rounds", ["3.14", "rounds"], True),
    ("foo_bar", "foo bar", ["foo_bar"], True),
    ("mail a@b.com", "mail a b com", ["mail", "a", "b.com"], True),
    ("日本語 text", "日本語 text", ["日", "本", "語", "text"], True),
]


@pytest.fixture(scope="module")
def analyze(spark):
    def run(s: str) -> str:
        return spark.range(1).select(analyze_expr(F.lit(s)).alias("t")).first()["t"]

    return run


@pytest.mark.parametrize("raw,ours,lucene,diverges", CONTRACT)
def test_analyzer_contract(analyze, raw, ours, lucene, diverges):
    got = analyze(raw)
    assert got == ours, f"engine analyzer changed for {raw!r}"
    # the divergence flag must stay truthful: if our token stream equals
    # Lucene's, the row must say so (and vice versa)
    assert (got.split(" ") != lucene) == diverges


def test_contains_word_boundary_semantics(infotons, triples):
    """`:` Contains matches whole analyzed words, not substrings — same as
    matchPhrase on the analyzed field for single terms."""
    from cm_well_spark.operators.search import search

    full = search(infotons, qp="rdfType::Part,name:widget", length=None, triples=triples).count()
    # 'plu' is a strict prefix of the token, not a token -> no match
    prefix = search(infotons, qp="rdfType::Part,name:widg", length=None, triples=triples).count()
    assert full > 0 and prefix == 0


def test_fuzzy_per_term_parity(spark, infotons, triples):
    """`~` fuzzy is PER-ANALYZED-TERM, matching Lucene fuzzyQuery
    (FTSService.scala:905-910): a one-word query within AUTO edit
    distance of ANY token of a multi-word value matches. (r6: this was
    previously pinned as a whole-value divergence; now parity.)"""
    from cm_well_spark.operators.search import search

    # single-token value: 'NATIO' ~1 matches the 'nation' token of every
    # NATION_k name (the simple analyzer splits the underscore)
    hits = {r["path"] for r in search(infotons, qp="rdfType::Nation,name~NATIO", length=None, triples=triples).select("path").collect()}
    assert len(hits) == 25
    # part names are multi-word ("large widget"): fuzzyQuery on 'widgt'
    # matches the 'widget' TOKEN — whole-value distance would be huge
    assert search(infotons, qp="rdfType::Part,name~widgt", length=None, triples=triples).count() > 0
    # and a term near NO token stays a miss
    assert search(infotons, qp="rdfType::Part,name~zzqqx", length=None, triples=triples).count() == 0
    # remaining analyzer-mode divergence, still pinned: under `simple`,
    # ExtendNumLet values tokenize apart ('nation 3'), so a fuzzy query
    # against the UNANALYZED compound ('NATIN_3', Lucene keeps it one
    # token) misses; the opt-in uax29ish mode converges this
    assert search(infotons, qp="rdfType::Nation,name~NATIN_3", length=None, triples=triples).count() == 0


# ---- opt-in uax29ish mode: divergent rows converge -----------------------

UAX29ISH_CONVERGES = [
    ("O'Brien", ["o'brien"]),
    ("dog's", ["dog's"]),
    ("3.14 rounds", ["3.14", "rounds"]),
    ("foo_bar", ["foo_bar"]),
    ("mail a@b.com", ["mail", "a", "b.com"]),  # @ breaks; MidNumLet period holds b.com
    # positional mid-char rules (r11): ' only letter-letter, . only
    # letter.letter / digit.digit, runs of mids always break
    ("3'4", ["3", "4"]),
    ("a.3 ok", ["a", "3", "ok"]),
    ("x..y", ["x", "y"]),
    ("can't stop 3.14.15", ["can't", "stop", "3.14.15"]),
    # r7: CJK converges too — Han + Hiragana unigrams (StandardTokenizer
    # IDEOGRAPHIC/HIRAGANA types), Katakana runs whole (KATAKANA type)
    ("日本語 text", ["日", "本", "語", "text"]),
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("トヨタ車", ["トヨタ", "車"]),
]


@pytest.mark.parametrize("raw,lucene_ish", UAX29ISH_CONVERGES)
def test_uax29ish_mode_converges(spark, raw, lucene_ish):
    got = (
        spark.range(1)
        .select(analyze_expr(F.lit(raw), analyzer="uax29ish").alias("t"))
        .first()["t"]
    )
    assert got.split(" ") == lucene_ish


def test_uax29ish_strips_edge_punct(spark):
    got = (
        spark.range(1)
        .select(analyze_expr(F.lit("'quoted' end. _x_"), analyzer="uax29ish").alias("t"))
        .first()["t"]
    )
    assert got.split(" ") == ["quoted", "end", "x"]


def test_unknown_analyzer_rejected(spark):
    with pytest.raises(ValueError, match="know: simple"):
        spark.range(1).select(analyze_expr(F.lit("x"), analyzer="bogus")).first()


def test_fuzzy_uax29ish_converges_compound_tokens(spark, infotons, triples):
    """Under uax29ish, ExtendNumLet compounds stay single tokens
    ('nation_3'), so the per-term fuzzy matches the compound query that
    `simple` mode misses — the converged half of the pinned divergence."""
    from cm_well_spark.operators.search import search
    from cm_well_spark.plans.compile import analyzer_mode

    with analyzer_mode("uax29ish"):
        df = search(infotons, qp="rdfType::Nation,name~NATIN_3", length=None, triples=triples)
    hits = {r["path"] for r in df.select("path").collect()}
    assert "/tpch/nation/3" in hits
    # and the mode did not leak: simple still misses after the block
    assert search(infotons, qp="rdfType::Nation,name~NATIN_3", length=None, triples=triples).count() == 0
