

def test_url_host_and_filter_subdomains(spark):
    """r7 URL blocklist pass: host extraction handles scheme/userinfo/
    port/path; filtering drops exact hosts AND subdomains of blocked
    domains, never unrelated lookalikes."""
    from pyspark.sql import functions as F

    from cm_well_spark.operators.curation import url_filter, url_host

    hosts = spark.createDataFrame(
        [
            ("https://User:pw@Sub.Example.COM:8443/a/b?q=1",),
            ("http://plain.org/x",),
            ("no-scheme.net/path",),
        ],
        "url string",
    ).select(url_host(F.col("url")).alias("h"))
    assert [r["h"] for r in hosts.collect()] == ["sub.example.com", "plain.org", "no-scheme.net"]

    docs = spark.createDataFrame(
        [
            (1, "https://ads.tracker.com/x"),       # subdomain of blocked
            (2, "https://tracker.com/y"),           # exact blocked
            (3, "https://nottracker.com/z"),        # lookalike, kept
            (4, "https://deep.a.b.tracker.com/w"),  # deep subdomain
            (5, "https://fine.org/ok"),
        ],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in url_filter(docs, ["tracker.com"]).collect()}
    assert kept == {3, 5}


def test_dsir_weights_prefer_target_like_docs(spark):
    """r7 DSIR (Xie et al. 2023): importance weights rank raw docs that
    share the target's hashed n-gram distribution above dissimilar ones,
    and the Gumbel top-k is deterministic across re-evaluation."""
    from cm_well_spark.operators.curation import dsir_resample, dsir_weights

    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(8)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog once more"),
            (101, "quick brown fox and the lazy dog jump together"),
            (102, "zzz qqq xxx www vvv kkk jjj hhh ggg fff"),
            (103, "completely unrelated tokens nowhere near target corpus"),
        ],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["log_w"] for r in dsir_weights(raw, target).collect()}
    assert w[100] > w[102] and w[100] > w[103]
    assert w[101] > w[102] and w[101] > w[103]

    top = dsir_resample(raw, target, k=2)
    first = [(r["doc_id"], r["gumbel_key"]) for r in top.collect()]
    second = [(r["doc_id"], r["gumbel_key"]) for r in top.collect()]
    assert first == second and len(first) == 2


def test_gopher_rules_each_branch(spark):
    """r7 Gopher rule filter (Rae et al. 2021 Table A1): every rule
    branch fires on a doc built to trip exactly it, checked in the
    declared first-fail order."""
    from cm_well_spark.operators.curation import gopher_rules

    stop_tail = " the be to of and that have with"
    # a healthy base: 30+ distinct-ish words, stop words present
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four" + stop_tail)
    docs = spark.createDataFrame(
        [
            (0, base),  # ok
            (1, "too short" + stop_tail),  # too_few_words
            (2, " ".join("ab" for _ in range(40)) + stop_tail),  # short_words
            (3, " ".join("pneumonoultramicro" for _ in range(40)) + stop_tail),  # long_words
            (4, base + " " + "# " * 10),  # symbol_ratio
            (5, "\n".join("- bullet item here now" for _ in range(10)) + "\n" + base),  # bullet_lines... see below
            (6, "\n".join([base + " more..."] * 4 + [base] * 6)),  # ellipsis_lines
            (7, " ".join("1234" for _ in range(40)) + stop_tail),  # non_alpha_words
            (8, " ".join(f"word{i}xyz" for i in range(40))),  # few_stop_words
            (9, "\n".join([base] * 12)),  # dup_lines
            (10, base + " " + "ping pong " * 30),  # top_2gram
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["reason"] for r in gopher_rules(docs, min_words=25).collect()}
    assert out[0] == "ok"
    assert out[1] == "too_few_words"
    assert out[2] == "short_words"
    assert out[3] == "long_words"
    assert out[4] == "symbol_ratio"
    assert out[5] == "bullet_lines"
    assert out[6] == "ellipsis_lines"
    assert out[7] == "non_alpha_words"
    assert out[8] == "few_stop_words"
    assert out[9] == "dup_lines"
    assert out[10] == "top_2gram"
    # keep is exactly the reason == ok docs
    keeps = {r["doc_id"] for r in gopher_rules(docs, min_words=25).collect() if r["keep"]}
    assert keeps == {0}


def test_boilerplate_removal_keeps_content_lines(spark):
    """r7 jusText-lite: chrome lines (copyright, bullets, short, low
    stopword density) drop; content lines survive in original order and
    the counts reconcile."""
    from cm_well_spark.operators.curation import boilerplate_removal

    content1 = "the first paragraph is made of common words and that is fine to keep"
    content2 = "each of the following sentences ought to be retained with the body text"
    doc = "\n".join(
        [
            "Copyright © 2024 Example Corp. All rights reserved.",
            content1,
            "- nav item",
            "tiny line",
            content2,
            "We use cookies to improve your experience on this site okay",
        ]
    )
    out = boilerplate_removal(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]
    assert out["text"] == content1 + "\n" + content2
    assert out["n_kept"] == 2 and out["n_dropped"] == 4
    # empty result still yields '' (not null) so downstream concat is safe
    empty = boilerplate_removal(
        spark.createDataFrame([(2, "x y")], "doc_id long, text string")
    ).collect()[0]
    assert empty["text"] == "" and empty["n_kept"] == 0


# ---------------------------------------------------------------------------
# property pin: gopher_rules vs an independent pure-Python model
# ---------------------------------------------------------------------------

from collections import Counter as _Counter

from hypothesis import given, settings, strategies as st


def _py_gopher(text: str, min_words: int, max_words: int = 100_000) -> str:
    """Independent reimplementation of the Gopher rule order (plain
    Python re/collections — no Spark, no SQL)."""
    import re

    t = text.strip()
    words = re.split(r"\s+", t)
    n_words = len(words)
    lines = text.split("\n")
    mean_wl = len(re.sub(r"\s+", "", t)) / max(n_words, 1)
    n_sym = len(re.findall("#", text)) + len(re.findall(r"\.\.\.|…", text))
    sym_ratio = n_sym / max(n_words, 1)
    bullet = sum(bool(re.search(r"^\s*[-*•]", l)) for l in lines) / max(len(lines), 1)
    ellip = sum(bool(re.search(r"(\.\.\.|…)\s*$", l)) for l in lines) / max(len(lines), 1)
    alpha = sum(bool(re.search("[A-Za-z]", w)) for w in words) / max(n_words, 1)
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    n_stop = len({w.lower() for w in words} & stops)

    norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    nwords = norm.split(" ")

    def frac_dup(counts, weight=None):
        tot = sum((weight(k) if weight else 1) * c for k, c in counts.items())
        dup = sum((weight(k) if weight else 1) * c for k, c in counts.items() if c > 1)
        return dup / tot if tot else 0.0

    lc = _Counter(lines)
    dup_line = frac_dup(lc)
    dup_line_char = frac_dup(lc, weight=len)
    g2 = _Counter(
        " ".join(nwords[i : i + 2]) for i in range(len(nwords) - 1)
    ) if len(nwords) >= 2 else _Counter()
    top2 = max(g2.values()) / sum(g2.values()) if g2 else 0.0
    g5 = _Counter(
        " ".join(nwords[i : i + 5]) for i in range(len(nwords) - 4)
    ) if len(nwords) >= 5 else _Counter()
    dup5 = frac_dup(g5)

    if n_words < min_words:
        return "too_few_words"
    if n_words > max_words:
        return "too_many_words"
    if mean_wl < 3:
        return "short_words"
    if mean_wl > 10:
        return "long_words"
    if sym_ratio > 0.1:
        return "symbol_ratio"
    if bullet > 0.9:
        return "bullet_lines"
    if ellip > 0.3:
        return "ellipsis_lines"
    if alpha < 0.8:
        return "non_alpha_words"
    if n_stop < 2:
        return "few_stop_words"
    if dup_line > 0.30:
        return "dup_lines"
    if dup_line_char > 0.20:
        return "dup_line_chars"
    if top2 > 0.20:
        return "top_2gram"
    if dup5 > 0.15:
        return "dup_5gram"
    return "ok"


_WORDS = ["the", "be", "of", "and", "quick", "brown", "fox", "x1", "#", "...", "…", "•", "-", "zzzz"]
_SEPS = [" ", " ", " ", "\n", "  "]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=25).map(
            lambda ws: "".join(
                w + _SEPS[i % len(_SEPS)] for i, w in enumerate(ws)
            ).rstrip()
        ),
        min_size=1,
        max_size=12,
    )
)
def test_gopher_rules_match_python_model(spark, texts):
    """The Spark classifier agrees with an independent pure-Python
    reimplementation on arbitrary whitespace/bullet/ellipsis soup — the
    same style of engine-independence pin as the asof/pandas one."""
    from cm_well_spark.operators.curation import gopher_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["reason"] for r in gopher_rules(df, min_words=3).collect()}
    want = {i: _py_gopher(t, min_words=3) for i, t in enumerate(texts)}
    assert got == want


def _py_boiler(text: str) -> tuple[str, int, int]:
    """Independent pure-Python model of boilerplate_removal's defaults."""
    import re

    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    markers = ("all rights reserved", "cookie", "terms of service",
               "privacy policy", "copyright", "©")
    lines = text.split("\n")
    kept = []
    for l in lines:
        w = re.split(r"\s+", l.strip())
        nw = len(w)
        alpha = sum(bool(re.search("[A-Za-z]", x)) for x in w) / max(nw, 1)
        stop = sum(x.lower() in stops for x in w) / max(nw, 1)
        low = l.lower()
        if (
            nw >= 5
            and alpha >= 0.5
            and not any(m in low for m in markers)
            and (nw >= 20 or stop >= 0.2)
        ):
            kept.append(l)
    return "\n".join(kept), len(kept), len(lines) - len(kept)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS + ["Copyright", "cookie"]), min_size=0, max_size=25).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    ).map(lambda ls: "\n".join(ls))
)
def test_boilerplate_matches_python_model(spark, text):
    """The Spark line classifier agrees with an independent pure-Python
    model on arbitrary marker/stopword/newline soup."""
    from cm_well_spark.operators.curation import boilerplate_removal

    row = boilerplate_removal(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    want_text, want_kept, want_dropped = _py_boiler(text)
    assert (row["text"], row["n_kept"], row["n_dropped"]) == (want_text, want_kept, want_dropped)


def test_linear_classifier_matches_pure_python(spark):
    """Classifier inference pinned against an independent pure-Python
    model application: same md5 bucketing, same mean-pool + sigmoid.
    Also the edge case: an empty-after-normalization doc scores
    sigmoid(bias)."""
    import hashlib
    import math
    import re

    import pytest

    from cm_well_spark.operators.curation import linear_classifier_score

    weights = [((i * 37) % 11 - 5) / 7.0 for i in range(64)]
    bias = 0.25
    rows = [
        (1, "The quick brown fox, jumps!"),
        (2, "spam spam spam buy now"),
        (3, "???!!!"),  # normalizes to empty -> no grams
        (4, "one"),
    ]

    def py_score(text):
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        words = [w for w in norm.split(" ") if w] if norm else []
        grams = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
        if not grams:
            return 1.0 / (1.0 + math.exp(-bias))
        ws = [weights[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 64] for g in grams]
        return 1.0 / (1.0 + math.exp(-(bias + sum(ws) / len(ws))))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in linear_classifier_score(df, weights, bias=bias).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == pytest.approx(py_score(text), abs=1e-12), (doc_id, text)


def test_exact_stratified_sample_quota_and_determinism(spark):
    from cm_well_spark.operators.curation import exact_stratified_sample

    rows = [(i, "a" if i < 20 else ("b" if i < 25 else "c")) for i in range(27)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = exact_stratified_sample(df, "lang", 5).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # exact quota where the stratum is big enough, whole stratum otherwise
    assert len(by_lang["a"]) == 5
    assert len(by_lang["b"]) == 5
    assert by_lang["c"] == {25, 26}
    again = exact_stratified_sample(df, "lang", 5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # different salt -> (almost surely) different draw from the big stratum
    other = exact_stratified_sample(df, "lang", 5, salt="other").collect()
    ob = {r["doc_id"] for r in other if r["lang"] == "a"}
    assert ob != by_lang["a"]


def test_train_val_test_split_properties(spark):
    import hashlib

    from cm_well_spark.operators.curation import train_val_test_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    got = {r["doc_id"]: r["split"] for r in train_val_test_split(df).collect()}
    # pure function of the id: pin a few rows against pure Python
    for i in (0, 7, 1999):
        u = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16)
        want = "train" if u < int(0.9 * 2**32) else ("val" if u < int(0.95 * 2**32) else "test")
        assert got[i] == want
    # rough proportions at n=2000
    from collections import Counter

    c = Counter(got.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["val"] + c["test"] > 0
    # weights must sum to 1
    import pytest

    with pytest.raises(ValueError):
        train_val_test_split(df, weights=(0.5, 0.2, 0.2))


def test_temperature_mixture_flattens(spark):
    from cm_well_spark.operators.curation import temperature_mixture_rates

    rows = [(i, "word " * (200 if i % 10 else 4), "hi" if i % 10 == 0 else "en") for i in range(50)]
    df = spark.createDataFrame([(i, t.strip(), l) for i, t, l in rows], ["doc_id", "text", "lang"])
    r03 = {r["stratum"]: r for r in temperature_mixture_rates(df, alpha=0.3).collect()}
    # alpha < 1: the low-resource stratum keeps everything (binding), the
    # high-resource one downsamples
    assert r03["hi"]["rate"] == 1.0
    assert r03["en"]["rate"] < 1.0
    # shares flattened vs raw token shares: hi's q_share far above its raw share
    raw_hi = r03["hi"]["n_tokens"] / (r03["hi"]["n_tokens"] + r03["en"]["n_tokens"])
    assert r03["hi"]["q_share"] > 2 * raw_hi
    # alpha = 1 degenerates to proportional: every stratum keeps all
    r1 = {r["stratum"]: r["rate"] for r in temperature_mixture_rates(df, alpha=1.0).collect()}
    assert all(abs(v - 1.0) < 1e-6 for v in r1.values())


def test_token_budget_select_matches_naive_greedy(spark, sf_dir):
    from cm_well_spark.operators.curation import token_budget_select
    from cm_well_spark.operators.text import quality_score
    from cm_well_spark.sources import tables as tbl
    from pyspark.sql import functions as F

    docs = tbl.load_table(spark, sf_dir, "documents").cache()
    budget = 3000
    got = {r["doc_id"]: r for r in token_budget_select(docs, budget=budget).collect()}

    # naive reference: single ordered walk
    scored = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("q"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
    ).collect()
    run, want = 0, {}
    for r in sorted(scored, key=lambda r: (-r["q"], r["doc_id"])):
        if run < budget:
            want[r["doc_id"]] = (r["q"], r["n"], run)
        run += r["n"]
    assert set(got) == set(want)
    for d, (q, n, before) in want.items():
        assert got[d]["quality"] == q
        assert got[d]["n_tokens"] == n
        assert got[d]["tokens_before"] == before
    # greedy fill: admitted tokens exceed budget by at most one straddler
    total = sum(v[1] for v in want.values())
    assert total >= min(budget, sum(r["n"] for r in scored) ) - max(v[1] for v in want.values())


def _norm_py(t):
    import re as _re

    return _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def _grams_py(t):
    w = _norm_py(t).split(" ")
    out = [x for x in w if x != ""]
    if len(w) >= 2:
        out += [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
    return [g for g in out if g != ""]


def _bucket_py(ng, n):
    import hashlib

    return int(hashlib.md5(ng.encode()).hexdigest()[:8], 16) % n


def test_train_linear_classifier_matches_python_reference(spark, sf_dir):
    import math

    from cm_well_spark.operators.curation import train_linear_classifier
    from cm_well_spark.sources import tables as tbl
    from pyspark.sql import functions as F

    docs = tbl.load_table(spark, sf_dir, "documents").where("doc_id < 60").cache()
    # deterministic synthetic labels: parity of the doc's md5
    labels = docs.select(
        "doc_id", (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10) % 2).cast("int").alias("label")
    )
    N_B, ITERS, LR = 64, 4, 2.0
    w, b = train_linear_classifier(docs, labels, n_buckets=N_B, n_iters=ITERS, lr=LR)

    # pure-Python twin (same mean-pooled features, same GD)
    import hashlib

    rows = docs.select("doc_id", "text").collect()
    lab = {r["doc_id"]: r["label"] for r in labels.collect()}
    feats = {}
    for r in rows:
        gs = _grams_py(r["text"])
        if not gs:
            continue
        d = {}
        for g in gs:
            bkt = _bucket_py(g, N_B)
            d[bkt] = d.get(bkt, 0) + 1
        m = sum(d.values())
        feats[r["doc_id"]] = {k: v / m for k, v in d.items()}
    n = len(feats)
    wr, br = [0.0] * N_B, 0.0
    for _ in range(ITERS):
        gw, gb = [0.0] * N_B, 0.0
        for d, x in feats.items():
            p = 1.0 / (1.0 + math.exp(-(br + sum(wr[k] * v for k, v in x.items()))))
            e = p - lab[d]
            gb += e
            for k, v in x.items():
                gw[k] += e * v
        wr = [wi - LR * gi / n for wi, gi in zip(wr, gw)]
        br -= LR * gb / n

    import pytest

    assert b == pytest.approx(br, rel=1e-9, abs=1e-12)
    for got, want in zip(w, wr):
        assert got == pytest.approx(want, rel=1e-9, abs=1e-12)


def test_train_linear_classifier_separates_synthetic_task(spark):
    from cm_well_spark.operators.curation import linear_classifier_score, train_linear_classifier
    from pyspark.sql import functions as F

    # positives talk about cats, negatives about bolts — trivially separable
    rows = [(i, "the fluffy cat sat on the warm mat purring softly", 1) for i in range(20)]
    rows += [(i + 20, "torque the hex bolt with a steel wrench firmly", 0) for i in range(20)]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], ["doc_id", "text"])
    labels = spark.createDataFrame([(i, y) for i, _, y in rows], ["doc_id", "label"])
    w, b = train_linear_classifier(df, labels, n_buckets=64, n_iters=40, lr=8.0)
    scored = {r["doc_id"]: r["score"] for r in linear_classifier_score(df, w, b).collect()}
    pos = [scored[i] for i in range(20)]
    neg = [scored[i + 20] for i in range(20)]
    assert min(pos) > 0.7 and max(neg) < 0.3
