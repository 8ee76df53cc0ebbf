"""Training-export operators: sequence packing and deterministic sharding.

The last mile of a 100 TB pretraining pipeline — after dedup (dedup.py),
scoring (text.py) and curation (curation.py), the surviving corpus has to
become fixed-budget training sequences laid out in shards a data loader
can stream:

  pack_concat_windows   GPT-style concat-and-chunk packing: documents are
                        concatenated in a deterministic per-shard order
                        and sliced at token-budget boundaries; a document
                        that straddles a boundary spans both windows (the
                        standard causal-LM packing — no padding waste,
                        attention masks handle the seams).
  shard_order           deterministic global shuffle: every doc gets a
                        (shard, pos) address from a salted md5, so the
                        training order is reproducible bit-for-bit across
                        re-runs, retries and topology changes — the
                        property `df.orderBy(rand())` cannot give.

Scale posture: both operators shuffle ONCE on the shard key (n_shards is
sized to the cluster, so shards are the unit of write parallelism) and do
all per-shard work inside a window over that same partitioning — the sort
rides the shuffle's spill machinery, nothing is ever collected. Window
indices, spans and token offsets are pure columnar expressions; there is
no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cm_well_spark.operators.text import whitespace_token_count


def _salted_md5(id_col: str, salt: str) -> Column:
    return F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))


def pack_concat_windows(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document its context-window spans under concat-and-
    chunk packing. Per shard, documents are concatenated in id order; the
    token stream is cut every `budget` tokens; a document occupying
    stream offsets [start, end) appears in each window it overlaps, with
    `win_tokens` of its tokens in that window.

    Output: (doc_id, shard, window, win_tokens, start_off) — start_off is
    the document's offset inside its first window (0 for docs that begin
    a window), so a loader can reconstruct the exact byte layout.

    Sharding is round-robin on the id (deterministic and balanced for
    arbitrary id spaces; swap in a salted-hash shard for adversarial id
    distributions — shard_order shows the md5 recipe). The cumulative
    offset is one window function over the shard partitioning; the spans
    explode via `sequence`, so a 100 TB corpus packs in a single shuffle
    + per-partition sort with map-side everything else."""
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    tok = whitespace_token_count(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        tok.alias("__tok"),
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    end = F.sum("__tok").over(w)
    start = (end - F.col("__tok")).cast("long")
    spans = base.select(
        id_col,
        "shard",
        "__tok",
        start.alias("__start"),
        end.cast("long").alias("__end"),
    )
    first_w = (F.col("__start") / budget).cast("long")
    last_w = ((F.col("__end") - 1) / budget).cast("long")
    out = spans.select(
        id_col,
        "shard",
        "__start",
        "__end",
        F.explode(F.sequence(first_w, last_w)).alias("window"),
    )
    win_lo = F.col("window") * budget
    win_hi = win_lo + budget
    return out.select(
        id_col,
        "shard",
        "window",
        (F.least(F.col("__end"), win_hi) - F.greatest(F.col("__start"), win_lo))
        .cast("int")
        .alias("win_tokens"),
        F.greatest(F.col("__start") - win_lo, F.lit(0)).cast("int").alias("start_off"),
    )


def shard_order(
    docs: DataFrame,
    n_shards: int = 4,
    id_col: str = "doc_id",
    salt: str = "cmw",
) -> DataFrame:
    """Deterministic global shuffle for training export: (doc_id, shard,
    pos). The salted md5 hex is the shuffle key — shard from its leading
    byte (lexicographic bucketing of a uniform hash), position from its
    rank within the shard. Changing `salt` is a fresh epoch permutation;
    the same salt reproduces the same order on any cluster topology.

    One shuffle on `shard`, rank via row_number over the per-shard sort.
    The md5 prefix comparison trick (fixed-width lowercase hex compares
    lexicographically == numerically) keeps the whole recipe portable to
    any ANSI-SQL engine, so the layout can be audited outside Spark."""
    if n_shards <= 0 or n_shards > 256:
        raise ValueError("n_shards must be in 1..256")
    h = _salted_md5(id_col, salt)
    # leading md5 byte -> shard: equal-width hex ranges, no int parsing
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    shard = (bucket * n_shards / 256).cast("int")
    w = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        docs.select(F.col(id_col), h.alias("__h"), shard.alias("shard"))
        .select(id_col, "shard", F.row_number().over(w).alias("pos"))
    )


def packing_stats(
    docs: DataFrame,
    context_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pre-packing corpus accounting — the numbers a training-export run
    is sized from, as ONE row: doc/token totals, exact token-count
    percentiles (p50/p90/max), the padding-waste fraction a naive
    one-doc-per-sequence layout would pay at `context_len`, and the
    concat-packed sequence lower bound pack_concat_windows achieves.

    Shape at 100 TB: a single aggregate with map-side partial combine;
    token counts are the whitespace tokenizer (one columnar expression).
    Exact percentiles over doc counts are a sort-based agg — at real
    scale swap percentile() for approx_percentile() (t-digest, one pass)
    with no other plan change; kept exact here so the oracle replays
    bit-for-bit."""
    n = whitespace_token_count(F.col(text_col))
    per_doc = docs.select(F.col(id_col), n.alias("n_tok"))
    ctx = F.lit(context_len)
    padded = F.ceil(F.col("n_tok") / ctx) * ctx
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.expr("percentile(n_tok, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n_tok, 0.9)").alias("p90_tokens"),
        F.max("n_tok").alias("max_tokens"),
        # an all-empty corpus pads to 0 total: waste 0, not an ANSI error
        F.round(
            F.when(
                F.sum(padded) > 0, (F.sum(padded) - F.sum("n_tok")) / F.sum(padded)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pad_waste_frac_unpacked"),
        F.ceil(F.sum("n_tok") / ctx).alias("n_seqs_packed"),
        F.sum(F.ceil(F.col("n_tok") / ctx)).alias("n_seqs_unpacked"),
    )


def pack_bins_ffd(
    docs: DataFrame,
    context_len: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "ffd",
) -> DataFrame:
    """First-fit-decreasing bin packing: assign each document to a bin of
    capacity `context_len` tokens WITHOUT splitting documents — the
    padding-minimizing alternative to pack_concat_windows when sequences
    must not cross document boundaries (instruction tuning, contrastive
    batches, anything where cross-doc attention is wrong). FFD is the
    classic 11/9-OPT+6/9 guarantee heuristic (Johnson 1973).

    Output: (id_col, bucket, bin_id, n_tok). `bin_id` is per-bucket;
    (bucket, bin_id) is the global bin key. Documents longer than
    context_len get bin_id -1 (bucket -1): the caller decides to
    truncate or split upstream — silently dropping them would misreport
    packing efficiency.

    Shape at 100 TB: bin packing is inherently sequential, so the
    parallel form is salted-bucket FFD — a deterministic md5 bucket
    splits the corpus into n_buckets independent streams (size the
    bucket count so each holds ~10-100k docs), each packed by one
    applyInPandas group in Arrow batches. One shuffle on the bucket key;
    per-bucket state is just the open-bin fill array (<= docs/bin-size
    entries). Against a global FFD this costs a bounded efficiency loss
    (each bucket wastes at most one partial bin per open tail) and buys
    full cluster parallelism + bit-for-bit reproducibility under any
    topology (the salted order is data-derived, not partition-derived).
    Not SQL-replayable (sequential bin state) — pytest pins parity with
    a pure-Python FFD, the capacity invariant, and determinism."""
    import pandas as pd

    if context_len <= 0:
        raise ValueError("context_len must be positive")
    base = docs.select(
        F.col(id_col).alias("id"),
        whitespace_token_count(F.col(text_col)).alias("n_tok"),
        _salted_md5(id_col, salt).alias("rk"),
    )
    bucket = F.conv(F.substring("rk", 1, 8), 16, 10).cast("long") % n_buckets
    fit = base.where(F.col("n_tok") <= context_len).withColumn("bucket", bucket)
    over = base.where(F.col("n_tok") > context_len).select(
        F.col("id").alias(id_col),
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(-1).cast("long").alias("bin_id"),
        F.col("n_tok"),
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tok", "rk"], ascending=[False, True])
        fills: list[int] = []
        assigned: list[int] = []
        for n in pdf["n_tok"].to_numpy():
            for j, f in enumerate(fills):
                if f + n <= context_len:
                    fills[j] = f + n
                    assigned.append(j)
                    break
            else:
                fills.append(int(n))
                assigned.append(len(fills) - 1)
        return pd.DataFrame(
            {
                id_col: pdf["id"].to_numpy(),
                "bucket": pdf["bucket"].to_numpy(),
                "bin_id": assigned,
                "n_tok": pdf["n_tok"].to_numpy(),
            }
        )

    packed = fit.groupBy("bucket").applyInPandas(
        ffd, schema=f"{id_col} long, bucket long, bin_id long, n_tok long"
    )
    return packed.unionByName(over)


def fim_transform(
    docs: DataFrame,
    fim_rate: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "fim",
    sentinels: tuple[str, str, str] = ("<PRE>", "<MID>", "<SUF>"),
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022): rewrite
    a `fim_rate` fraction of documents into PSM order —
    `<PRE> prefix <SUF> suffix <MID> middle` — so a causal LM learns
    infilling for free; the rest pass through untouched. The standard
    code-model pretraining preprocessing step.

    All randomness derives from salted md5 of the doc id (the gate draw
    and both character split points), so the transformed corpus is
    bit-for-bit reproducible across partitionings, retries and engines —
    the whole rewrite is string algebra on the scan (one projection, no
    shuffle, no Python) and the oracle replays it exactly.

    Output: (id_col, fim_applied, text)."""
    if not (0.0 <= fim_rate <= 1.0):
        raise ValueError("fim_rate must be in [0, 1]")

    def u(tag: str) -> "F.Column":
        h = F.md5(F.concat_ws(":", F.lit(salt), F.lit(tag), F.col(id_col).cast("string")))
        return (
            F.conv(F.substring(h, 1, 12), 16, 10).cast("double") + 0.5
        ) / F.lit(float(16**12) + 1.0)

    c = F.col(text_col)
    n = F.length(c)
    gate = (u("gate") < F.lit(float(fim_rate))) & (n >= 3)
    # two split points 1 <= p1 <= p2 <= n-1 (both cuts strictly inside)
    r1 = (u("p1") * (n - 1)).cast("int") + 1
    r2 = (u("p2") * (n - 1)).cast("int") + 1
    p1, p2 = F.least(r1, r2), F.greatest(r1, r2)
    pre = F.substring(c, F.lit(1), p1)
    mid = c.substr(p1 + 1, p2 - p1)
    suf = c.substr(p2 + 1, n - p2)
    s_pre, s_mid, s_suf = (F.lit(x) for x in sentinels)
    psm = F.concat(s_pre, pre, s_suf, suf, s_mid, mid)
    return docs.select(
        F.col(id_col),
        gate.alias("fim_applied"),
        F.when(gate, psm).otherwise(c).alias(text_col),
    )


def span_corruption(
    docs: DataFrame,
    rate: float = 0.15,
    span_len: int = 3,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "t5",
) -> DataFrame:
    """T5-style span-corruption example builder (Raffel et al. 2020):
    (id, inputs, targets) where masked spans become <extra_id_k>
    sentinels in `inputs` and `targets` lists each sentinel + its
    original tokens, closed by a final sentinel — the denoising
    objective's preprocessing, as a corpus transform.

    Deterministic, shuffle-free variant: span START CANDIDATES sit at
    every `stride`-th token; candidate c of a doc is gated in by a
    salted-md5 draw at probability rate*stride/span_len (so the expected
    masked-token fraction is `rate`), and spans are span_len tokens.
    stride > span_len makes spans non-overlapping BY CONSTRUCTION, which
    is what keeps sentinel numbering a pure columnar rank (count of
    gated candidates before mine) instead of a sequential merge — the
    whole example builder is one projection of array algebra on the
    scan, reproducible across partitionings/retries/engines, and the
    oracle replays it token for token. (T5's sampler merges random-
    length spans; the fixed-grid variant trades that freedom for
    engine-replayability — the objective is unchanged.)"""
    if not 0 < span_len < stride:
        raise ValueError("need 0 < span_len < stride")
    p_gate = min(1.0, rate * stride / span_len)
    from cm_well_spark.operators.curation import _rate_hex

    thr = _rate_hex(p_gate)
    gate = lambda c: (  # noqa: E731
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"), c.cast("string"))),
            1,
            4,
        )
        < F.lit(thr)
    )
    sent = lambda k: F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))  # noqa: E731
    # O(tokens + candidates) reconstruction (VERDICT r8 item 2; replaces
    # an exists() over cands per token — O(n * n/stride) on unchunked
    # docs): spans are non-overlapping grid cells, so `inputs` is the
    # head before the first gated span, then per gated candidate k a
    # sentinel plus the tokens from its span end to the NEXT gated
    # span's start (array lookups, no scans), flattened. The index-aware
    # transform lambda supplies sentinel ranks directly — cands is
    # ascending, so rank = position. The token and candidate arrays are
    # MATERIALIZED as columns in stacked projections first: as inline
    # expressions, every reference inside a lambda body re-evaluates its
    # whole defining expression PER ELEMENT (Catalyst doesn't CSE across
    # lambda scopes — size(split(text)) inside the candidate gate alone
    # re-split the document once per candidate), which is exactly the
    # quadratic blowup being removed. Multi-referenced non-cheap columns
    # are not re-inlined by CollapseProject, so this stays one narrow
    # scan-riding stage; semantics are token-for-token identical to the
    # per-token form (same oracle entries).
    step = docs.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__w"))
    wc = F.col("__w")
    nt = F.size(wc)
    n_cands = F.ceil(nt / F.lit(stride)).cast("int")
    base = step.select(
        F.col(id_col),
        wc,
        F.filter(
            F.sequence(F.lit(0), n_cands - 1), lambda c: gate(c) & (c * stride < nt)
        ).alias("__cands"),
    )
    cands = F.col("__cands")
    n_sel = F.size(cands)
    first_start = F.when(n_sel > 0, F.element_at(cands, 1) * stride).otherwise(nt)
    head = F.slice(wc, 1, first_start)
    seg_end = lambda k: (  # noqa: E731  # exclusive end of the gap after span k
        F.when(k + 1 < n_sel, F.element_at(cands, k + 2) * stride).otherwise(nt)
    )
    parts = F.transform(
        cands,
        lambda c, k: F.concat(
            F.array(sent(k)),
            F.slice(
                wc,
                c * stride + span_len + 1,
                F.greatest(seg_end(k) - c * stride - span_len, F.lit(0)),
            ),
        ),
    )
    # empty tokens (doubled spaces in the source) are dropped, exactly
    # as the per-token form's t != "" filter did
    in_toks = F.filter(F.flatten(F.concat(F.array(head), parts)), lambda t: t != "")
    tgt_parts = F.transform(
        cands,
        lambda c, k: F.concat(
            sent(k),
            F.lit(" "),
            F.array_join(F.slice(wc, c * stride + 1, span_len), " "),
        ),
    )
    # final sentinel appended INTO the array, one join — avoids the
    # leading-space asymmetry of concat_ws over an empty parts string
    targets = F.array_join(F.concat(tgt_parts, F.array(sent(n_sel))), " ")
    return base.select(
        F.col(id_col),
        F.array_join(in_toks, " ").alias("inputs"),
        targets.alias("targets"),
    )


def ul2_mixture(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "ul2",
) -> DataFrame:
    """UL2 mixture-of-denoisers preprocessing (Tay et al. 2022) ->
    (id, denoiser, inputs, targets): each document is md5-assigned one
    of the three objectives —

      R  regular span corruption (rate .15, 3-token spans, stride 8)
      X  extreme span corruption (rate .5, 8-token spans, stride 16 —
         the gate saturates, so every grid span masks: 50% of tokens)
      S  sequential / prefix-LM (split at an md5-drawn word boundary;
         inputs = prefix + <extra_id_0>, targets = <extra_id_0> +
         suffix + <extra_id_1>)

    Assignment thresholds are fixed hex-prefix compares (< 0x5555 -> R,
    < 0xaaaa -> X, else S: thirds), each branch reuses the deterministic
    span_corruption machinery with its own salt, and the S split builds
    both strings by array concatenation (no concat_ws empty-part
    asymmetry) — the whole mixture is a three-way union of scan
    projections, engine-replayable end to end."""
    h4 = F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 4)
    r_docs = docs.where(h4 < "5555")
    x_docs = docs.where((h4 >= "5555") & (h4 < "aaaa"))
    s_docs = docs.where(h4 >= "aaaa")

    r = span_corruption(
        r_docs, rate=0.15, span_len=3, stride=8, text_col=text_col, id_col=id_col, salt=salt + "r"
    ).select(id_col, F.lit("R").alias("denoiser"), "inputs", "targets")
    x = span_corruption(
        x_docs, rate=0.5, span_len=8, stride=16, text_col=text_col, id_col=id_col, salt=salt + "x"
    ).select(id_col, F.lit("X").alias("denoiser"), "inputs", "targets")

    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(salt + "s"), F.col(id_col).cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(16**12) + 1.0)
    p = F.floor(u * (n - 1)).cast("int") + 1  # 1..n-1 word boundary
    s0, s1 = F.lit("<extra_id_0>"), F.lit("<extra_id_1>")
    s = s_docs.select(
        F.col(id_col),
        F.lit("S").alias("denoiser"),
        F.array_join(F.concat(F.slice(w, 1, p), F.array(s0)), " ").alias("inputs"),
        F.array_join(
            F.concat(F.array(s0), F.slice(w, p + 1, F.greatest(n - p, F.lit(0))), F.array(s1)), " "
        ).alias("targets"),
    )
    return r.unionByName(x).unionByName(s)
