"""Benchmark harness — times the BASELINE core queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE compact JSON line to stdout.

Harness contract (VERDICT r9 item 1 — the r7-r9 bench artifacts were lost):
the driver keeps only the last ~2000 bytes of output and parses the JSON
line out of that tail, and it enforces a wall-clock budget. Therefore:

  * stdout carries EXACTLY ONE line — the compact core JSON (< ~1.5 KB).
    All progress chatter goes to stderr; full detail (per-sample data,
    adjudications, extended/sf1 blocks) goes to BENCH_LOCAL.json.
  * the default run is the fixed BASELINE core (B1-B8 + one representative
    per pipeline family, <=25 queries) budgeted well under 8 min wall
    including cold ingest.
  * the extended rotating-family block and the sf1 scale-evidence block
    run only with CMW_BENCH_EXTENDED=1 and write to BENCH_EXTENDED.json,
    never stdout.

Ingest (lakehouse materialization) is timed separately as `ingest`; query
timings are on the materialized store, mirroring the reference's
write-then-index-then-query architecture (SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _gate_threshold() -> float:
    cores = os.cpu_count() or 32
    return float(os.environ.get("CMW_BENCH_LOAD_GATE", str(max(4.0, cores / 4.0))))


def _cpu_times() -> list[int] | None:
    """First /proc/stat line (user nice sys idle iowait irq softirq steal...).
    Steal is the contention loadavg cannot see: hypervisor CPU time taken
    from this VM by other tenants (r11 — measured 11-25% during a 'quiet'
    loadavg<2 window, inflating sf1 samples 2-4x)."""
    try:
        return list(map(int, open("/proc/stat").readline().split()[1:]))
    except (OSError, ValueError):
        return None


def _steal_pct(before: list[int] | None, after: list[int] | None) -> float | None:
    """% of total CPU time stolen between the two samples."""
    if not before or not after or len(before) < 8 or len(after) < 8:
        return None
    d = [y - x for x, y in zip(before, after)]
    total = sum(d)
    return round(100.0 * d[7] / total, 1) if total > 0 else None


def _load_gate(max_wait: float | None = None) -> tuple[float, float, bool]:
    """Contention gate (VERDICT r8 item 1): rounds 4-8 recorded phantom
    regressions because the canonical bench ran under external CPU steal.
    Before sampling, if the 1-min loadavg exceeds ~cores/4, sleep-retry up
    to CMW_BENCH_LOAD_WAIT_SEC (default 120 s — lowered from 240 in r10 to
    protect the driver's wall budget); if the host is STILL contended,
    return contended=True so the artifact carries the flag and adjudicates
    itself. Returns (loadavg_at_gate, waited_sec, contended)."""
    threshold = _gate_threshold()
    if max_wait is None:
        max_wait = float(os.environ.get("CMW_BENCH_LOAD_WAIT_SEC", "120"))
    waited = 0.0
    load1 = os.getloadavg()[0]
    while load1 > threshold and waited < max_wait:
        step = min(20.0, max_wait - waited)
        print(
            f"# load gate: 1-min loadavg {load1:.1f} > {threshold:.1f}, "
            f"waiting {step:.0f}s ({waited:.0f}/{max_wait:.0f})",
            file=sys.stderr,
        )
        time.sleep(step)
        waited += step
        load1 = os.getloadavg()[0]
    return load1, waited, load1 > threshold


# Fixed BASELINE core — one row per BASELINE.md class plus one representative
# per pipeline family, chosen for distinct plan shapes. This list is the
# driver's canonical perf record; it must stay <=25 entries so the JSON line
# fits the driver's 2000-byte tail (the r7/r8 parse failures were a too-long
# line). Grow EXTENDED_QUERIES instead.
CORE_QUERIES = [
    "read_point",             # B1 point read
    "search_equals",          # B2 qp search
    "search_sort_page",       # B2 sort + page
    "search_contains",        # B2 analyzed contains
    "agg_term",               # B3
    "agg_stats",              # B3
    "agg_hist",               # B3
    "agg_card_exact",         # B3
    "agg_sig_terms",          # B3 (doc-route JLH)
    "xg_two_levels",          # B4 expand-out
    "yg_reverse",             # B5 expand-in
    "sparql_bgp_join",        # B6
    "sparql_graph_revenue",   # B6 heaviest multi-join BGP
    "consume_first_chunk",    # B7 change-feed chunk
    "merge_writer_current",   # write-path merge/versioning
    "dedup_exact_groups",     # pipeline: exact dedup
    "dedup_minhash_lsh",      # pipeline: banded-LSH near-dup
    "similarity_topk_cosine", # pipeline: ANN baseline
    "similarity_knn_graph",   # pipeline: data-scale ANN self-join
    "text_token_counts",      # pipeline: text analysis scan
    "curation_gopher_rules",  # pipeline: scan-riding quality rules
    "pack_windows",           # pipeline: training export packing
    "graph_pagerank",         # pipeline: iterated join+agg
    "events_asof_latest_order",  # temporal one-shuffle as-of join
    "multimodal_decode",      # pipeline: Arrow-batched decode
]

# Rotating/extended block — everything else worth tracking, run only with
# CMW_BENCH_EXTENDED=1; results go to BENCH_EXTENDED.json (never stdout).
EXTENDED_QUERIES = [
    "search_range_num",
    "xg_expand_out",
    "gqp_semi_filter",
    "gqp_two_hop",
    "sparql_optional",
    "sparql_path_seq",
    "sparql_exists",
    "sparql_subquery",
    "sparql_graph_var",
    "sparql_path_plus_deep",
    "sparql_sum_expr_revenue",
    "curation_repetition_signals",
    "bulk_consume_range",
    "dedup_cluster_components",
    "curation_stratified_sample",
    "curation_contamination",
    "curation_quality_filter",
    "embedding_semantic_dedup",
    "sp_paths_sparql",
    "curation_boilerplate_removal",
    "dedup_incremental_batch",
    "graph_sample_neighborhood",
    "dedup_incremental_bloom",
    "curation_classifier_score",
    "similarity_hard_negatives",
    "dedup_corpus_overlap",
    "text_script_profile",
    "agg_heavy_hitters",
    "dedup_span_removal",
    "curation_snapshot_diff",
    "graph_triangles",
    "graph_label_propagation",
    "similarity_mmr_select",
    "graph_connected_components",
    "graph_kcore",
    "graph_bfs_distances",
    "text_readability",
    "curation_decontaminate",
    "dedup_knn_components",
    "events_trending_topk",
    "events_anomaly_zscore",
    "events_funnel",
    "graph_link_prediction",
    "er_fuzzy_name_pairs",
    "agg_association_rules",
    "events_markov_transitions",
    "events_rolling_trail",
    "events_ohlc_daily",
    "agg_rollup_orders",
    "agg_rfm_segments",
    "temporal_scd2_orders",
    "graph_clustering_coefficient",
    "events_sessionize",
    "events_active_users",
    "graph_shortest_paths",
    "events_resample_ffill",
]

SF1_QUERIES = [
    "read_point",
    "search_equals",
    "search_sort_page",
    "agg_term",
    "agg_stats",
    "xg_expand_out",
    "yg_reverse",
    "sparql_bgp_join",
    "sparql_graph_revenue",
    "consume_first_chunk",
    "dedup_exact_groups",
    "similarity_topk_cosine",
    "pack_windows",
    "events_asof_latest_order",
    "dedup_minhash_lsh",
    "dedup_line_level",
    "curation_gopher_rules",
    "dedup_incremental_batch",
    "graph_pagerank",
    "graph_sample_neighborhood",
    "similarity_hard_negatives",
    "dedup_corpus_overlap",
    "graph_triangles",
    "graph_label_propagation",
    "agg_heavy_hitters",
    "dedup_span_removal",
    "graph_bfs_distances",
    "er_fuzzy_name_pairs",
    "agg_association_rules",
    "events_rolling_trail",
    "agg_rollup_orders",
    "temporal_scd2_orders",
]


def _time_queries(spark, sf_dir, qs, names, samples, *, min_flag_sec=0.2, tag=""):
    """min-of-N sampling with sample-spread flagging (VERDICT r8 item 1).

    BASELINE.md targets are WARM numbers; on a contended host any single
    sample can be 5-30x the warm cost (the r4 adjudication traced a phantom
    35x "regression" to host CPU steal), so every query takes min-of-N.
    Budget trim (r10): after two samples within 1.25x of each other the
    remaining draws are skipped — steady samples don't need a third. When a
    query's worst sample exceeds 2.5x its best, the environment was noisy
    DURING that query; those re-sample once at the end of the run (the tail
    usually lands in a quieter slice) and keep the min."""
    timings: dict[str, float] = {}
    flagged: list[str] = []
    for name in names:
        if name not in qs:
            continue
        fn = qs[name]
        best, worst, n = float("inf"), 0.0, 0
        for i in range(max(1, samples)):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best, worst = min(best, dt), max(worst, dt)
            if i >= 1 and worst <= 1.25 * best:
                break
        timings[name] = round(best, 3)
        if best > min_flag_sec and worst > 2.5 * best:
            flagged.append(name)
        print(f"# {tag}{name}: {n} rows in {timings[name]}s", file=sys.stderr)
    rerun: dict[str, float] = {}
    for name in flagged:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        rerun[name] = round(dt, 3)
        if dt < timings[name]:
            timings[name] = round(dt, 3)
        print(f"# rerun {tag}{name}: {rerun[name]}s (kept {timings[name]}s)", file=sys.stderr)
    return timings, rerun


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("CMW_CACHE", "1")  # warm-store mode (BASELINE targets are warm)
    gate_load, gate_waited, contended = _load_gate()
    from cm_well_spark.model.lakehouse import load_infotons, load_triples, materialize
    from cm_well_spark.registry import queries
    from cm_well_spark.session import get_spark

    spark = get_spark("cm_well_bench")

    # Cold ingest is a BASELINE class (B8): force-rebuild the store so
    # ingest_sec is a real measurement every round, not a cache hit, and
    # the store always matches current builder code. CMW_BENCH_COLD=0
    # reuses a warm store (ingest_sec then reads ~0). min-of-2 by default
    # (r10): the single-sample B8 record swung 57-105 s on this host with
    # identical code purely from CPU steal — the same adjudication the
    # judge had to do by hand in r7 and r9; a second rebuild is cheap
    # against the wall budget and self-corrects the record.
    force = os.environ.get("CMW_BENCH_COLD", "1") != "0"
    ingest_samples = int(os.environ.get("CMW_BENCH_INGEST_SAMPLES", "2")) if force else 1
    ingest_s = float("inf")
    for _ in range(max(1, ingest_samples)):
        t0 = time.time()
        materialize(spark, sf_dir, force=force)
        ingest_s = min(ingest_s, time.time() - t0)
    # loadavg right after the ingest phase: a B8 reading taken under
    # external steal self-diagnoses here even when the start gate passed.
    # r11 (VERDICT item 2): if the load CROSSED the gate during ingest, the
    # min-of-N samples all ran under steal — re-gate (short wait) and take
    # one more sample so the B8 record reflects capability, not load.
    load_after_ingest = os.getloadavg()[0]
    ingest_resampled = False
    if force and load_after_ingest > _gate_threshold():
        _load_gate(max_wait=60.0)
        t0 = time.time()
        materialize(spark, sf_dir, force=True)
        ingest_s = min(ingest_s, time.time() - t0)
        load_after_ingest = os.getloadavg()[0]
        ingest_resampled = True
        print(f"# ingest re-sampled after load spike: {ingest_s:.1f}s best", file=sys.stderr)

    t0 = time.time()
    n_infotons = load_infotons(spark, sf_dir).count()
    load_triples(spark, sf_dir).count()
    warm_s = time.time() - t0

    qs = queries()
    bench_names = os.environ.get("CMW_BENCH_QUERIES")
    if bench_names == "all":
        names = list(qs)
    elif bench_names:
        names = bench_names.split(",")
    else:
        names = CORE_QUERIES
    samples = int(os.environ.get("CMW_BENCH_SAMPLES", "3"))
    cpu0 = _cpu_times()
    timings, rerun = _time_queries(spark, sf_dir, qs, names, samples)
    core_steal = _steal_pct(cpu0, _cpu_times())

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": dict(timings),
        "ingest_sec": round(ingest_s, 3),
        "ingest_rows": n_infotons,
        "ingest_rows_per_sec": round(n_infotons / ingest_s) if ingest_s > 1 else None,
        "warmup_sec": round(warm_s, 3),
        # host 1/5/15-min load averages: makes the record self-diagnosing
        # under external CPU steal (the r4 phantom-regression signature).
        # contended=true means the start gate waited load_wait_sec and the
        # 1-min loadavg was STILL above the gate — treat inflated entries
        # as environment, not regression.
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "contended": contended,
        "loadavg_at_gate": round(gate_load, 2),
        "loadavg_after_ingest": round(load_after_ingest, 2),
        "ingest_resampled": ingest_resampled,
        # hypervisor CPU steal during the query block: >~5% means the
        # samples ran on a throttled VM and inflated entries are
        # environment, not regression (loadavg cannot show this)
        "steal_pct": core_steal,
        "load_wait_sec": round(gate_waited, 1),
        "flagged_reruns": rerun,
        "sf": sf_val,
    }

    # The canonical record: exactly ONE compact stdout line, small enough
    # to survive the driver's 2000-byte tail window. Everything else goes
    # to stderr or files.
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1800:
        # never let the canonical line outgrow the tail window again:
        # drop diagnostics first, then spill excess query timings to the
        # local file (kept whole there)
        for k in ("flagged_reruns", "loadavg_at_gate", "loadavg_after_ingest",
                  "ingest_resampled", "steal_pct", "load_wait_sec"):
            out.pop(k, None)
        while len(json.dumps(out, separators=(",", ":"))) > 1800 and out["queries"]:
            out["queries"].pop(next(iter(out["queries"])))
        line = json.dumps(out, separators=(",", ":"))
    print(line)
    sys.stdout.flush()

    detail = dict(out)
    detail["queries"] = timings
    detail["flagged_reruns"] = rerun
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    if os.environ.get("CMW_BENCH_EXTENDED", "0") != "1":
        return

    # ---- extended block (opt-in, file-only output) ----------------------
    # r11 (VERDICT item 1): the r10 sf1 numbers were contention-poisoned
    # (loadavg 13-18.5) — re-run the gate BEFORE each block and stamp
    # per-block loadavg/contended so every block self-adjudicates.
    ext: dict[str, object] = {}
    ext_gate_load, ext_waited, ext_contended = _load_gate()
    ext["loadavg_at_gate"] = round(ext_gate_load, 2)
    ext["contended"] = ext_contended
    ext_cpu0 = _cpu_times()
    ext_timings, ext_rerun = _time_queries(
        spark, sf_dir, qs, EXTENDED_QUERIES, samples, tag="ext "
    )
    ext["steal_pct"] = _steal_pct(ext_cpu0, _cpu_times())
    ext["queries"] = ext_timings
    ext["flagged_reruns"] = ext_rerun
    ext["total_sec"] = round(sum(ext_timings.values()), 3)
    ext["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]

    # sf1 scale-evidence block (VERDICT r5 item 7): if the generated sf1
    # dataset exists (tools/gen_sf1.py, ~8.9M infotons), run a compact
    # subset LIVE against its materialized store — this exercises the
    # route-choice thresholds (indexed-agg cutoff, broadcast caps,
    # index-vs-doc qp route) on the other side of their cutoffs. The
    # store build is fingerprint-cached, so the per-run cost is queries
    # only. Set CMW_BENCH_SF1=0 to skip.
    sf1_dir = os.environ.get("CMW_BENCH_SF1_DIR", "/root/repo/.sfgen/sf1")
    if os.environ.get("CMW_BENCH_SF1", "1") != "0" and os.path.isdir(sf1_dir):
        t0 = time.time()
        materialize(spark, sf1_dir)
        sf1_ingest = time.time() - t0
        # warm the sf1 store like the sf0.1 block: BASELINE numbers are
        # WARM by convention, and with CMW_CACHE=1 the first query to
        # touch the 98M-row triples table otherwise pays the whole
        # in-memory materialization inside ITS timing (r10: a 0.6s
        # partition-pruned agg recorded 31s that way)
        t0 = time.time()
        load_infotons(spark, sf1_dir).count()
        load_triples(spark, sf1_dir).count()
        sf1_warm = time.time() - t0
        # per-block gate AFTER the sf1 ingest+warm completes (VERDICT r10
        # item 1): the ingest itself raises the loadavg, so gating here —
        # not at process start — is what makes the sf1 query timings
        # usable as regression evidence.
        sf1_gate_load, sf1_waited, sf1_contended = _load_gate()
        sf1_cpu0 = _cpu_times()
        # sf1 queries run 3-10x their sf0.1 cost; cap at 2 samples so the
        # scale block never dominates the wall
        sf1_timings, sf1_rerun = _time_queries(
            spark, sf1_dir, qs, SF1_QUERIES, min(max(1, samples), 2),
            min_flag_sec=0.5, tag="sf1 ",
        )
        ext["sf1"] = {
            "sf": 1.0,
            "queries": sf1_timings,
            "total_sec": round(sum(sf1_timings.values()), 3),
            # >0 only on the run that (re)builds the store
            "ingest_sec": round(sf1_ingest, 3),
            "warmup_sec": round(sf1_warm, 3),
            "loadavg_at_gate": round(sf1_gate_load, 2),
            "contended": sf1_contended,
            "steal_pct": _steal_pct(sf1_cpu0, _cpu_times()),
            "load_wait_sec": round(sf1_waited, 1),
            "loadavg": [round(x, 2) for x in os.getloadavg()],
            "flagged_reruns": sf1_rerun,
        }

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTENDED.json"), "w") as f:
        json.dump(ext, f, indent=1)
    print(f"# extended block written to BENCH_EXTENDED.json", file=sys.stderr)


if __name__ == "__main__":
    main()
