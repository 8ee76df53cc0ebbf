"""Harness-level contracts: the bench contention gate and the rotating
correctness-gate window (r9, VERDICT r8 items 1 and 6). These pin driver
-facing behavior that no operator test covers."""

import importlib.util
import os

import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_load_gate_waits_then_flags(monkeypatch):
    """Contended host: the gate sleeps in steps up to the budget, then
    returns contended=True without ever running a query."""
    bench = _load_bench()
    monkeypatch.setenv("CMW_BENCH_LOAD_GATE", "4.0")
    monkeypatch.setenv("CMW_BENCH_LOAD_WAIT_SEC", "45")
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (99.0, 0, 0))
    load, waited, contended = bench._load_gate()
    assert contended and load == 99.0 and waited == 45.0
    assert sleeps == [20.0, 20.0, 5.0]  # 20s steps, clipped to the budget


def test_bench_load_gate_passes_quiet_host(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv("CMW_BENCH_LOAD_GATE", "4.0")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (1.0, 0, 0))
    load, waited, contended = bench._load_gate()
    assert not contended and waited == 0.0 and load == 1.0


def test_bench_load_gate_recovers_mid_wait(monkeypatch):
    """Load drops below the gate during the wait: return immediately,
    not contended, with the elapsed wait recorded."""
    bench = _load_bench()
    monkeypatch.setenv("CMW_BENCH_LOAD_GATE", "4.0")
    monkeypatch.setenv("CMW_BENCH_LOAD_WAIT_SEC", "300")
    readings = iter([9.0, 9.0, 2.0])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(readings), 0, 0))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    load, waited, contended = bench._load_gate()
    assert not contended and load == 2.0 and waited == 40.0


def test_gate_window_rotation_contract(monkeypatch):
    """queries(): sentinels pinned first, every registry entry present
    exactly once, deterministic for a fixed round counter, and the
    window actually MOVES when the round counter advances."""
    from cm_well_spark import registry
    from cm_well_spark.registry import _core

    monkeypatch.setattr(_core, "_gate_rotation", lambda: 8)
    w8 = list(registry.queries())
    assert w8[:2] == ["read_point", "merge_writer_current"]
    assert sorted(w8) == sorted(registry.QUERIES)
    assert w8 == list(registry.queries())  # deterministic

    monkeypatch.setattr(_core, "_gate_rotation", lambda: 9)
    w9 = list(registry.queries())
    assert w9[:2] == ["read_point", "merge_writer_current"]
    assert sorted(w9) == sorted(registry.QUERIES)
    # the 50-entry driver window samples a different slice next round
    assert set(w8[2:50]) != set(w9[2:50])
    # and spans many operator families in both rounds
    for w in (w8, w9):
        fams = {n.split("_", 1)[0] for n in w[:50]}
        assert len(fams) >= 20, sorted(fams)


@pytest.mark.parametrize("seed", [1, 2])
def test_span_corruption_random_params_reconstruct(spark, seed):
    """r9 property pin for the O(1)-per-token rewrite: under random
    (rate, span_len, stride) the example must always reconstruct —
    sentinels numbered 0..k in order, masked spans splice back into
    inputs to reproduce the original token stream."""
    import random
    import re

    from cm_well_spark.operators.packing import span_corruption

    rng = random.Random(seed)
    docs = []
    for d in range(6):
        n = rng.choice([0, 1, 2, 7, 40, 300])
        docs.append((d, " ".join(f"w{d}x{i}" for i in range(n))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for _ in range(3):
        stride = rng.randrange(3, 12)
        span_len = rng.randrange(1, stride)
        rate = rng.choice([0.05, 0.15, 0.5, 1.0])
        out = {r["doc_id"]: r for r in
               span_corruption(df, rate=rate, span_len=span_len, stride=stride).collect()}
        for d, text in docs:
            r = out[d]
            spans = re.findall(r"<extra_id_(\d+)>((?: w\d+x\d+)*)", " " + r["targets"].replace("<extra_id_", " <extra_id_"))
            ids = [int(i) for i, _ in spans]
            assert ids == list(range(len(ids))), (d, stride, span_len)
            by_id = {int(i): c.split() for i, c in spans[:-1]}  # last = closing sentinel
            toks = []
            for t in r["inputs"].split():
                m = re.fullmatch(r"<extra_id_(\d+)>", t)
                toks += by_id[int(m.group(1))] if m else [t]
            assert toks == text.split(), (d, stride, span_len)


def test_registry_outputs_are_scalar_columns(spark, sf_dir):
    """Driver-canon output-shape contract (VERDICT r9 item 3): the
    driver's correctness canonicalizer sorts and hashes a pandas frame,
    which dies on array/map/struct cells (CORRECTNESS_r09's
    embedding_pca_project returning ARRAY `proj` was the gate's one red
    row). Every registry entry must therefore surface scalar-only
    columns — posexplode arrays, flatten structs, join maps out — so
    this class of harness failure is caught at build time, not by the
    driver."""
    from pyspark.sql import types as T

    from cm_well_spark.registry import QUERIES

    bad: dict[str, list[str]] = {}
    for name, fn in sorted(QUERIES.items()):
        df = fn(spark, sf_dir)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"registry entries with non-scalar output columns: {bad}"


def test_plan_audit_covers_every_registry_entry():
    """PLAN_AUDIT completeness contract (VERDICT r10 item 4): the r10
    artifact silently lagged the registry by one entry
    (auth_visibility_filter landed after the audit was generated). The
    committed PLAN_AUDIT.json must cover EXACTLY the registry's query
    set — regenerate with
    `PYTHONPATH=. python tools/plan_audit.py <sf_dir> > PLAN_AUDIT.json`
    whenever a registry entry is added or removed."""
    import json

    from cm_well_spark.registry import QUERIES

    path = os.path.join(os.path.dirname(__file__), "..", "PLAN_AUDIT.json")
    audit = json.load(open(path))
    audited = set(audit["entries"])
    want = set(QUERIES)
    assert audited == want, (
        f"PLAN_AUDIT.json is stale: missing={sorted(want - audited)} "
        f"extra={sorted(audited - want)}"
    )
    assert audit["n_violations"] == 0, audit["violations"]


def test_registry_package_split_bounds():
    """Registry split contract (VERDICT r10 item 9): the registry is a
    package of family tranches, no module over 2.5k LoC, and the
    package must keep behaving as the old single module did — QUERIES
    populated, sentinels first in gate order."""
    import glob

    import cm_well_spark.registry as R

    pkg_dir = os.path.dirname(R.__file__)
    for f in glob.glob(os.path.join(pkg_dir, "*.py")):
        n = sum(1 for _ in open(f))
        assert n <= 2500, f"{os.path.basename(f)} has {n} LoC (>2500)"
    assert len(R.QUERIES) >= 283
    gate = list(R.queries())
    assert gate[:2] == ["read_point", "merge_writer_current"]
