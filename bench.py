#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

``--diff PRIOR.json`` (e.g. a prior round's BENCH_r*.json) adds a
"diff" object to the line: per-branch steady times compared against
the prior run, any branch slower than DIFF_FACTOR (2x) flagged in
"regressed", plus "new"/"removed" branch lists — so a round's verdict
can separate bought coverage from regression mechanically.  Host noise
is real (PLANS.md documents ±60% swings on sub-100ms branches), so the
2x flag on a >=0.05s branch is a TRIAGE signal, not a verdict.

The diff is DRIFT-NORMALIZED (the r10 lesson: a shared host drifted
~1.22x slower one round and the raw diff flagged unchanged code):
"drift_factor" is the median now/prior ratio over shared queries —
uniform host slowdown moves the median, a genuine single-query
regression doesn't — every entry carries both the raw "ratio" and
"adj_ratio" (ratio / drift), and ONLY drift-adjusted regressions
flag.  Fewer than 5 shared queries -> drift 1.0 (can't estimate).

``--summary`` additionally prints a README-ready close-out sentence to
STDERR (stdout stays exactly one JSON line) — the status numbers come
from the measured artifact instead of being hand-written, which is how
the round-9 README drifted.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_pipeline_with_kafka_spark import queries as q
from cdc_pipeline_with_kafka_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Arrow Python workers once so
    # per-query times measure the query, not session/worker startup
    q.q1_pricing_summary(spark, sf_dir).count()
    _warm_python_workers(spark)

    # Steady-state, prepared-statement style: the DataFrame (logical
    # plan) is built once per query, the warm pass pays one-time
    # analysis/codegen, and the reported number is the best of two
    # executions of the prepared plan — what a resident engine serves
    # for a repeated query.  build_s (plan construction, the py4j
    # lever) and exec_s (first cold execution incl. analysis+codegen)
    # are reported alongside so regressions in either stay visible.
    timings: dict[str, float] = {}
    build_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    dfs: dict[str, object] = {}
    for name, fn in q.BENCH_FNS.items():
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s[name] = round(time.perf_counter() - start, 3)
        dfs[name] = df
        start = time.perf_counter()
        df.count()
        exec_s[name] = round(time.perf_counter() - start, 3)
        # best-of-3: same-host scheduling noise showed 2× swings on
        # single post-warm passes; min of three is stable to ~±10%
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    # Per-BRANCH steady attribution for the tagged suite gates: gates
    # grow new branches every round, so the suite total alone cannot
    # separate bought coverage from regression.  Filtering on the
    # suite_case literal constant-folds per union child and
    # PropagateEmptyRelation drops the other branches (verified: the
    # pruned plan contains only that branch's subtree), so each number
    # is that branch's own steady cost.  Checkpointed shared seams
    # appear as ExistingRDD scans — their build cost is in build_s.
    branch_s = _branch_timings(dfs)

    # CDC end-to-end throughput: synthesize Debezium envelopes from the
    # events table, parse → filter → after-image → keyword-window count.
    # Baseline comparison: the reference extracts at ~50 ms/article
    # (~20 articles/s) and propagates CDC in <1 s (BASELINE.md).
    cdc_rate = _cdc_throughput(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    prior_path = _diff_arg()
    diff = (
        _diff_branches(prior_path, branch_s, timings, cdc_rate, total)
        if prior_path
        else None
    )
    out = _ordered_output(timings, build_s, exec_s, branch_s, sf, cdc_rate, diff)
    print(json.dumps(out))
    if "--summary" in sys.argv:
        # README-ready close-out sentence generated from the measured
        # artifact instead of hand-written (the r9 drift lesson), and
        # stating exactly what the diff object says — drift factor
        # included — instead of paraphrasing it (the r10 lesson):
        # pipe to stderr so the stdout contract stays ONE JSON line
        d = out.get("diff", {})
        extra = ""
        if d and "error" not in d:
            n_reg = (
                len(d.get("branch_s", {}).get("regressed", {}))
                + len(d.get("queries", {}).get("regressed", {}))
            )
            extra = (
                f"; --diff vs {d.get('vs')}: host drift x"
                f"{d.get('drift_factor')}, {n_reg} drift-adjusted "
                f"regressed branch(es)/query(ies)"
            )
        elif d:
            extra = f"; --diff vs {d.get('vs')}: {d['error']}"
        print(
            f"Solo bench sf{sf}: {total} s / {len(timings)} queries / "
            f"{len(branch_s)} attributed branches, CDC parse "
            f"{cdc_rate:,.0f} events/s" + extra,
            file=sys.stderr,
        )
    spark.stop()


def _ordered_output(
    timings: dict,
    build_s: dict,
    exec_s: dict,
    branch_s: dict,
    sf: str,
    cdc_rate: float,
    diff: dict | None = None,
) -> dict:
    """Assemble the one-line JSON object with the LARGE maps (build_s,
    exec_s, branch_s, diff) FIRST and the headline keys (metric, value,
    queries, sf, cdc_events_per_sec) LAST.  The driver keeps only the
    last 2000 characters of stdout as 'tail' when its full-parse path
    fails (r11's BENCH artifact carried parsed: {} for exactly this
    reason, which nulled the whole round-over-round PERF table in r12)
    — with the headline keys at the end, a 2000-char tail still holds
    the total and the per-query dict, and `_load_prior` below can
    recover them mechanically.  Same keys, same single line; only the
    order changed."""
    total = round(sum(timings.values()), 3)
    out: dict = {
        "build_s": build_s,
        "exec_s": exec_s,
        "branch_s": branch_s,
    }
    if diff is not None:
        out["diff"] = diff
    out.update(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cdc_events_per_sec": cdc_rate,
        }
    )
    return out


def _recover_tail(fragment: str) -> dict | None:
    """Recover the headline keys from a FRONT-truncated fragment of the
    one-line JSON (the driver's 2000-char stdout tail).  Works because
    `_ordered_output` puts metric/value/queries/sf/cdc_events_per_sec
    at the END of the object: the fragment from the last '"metric"'
    occurrence to the closing brace is a valid member list."""
    idx = fragment.rfind('"metric"')
    if idx < 0:
        return None
    candidate = "{" + fragment[idx:].strip()
    try:
        obj = json.loads(candidate)
    except json.JSONDecodeError:
        return None
    return obj if isinstance(obj, dict) and "queries" in obj else None


DIFF_FACTOR = 2.0
DIFF_FLOOR_S = 0.05  # below this, host noise swamps any ratio


def _diff_arg() -> str | None:
    if "--diff" in sys.argv:
        i = sys.argv.index("--diff")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--diff needs a prior BENCH json path")
        return sys.argv[i + 1]
    return None


def _load_prior(prior_path: str) -> dict | None:
    """Accept any of: a raw one-JSON-line bench output, the driver's
    BENCH_r*.json wrapper ({'parsed': {...}} or a parseable 'tail'
    string), or a bare result object.  Returns the result dict with
    queries/branch_s, or None if nothing parseable survives (the
    driver truncates 'tail' at 2000 chars)."""
    with open(prior_path) as f:
        try:
            obj = json.loads(f.read().strip().splitlines()[-1])
        except json.JSONDecodeError:
            f.seek(0)
            try:
                obj = json.load(f)
            except json.JSONDecodeError:
                return None
    if isinstance(obj, dict) and ("queries" in obj or "branch_s" in obj):
        return obj
    if isinstance(obj, dict):
        if isinstance(obj.get("parsed"), dict):
            return obj["parsed"]
        tail = obj.get("tail")
        if isinstance(tail, str):
            try:
                return json.loads(tail)
            except json.JSONDecodeError:
                # front-truncated tail of a `_ordered_output` line: the
                # headline keys sit at the end and are recoverable
                return _recover_tail(tail)
    return None


def _diff_branches(
    prior_path: str,
    branch_s: dict,
    timings: dict,
    cdc_rate: float | None = None,
    total: float | None = None,
) -> dict:
    """Mechanical regression table vs a prior bench JSON: per-branch
    and per-query steady times, PLUS the two whole-run signals the
    branch tiers can't see (the r8 verdict gap): cdc_events_per_sec
    (throughput — a DROP flags) and the headline total.

    DRIFT-NORMALIZED (the r10 lesson — a uniformly ~1.22x-slower
    host day flagged byte-identical code at 2.18x): `drift_factor`
    is the median now/prior ratio over shared QUERIES (needs >=
    MIN_DRIFT_SAMPLES, else 1.0); regressed = now >= DIFF_FLOOR_S
    AND adj_ratio (= ratio / drift) > DIFF_FACTOR.  Both ratios are
    in every entry so the artifact shows raw and adjusted."""
    prior = _load_prior(prior_path)
    if prior is None:
        return {
            "vs": os.path.basename(prior_path),
            "error": "prior file holds no parseable bench line "
                     "(driver 'tail' truncation?) — save bench.py's own "
                     "output line for diffable baselines",
        }
    drift, n_shared = _drift_factor(prior.get("queries", {}), timings)
    diff: dict = {
        "vs": os.path.basename(prior_path),
        "drift_factor": drift,
        "drift_samples": n_shared,
    }
    # r12 (advisor finding): drift normalization absorbs a UNIFORM
    # slowdown by construction — which is the point for host drift,
    # but a genuine regression in a shared helper/parse path would
    # also be uniform and would vanish into drift_factor.  Flag when
    # the factor itself exceeds the regression threshold so a human
    # decides host-vs-code before trusting a clean diff.
    if drift > DIFF_FACTOR or (drift > 0 and 1 / drift > DIFF_FACTOR):
        diff["drift_factor_exceeds_threshold"] = (
            f"median shared-query ratio x{drift} exceeds the {DIFF_FACTOR}x "
            "flag threshold: either host drift or a UNIFORM code "
            "regression (shared helper / parse path) — verify on a quiet "
            "host before trusting the per-query flags"
        )
    improved_frac = None
    for tier, now in (("branch_s", branch_s), ("queries", timings)):
        old = prior.get(tier, {})
        regressed = {}
        n_cmp = n_improved = 0
        for k, v in now.items():
            if k not in old or not old[k] or old[k] <= 0:
                continue
            ratio = v / old[k]
            if old[k] >= DIFF_FLOOR_S:
                n_cmp += 1
                if ratio <= IMPROVED_RATIO:
                    n_improved += 1
            if v < DIFF_FLOOR_S:
                continue
            adj = ratio / drift
            if adj > DIFF_FACTOR:
                regressed[k] = {
                    "prior": old[k], "now": v,
                    "ratio": round(ratio, 2), "adj_ratio": round(adj, 2),
                }
        diff[tier] = {
            "regressed": regressed,
            "new": sorted(set(now) - set(old)),
            "removed": sorted(set(old) - set(now)),
        }
        if tier == "branch_s" and n_cmp >= MIN_DRIFT_SAMPLES:
            improved_frac = n_improved / n_cmp
    # r12 (close-out triage finding): the median-drift estimator assumes
    # most shared entries are UNCHANGED code.  An optimization round
    # violates that: when a large share of branches genuinely improved,
    # the median mixes improvement into drift_factor and UNDER-corrects
    # — unchanged branches' host drift then surfaces as false flags
    # (observed: 12/114 branches <=0.7x raw pulled drift to x1.042 while
    # interleaved A/Bs showed unchanged code at ~1.5x host drift).  Say
    # so in the artifact whenever the improved fraction is material.
    if improved_frac is not None and improved_frac >= MIXED_IMPROVEMENT_FRAC:
        diff["drift_mixed_improvements"] = (
            f"{improved_frac:.0%} of shared branches improved past "
            f"{IMPROVED_RATIO}x — the median drift_factor (x{drift}) likely "
            "UNDER-corrects host drift for the unchanged branches; "
            "re-measure any flagged branch in isolation (interleaved "
            "old-vs-new) before treating it as a regression"
        )
    prior_rate = prior.get("cdc_events_per_sec")
    if cdc_rate is not None and isinstance(prior_rate, (int, float)) and prior_rate > 0:
        ratio = cdc_rate / prior_rate
        # throughput regresses DOWNWARD; a slower host LOWERS the rate
        # by ~drift, so the adjusted ratio multiplies the drift back in
        adj = ratio * drift
        diff["cdc_events_per_sec"] = {
            "prior": prior_rate,
            "now": cdc_rate,
            "ratio": round(ratio, 2),
            "adj_ratio": round(adj, 2),
            "regressed": adj * DIFF_FACTOR < 1.0,
        }
    prior_total = prior.get("value")
    if total is not None and isinstance(prior_total, (int, float)) and prior_total > 0:
        ratio = total / prior_total
        adj = ratio / drift
        diff["total"] = {
            "prior": prior_total,
            "now": total,
            "ratio": round(ratio, 2),
            "adj_ratio": round(adj, 2),
            "regressed": adj > DIFF_FACTOR and total >= DIFF_FLOOR_S,
        }
    return diff


MIN_DRIFT_SAMPLES = 5
# a branch counts as "genuinely improved" for the mixed-improvement
# caveat below this raw now/prior ratio; the caveat fires when at least
# this fraction of shared branches improved (the r12 close-out case)
IMPROVED_RATIO = 0.7
MIXED_IMPROVEMENT_FRAC = 0.10


def _drift_factor(prior_queries: dict, timings: dict) -> tuple[float, int]:
    """Median now/prior ratio over shared queries — the whole-host
    slowdown estimate.  Uniform drift moves every shared query by the
    same factor and therefore the median; one genuinely regressed
    query cannot (it is one sample).  Queries, not branches: the 32
    query timings are all >= the noise floor, branch timings are not.
    Returns (1.0, n) below MIN_DRIFT_SAMPLES shared samples."""
    shared = sorted(
        v / prior_queries[k]
        for k, v in timings.items()
        if isinstance(prior_queries.get(k), (int, float))
        and prior_queries[k] > 0 and v > 0
    )
    n = len(shared)
    if n < MIN_DRIFT_SAMPLES:
        return 1.0, n
    mid = n // 2
    med = shared[mid] if n % 2 else (shared[mid - 1] + shared[mid]) / 2
    return round(med, 3), n


_SUITE_COLS = ["suite_case", "k", "v_str", "v_num"]


def _branch_timings(dfs: dict) -> dict[str, float]:
    """{gate.branch: steady_sec} for every tagged-suite gate — one
    warm pass + best-of-2 per branch on the union-pruned plan."""
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    for name, df in dfs.items():
        if df.columns != _SUITE_COLS:
            continue
        cases = sorted(
            r["suite_case"] for r in df.select("suite_case").distinct().collect()
        )
        for case in cases:
            sub = df.filter(F.col("suite_case") == case)
            sub.count()  # warm the pruned plan (analysis + codegen)
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                sub.count()
                best = min(best, time.perf_counter() - start)
            out[f"{name}.{case}"] = round(best, 3)
    return out


def _warm_python_workers(spark) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    noop = F.pandas_udf(lambda x: x * 1.0, DoubleType())
    cpus = spark.sparkContext.defaultParallelism
    spark.range(cpus * 4).repartition(cpus).select(noop((F.col("id")).cast("double"))).count()


def _cdc_throughput(spark, sf_dir: str) -> float:
    """Events/sec through envelope-encode → parse → op-filter →
    after-image → 30-min windowed count (the §3.1 hot path, batch
    replay)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cdc_pipeline_with_kafka_spark.sources import cdc
    from cdc_pipeline_with_kafka_spark.sources.tables import load_table
    from cdc_pipeline_with_kafka_spark.util import spread

    ev = spread(load_table(spark, "events", sf_dir))
    raw = ev.select(
        F.to_json(
            F.struct(
                F.struct(
                    F.lit("c").alias("op"),
                    F.struct(
                        F.col("event_id").alias("id"),
                        F.col("event_type").alias("category"),
                        F.col("value").alias("score"),
                    ).alias("after"),
                    F.struct(F.lit("articles").alias("table")).alias("source"),
                    F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
                ).alias("payload")
            )
        ).alias("value")
    )
    row_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("category", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    # materialize the synthesized wire bytes once: the measured path is
    # Kafka-shaped JSON -> parse -> filter -> after-image -> windowed
    # count, not the test-only envelope encoding
    raw = raw.persist()
    n = raw.count()

    def run() -> None:
        parsed = cdc.parse_envelope(raw, row_schema=row_schema)
        imgs = cdc.after_image(cdc.upsert_ops(parsed))
        imgs.groupBy(F.window("ts", "30 minutes"), "category").count().count()

    # two warm passes: the first pays plan+codegen, the second lets C2
    # JIT compile the JSON-parse hot loop (measured: single-warm rates
    # drift upward 94k→139k across repeats; double-warm is stable)
    run()
    run()
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        run()
        elapsed = min(elapsed, time.perf_counter() - start)
    raw.unpersist()
    return round(n / elapsed, 1)


if __name__ == "__main__":
    main()
