#!/usr/bin/env python
"""Quantify the cluster story for the shuffle-bound sf10 tail
(r12 verdict next #4): tpch_q5 (6.69x at 10x data), j3_large_large_join
and tpch_q21 were "a cluster absorbs the shuffle growth" by ARGUMENT.
This tool makes it a measurement:

  per query and tier (sf1, sf10): run once on the v2 layout and sum the
  per-stage shuffle write/read bytes from the Spark status REST API
  (only stages born after the warm run count).

Fitting detail learned from the first run: the NATURAL plans change
REGIME across the decade — at sf1 the q5/j3 fact joins broadcast
(shuffle ~0.01 MB) and at sf10 they cross autoBroadcastJoinThreshold
into sort-merge (hundreds of MB), so the naive bytes(sf10)/bytes(sf1)
ratio (~4.5e4) is a plan transition, not shuffle growth. At 100 TB
every such join is in the shuffle regime already, so the quantity that
predicts the next decade is the WITHIN-REGIME slope: both tiers are
re-measured with autoBroadcastJoinThreshold=-1 (forcing the
shuffle-regime plan sf1 normally skips) and the slope
s = forced(sf10)/forced(sf1) projects bytes(sf100) =
natural(sf10) * s.

The cluster claim is then arithmetic: if executor cores scale with the
data (the whole point of a cluster), per-core shuffle volume moves by
s/10 per decade — s <= 10 means the volume per core is flat or
shrinking at any scale, and the fixed-32-core wall ratios in
BENCH_sf10 are box artifacts, not plan defects. s > 10 would mean the
plan genuinely super-linearizes shuffle and needs a re-plan.

Writes SHUFFLE_PROJECTION.json; the table lands in PERFORMANCE.md.
Run quiet: byte counts are deterministic but wall-clock neighbors can
starve the UI store's event queue (dropped events undercount bytes).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

QUERIES = ["tpch_q5", "j3_large_large_join", "tpch_q21", "j9_asof_join"]
CORES_SMALL = 32          # the measurement box
DECADE = 10.0


def stage_bytes(url: str, app: str, after_stage: int) -> dict:
    stages = json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app}/stages?status=complete"))
    new = [s for s in stages if s["stageId"] > after_stage]
    return {
        "write": sum(s.get("shuffleWriteBytes", 0) for s in new),
        "read": sum(s.get("shuffleReadBytes", 0) for s in new),
        "records": sum(s.get("shuffleWriteRecords", 0) for s in new),
        "max_stage": max([s["stageId"] for s in stages], default=after_stage),
    }


def max_stage(url: str, app: str) -> int:
    stages = json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app}/stages"))
    return max([s["stageId"] for s in stages], default=-1)


def main() -> None:
    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    conf = dict(bench.BENCH_CONF)
    conf["spark.sql.shuffle.partitions"] = "32"
    conf["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY",
                                                 "32g")
    conf["spark.ui.enabled"] = "true"   # the REST status store IS the tool
    conf["spark.ui.retainedStages"] = "5000"
    spark = get_spark("shuffle-projection", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    registry = load_all()
    tiers = {
        "sf1": bench.normalize_layout(
            os.path.join(REPO, "testdata_scale", "sf1")),
        "sf10": bench.normalize_layout(
            os.path.join(REPO, "testdata_scale", "sf10")),
    }

    def measure(fn, d: str) -> float:
        # fresh DataFrame per run: re-running the SAME df object lets
        # Spark reuse its materialized shuffle stages and the counted
        # run reads ~0 bytes (observed: tpch_q5 sf1 "0.01 MB"). Two
        # counted runs, max taken — stragglers in the UI event queue
        # can drop a stage's metrics under load.
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        best, recs = 0.0, 0
        for _ in range(2):
            before = max_stage(url, app)
            fn(spark, d).write.format("noop").mode("overwrite").save()
            got = stage_bytes(url, app, before)
            if got["write"] / 2**20 > best:
                best, recs = got["write"] / 2**20, got["records"]
        return round(best, 2), recs

    out: dict = {"queries": {}}
    for name in QUERIES:
        fn = registry[name].fn
        row: dict = {}
        for tier, d in tiers.items():
            row[f"{tier}_natural_write_mb"], _ = measure(fn, d)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            for tier, d in tiers.items():
                (row[f"{tier}_forced_smj_write_mb"],
                 row[f"{tier}_forced_smj_records"]) = measure(fn, d)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        row["records_slope_per_decade"] = round(
            row["sf10_forced_smj_records"]
            / max(row["sf1_forced_smj_records"], 1), 2)
        s = (row["sf10_forced_smj_write_mb"]
             / max(row["sf1_forced_smj_write_mb"], 1e-9))
        row["within_regime_slope_per_decade"] = round(s, 2)
        row["sf100_projected_write_mb"] = round(
            row["sf10_natural_write_mb"] * s, 1)
        # per-core volume when cores scale with data (32 -> 320 -> 3200)
        row["per_core_mb_sf10_32c"] = round(
            row["sf10_natural_write_mb"] / CORES_SMALL, 2)
        row["per_core_mb_sf100_320c"] = round(
            row["sf100_projected_write_mb"] / (CORES_SMALL * DECADE), 2)
        row["per_core_factor_per_decade"] = round(s / DECADE, 3)
        out["queries"][name] = row
        print(name, json.dumps(row))

    out["model"] = ("within-shuffle-regime slope fitted from the "
                    "sf1->sf10 decade with autoBroadcastJoinThreshold "
                    "disabled (the natural sf1 plans broadcast and "
                    "would fit a plan TRANSITION, not growth); "
                    "sf100 = natural sf10 bytes x slope; per-core "
                    "columns assume executor cores scale with data "
                    "(32 at sf10 -> 320 at sf100); factor s/10 <= 1 "
                    "means per-core shuffle volume is flat or shrinks "
                    "each decade — the quantified 'a cluster absorbs "
                    "it' claim")
    with open(os.path.join(REPO, "SHUFFLE_PROJECTION.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


def measure_sf100(scaled: bool = False, auto: bool = False) -> None:
    """r14 (r13 verdict #1): the sf100 decade MEASURED, not projected.
    Runs the four shuffle-bound queries against a real sf100 tier
    (tools/make_sf_scale.py sf10→sf100, partial: only the tables these
    queries touch) in a fresh JVM and records measured shuffle
    write bytes/records next to SHUFFLE_PROJECTION.json's projections.
    One real decade beats any fit — the r10 √N and r13 bloom-sizing
    defects were both invisible until the next decade actually ran.
    Confs scale with the data: shuffle partitions 32→96 (the fixed box
    still has 32 cores; more waves, bounded per-partition memory),
    driver heap 96g, AQE off (same as every projection measurement).
    Writes SHUFFLE_SF100.json; the table lands in PERFORMANCE.md."""
    import time as _time
    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    conf = dict(bench.BENCH_CONF)
    conf["spark.sql.shuffle.partitions"] = "96"
    conf["spark.sql.files.maxPartitionBytes"] = str(64 * 1024 * 1024)
    conf["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY",
                                                 "96g")
    conf["spark.ui.enabled"] = "true"
    conf["spark.ui.retainedStages"] = "5000"
    d_sizing = None
    if scaled:
        # the r14 fix under test: size the stats-less runtime blooms
        # from the tier's fact row count (600M lineitem rows at sf100)
        # instead of the r13 constant grid that the first sf100 run
        # measured saturating (q5 5.5x its projection)
        from pravega_flink_ai_flow_spark.engine.session import \
            bloom_filter_sizing
        conf.update(bloom_filter_sizing(600_000_000))
    elif auto:
        # r15 (r14 verdict #1): NO explicit sizing call — get_spark
        # derives the grid itself from the tier's parquet footers.
        # Done-criterion: these rows match the '_scaled_bloom' rows
        # within noise.
        d_sizing = os.path.join(REPO, "testdata_scale", "sf100")
    spark = get_spark("shuffle-sf100", extra_conf=conf, data_dir=d_sizing)
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    registry = load_all()
    # no normalize_layout: the streamed generator already writes ~17 MB
    # row groups (lineitem: 600), and rewriting an 11 GB parquet via
    # pq.read_table would hold ~40 GB of Arrow; shuffle bytes — the
    # measured quantity — don't depend on scan layout anyway
    d = os.path.join(REPO, "testdata_scale", "sf100")
    proj = json.load(open(os.path.join(REPO,
                                       "SHUFFLE_PROJECTION.json")))["queries"]
    out_path = os.path.join(REPO, "SHUFFLE_SF100.json")
    out: dict = {"queries": {}}
    if (scaled or auto) and os.path.exists(out_path):
        out = json.load(open(out_path))     # merge next to the first run
    suffix = "_scaled_bloom" if scaled else "_auto_sized" if auto else ""
    for name in QUERIES:
        fn = registry[name].fn
        before = max_stage(url, app)
        t0 = _time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        wall = round(_time.perf_counter() - t0, 2)
        got = stage_bytes(url, app, before)
        mb = round(got["write"] / 2**20, 2)
        p = proj[name]
        row = {
            "sf100_measured_write_mb": mb,
            "sf100_measured_records": got["records"],
            "sf100_projected_write_mb": p["sf100_projected_write_mb"],
            "measured_over_projected": round(
                mb / max(p["sf100_projected_write_mb"], 1e-9), 3),
            "records_measured_over_sf10": round(
                got["records"] / max(p["sf10_forced_smj_records"], 1), 2),
            "wall_sec_cold_96part": wall,
            "per_core_mb_if_320c": round(mb / 320, 2),
        }
        out["queries"][name + suffix] = row
        print(name + suffix, json.dumps(row), flush=True)
    out["model"] = ("one measured run per query at the real sf100 tier "
                    "(fresh JVM, quiet box, AQE off, 96 shuffle "
                    "partitions); measured_over_projected near 1.0 "
                    "validates SHUFFLE_PROJECTION's within-regime slope; "
                    "wall times are fixed-32-core box artifacts (10x the "
                    "data on the same cores), NOT the per-core claim. "
                    "'_scaled_bloom' rows re-measure with "
                    "bloom_filter_sizing(600M) — the r14 fix for the "
                    "two constants the unsuffixed q5/q21 rows caught: "
                    "the 256MB creationSideThreshold stopped injecting "
                    "the o_orderkey bloom at sf100 (plan-probed), and "
                    "the 4M-item grid would have eroded it anyway")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


def _job_table(url: str, app: str) -> list[dict]:
    import datetime as _dt

    def ms(s: str | None) -> float | None:
        if not s:
            return None
        return _dt.datetime.strptime(
            s.replace("GMT", "+0000"),
            "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000.0

    jobs = json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app}/jobs"))
    out = []
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        t0, t1 = ms(j.get("submissionTime")), ms(j.get("completionTime"))
        out.append({
            "job_id": j["jobId"],
            "name": (j.get("name") or "")[:120],
            "wall_s": round((t1 - t0) / 1000.0, 3)
            if t0 is not None and t1 is not None else None,
            "num_tasks": j.get("numTasks"),
            "num_stages": len(j.get("stageIds", [])),
        })
    return out


def measure_sf100_one(query: str, bloom: str) -> None:
    """ONE query, ONE bloom config, in THIS (fresh) JVM — the clean-room
    unit of measure_sf100_clean (r15, r14 verdict #2: the committed q21
    scaled wall was polluted by the preceding q5 run's shuffle spill;
    any with/without comparison needs one quiet session per cell).
    ``bloom`` is 'on' (self-sized from the tier's footers — the r15
    production path) or 'off' (runtime bloom filters disabled entirely,
    so the delta IS the filter: build cost and all savings included).
    Prints one ``RESULT {json}`` line with wall, shuffle bytes/records
    and the per-job wall table (the ON-only jobs are the filter
    builds — scalar subqueries run as their own jobs with AQE off)."""
    import time as _time

    from pravega_flink_ai_flow_spark.engine.session import get_spark
    from pravega_flink_ai_flow_spark.queries import load_all

    d = os.path.join(REPO, "testdata_scale", "sf100")
    conf = dict(bench.BENCH_CONF)
    conf["spark.sql.shuffle.partitions"] = "96"
    conf["spark.sql.files.maxPartitionBytes"] = str(64 * 1024 * 1024)
    conf["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY",
                                                 "96g")
    conf["spark.ui.enabled"] = "true"
    conf["spark.ui.retainedStages"] = "5000"
    d_sizing = None
    if bloom == "on":
        d_sizing = d
    else:
        conf["spark.sql.optimizer.runtime.bloomFilter.enabled"] = "false"
    spark = get_spark("shuffle-sf100-clean", extra_conf=conf,
                      data_dir=d_sizing)
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    fn = load_all()[query].fn
    t0 = _time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    wall = round(_time.perf_counter() - t0, 2)
    got = stage_bytes(url, app, -1)
    print("RESULT " + json.dumps({
        "query": query, "bloom": bloom, "wall_s": wall,
        "write_mb": round(got["write"] / 2**20, 2),
        "records": got["records"],
        "jobs": _job_table(url, app),
    }), flush=True)
    spark.stop()


def measure_sf100_clean() -> None:
    """r15 (r14 verdict #2): the bloom cost/benefit measured CLEANLY —
    every (query, bloom on/off) cell in its own fresh quiet JVM via a
    subprocess, so no cell inherits a neighbor's shuffle spill or page
    cache churn. Filter-build wall is attributed from the job tables:
    with AQE off the bloom creation aggregates run as their OWN jobs
    before the main save job, so the ON run's extra jobs (name-count
    diff against OFF) are the builds. Writes ``<q>_clean_on/off`` rows
    + a derived comparison into SHUFFLE_SF100.json; the analysis
    table lands in PERFORMANCE.md."""
    import subprocess
    from collections import Counter

    results: dict[str, dict] = {}
    for name in QUERIES:
        for mode in ("off", "on"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "sf100_one", name, mode],
                capture_output=True, text=True)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("RESULT ")]
            if not line:
                print(f"FAILED {name} {mode}:", p.stdout[-2000:],
                      p.stderr[-2000:], flush=True)
                continue
            row = json.loads(line[-1][len("RESULT "):])
            results[f"{name}_{mode}"] = row
            print(name, mode, json.dumps(
                {k: row[k] for k in ("wall_s", "write_mb", "records")}),
                flush=True)

    out_path = os.path.join(REPO, "SHUFFLE_SF100.json")
    out = json.load(open(out_path)) if os.path.exists(out_path) \
        else {"queries": {}}
    for name in QUERIES:
        on = results.get(f"{name}_on")
        off = results.get(f"{name}_off")
        if not on or not off:
            continue
        off_names = Counter(j["name"] for j in off["jobs"])
        extra = []
        seen: Counter = Counter()
        for j in on["jobs"]:
            seen[j["name"]] += 1
            if seen[j["name"]] > off_names[j["name"]]:
                extra.append(j)
        build_wall = round(sum(j["wall_s"] or 0.0 for j in extra), 2)
        row = {
            "wall_s_bloom_on": on["wall_s"],
            "wall_s_bloom_off": off["wall_s"],
            "write_mb_bloom_on": on["write_mb"],
            "write_mb_bloom_off": off["write_mb"],
            "records_bloom_on": on["records"],
            "records_bloom_off": off["records"],
            "bytes_saved_mb": round(off["write_mb"] - on["write_mb"], 2),
            "filter_build_wall_s": build_wall,
            "filter_build_jobs": [
                {k: j[k] for k in ("name", "wall_s", "num_tasks")}
                for j in extra],
            "jobs_on": on["jobs"],
            "jobs_off": off["jobs"],
        }
        out["queries"][name + "_clean"] = row
        print(name, "clean:", json.dumps(
            {k: row[k] for k in ("wall_s_bloom_on", "wall_s_bloom_off",
                                 "bytes_saved_mb",
                                 "filter_build_wall_s")}), flush=True)
    out["clean_model"] = (
        "one fresh quiet JVM per (query, bloom on/off) cell — no cell "
        "inherits a neighbor's spill (the r14 q21_scaled_bloom wall was "
        "polluted that way and is superseded by these rows). 'on' = the "
        "r15 self-sized grid (get_spark(data_dir=tier)); 'off' = runtime "
        "bloom filters disabled, so wall/bytes deltas capture the whole "
        "filter: creation-side scan + build + probe vs shuffle saved. "
        "filter_build_wall_s sums the ON run's extra pre-save jobs (the "
        "scalar-subquery filter builds; AQE off). On this loopback box "
        "'shuffle' is memcpy — the filter pays on a real network when "
        "bytes_saved x (network cost per MB) > filter_build + probe "
        "overhead; see PERFORMANCE.md for the per-query break-even.")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sf100":
        mode = sys.argv[2] if len(sys.argv) > 2 else ""
        measure_sf100(scaled=mode == "scaled", auto=mode == "auto")
    elif len(sys.argv) > 1 and sys.argv[1] == "sf100_one":
        measure_sf100_one(sys.argv[2], sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "sf100_clean":
        measure_sf100_clean()
    else:
        main()
