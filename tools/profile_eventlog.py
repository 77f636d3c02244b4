"""Event-log attribution of one dedup run: where does the wall go?

Usage: python tools/profile_eventlog.py <cores> <n_docs> [out.json]

Runs ONE warmed pipeline rep with spark.eventLog enabled, then parses
the event log into per-stage sums of the task metrics Spark actually
records (executor CPU, executor run time, JVM GC, shuffle read/write
time, serialization, scheduler delay, python worker time is inside
executor run - cpu). Groups stages by the pipeline phase that launched
them (callSite long form contains the materializing call), so the
answer is per-PHASE: wall vs executor-CPU vs GC vs shuffle-io vs
"other" (scheduler + python + blocked I/O).

This is the weather-robust view: executor-CPU sums barely move with
hypervisor throttling windows, wall times swing 2-3x (BENCH.md round
4) — a stage whose CPU-sum dropped after a rewrite got cheaper even if
the wall got worse.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log_lines(evpath: str):
    """Yield event-log lines from a single-file log, a Spark-4 rolling
    event-log directory (ALL events_* parts, in order — a multi-part
    log previously crashed open() with a list, ADVICE r4), or a
    directory of logs (most recent entry)."""
    if os.path.isdir(evpath):
        entries = [os.path.join(evpath, f) for f in os.listdir(evpath)]
        if any(os.path.basename(e).startswith("events_") for e in entries):
            parts = sorted(
                e for e in entries
                if os.path.basename(e).startswith("events_")
            )
        else:
            # a dir of logs: pick the newest, recurse for rolling dirs
            yield from _log_lines(max(entries, key=os.path.getmtime))
            return
    else:
        parts = [evpath]
    for part in parts:
        with open(part) as f:
            yield from f


def parse_eventlog(evpath: str, t_mark: float = 0) -> tuple[dict, dict]:
    """(per_stage metrics, stage names) for tasks launched after t_mark
    (epoch ms). Stage names prefer the job description (the pipeline
    phase label run_dedup sets via setJobDescription) over the bare
    callsite."""
    per_stage: dict[int, dict] = {}
    names: dict[int, str] = {}
    phase: dict[int, str] = {}
    for line in _log_lines(evpath):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description"
            )
            if desc:
                for si in ev.get("Stage Infos", []):
                    phase[si["Stage ID"]] = desc
        elif ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            if si.get("Submission Time", 0) < t_mark:
                continue
            names[si["Stage ID"]] = si.get("Details", "").split("\n")[0]
        elif ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            ti = ev.get("Task Info", {})
            if ti.get("Launch Time", 0) < t_mark:
                continue
            tm = ev.get("Task Metrics") or {}
            d = per_stage.setdefault(
                sid,
                {
                    "tasks": 0,
                    "run_ms": 0,
                    "cpu_ms": 0,
                    "gc_ms": 0,
                    "shuffle_write_ms": 0,
                    "shuffle_read_block_ms": 0,
                    "deser_ms": 0,
                    "ser_ms": 0,
                    "getting_result_ms": 0,
                    "input_mb": 0.0,
                    "shuffle_read_mb": 0.0,
                    "shuffle_write_mb": 0.0,
                },
            )
            d["tasks"] += 1
            d["run_ms"] += tm.get("Executor Run Time", 0)
            d["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
            d["gc_ms"] += tm.get("JVM GC Time", 0)
            sw = tm.get("Shuffle Write Metrics", {})
            d["shuffle_write_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
            d["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
            sr = tm.get("Shuffle Read Metrics", {})
            d["shuffle_read_block_ms"] += sr.get("Fetch Wait Time", 0)
            d["shuffle_read_mb"] += (
                sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
            ) / 1e6
            d["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            d["ser_ms"] += tm.get("Result Serialization Time", 0)
            inp = tm.get("Input Metrics", {})
            d["input_mb"] += inp.get("Bytes Read", 0) / 1e6
    for sid, desc in phase.items():
        names[sid] = f"[{desc}] {names.get(sid, '')}"
    return per_stage, names


def report(per_stage: dict, names: dict, cores: int, top: int = 18) -> dict:
    if not per_stage:
        sys.exit("no post-warmup task events found in event log")
    tot = {
        k: sum(s[k] for s in per_stage.values())
        for k in next(iter(per_stage.values()))
    }
    print(
        f"TOTAL run={tot['run_ms']/1e3:.1f}s cpu={tot['cpu_ms']/1e3:.1f}s "
        f"gc={tot['gc_ms']/1e3:.1f}s deser={tot['deser_ms']/1e3:.1f}s "
        f"shufw={tot['shuffle_write_ms']/1e3:.1f}s "
        f"fetchwait={tot['shuffle_read_block_ms']/1e3:.1f}s "
        f"(ideal cpu-bound wall at {cores} cores = "
        f"{tot['cpu_ms']/1e3/cores:.1f}s)"
    )
    by_phase: dict[str, dict] = {}
    for sid, d in per_stage.items():
        nm = names.get(sid, "")
        ph = nm[1 : nm.index("]")] if nm.startswith("[") else "(other)"
        agg = by_phase.setdefault(ph, dict.fromkeys(d, 0))
        for k, v in d.items():
            agg[k] += v
    for ph, d in sorted(by_phase.items(), key=lambda kv: -kv[1]["run_ms"]):
        print(
            f"phase {ph:<24} run={d['run_ms']/1e3:7.1f}s "
            f"cpu={d['cpu_ms']/1e3:7.1f}s swr_ms={d['shuffle_write_ms']/1e3:6.1f}s "
            f"swr={d['shuffle_write_mb']:6.0f}MB srd={d['shuffle_read_mb']:6.0f}MB "
            f"fw={d['shuffle_read_block_ms']/1e3:5.1f}s tasks={d['tasks']}"
        )
    rows = sorted(per_stage.items(), key=lambda kv: -kv[1]["run_ms"])[:top]
    for sid, d in rows:
        nm = names.get(sid, "?")[:80]
        print(
            f"stage {sid:>4} tasks={d['tasks']:>3} "
            f"run={d['run_ms']/1e3:7.1f}s cpu={d['cpu_ms']/1e3:7.1f}s "
            f"gc={d['gc_ms']/1e3:5.1f}s swr_ms={d['shuffle_write_ms']/1e3:6.1f}s "
            f"swr={d['shuffle_write_mb']:6.0f}MB "
            f"srd={d['shuffle_read_mb']:6.0f}MB fw={d['shuffle_read_block_ms']/1e3:5.1f}s"
            f"  {nm}"
        )
    return tot


def main() -> None:
    # parse-only mode: profile an existing event log (e.g. a standalone
    # sweep leg's) without running anything
    if sys.argv[1] == "--parse":
        evpath = sys.argv[2]
        cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        per_stage, names = parse_eventlog(evpath)
        report(per_stage, names, cores, top=24)
        return
    _run_and_profile()


def _run_and_profile() -> None:
    cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else None
    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import functions as F

    from hsearch_spark.plans.pipeline import run_dedup
    from hsearch_spark.session import build_session
    from hsearch_spark.sources.pages import pages_dataframe

    spark = build_session(
        app_name=f"evprof_{cores}",
        cores=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )

    def one_run(pages):
        t0 = time.monotonic()
        res = run_dedup(spark, pages)
        res.clusters.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(doc_id, cluster_id))"), F.lit(0)
            ).alias("h"),
        ).collect()
        return time.monotonic() - t0, dict(res.metrics["timings_sec"])

    wpages, _ = pages_dataframe(spark, n_docs=2000, seed=7)
    one_run(wpages.localCheckpoint())
    pages, _ = pages_dataframe(spark, n_docs=n_docs, seed=43)
    pages = pages.localCheckpoint()
    # stage IDs of the warmup are excluded by timestamp: record the
    # wall-clock boundary between warmup and the measured rep
    t_mark = time.time() * 1000
    wall, stage_timings = one_run(pages)
    spark.stop()

    per_stage, names = parse_eventlog(evdir, t_mark)
    print(f"wall={wall:.1f}s  stage_timings={stage_timings}")
    tot = report(per_stage, names, cores)
    if out:
        with open(out, "w") as f:
            json.dump(
                {
                    "cores": cores,
                    "n_docs": n_docs,
                    "wall": wall,
                    "stage_timings": stage_timings,
                    "totals": tot,
                    "per_stage": {
                        str(k): {**v, "name": names.get(k, "?")}
                        for k, v in per_stage.items()
                    },
                },
                f,
                indent=1,
            )


if __name__ == "__main__":
    main()
