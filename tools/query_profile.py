"""Per-query job/driver-gap decomposition for the bench headline queries.

Runs each headline query exactly like bench.py (_force full-row checksum),
labels every query's jobs via setJobDescription, writes a Spark event log,
then attributes per query:

* wall      — driver-side wall clock around the forced action(s)
* n_jobs    — Spark jobs the query submitted
* task_s    — summed executor task time (all jobs, all stages)
* stage_s   — summed stage wall (submission→completion, overlaps not merged)
* gap_s     — wall - union-of-job-intervals: driver/AQE planning time where
              NO job of this query was running (the §1/§7.3 "nothing is
              happening" term)

Usage: python tools/query_profile.py [query ...]   (default: all headline)
Output: one JSON line per query + a TOTAL line (to stdout).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = os.environ.get("QP_EVDIR", "/tmp/qp_evlog")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm = "/dev/shm/spark_local"
        os.makedirs(shm, exist_ok=True)
        os.environ["SPARK_LOCAL_DIRS"] = shm
    os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = EVDIR
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)

    import bench
    from camden_spark.entry_queries import QUERIES, RETIRED_ROWS_ONLY
    from camden_spark.plans.caches import release_caches
    from camden_spark.session import get_spark, warm_python_workers

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("camden_spark_qprofile", cores=cores)
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_python_workers(spark)

    lookup = {**RETIRED_ROWS_ONLY, **QUERIES}
    overrides = {"near_dup_clusters": bench._near_dup_clusters_bench}
    walls: dict[str, float] = {}
    reps = max(1, int(os.environ.get("QP_REPS", "1")))
    for _rep in range(reps):
        for name in names:
            fn = overrides.get(name, lookup[name])
            spark.sparkContext.setJobDescription(f"qp:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            bench._force(df)
            w = time.time() - t0
            walls[name] = min(walls.get(name, 1e9), w)
            spark.sparkContext.setJobDescription(None)
            release_caches()
    spark.stop()

    # ---- parse the event log --------------------------------------------
    files = []
    for root, _dirs, fnames in os.walk(EVDIR):
        for f in fnames:
            if f.startswith("events_") or f.startswith("local-"):
                files.append(os.path.join(root, f))
    # rolling v2 logs split one app across events_N files — read them all,
    # in sequence, for the most recent app directory
    latest_dir = max((os.path.dirname(f) for f in files), key=os.path.getmtime)
    files = sorted(
        (f for f in files if os.path.dirname(f) == latest_dir),
        key=lambda f: int(os.path.basename(f).split("_")[1])
        if os.path.basename(f).startswith("events_")
        else 0,
    )
    jobs: dict[int, dict] = {}  # job id -> {q, start, end, stages:set}
    stage_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    task_time: dict[int, float] = {}
    import io
    import subprocess

    def open_ev(path):
        if path.endswith(".zstd"):
            p = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            )
            return io.StringIO(p.stdout.decode())
        return open(path)

    def iter_events():
        for path in files:
            with open_ev(path) as fh:
                for line in fh:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue

    if True:
        for ev in iter_events():
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jid = ev["Job ID"]
                jobs[jid] = {
                    "q": desc[3:] if desc.startswith("qp:") else None,
                    "start": ev["Submission Time"],
                    "end": None,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    stage_info[sid] = {"wall": (comp - sub) / 1e3}
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                task_time[sid] = task_time.get(sid, 0.0) + (
                    tm.get("Executor Run Time", 0) / 1e3
                )

    out: dict[str, dict] = {}
    for name in names:
        qjobs = [j for j in jobs.values() if j["q"] == name and j["end"]]
        sids = [s for s, jid in stage_job.items() if jobs[jid]["q"] == name]
        ivals = sorted((j["start"], j["end"]) for j in qjobs)
        covered = 0.0
        cur_s = cur_e = None
        for s, e in ivals:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        out[name] = {
            "wall": round(walls[name], 3),
            "n_jobs": len(qjobs),
            "task_s": round(sum(task_time.get(s, 0.0) for s in sids), 2),
            "stage_s": round(
                sum(stage_info.get(s, {}).get("wall", 0.0) for s in sids), 2
            ),
            "job_cover_s": round(covered / 1e3, 2),
            "gap_s": round(walls[name] - covered / 1e3, 2),
        }
        print(json.dumps({"query": name, **out[name]}))
    tot = {
        k: round(sum(v[k] for v in out.values()), 2)
        for k in ("wall", "n_jobs", "task_s", "stage_s", "gap_s")
    }
    print(json.dumps({"query": "TOTAL", **tot}))


if __name__ == "__main__":
    main()
