"""Round-15 optimization probe: capture plans and isolated timings.

Usage:
  python tools/opt_probe.py plans  <suffix> q129_prefix_filter_join [...]
  python tools/opt_probe.py time   <reps>   q129_prefix_filter_join [...]

``plans`` writes ``plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<suffix>.txt`` (default r16) with the
``explain('formatted')`` output of each named query (suffix = before/after).
``time`` runs each named query <reps> times into the noop sink (guide §1.4)
after one untimed warmup pass, printing per-rep seconds and the median —
the same timing discipline as bench.py, without the full headline list.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from columnarmodeling_spark.queries import REGISTRY  # noqa: E402
from columnarmodeling_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-probe")
    if mode == "plans":
        suffix = sys.argv[2]
        names = sys.argv[3:]
        out_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"),
        )
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = REGISTRY[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
    elif mode == "time":
        reps = int(sys.argv[2])
        names = sys.argv[3:]
        jvm_gc = spark.sparkContext._jvm.System.gc
        for name in names:
            spark.sparkContext.setJobDescription(f"warmup {name}")
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts = []
            for r in range(reps):
                jvm_gc()
                time.sleep(0.2)
                spark.sparkContext.setJobDescription(f"timed {name} rep{r}")
                t0 = time.perf_counter()
                REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.perf_counter() - t0)
            s = sorted(ts)
            med = s[len(s) // 2] if len(s) % 2 else 0.5 * (
                s[len(s) // 2 - 1] + s[len(s) // 2]
            )
            print(
                f"{name}: median {med:.3f}s reps "
                + " ".join(f"{t:.3f}" for t in ts),
                flush=True,
            )
    elif mode == "jobs":
        # Count Spark jobs (and their stages) for ONE end-to-end run of
        # each query — the per-round scheduling evidence for iterative
        # operators whose checkpoints truncate the final explain() into
        # LogicalRDD scans (solver rounds, CC/LPA rounds), where a plan
        # dump cannot show the job-count change (r16).
        names = sys.argv[2:]
        for name in names:
            # warmup (codegen, page cache) so the counted run is steady
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            group = f"jobs_{name}"
            sc = spark.sparkContext
            sc.setJobGroup(group, f"count jobs for {name}")
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    n_stages += len(info.stageIds)
            print(
                f"{name}: jobs {len(job_ids)} stages {n_stages}",
                flush=True,
            )
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
