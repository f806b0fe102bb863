"""Round-15 optimization probe: capture plans and isolated timings.

Usage:
  python tools/opt_probe.py plans  <suffix> q129_prefix_filter_join [...]
  python tools/opt_probe.py time   <reps>   q129_prefix_filter_join [...]

``plans`` writes ``plans/r15/<name>_<suffix>.txt`` with the
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
            "r15",
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
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
