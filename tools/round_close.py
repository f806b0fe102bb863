"""Round-close driver: run the full artifact-regeneration sequence in
the one order that keeps every checked-in claim consistent with the
final registry, then assert the consistency invariants.

This is the executable form of the per-round checklist (r13 verdict
item 5 asked for the census to be wired next to the plans regen so it
cannot lag the registry; a single entry point makes the whole sequence
un-laggable):

    1. tools/make_plans.py      -> PLANS.md       (captured plans)
    2. tools/plan_census.py     -> PLANCENSUS.md  (zero-unexplained audit)
    3. tools/driver_replica.py  -> REPLICA_rNN.json (full strict sweep)
    4. consistency asserts      -> registry count appears in all three,
                                   replica is all-green, census has no
                                   unexplained markers

Run AFTER the round's last query registration:

    python tools/round_close.py 15        # -> REPLICA_r15.json

The bench run stays separate (it needs an idle machine and its own
retry gate — see bench.py); everything here is untimed.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run(args: list[str]) -> None:
    print(f"== running: {' '.join(args)}", flush=True)
    subprocess.run(args, cwd=REPO, check=True)


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python tools/round_close.py <round-number>")
    rnd = int(sys.argv[1])
    replica_path = os.path.join(REPO, f"REPLICA_r{rnd}.json")

    from columnarmodeling_spark.queries import REGISTRY

    n = len(REGISTRY)
    py = sys.executable

    _run([py, "tools/make_plans.py"])
    _run([py, "tools/plan_census.py"])
    _run([py, "tools/driver_replica.py", "--all", "--json", replica_path])

    # --- consistency asserts -------------------------------------------------
    errs: list[str] = []

    census = open(os.path.join(REPO, "PLANCENSUS.md")).read()
    m = re.search(r"over all (\d+) registered queries", census)
    if not m or int(m.group(1)) != n:
        errs.append(
            f"PLANCENSUS.md header covers {m.group(1) if m else '???'} "
            f"queries, registry has {n}"
        )
    if "Unexplained hits: 0." not in census:
        errs.append("PLANCENSUS.md reports unexplained marker hits")

    rep = json.load(open(replica_path))
    if len(rep) != n:
        errs.append(f"replica has {len(rep)} records, registry has {n}")
    bad = [
        q
        for q, v in rep.items()
        if v.get("err") or v.get("rows_match") is False
        or v.get("hash_match") is False
    ]
    if bad:
        errs.append(f"replica non-green rows: {bad[:10]}")

    plans = open(os.path.join(REPO, "PLANS.md")).read()
    n_plans = plans.count("\n## ")
    print(f"== registry {n} queries; PLANS.md {n_plans} captured plans; "
          f"replica {len(rep)} records")

    # --- bench cleanliness ratchet (r14 verdict item 1) ----------------------
    # The official perf artifact must be a clean run, or provably the
    # best available (all attempts dirty AND the published one is the
    # lowest-steal attempt — bench.py's fallback rule). A dirty regen
    # must never have displaced a clean committed run; bench.py's own
    # ratchet enforces that at write time, this assert catches it at
    # close time.
    bench_path = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(bench_path):
        bf = json.load(open(bench_path))
        pub = bf["attempts"][bf["published_attempt"]]
        if not pub["run_conditions"]["run_clean"]:
            fracs = [
                a["run_conditions"]["steal_frac"] for a in bf["attempts"]
            ]
            if pub["run_conditions"]["steal_frac"] > min(fracs):
                errs.append(
                    "BENCH_FULL.json publishes a dirty attempt that is "
                    "not the lowest-steal one"
                )
            else:
                print(
                    "WARN: BENCH_FULL.json publishes a dirty run "
                    f"(steal_frac {pub['run_conditions']['steal_frac']}); "
                    "rerun bench in a cleaner window before round end"
                )
        else:
            print(
                f"== BENCH_FULL.json clean (steal "
                f"{pub['run_conditions']['steal_s_during_run']}s over "
                f"{pub['run_conditions']['timed_region_s']}s)"
            )
    else:
        print("WARN: BENCH_FULL.json missing — run bench.py before round end")

    # --- driver-artifact freshness (r14 verdict item 8) -----------------------
    # LEAKCHECK/COPYCHECK are driver-written; at close time the newest
    # available round field is rnd-1 (this round's sweep runs after the
    # close). Anything older means the sweeps stalled and the round's
    # leak/copy claims rest on stale evidence.
    leak_path = os.path.join(REPO, "LEAKCHECK.json")
    if not os.path.exists(leak_path):
        errs.append("LEAKCHECK.json missing")
    else:
        leak = json.load(open(leak_path))
        if leak.get("round", -1) < rnd - 1:
            errs.append(
                f"LEAKCHECK.json is stale (round {leak.get('round')}, "
                f"closing round {rnd})"
            )
        elif leak.get("n_hits", 0) != 0:
            errs.append(f"LEAKCHECK.json has {leak['n_hits']} hits")
        else:
            print(f"== LEAKCHECK.json fresh (round {leak['round']}, 0 hits)")
    copy_path = os.path.join(REPO, "COPYCHECK.json")
    if not os.path.exists(copy_path):
        errs.append("COPYCHECK.json missing")
    else:
        cp = json.load(open(copy_path))
        if cp.get("flagged"):
            errs.append(f"COPYCHECK.json flags files: {cp['flagged'][:5]}")
        else:
            print("== COPYCHECK.json empty (threshold "
                  f"{cp.get('threshold')})")

    if errs:
        for e in errs:
            print(f"FAIL: {e}", file=sys.stderr)
        sys.exit(1)
    print(f"== round {rnd} close: all artifacts consistent "
          f"({n} queries, replica all-green, census zero-unexplained)")


if __name__ == "__main__":
    main()
