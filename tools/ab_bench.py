"""Interleaved A/B query bench between two checkouts of this repo.

The round-2 bench recorded 2-3x slowdowns on four queries whose code
did not change; this VM's delivered CPU swings ~3x across the day, so
lone before/after numbers cannot distinguish host weather from a real
regression. This harness alternates fresh-process runs of the SAME
queries from two worktrees within the same minutes (A B B A A B ...),
so any host drift hits both sides symmetrically.

Usage:
  python tools/ab_bench.py A_TREE B_TREE ROUNDS NAME [NAME...]
  python tools/ab_bench.py --child TREE SF_DIR NAME [NAME...]   (internal)

Each child process: sys.path pins TREE, one Spark session, per query
one untimed warm run then median of 3 noop-sink runs (bench.py's sink:
full plan execution, no driver transfer).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(tree: str, sf_dir: str, names: list[str]) -> None:
    sys.path.insert(0, tree)
    import __spark_entry__ as entrymod  # noqa: E402
    from newsleak_spark.session import get_spark  # noqa: E402

    spark = get_spark(app_name="ab_bench")
    spark.range(1_000).count()
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(time.time() - t0)
        out[name] = round(statistics.median(reps), 3)
    print("ABRESULT " + json.dumps({"tree": tree, "timings": out}), flush=True)


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4:])
        return
    tree_a, tree_b, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    results: dict[str, list[dict[str, float]]] = {tree_a: [], tree_b: []}
    for r in range(rounds):
        order = (tree_a, tree_b) if r % 2 == 0 else (tree_b, tree_a)
        for tree in order:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", tree, SF_DIR]
                + names,
                capture_output=True, text=True, timeout=1800,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")]
            if not line:
                print(f"child for {tree} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                sys.exit(1)
            rec = json.loads(line[-1][len("ABRESULT "):])
            results[tree].append(rec["timings"])
            print(f"round {r} {tree}: {rec['timings']}", flush=True)
    summary = {}
    for name in names:
        a = statistics.median(t[name] for t in results[tree_a])
        b = statistics.median(t[name] for t in results[tree_b])
        summary[name] = {
            "a_median": a, "b_median": b,
            "b_over_a": round(b / a, 3) if a else None,
            "a_all": [t[name] for t in results[tree_a]],
            "b_all": [t[name] for t in results[tree_b]],
        }
    print(json.dumps({"a": tree_a, "b": tree_b, "sf": SF_DIR, "queries": summary},
                     indent=1))


if __name__ == "__main__":
    main()
