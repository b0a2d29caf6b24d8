"""Run a filtered slice of the TCK corpus (INCLUDING @skip/@crash-
tagged scenarios the reference cannot run) and report outcomes.

    python tools/tck_sweep.py Temporal            # feature prefix
    python tools/tck_sweep.py Temporal9 -v        # show failures
    python tools/tck_sweep.py --all               # whole tagged set

Used to grow tests/tck_passing_extended.txt (tools/tck_report.py
--extend rewrites the ratchet)."""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix", nargs="?", default="")
    ap.add_argument("--all", action="store_true",
                    help="run untagged scenarios too")
    ap.add_argument("-v", "--verbose", type=int, default=12,
                    help="number of failures to print")
    ap.add_argument("--write-extended", action="store_true",
                    help="rewrite tests/tck_passing_extended.txt with "
                         "every TAGGED scenario that passes (the "
                         "beyond-reference ratchet)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from collections import Counter

    from redisgraph_spark.tck import load_scenarios
    from redisgraph_spark.tck.runner import run_scenario

    scs = load_scenarios()
    if not args.all:
        scs = [s for s in scs
               if any(t in ("@skip", "@crash") for t in s.tags)]
    if args.prefix:
        scs = [s for s in scs if s.feature.startswith(args.prefix)]
    counts = Counter()
    fails = []
    passing = []
    for i, sc in enumerate(scs):
        o = run_scenario(spark, sc)
        counts[o.status] += 1
        if o.status in ("FAIL", "ERROR"):
            fails.append(o)
        elif o.status == "PASS":
            passing.append(o.scenario)
        if (i + 1) % 100 == 0:
            print(f"  …{i + 1}/{len(scs)} {dict(counts)}",
                  file=sys.stderr)
    if args.write_extended and not args.prefix and not args.all:
        path = "tests/tck_passing_extended.txt"
        with open(path, "w") as f:
            for name in sorted(passing):
                f.write(name + "\n")
        print(f"wrote {len(passing)} scenarios to {path}")
    print(f"{len(scs)} scenarios: {dict(counts)}")
    for o in fails[:args.verbose]:
        print(f"  {o.status}: {o.scenario}\n      {o.detail[:200]}")
    by_feat = Counter(o.scenario.split("::")[0].split(" - ")[0]
                      for o in fails)
    if by_feat:
        print("failures by feature:", dict(by_feat.most_common()))


if __name__ == "__main__":
    main()
