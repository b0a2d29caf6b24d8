"""Capture .explain("formatted") for named contract entries → files.

Usage: python tools/capture_plans.py <repo_root> <out_suffix> <entry...>

Runs the entries from <repo_root>'s __spark_entry__ at sf0.01 and writes
plans/r10/<entry>_<out_suffix>.txt into THIS repo (cwd). Set
SPARK_GRAFT_ADAPTIVE_MIN_BYTES=0 in the environment to capture the
cluster-scale (gate-open) plan where parquet scans are visible.
"""

import contextlib
import io
import os
import sys


def main():
    repo_root, suffix = sys.argv[1], sys.argv[2]
    entries = sys.argv[3:]
    sys.path.insert(0, repo_root)
    import __spark_entry__ as entrymod
    from redisgraph_spark import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qs = entrymod.queries()
    outdir = os.path.join(os.getcwd(), "plans",
                          os.environ.get("SPARK_GRAFT_PLANS_DIR", "r10"))
    os.makedirs(outdir, exist_ok=True)
    for name in entries:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted'), sf0.01, "
                    f"gate_min_bytes={os.environ.get('SPARK_GRAFT_ADAPTIVE_MIN_BYTES', 'default')}\n")
            f.write(buf.getvalue().strip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
