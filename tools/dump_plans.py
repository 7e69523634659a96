"""Dump .explain('formatted') for named driver-contract queries into
plans/r08/<query>_<tag>.txt (optimization-round evidence artifacts).

Usage: python tools/dump_plans.py before q1,q2,...
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry
from json_time_series_extractor_spark.plans.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    out_dir = os.path.join("/root/repo", "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="jtse-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    queries = entry.queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        print(name, "exchanges:", txt.count("Exchange "),
              "pythonEval:", txt.count("EvalPython")
              + txt.count("MapInPandas") + txt.count("ArrowEval"),
              "-> ", path)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
