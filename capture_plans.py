"""Scratch: capture .explain('formatted') for named queries to
plans/r10/<name>_after.txt (and copy the baseline _before file next to
it). Usage: python capture_plans.py q1 q2 ..."""

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
from fluss_spark import registry  # noqa: E402
from fluss_spark.session import get_spark  # noqa: E402

registry.load_all_queries()
spark = get_spark("capture_plans")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = "/root/repo/plans/r10"

for name in sys.argv[1:]:
    df = registry.QUERIES[name](spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{name}_after.txt"), "w") as f:
        f.write(plan)
    before = os.path.join(out_dir, "_before", f"{name}.txt")
    if os.path.isfile(before):
        shutil.copy(before, os.path.join(out_dir, f"{name}_before.txt"))
    print(f"captured {name}")
