"""Dump .explain('formatted') for named catalog queries to files.

Usage: python jobs/dump_plans.py <repo_root> <out_dir> <suffix> [query ...]
Writes <out_dir>/<query>_<suffix>.txt.  Run with repo_root = a worktree of the
round-start commit for the _before set, and the live tree for _after.
"""
import contextlib
import io
import os
import sys

repo_root = sys.argv[1]
out_dir = sys.argv[2]
suffix = sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo_root)

from nerzo_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

spark = get_spark("dump-plans", master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

from nerzo_spark.plans import catalog  # noqa: E402
import nerzo_spark.plans.catalog_ivf  # noqa: F401,E402
import nerzo_spark.plans.catalog_kg  # noqa: F401,E402
import nerzo_spark.plans.catalog_more  # noqa: F401,E402
import nerzo_spark.plans.catalog_text  # noqa: F401,E402
import nerzo_spark.plans.catalog_vec  # noqa: F401,E402

os.makedirs(out_dir, exist_ok=True)
qs = catalog.queries()
for name in names:
    df = qs[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(name, "ok")
