"""Dump `explain('formatted')` for named catalog queries to files —
the judge-facing before/after plan artifacts for optimization rounds:

    python tools/explain_dump.py plans/r14 before q1 q2 ...
    python tools/explain_dump.py plans/r14 after q1 q2 ...

writes plans/r14/<query>_<suffix>.txt at sf0.1.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.session import get_spark, load_tables


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    tables = load_tables(spark, "/root/testdata/sf0.1")
    for name in names:
        df = CATALOG[name].build(spark, tables)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
