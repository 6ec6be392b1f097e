import sys, re
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from github_etl_spark.session import get_spark
from github_etl_spark.plans import headline_queries

spark = get_spark("plans", cpus=8)
SF = "/root/testdata/sf0.01"

out = ["""# Physical plans — headline queries (sf0.01, local[8])

Generated evidence that the headline plans have the shape the 100 TB
design intends: filters/projections reaching the parquet scan
(`PushedFilters`/`ReadSchema`), dimension joins broadcast, partial
(map-side) aggregation before every exchange. Regenerate with
`python tools/gen_plans.py` after plan-affecting changes.
"""]
for name, fn in sorted(headline_queries().items()):
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    exch = len(re.findall(r"Exchange", plan))
    partial = len(re.findall(r"HashAggregate.*partial|partial_", plan))
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    schemas = re.findall(r"ReadSchema: [^\n]+", plan)
    out.append(f"## {name}\n")
    out.append(f"- broadcast joins: {joins}; sort-merge joins: {smj}; exchanges: {exch}; partial-agg nodes: {partial}")
    for p in dict.fromkeys(pushed):
        if p != "PushedFilters: []":
            out.append(f"- `{p[:180]}`")
    for s in dict.fromkeys(schemas):
        out.append(f"- `{s[:180]}`")
    out.append("")
open("/root/repo/docs/PLANS.md", "w").write("\n".join(out))
print("written")
