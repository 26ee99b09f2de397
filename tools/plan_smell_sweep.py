"""r11 registry-wide plan-smell sweep (OPTIMIZATION_r11.md).

Builds every registered query's formatted plan at sf0.001 and flags:
- Expand nodes not explained by rollup/cube/grouping-sets/pivot
  (mixed distinct/plain aggregates multiply scan rows N_distinct+1 x)
- >=4 static scans of one table (re-derived lineages)
- CartesianProduct nodes

Findings and their triage (fixed: x171/x175/x231/x111; declared-
surface or by-design: the rest) are recorded in OPTIMIZATION_r11.md.
Usage: python tools/plan_smell_sweep.py   (writes /tmp/plan_sweep.json)
"""
import sys, re, json, os, traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
from tools.opt_profile import build_session
from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
from capgemini_himss24_fhirbulkdata_demo_spark.plans.inspect import explain_str

# smallest shipped fixture next to $SPARK_GRAFT_SF_DIR (ADVICE r11:
# derive paths like opt_profile does instead of hardcoding this box's)
_SF_BASE = os.path.dirname(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
)
SF = os.path.join(_SF_BASE, "sf0.001")
if not os.path.isdir(SF):
    SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session()
rows = []
for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, SF)
        plan = explain_str(df)
        for dep in getattr(df, "_cached_deps", []):
            dep.unpersist()
    except Exception as e:
        rows.append((name, -1, -1, -1, f"ERR {type(e).__name__}: {e}"))
        continue
    n_expand = len(re.findall(r"^\(\d+\) Expand", plan, re.M))
    grouping = "spark_grouping_id" in plan
    scans = re.findall(r"Location:.*/(\w+)\.parquet", plan)
    from collections import Counter
    c = Counter(scans)
    worst = c.most_common(1)[0] if c else ("", 0)
    cart = plan.count("CartesianProduct")
    rows.append((name, n_expand, int(grouping), cart, f"{worst[0]}x{worst[1]}"))
    if n_expand and not grouping:
        print(f"EXPAND {name}: {n_expand} expand, scans={dict(c)}", flush=True)
    if worst[1] >= 4:
        print(f"MULTISCAN {name}: {dict(c)}", flush=True)
    if cart:
        print(f"CARTESIAN {name}", flush=True)
with open("/tmp/plan_sweep.json", "w") as f:
    json.dump(rows, f)
print("done", len(rows))
