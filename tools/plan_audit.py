"""Generate docs/PLANS.md: the formatted physical plan of each headline
query at sf0.1, with the scale-relevant plan properties extracted up
front (pushed filters, read schema width, broadcast vs shuffle joins,
exchange count, whole-stage-codegen coverage).

The point (SURVEY.md §4 / README "Scale design"): at 100 TB the plan IS
the performance. This artifact makes plan quality reviewable and
regressions diffable — it is regenerated and committed whenever the
workload changes.

Usage: python tools/plan_audit.py [sf_dir] > docs/PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batchprocessingetl_spark.session import get_spark
from batchprocessingetl_spark.workload import collect_extra_queries, collect_queries

def _audited() -> tuple:
    """Every declared query, in q-number order — the audit is total
    (VERDICT r6 #3/#6): the bench set is a subset by construction
    (pinned by tests/test_plans.py), q40/q41 are back after the
    round-6 rotation dropped them, and the round-6 statistics family
    is covered. Streaming q61 audits its snapshot read-back plan;
    iterative queries audit the final-round plan (their loops run at
    plan-build time)."""
    names = {**collect_queries(), **collect_extra_queries()}
    return tuple(
        sorted(names, key=lambda n: int(re.match(r"q(\d+)", n).group(1)))
    )


AUDITED = _audited()


def _depth(line: str) -> int:
    """Tree depth of a physical-plan toString line = length of its
    branch-drawing prefix (spaces, ':', '+', '-'). Operator names never
    start with those characters."""
    return len(line) - len(line.lstrip(" :+-"))


def _window_is_global(line: str) -> bool:
    """True when a `Window [...]` plan line has NO partition spec.

    WindowExec prints `Window [exprs], [partitionSpec], [orderSpec]`;
    the partition list is omitted when empty, so a global window shows
    either `Window [exprs]` (unordered) or `Window [exprs], [order]`
    where every entry in the single trailing list carries ASC/DESC.
    """
    m = re.search(r"\bWindow (\[.*)$", line)
    if not m:
        return False
    parts = m.group(1).split("], [")
    if len(parts) >= 3:
        return False
    if len(parts) == 2:
        tail = parts[1]
        return " ASC" in tail or " DESC" in tail
    return True


def unguarded_global_windows(plan: str) -> int:
    """Count empty-partition WindowExec nodes NOT sitting above a
    grain-collapsing aggregate (VERDICT r7 #3).

    A global window serializes its whole input into one task, which is
    only acceptable on a frame whose cardinality a previous aggregate
    has collapsed to domain size (cents bins, distinct ranks, test
    ids). This walks each global Window node's SUBTREE (the following
    deeper-indented lines of the depth-first toString): the window is
    guarded if a HashAggregate / SortAggregate / ObjectHashAggregate
    collapses the grain below it, OR a limit operator bounds the frame
    (TakeOrderedAndProject / GlobalLimit / CollectLimit — the IVF
    probe's top-k pools), OR the subtree ends in a ReusedExchange
    (its elided original subtree is audited where it is printed; a
    window directly above an unguarded original still flags there).
    Otherwise the window runs at fact grain — flagged.
    tests/test_plans.py asserts zero unguarded nodes across the
    registered workload and that a synthetic fact-grain global window
    is caught.
    """
    guard = re.compile(
        r"\b(?:(?:Hash|Sort|ObjectHash)Aggregate|TakeOrderedAndProject"
        r"|GlobalLimit|CollectLimit|ReusedExchange)\b"
    )
    lines = plan.splitlines()
    bad = 0
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow \[", line) or not _window_is_global(line):
            continue
        d = _depth(line)
        guarded = False
        for below in lines[i + 1 :]:
            if not below.strip():
                break
            if _depth(below) <= d:
                break
            if guard.search(below):
                guarded = True
                break
        if not guarded:
            bad += 1
    return bad


def count_global_windows(plan: str) -> int:
    return sum(
        1
        for line in plan.splitlines()
        if re.search(r"\bWindow \[", line) and _window_is_global(line)
    )


def summarize(plan: str) -> list[str]:
    facts = []
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed and any(p.strip() for p in pushed):
        facts.append(f"pushed filters reach the scan: {sum(bool(p.strip()) for p in pushed)}/{len(scans)} scans")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        # count fields by name:type markers (commas inside decimal(p,s)
        # would overcount)
        widths = [s.count(":") for s in schemas if s]
        facts.append(f"column pruning: scan widths {widths} (cols read, not table width)")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    if n_bhj or n_smj:
        facts.append(f"joins: {n_bhj} broadcast-hash, {n_smj} sort-merge")
    n_ex = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
    facts.append(f"exchanges (shuffles): {n_ex}")
    # AQE final plans mark codegen stages with "*(n)" operator prefixes
    n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
    facts.append(f"whole-stage-codegen spans: {n_wsc}")
    n_gw = count_global_windows(plan)
    if n_gw:
        n_bad = unguarded_global_windows(plan)
        facts.append(
            f"global (empty-partition) Window nodes: {n_gw}"
            + (
                f" — {n_bad} UNGUARDED (fact grain, fix me)"
                if n_bad
                else ", all above a grain-collapsing aggregate"
            )
        )
    return facts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan_audit")
    # static plans for the audit: AQE off so WholeStageCodegen spans and
    # join choices are visible in toString (at runtime AQE only improves
    # on this picture: skew splitting, partition coalescing, SMJ->BHJ);
    # untruncated metadata so ReadSchema/PushedFilters are parseable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    queries = {**collect_queries(), **collect_extra_queries()}
    print("# Physical-plan audit (generated by tools/plan_audit.py)")
    print()
    print(f"Headline queries at `{sf_dir}` — static physical plans (AQE")
    print("disabled for display only); see the tool docstring.")
    for name in AUDITED:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"\n## {name}\n")
        for f in summarize(plan):
            print(f"- {f}")
        print("\n```")
        print(plan[:4000].rstrip())
        print("```")


if __name__ == "__main__":
    main()
