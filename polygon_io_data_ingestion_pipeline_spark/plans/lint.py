"""Physical-plan linting: the scale-killer checks the test suite runs
on every registry query (tests/test_plan_quality.py), packaged as a
library so user pipelines can gate THEIR plans in CI the same way.

At 100 TB the difference between a plan that runs and one that never
finishes is usually one of a handful of physical shapes, all visible
in ``explain`` output before a single byte is read:

- ``error``-class: row-at-a-time Python UDFs (BatchEvalPython),
  cartesian products, broadcast nested-loop joins — each turns a
  linear job into a per-row/per-pair one.
- ``warn``-class: a single-partition exchange (a global window or
  un-partitioned sort serializes the whole dataset through one task),
  a filter sitting above a scan that pushed nothing down (the scan
  reads everything the filter will throw away), a global sort feeding
  a limit (TakeOrdered exists for that), and Arrow-batched Python
  (legitimate for media decode; worth flagging in hot paths).

``lint_plan`` returns findings; ``assert_scalable`` raises on any
``error`` finding — the one-liner for a CI gate or a notebook
preflight.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn"
    detail: str


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan (same text as .explain("formatted"))."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def lint_plan(df: DataFrame, allow_arrow_python: bool = True) -> list[Finding]:
    plan = plan_text(df)
    out: list[Finding] = []

    if "BatchEvalPython" in plan:
        out.append(
            Finding(
                "python-row-udf",
                "error",
                "row-at-a-time Python UDF in the plan: ~10-100x slower than "
                "builtin expressions; rewrite with pyspark.sql.functions or "
                "a Pandas UDF",
            )
        )
    if "ArrowEvalPython" in plan and not allow_arrow_python:
        out.append(
            Finding(
                "python-arrow-udf",
                "warn",
                "Arrow-batched Python stage present — fine for media decode, "
                "suspect in a relational hot path",
            )
        )
    if "CartesianProduct" in plan:
        out.append(
            Finding(
                "cartesian-product",
                "error",
                "cartesian product: O(|L|x|R|) pairs; add an equi key "
                "(bucketize ranges, block fuzzy matches, band LSH)",
            )
        )
    # BNLJ comes in two flavors, told apart by the per-node
    # "Join condition:" in the formatted detail block. Condition None is
    # how Spark attaches a broadcast SCALAR (crossJoin / join with a
    # 1-row aggregate) — legitimate and everywhere in this repo; flag
    # softly so a non-tiny build side still gets eyeballs. A CONDITION-
    # BEARING BNLJ means the planner found no equi key for a real join
    # (pure range/inequality predicates) — per-pair work at scale.
    for m in re.finditer(r"\(\d+\) BroadcastNestedLoopJoin", plan):
        cond = re.search(r"Join condition: (.+)", plan[m.end():])
        if cond is None or cond.group(1).strip() == "None":
            out.append(
                Finding(
                    "scalar-cross-join",
                    "warn",
                    "condition-less broadcast nested-loop join — fine for "
                    "attaching a 1-row/broadcast scalar; verify the build "
                    "side is tiny",
                )
            )
        else:
            out.append(
                Finding(
                    "nested-loop-join",
                    "error",
                    "broadcast nested-loop join with a non-equi condition "
                    f"({cond.group(1).strip()}): the planner found no equi "
                    "key (pure range/inequality predicates do this) — "
                    "per-pair work at scale; see operators/intervals.py for "
                    "the bucketized shape",
                )
            )
    if "SinglePartition" in plan:
        out.append(
            Finding(
                "single-partition-exchange",
                "warn",
                "a stage funnels ALL rows through one task (global window or "
                "un-partitioned sort?) — fine for tiny aggregates, a "
                "serialization point otherwise; partition the window or use "
                "a two-level formulation",
            )
        )
    # A Filter node sitting directly over a scan that pushed nothing:
    # the scan reads rows the filter immediately drops. Matched
    # STRUCTURALLY in the tree text — a Filter line whose next tree
    # line is that scan — then the scan's detail block is checked for
    # an empty PushedFilters. (Pairing "any empty-pushdown scan" with
    # "any Filter anywhere" would false-positive on every join with a
    # predicate-free dimension scan plus an unrelated post-join
    # filter.) Non-pushable predicates — casts/functions over the
    # scanned column — land here too; the warn asks "did you mean
    # this".
    tree_lines = [ln for ln in plan.splitlines() if re.search(r"\(\d+\)", ln)]
    for i, ln in enumerate(tree_lines[:-1]):
        if re.search(r"\bFilter \(\d+\)", ln):
            nxt = tree_lines[i + 1]
            m = re.search(r"Scan \w+ .*\((\d+)\)", nxt)
            if not m:
                # codegen/ColumnarToRow wrappers may sit between
                for nxt2 in tree_lines[i + 1 : i + 3]:
                    m = re.search(r"Scan \w+ .*\((\d+)\)", nxt2)
                    if m:
                        break
            if m:
                detail = re.search(
                    rf"\({m.group(1)}\) Scan.*?(?=\n\(\d+\)|\Z)", plan, re.DOTALL
                )
                if detail and "PushedFilters: []" in detail.group(0):
                    out.append(
                        Finding(
                            "unpushed-filter",
                            "warn",
                            "a Filter sits directly over a scan that pushed "
                            "no filters — check the predicate is pushable "
                            "(no casts/functions over the scanned column)",
                        )
                    )
                    break
    # A Sort node DIRECTLY feeding a global limit (bare "Sort" substring
    # would false-positive on every SortMergeJoin/SortAggregate in a
    # plan that happens to contain a limit).
    for i, ln in enumerate(tree_lines[:-1]):
        if "GlobalLimit" in ln and re.search(r"\bSort \(\d+\)", tree_lines[i + 1]):
            out.append(
                Finding(
                    "sort-for-limit",
                    "warn",
                    "global sort feeding a limit — orderBy(...).limit(k) "
                    "compiles to TakeOrdered when adjacent; something "
                    "between them forced a full sort",
                )
            )
            break
    return out


def assert_scalable(
    df: DataFrame,
    allow_arrow_python: bool = True,
    allow: tuple[str, ...] = (),
) -> list[Finding]:
    """Raise AssertionError on any error-class finding; return all
    findings (incl. warns) otherwise — the CI-gate one-liner.

    ``allow`` names rules to acknowledge rather than fail on — the
    suppression a gate needs for the rare legitimate exception (e.g. a
    nested-loop condition against a build side KNOWN to be one row,
    where the linter cannot see the cardinality). Suppressions should
    carry a written justification at the call site."""
    findings = lint_plan(df, allow_arrow_python=allow_arrow_python)
    errors = [f for f in findings if f.severity == "error" and f.rule not in allow]
    if errors:
        raise AssertionError(
            "plan has scale-killer shapes: "
            + "; ".join(f"{f.rule}: {f.detail}" for f in errors)
        )
    return findings
