"""Physical-plan linter: the 100 TB design review, as code.

Every scale rule this repo's plans follow by hand (PLANS.md; the
plan-shape guards in tests) is a string-detectable property of the
executed/optimized plan. This module mechanizes them, so a CI sweep —
`tests/test_plan_lint.py` runs it over EVERY registered query — catches
a regression the moment a plan picks up a scale-killer, instead of at
the next manual `.explain()` audit.

Rules (severity):

- ``cartesian-product`` (error): a ``CartesianProduct`` node — the
  unbounded |L|×|R| shuffle join. At 100 TB this never finishes.
- ``python-row-udf`` (error): ``BatchEvalPython`` — row-at-a-time
  Python in the plan (§2.7 bans it; Arrow evaluation shows up as
  ``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas`` and is
  allowed — flagged as info so hot paths stay auditable).
- ``bnl-join`` (warn): ``BroadcastNestedLoopJoin`` — legitimate for a
  broadcast-tiny side (1-row stats crosses, binned theta residuals),
  lethal otherwise; the linter can't see sizes, so it warns and the
  caller allowlists the intentional ones.
- ``global-window`` (warn): a ``Window`` node with no partition spec —
  all rows to one task unless the input is already limited.
- ``global-sort`` (warn): a global ``Sort`` that isn't the
  ``TakeOrderedAndProject`` fusion and has no ``Limit``/window above
  it — a full range-shuffle ordering of the relation.
- ``arrow-python`` (info): Arrow-batched Python stages — allowed, but
  each one is a JVM↔Python boundary worth knowing about.
- ``exchange-count`` (info): number of shuffle exchanges (hash +
  range + single-partition), the plan's dominant cost driver.
- ``unpushed-filter`` (info): a ``Filter`` node in a plan where some
  parquet scan reports ``PushedFilters: []`` — often benign (derived
  columns can't push), but the first thing to check when a scan is
  slow.

Detection is on the plan STRING (same substrate as the repo's
plan-shape tests): stable across Spark 3.x/4.x for these node names,
zero JVM round-trips beyond the one ``toString``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn" | "info"
    detail: str


def _plan_strings(df: DataFrame, executed: bool = True) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    phys = (qe.executedPlan() if executed else qe.sparkPlan()).toString()
    # an AQE plan that already ran prints "Final Plan" + "Initial Plan";
    # lint the final one (what actually executed / will execute)
    if "== Initial Plan ==" in phys:
        phys = phys.split("== Initial Plan ==")[0]
    return phys, qe.optimizedPlan().toString()


def _balanced(s: str, start: int) -> str:
    """Contents of the paren group opening at ``s[start] == '('``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
    return s[start + 1 :]


def _top_level_args(s: str) -> list[str]:
    args: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "(" or ch == "[":
            depth += 1
        elif ch == ")" or ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


_ORDER_MARK = re.compile(r" (ASC|DESC)\b")


def _global_window_specs(phys: str) -> list[str]:
    """Unique ``windowspecdefinition`` argument lists with NO partition
    expression. The plan printer elides empty arg lists on the Window
    node itself (a partition-only window and an order-only window both
    print two bracket groups), so bracket counting cannot distinguish
    them — the spec args can: order expressions carry an ASC/DESC
    marker, partition expressions never do, and the frame is the
    trailing ``specifiedwindowframe(...)``."""
    out: list[str] = []
    pos = 0
    while True:
        i = phys.find("windowspecdefinition(", pos)
        if i < 0:
            break
        body = _balanced(phys, i + len("windowspecdefinition"))
        pos = i + len("windowspecdefinition") + len(body)
        exprs = [
            a
            for a in _top_level_args(body)
            if not a.startswith("specifiedwindowframe")
        ]
        has_partition = any(not _ORDER_MARK.search(a) for a in exprs)
        if not has_partition and body not in out:
            out.append(body)
    return out


# Higher-order-function expression heads as they print in an optimized
# logical plan. Lowercase, so the logical `Filter (...)` node never
# collides with the `filter(lambda …)` HOF.
_HOF_HEADS = ("transform(", "aggregate(", "zip_with(", "exists(", "filter(")


def hof_counts(df: DataFrame) -> dict[str, int]:
    """Occurrences of each array higher-order-function head in the
    OPTIMIZED logical plan. The repeated-derivation detector (VERDICT
    r16 #2): when a filter above a projection is predicate-pushed with
    its alias substituted, an expensive HOF chain silently multiplies
    across scan filters and join branches — q36's sq8 leg shipped a 4×
    warm regression this way (18 ``transform(`` vs 6 clean) while
    staying hash-green. Pin a ceiling per hot plan in CI; the counts
    are plan-shape, so they are stable across data scale."""
    _, opt = _plan_strings(df)
    return {h.rstrip("("): opt.count(h) for h in _HOF_HEADS}


def lint_plan(df: DataFrame) -> list[Finding]:
    """Lint a DataFrame's physical plan; returns findings ordered
    errors-first. Call AFTER an action if you want the AQE-final plan
    (pre-action it lints the initial physical plan, which is the
    conservative choice — AQE only ever improves on it)."""
    phys, _opt = _plan_strings(df)
    out: list[Finding] = []

    for n in range(phys.count("CartesianProduct")):
        out.append(
            Finding(
                "cartesian-product",
                "error",
                "CartesianProduct join: unbounded |L|x|R| work — broadcast "
                "one side, add an equi/band key, or pre-aggregate",
            )
        )
    if "BatchEvalPython" in phys:
        out.append(
            Finding(
                "python-row-udf",
                "error",
                "BatchEvalPython: row-at-a-time Python UDF in the plan — "
                "use built-in Column functions or an Arrow-batched form",
            )
        )
    for _ in range(phys.count("BroadcastNestedLoopJoin")):
        out.append(
            Finding(
                "bnl-join",
                "warn",
                "BroadcastNestedLoopJoin: fine for a broadcast-tiny side "
                "(stats crosses, theta residuals); verify the build side "
                "is bounded",
            )
        )
    for spec in _global_window_specs(phys):
        out.append(
            Finding(
                "global-window",
                "warn",
                "Window with no partition spec: every row moves to one "
                "task — partition the window or bound its input first "
                f"(windowspecdefinition({spec[:80]}...))",
            )
        )
    # global Sort not fused into TakeOrderedAndProject and with no limit
    # above it anywhere
    if (
        re.search(r"\bSort \[.*\], true,", phys)
        and "TakeOrderedAndProject" not in phys
        and not re.search(r"\b(Global|Local)?Limit\b", phys)
    ):
        out.append(
            Finding(
                "global-sort",
                "warn",
                "global Sort with no Limit: full range-shuffle ordering — "
                "top-k should fuse into TakeOrderedAndProject; full "
                "ordering belongs in the sink's write, if anywhere",
            )
        )
    n_arrow = sum(
        phys.count(tag)
        for tag in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
    if n_arrow:
        out.append(
            Finding(
                "arrow-python",
                "info",
                f"{n_arrow} Arrow-batched Python stage(s): allowed, but "
                "each is a JVM<->Python boundary",
            )
        )
    n_ex = len(re.findall(r"\bExchange (hash|range)partitioning", phys)) + phys.count(
        "Exchange SinglePartition"
    )
    out.append(
        Finding("exchange-count", "info", f"{n_ex} shuffle exchange(s) in the plan")
    )
    if "PushedFilters: []" in phys and "Filter " in phys:
        out.append(
            Finding(
                "unpushed-filter",
                "info",
                "a parquet scan reports PushedFilters: [] while the plan "
                "filters — check whether the predicate could reach the scan",
            )
        )
    order = {"error": 0, "warn": 1, "info": 2}
    out.sort(key=lambda f: (order[f.severity], f.rule))
    return out


def assert_scale_clean(
    df: DataFrame, allow: set[str] | frozenset[str] = frozenset()
) -> list[Finding]:
    """Raise ``AssertionError`` if the plan carries any error-severity
    finding (or warn-severity finding not in ``allow``); returns the
    full finding list otherwise. The CI form of the 100 TB review."""
    findings = lint_plan(df)
    bad = [
        f
        for f in findings
        if f.severity == "error"
        or (f.severity == "warn" and f.rule not in allow)
    ]
    if bad:
        raise AssertionError(
            "plan lint failed:\n" + "\n".join(f"  [{f.severity}] {f.rule}: {f.detail}" for f in bad)
        )
    return findings
