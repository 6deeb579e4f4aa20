"""Plan-level lint for the higher-order-function lambda rule (r3 VERDICT #9).

The r3 scale-class bug: an outer expression embedded in an
``F.transform``/``filter``/``zip_with`` lambda body is re-evaluated once
PER ARRAY ELEMENT — ``transform(sequence(...), i ->
slice(regexp_extract_all(text), i+1, n))`` re-tokenized a 500k-token mega
doc 500k times, invisible at oracle scale, quadratic at corpus scale.
The repo rule (CLAUDE.md): any HOF lambda must reference ONLY its lambda
variables (and literals / enclosing lambda variables).

This lint enforces the rule mechanically on the OPTIMIZED logical plan —
after constant folding, so a literal-only subtree like ``sequence(1, 3)``
has already collapsed to a Literal and doesn't false-positive.  Any
``AttributeReference`` or ``OuterReference`` inside a ``LambdaFunction``
body is an offense: the expression tree that produced it rides inside the
lambda and Catalyst evaluates it per element.  (A bare outer attribute is
the cheapest possible violation, but it is also how every expensive one
starts — the rule is strict because the analyzed shape, not the current
cost, is what survives refactors.)

The plan JSON is Catalyst's own serialization: each expression tree is a
flattened prefix-order list of node dicts with ``num-children``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

_EXPR = "org.apache.spark.sql.catalyst.expressions."
_LAMBDA = _EXPR + "LambdaFunction"
_OFFENDING_LEAVES = (
    _EXPR + "AttributeReference",
    _EXPR + "OuterReference",
)


def _is_flat_tree(x: Any) -> bool:
    return (
        isinstance(x, list)
        and len(x) > 0
        and all(
            isinstance(e, dict) and "class" in e and "num-children" in e
            for e in x
        )
    )


def _build(nodes: list[dict]) -> list[tuple[dict, list]]:
    """Rebuild prefix-order flattened node list into (node, children) trees."""
    it = iter(nodes)

    def one():
        n = next(it)
        return (n, [one() for _ in range(n.get("num-children", 0))])

    roots = []
    while True:
        try:
            roots.append(one())
        except StopIteration:
            return roots


def _collect_offenses(tree: tuple[dict, list], out: list[str]) -> None:
    node, kids = tree
    if node["class"] == _LAMBDA and kids:
        body = kids[0]  # LambdaFunction children = [function, *arguments]
        _scan_body(body, out)
        for arg in kids[1:]:
            _collect_offenses(arg, out)
    else:
        for k in kids:
            _collect_offenses(k, out)


def _scan_body(tree: tuple[dict, list], out: list[str]) -> None:
    node, kids = tree
    if node["class"] in _OFFENDING_LEAVES:
        out.append(
            f"outer {node['class'].rsplit('.', 1)[-1]} "
            f"'{node.get('name', '?')}' referenced inside a lambda body"
        )
    # nested lambdas: their bodies are subject to the same rule, their
    # argument NamedLambdaVariables are fine — plain recursion covers both
    for k in kids:
        _scan_body(k, out)


def find_lambda_offenses(df: DataFrame) -> list[str]:
    """All outer-attribute references inside HOF lambda bodies of the
    frame's optimized plan. Empty list == clean."""
    plan_json = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    offenses: list[str] = []

    def walk(x: Any) -> None:
        if isinstance(x, list):
            if _is_flat_tree(x):
                for tree in _build(x):
                    _collect_offenses(tree, offenses)
            # ALSO recurse into the node dicts themselves: operator nodes
            # carry their expression trees in named FIELDS (projectList,
            # condition, ...), not as plan-level children
            for e in x:
                walk(e)
        elif isinstance(x, dict):
            for v in x.values():
                walk(v)

    walk(plan_json)
    return offenses


def assert_no_lambda_offenses(df: DataFrame, context: str = "") -> None:
    off = find_lambda_offenses(df)
    if off:
        raise AssertionError(
            f"HOF-lambda rule violated{f' in {context}' if context else ''}: "
            + "; ".join(sorted(set(off)))
            + " — outer expressions re-evaluate once per array element "
            "(see CLAUDE.md r3; fix by pre-projecting outside the lambda)"
        )
