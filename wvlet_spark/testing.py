"""In-query `test` assertion evaluation (reference: test-syntax.md,
TestRelation/ShouldExpr) — evaluated on the collected Spark result."""

from __future__ import annotations

import datetime
import decimal
import math

from wvlet_spark import nodes as N


class TestFailure(AssertionError):
    pass


def evaluate_tests(df, tests: list[N.Expr]) -> list[tuple[bool, str]]:
    """Evaluate test expressions against a result DataFrame.
    Returns [(passed, message)]; raises TestFailure on first failure."""
    results = []
    state = _ResultState(df)
    for t in tests:
        ok, msg = _eval_test(state, t)
        results.append((ok, msg))
        if not ok:
            raise TestFailure(msg)
    return results


class _ResultState:
    def __init__(self, df):
        self.df = df
        self._rows = None

    @property
    def rows(self):
        if self._rows is None:
            self._rows = [list(r) for r in self.df.collect()]
        return self._rows

    @property
    def size(self):
        return len(self.rows)

    @property
    def columns(self):
        return list(self.df.columns)

    @property
    def json(self):
        import json

        return "\n".join(
            json.dumps(dict(zip(self.columns, r)), default=str,
                       separators=(",", ":")) for r in self.rows)

    @property
    def output(self):
        from wvlet_spark.printer import render_box

        return render_box(self.columns, self.rows, self.df.schema)


def _eval_test(state: _ResultState, t: N.Expr) -> tuple[bool, str]:
    if isinstance(t, N.Comparison) and t.op.startswith("should"):
        left = _eval_value(state, t.left)
        right = _eval_value(state, t.right)
        if t.op in ("should_be", "="):
            ok = _values_equal(left, right)
            return ok, "ok" if ok else f"expected {right!r} but got {left!r}"
        if t.op == "should_not_be":
            ok = not _values_equal(left, right)
            return ok, "ok" if ok else f"expected not {right!r}"
        if t.op == "should_contain":
            ok = _contains(left, right)
            return ok, "ok" if ok else f"{left!r} does not contain {right!r}"
        if t.op == "should_not_contain":
            ok = not _contains(left, right)
            return ok, "ok" if ok else f"{left!r} contains {right!r}"
    # plain boolean comparison test
    val = _eval_value(state, t)
    return bool(val), "ok" if val else f"test failed: {val!r}"


def _eval_value(state: _ResultState, e: N.Expr):
    if isinstance(e, N.MethodCall) and isinstance(e.target, N.Underscore):
        m = e.method
        if m == "size":
            return state.size
        if m == "columns":
            return state.columns
        if m == "rows":
            return state.rows
        if m == "json":
            return state.json
        if m == "output":
            return state.output
    if isinstance(e, N.Underscore):
        return state.rows
    if isinstance(e, N.Literal):
        return e.value
    if isinstance(e, N.UnaryOp) and e.op == "-":
        return -_eval_value(state, e.expr)
    if isinstance(e, N.ArrayCtor):
        return [_eval_value(state, i) for i in e.items]
    if isinstance(e, N.Comparison):
        l, r = _eval_value(state, e.left), _eval_value(state, e.right)
        return {
            "=": lambda: _values_equal(l, r),
            "!=": lambda: not _values_equal(l, r),
            "<": lambda: l < r,
            "<=": lambda: l <= r,
            ">": lambda: l > r,
            ">=": lambda: l >= r,
        }[e.op]()
    if isinstance(e, N.Not):
        return not bool(_eval_value(state, e.expr))
    if isinstance(e, N.And):
        return bool(_eval_value(state, e.left)) and bool(_eval_value(state, e.right))
    if isinstance(e, N.Or):
        return bool(_eval_value(state, e.left)) or bool(_eval_value(state, e.right))
    if isinstance(e, N.IsNull):
        v = _eval_value(state, e.expr)
        return (v is not None) if e.negated else (v is None)
    if isinstance(e, N.Ident):
        return e.name
    raise TestFailure(f"unsupported test expression: {type(e).__name__}")


def _values_equal(a, b) -> bool:
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, decimal.Decimal):
        a = float(a)
    if isinstance(b, decimal.Decimal):
        b = float(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool) and not isinstance(b, bool):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (datetime.date, datetime.datetime)):
        return str(a) == str(b) or a == b
    if isinstance(b, (datetime.date, datetime.datetime)):
        return str(b) == str(a)
    if isinstance(a, str) and isinstance(b, str):
        # golden-output blocks are triple-quoted with surrounding newlines
        # (spec/basic/select-json.wv); compare modulo outer whitespace
        return a.strip() == b.strip()
    return a == b


def _contains(container, item) -> bool:
    if isinstance(container, str):
        return str(item) in container
    if isinstance(container, (list, tuple)):
        return any(_values_equal(x, item) for x in container)
    return False
