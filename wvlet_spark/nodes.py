"""AST nodes for the wvlet language — expressions and relational plans.

Modeled after the reference's logical plan / expression trees
(wvlet-lang model/plan/relation.scala, model/expr/exprs.scala) but defined
fresh as plain Python dataclasses; no code is shared.  The Spark lowering
walks these trees and emits Spark SQL text (see generator.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Marker prefix for right-side columns carried through the flattened
# asof-join lowering: `r.col` written after an asof join resolves to the
# mangled copy, so duplicated column names keep their true RIGHT-side
# values (unqualified duplicates still resolve left, matching the
# reference's asof output contract).
ASOF_RIGHT_MARK = "__wv_asof_r__"


class Node:
    pass


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


class Expr(Node):
    pass


@dataclass
class Literal(Expr):
    value: object          # python value
    kind: str              # 'int' | 'float' | 'decimal' | 'string' | 'bool' | 'null'


@dataclass
class Ident(Expr):
    name: str
    quoted: bool = False   # came from backquotes


@dataclass
class Ref(Expr):
    """Qualified reference a.b / a.b.c (table.column etc)."""

    qualifier: Expr
    name: str


@dataclass
class Star(Expr):
    qualifier: str | None = None


@dataclass
class Underscore(Expr):
    """`_` — the context input (the group in aggregation, input row elsewhere)."""


@dataclass
class FunctionApply(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)
    is_distinct: bool = False
    window: "WindowSpec | None" = None
    filter: Expr | None = None
    raw: bool = False          # native passthrough: render verbatim, no FUNC_MAP
    ignore_nulls: bool = False
    # ordered aggregation: `array_agg(x order by k [desc], ...)` —
    # [(key_expr, is_desc)]; lowered natively on DuckDB, via a
    # struct-sort composition on Spark
    agg_order: "list[tuple[Expr, bool]] | None" = None


@dataclass
class MethodCall(Expr):
    """expr.method(args) — dot-aggregation sugar or stdlib method."""

    target: Expr
    method: str
    args: list[Expr] = field(default_factory=list)
    window: "WindowSpec | None" = None


@dataclass
class ArithmeticOp(Expr):
    op: str                # + - * / // %
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str                # - / +
    expr: Expr


@dataclass
class Comparison(Expr):
    op: str                # = != < <= > >= <=> (is distinct from handled here)
    left: Expr
    right: Expr


@dataclass
class And(Expr):
    left: Expr
    right: Expr


@dataclass
class Or(Expr):
    left: Expr
    right: Expr


@dataclass
class Not(Expr):
    expr: Expr


@dataclass
class Between(Expr):
    expr: Expr
    lower: Expr
    upper: Expr
    negated: bool = False


@dataclass
class IsNull(Expr):
    expr: Expr
    negated: bool = False


@dataclass
class IsDistinctFrom(Expr):
    left: Expr
    right: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    expr: Expr
    values: list[Expr]
    negated: bool = False


@dataclass
class InSubquery(Expr):
    expr: Expr             # may be a RowCtor for tuple-in-subquery
    query: "Relation"
    negated: bool = False


@dataclass
class Exists(Expr):
    query: "Relation"
    negated: bool = False


@dataclass
class Like(Expr):
    expr: Expr
    pattern: Expr
    escape: Expr | None = None
    negated: bool = False
    is_rlike: bool = False


@dataclass
class IfExpr(Expr):
    cond: Expr
    then: Expr
    otherwise: Expr | None = None


@dataclass
class CaseExpr(Expr):
    target: Expr | None            # case <target> when ... (simple form)
    whens: list[tuple[Expr, Expr]]
    otherwise: Expr | None = None


@dataclass
class Cast(Expr):
    expr: Expr
    to_type: str
    try_cast: bool = False


@dataclass
class ArrayCtor(Expr):
    items: list[Expr]


@dataclass
class MapCtor(Expr):
    entries: list[tuple[Expr, Expr]]


@dataclass
class StructCtor(Expr):
    entries: list[tuple[str, Expr]]


@dataclass
class RowCtor(Expr):
    items: list[Expr]


@dataclass
class Subscript(Expr):
    """arr[i] — wvlet is 1-origin; lowered via element_at."""

    target: Expr
    index: Expr


@dataclass
class Lambda(Expr):
    params: list[str]
    body: Expr


@dataclass
class ScalarSubquery(Expr):
    query: "Relation"


@dataclass
class InterpString(Expr):
    """s"a ${x} b" — parts are str or Expr; lowered to concat."""

    parts: list[object]
    prefix: str = "s"      # 's' or 'sql'


@dataclass
class IntervalLiteral(Expr):
    value: str             # e.g. "3" or "1-2"
    unit: str              # e.g. "day", "month", "year to month"


@dataclass
class SortItem(Node):
    expr: Expr
    ascending: bool | None = None   # None = unspecified (asc)
    nulls_first: bool | None = None


@dataclass
class FrameBound(Node):
    kind: str              # 'unbounded_preceding'|'preceding'|'current'|'following'|'unbounded_following'
    n: int | None = None


@dataclass
class WindowSpec(Node):
    partition_by: list[Expr] = field(default_factory=list)
    order_by: list[SortItem] = field(default_factory=list)
    frame_type: str | None = None      # 'rows' | 'range'
    frame_start: FrameBound | None = None
    frame_end: FrameBound | None = None


@dataclass
class Wildcard(Expr):
    """select * except-style helpers could extend this later."""


@dataclass
class NamedExpr(Node):
    """A projection item: expr [as name] or name = expr."""

    expr: Expr
    alias: str | None = None


@dataclass
class RawSQLExpr(Expr):
    sql: str


@dataclass
class AtTimeZone(Expr):
    """`expr at time zone tz` — interpret expr as a UTC instant and produce
    the wall-clock time in tz (reference: exprs.scala AtTimeZone)."""
    expr: Expr
    tz: Expr


@dataclass
class Param(Expr):
    """Prepared-statement parameter: `?` (anon, positional), `$1` (indexed),
    `$name` (named).  Reference: exprs.scala NoName/Indexed/NamedParameter."""
    kind: str                 # 'anon' | 'index' | 'name'
    index: int = 0            # 1-origin position for anon/indexed params
    name: str = ""


@dataclass
class NativeExpr(Expr):
    """Body marker of `def f(...): t = native` — a function either evaluated
    at compile time (ulid_string) or passed through to the engine verbatim
    (reference: exprs.scala NativeExpression, ext/NativeFunction.scala)."""
    name: str
    ret_type: str | None = None


# ---------------------------------------------------------------------------
# Relations (pipe operators)
# ---------------------------------------------------------------------------


class Relation(Node):
    pass


@dataclass
class TableRef(Relation):
    name: str              # possibly qualified catalog.schema.table


@dataclass
class InterpTableRef(Relation):
    """s`name_${expr}` — table name resolved after interpolation args are
    bound (reference: spec/basic/backquote-interpolation.wv)."""
    parts: list  # str | Expr


@dataclass
class FileScan(Relation):
    path: str
    fmt: str               # parquet | csv | json


@dataclass
class RawSQL(Relation):
    sql: str


@dataclass
class Values(Relation):
    rows: list[list[Expr]]
    alias: str | None = None
    columns: list[str] | None = None


@dataclass
class ModelScan(Relation):
    name: str
    args: list[tuple[str | None, Expr]] = field(default_factory=list)


@dataclass
class TableFunctionCall(Relation):
    name: str
    args: list[Expr]
    alias: str | None = None
    columns: list[str] | None = None


@dataclass
class AliasedRelation(Relation):
    child: Relation
    alias: str
    columns: list[str] | None = None
    from_select_as: bool = False  # `select as name` — registers the result
                                  # for later statements in the same session


@dataclass
class Lateral(Relation):
    """`lateral { subquery }` join operand — the subquery may reference
    columns of relations to its left (reference: relation.scala Lateral)."""
    child: Relation
    alias: str | None = None
    columns: list[str] | None = None


@dataclass
class ParenRelation(Relation):
    child: Relation        # { query } used as a relation


@dataclass
class Filter(Relation):
    child: Relation
    cond: Expr


@dataclass
class Project(Relation):
    child: Relation
    items: list[NamedExpr | Star]
    distinct: bool = False


@dataclass
class GroupBy(Relation):
    child: Relation
    keys: list[NamedExpr]


@dataclass
class Agg(Relation):
    """`agg` operator: grouping keys (from upstream GroupBy) + agg exprs."""

    child: Relation
    items: list[NamedExpr]


@dataclass
class Transform(Relation):
    child: Relation
    items: list[NamedExpr]     # each item must be aliased: col = expr


@dataclass
class AddColumns(Relation):
    child: Relation
    items: list[NamedExpr]


@dataclass
class PrependColumns(Relation):
    child: Relation
    items: list[NamedExpr]


@dataclass
class ExcludeColumns(Relation):
    child: Relation
    names: list[str]


@dataclass
class RenameColumns(Relation):
    child: Relation
    renames: list[tuple[str, str]]     # (old, new)


@dataclass
class ShiftColumns(Relation):
    child: Relation
    names: list[str]
    to_left: bool = True


@dataclass
class Join(Relation):
    left: Relation
    right: Relation
    join_type: str         # inner|left|right|full|cross
    cond: Expr | None = None
    using: list[str] | None = None
    natural: bool = False
    asof: bool = False


@dataclass
class SetOp(Relation):
    op: str                # union_all | union | intersect | intersect_all | except | except_all
    left: Relation
    right: Relation


@dataclass
class Sort(Relation):
    child: Relation
    items: list[SortItem]


@dataclass
class Limit(Relation):
    child: Relation
    n: int


@dataclass
class Offset(Relation):
    child: Relation
    n: int


@dataclass
class Dedup(Relation):
    child: Relation


@dataclass
class Sample(Relation):
    child: Relation
    method: str            # reservoir | system | bernoulli | default
    size: float            # rows if is_rows else percentage 0-100
    is_rows: bool = True


@dataclass
class CountRel(Relation):
    child: Relation


@dataclass
class Pivot(Relation):
    child: Relation
    pivot_col: Expr
    values: list[Expr] | None
    group_by: list[NamedExpr]
    agg_items: list[NamedExpr]
    # `group by *`: group by every input column not referenced by the
    # pivot column or the aggregate items — DuckDB PIVOT-statement
    # implicit-grouping semantics (expanded at generation time, where
    # the input schema is known)
    group_all_others: bool = False


@dataclass
class Unpivot(Relation):
    child: Relation
    value_col: str
    name_col: str
    columns: list[str]


@dataclass
class WithQuery(Relation):
    defs: list[tuple[str, Relation]]
    body: Relation
    recursive: bool = False


@dataclass
class Describe(Relation):
    child: Relation


@dataclass
class DescribePrepared(Relation):
    """describe input|output <model> — Trino's prepared-statement
    introspection (DESCRIBE INPUT lists parameter positions, DESCRIBE
    OUTPUT the result schema); models are this engine's prepared
    statements (reference: spec/sql/trino/describe-input.sql)."""
    kind: str   # "input" | "output"
    name: str


@dataclass
class TestRelation(Relation):
    child: Relation
    expr: Expr             # the assertion expression


@dataclass
class Debug(Relation):
    child: Relation
    body: Relation | None = None


@dataclass
class Show(Relation):
    kind: str              # tables | schemas | catalogs | models | functions | columns
    in_target: str | None = None
    like: str | None = None


@dataclass
class Subscribe(Relation):
    child: Relation        # ModelScan
    watermark_column: str | None = None
    window_size: str | None = None
    params: list[tuple[str, Expr]] = field(default_factory=list)
    source_name: str | None = None   # stable watermark-store key (model/table name)


@dataclass
class PartialApply(Relation):
    """Application of a `def`-defined partial query by pipe."""

    child: Relation
    name: str
    args: list[Expr] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------


class Statement(Node):
    pass


@dataclass
class QueryStatement(Statement):
    body: Relation
    tests: list[Expr] = field(default_factory=list)


@dataclass
class ModelDef(Statement):
    name: str
    params: list[tuple[str, str | None, Expr | None]]   # (name, type, default)
    body: Relation
    config: dict[str, object] = field(default_factory=dict)


@dataclass
class FunctionDef(Statement):
    name: str
    params: list[tuple[str, str | None, Expr | None]]
    return_type: str | None
    body: Expr


@dataclass
class PartialQueryDef(Statement):
    name: str
    params: list[tuple[str, str | None, Expr | None]]
    ops: list[object]       # list of parser "pipe op" closures applied to a child


@dataclass
class ValDef(Statement):
    name: str
    expr: Expr | None = None
    table: Values | None = None


@dataclass
class TypeDef(Statement):
    name: str
    parent: str | None = None
    columns: list[tuple[str, str]] = field(default_factory=list)
    binding: str | None = None
    # method extensions: (dialect | None, FunctionDef) — body may reference
    # `this` (the receiver); reference: plan.scala TypeDef/TypeElem
    methods: list = field(default_factory=list)


@dataclass
class SaveTo(Statement):
    child: Relation
    target: str
    is_file: bool = False
    options: dict[str, object] = field(default_factory=dict)
    tests: list[Expr] = field(default_factory=list)


@dataclass
class AppendTo(Statement):
    child: Relation
    target: str
    is_file: bool = False
    columns: list[str] | None = None


@dataclass
class DeleteStmt(Statement):
    child: Relation        # filtered pipe ending in delete


@dataclass
class InsertStmt(Statement):
    """insert into / insert overwrite, with Hive-style partition-write
    hints (reference: update.scala InsertInto/InsertOverwrite +
    PartitionWriteMode HIVE_{CLUSTER,DISTRIBUTE,SORT}_BY)."""
    target: str
    body: Relation
    columns: list[str] | None = None
    overwrite: bool = False
    cluster_by: list[str] = field(default_factory=list)
    distribute_by: list[str] = field(default_factory=list)
    sort_by: list[str] = field(default_factory=list)


@dataclass
class TruncateStmt(Statement):
    table: str


@dataclass
class ExecuteStmt(Statement):
    sql: str


@dataclass
class ImportStmt(Statement):
    name: str


@dataclass
class UseStmt(Statement):
    """use [schema|catalog|connector] name — session context switch
    (reference: spec/basic/use-schema.wv)."""
    target: str


@dataclass
class DeallocateStmt(Statement):
    """deallocate name — drop a session-scoped model (the SQL
    PREPARE/DEALLOCATE lifecycle: sql_import converts PREPARE to a
    model definition, DEALLOCATE to this)."""
    name: str


@dataclass
class ShowStmt(Statement):
    body: Relation


@dataclass
class ExplainStmt(Statement):
    body: Relation | None = None
    sql: str | None = None


# ---------------------------------------------------------------------------
# Flow / orchestration DSL (reference: model/plan/flow.scala,
# runner/FlowExecutor.scala — semantics per website/docs/syntax/flow.md)
# ---------------------------------------------------------------------------


@dataclass
class StageDef(Node):
    """One named step of a flow.

    kind:
      'query'      — body is a Relation; output materializes as a
                     run-scoped stage table
      'wait'       — pause for a duration (action = ms)
      'wait_until' — poll body until it yields >=1 row (action = poll ms)
      'activate'   — deliver upstream output to a named sink
      'end'        — terminate this path
    """
    name: str
    kind: str = "query"
    body: Relation | None = None
    sources: list[str] = field(default_factory=list)      # `from a, b`
    condition: Expr | None = None                          # `if x.failed and y.done`
    depends: list[str] = field(default_factory=list)       # `depends on c` (control only)
    config: dict[str, object] = field(default_factory=dict)  # retries/retry_delay/backoff/timeout/poll_interval
    action: dict[str, object] = field(default_factory=dict)  # wait ms / activate sink+args


@dataclass
class FlowRouteCase(Node):
    target: str
    cond: Expr | None = None        # boolean predicate case
    percent: int | None = None      # `case 50 ->` percentage split
    is_else: bool = False


@dataclass
class FlowRoute(Node):
    source: str
    cases: list[FlowRouteCase] = field(default_factory=list)
    hash_key: Expr | None = None    # `route by hash(k)` — deterministic bucketing


@dataclass
class FlowMerge(Node):
    name: str
    sources: list[str] = field(default_factory=list)
    on: Expr | None = None          # join condition; None = union by name


@dataclass
class FlowDef(Statement):
    name: str
    params: list[tuple[str, str | None, Expr | None]] = field(default_factory=list)
    stages: list[StageDef] = field(default_factory=list)
    routes: list[FlowRoute] = field(default_factory=list)
    merges: list[FlowMerge] = field(default_factory=list)
    config: dict[str, object] = field(default_factory=dict)  # schedule/concurrency/...


@dataclass
class CallToolStmt(Statement):
    """call tool(args) — invoke a registered external action; its result (a
    DataFrame or None) is the statement result (reference: CallTool
    relation.scala:1182-1205)."""
    name: str
    args: dict[str, Expr] = field(default_factory=dict)


@dataclass
class RunFlowStmt(Statement):
    name: str
    args: dict[str, Expr] = field(default_factory=dict)
    pos_args: list = field(default_factory=list)
    resume_run_id: str | None = None
    # optional pipe chain applied to the run-summary relation and trailing
    # tests (reference: spec/basic/flow-run.wv `run flow X | where ... test`)
    pipe: Relation | None = None
    tests: list = field(default_factory=list)
