"""wvlet_spark — a PySpark-native analytics engine speaking the wvlet query language.

A brand-new implementation of the wvlet (wvlet/wvlet) flow-style query
language on Apache Spark.  The reference compiles ``.wv`` text to SQL for
DuckDB/Trino; this engine compiles the same language to Spark SQL / DataFrame
plans and lets Catalyst + AQE do the physical optimization.

Architecture (SURVEY.md §7):

    .wv text -> Lexer -> Parser -> AST (plans/exprs dataclasses)
             -> Analyzer (models, vals, function inlining, dot-agg)
             -> SqlGenerator (spark dialect)  -> spark.sql(...)
                              (duckdb dialect) -> oracle cross-checking

Public API::

    from wvlet_spark import WvletSession
    ws = WvletSession(spark)
    df = ws.run("from lineitem where l_quantity > 10 group by l_returnflag agg _.count")
    sql = ws.compile_to_sql("from t select a, b")   # Spark SQL text
"""

from wvlet_spark.session import WvletSession, compile_to_sql

__version__ = "0.1.0"

__all__ = ["WvletSession", "compile_to_sql", "__version__"]
