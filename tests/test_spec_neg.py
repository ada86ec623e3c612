"""Run the reference's negative spec corpus (spec/neg/*.wv) verbatim.

Each file must be rejected with a *user-level* error (syntax error,
compile error, failed test assertion, bad flow wiring) — never a hang,
a RecursionError / stack overflow, or a raw engine exception.  This
hardens the analyzer error paths the positive corpora never touch
(reference: spec/neg/, run by the reference's compiler as must-fail).

The corpus lives outside the repo (read-only reference checkout); the
whole module skips when it is not present.
"""

import glob
import os
import sys

import pytest

NEG_DIR = "/root/reference/spec/neg"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NEG_DIR), reason="reference neg corpus not available")

# User-visible error surface: anything else (RecursionError, Py4J errors,
# KeyError, ...) is a crash, not an error report.
def _user_errors():
    from wvlet_spark.generator import CompileError
    from wvlet_spark.lexer import WvletSyntaxError
    from wvlet_spark.testing import TestFailure

    return (WvletSyntaxError, CompileError, TestFailure, ValueError)


def _neg_files():
    if not os.path.isdir(NEG_DIR):
        return []
    files = [os.path.basename(p) for p in glob.glob(NEG_DIR + "/*.wv")]
    files += ["update/" + os.path.basename(p)
              for p in glob.glob(NEG_DIR + "/update/*.wv")]
    return sorted(files)


@pytest.mark.parametrize("fname", _neg_files())
def test_neg_file_rejected(spark, fname):
    from wvlet_spark import WvletSession

    path = os.path.join(NEG_DIR, fname)
    with open(path, encoding="utf-8") as f:
        text = f.read()
    ws = WvletSession(spark, table_dir=NEG_DIR, file_base=NEG_DIR,
                      test_mode=True)
    # guard against unbounded recursion turning into a deep native crash:
    # a modest recursion limit converts runaway loops into RecursionError,
    # which the assertion below still counts as a failure to report cleanly
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(3000)
    try:
        with pytest.raises(_user_errors()):
            ws.run(text)
    finally:
        sys.setrecursionlimit(old_limit)
