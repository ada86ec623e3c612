"""Run the reference's own spec corpus (spec/basic/*.wv) verbatim.

Each file executes through WvletSession with its embedded `test ... should`
assertions evaluated; a file passes only if every statement runs and every
assertion holds.  This is the strongest parity evidence we have: the
reference's acceptance tests run unmodified against this engine.

The corpus lives outside the repo (read-only reference checkout); the whole
module skips when it is not present so the test suite stays standalone.
"""

import glob
import os

import pytest

SPEC_DIR = "/root/reference/spec/basic"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SPEC_DIR), reason="reference spec corpus not available")


def _spec_files():
    if not os.path.isdir(SPEC_DIR):
        return []
    return sorted(os.path.basename(p) for p in glob.glob(SPEC_DIR + "/*.wv"))


@pytest.fixture(scope="module")
def spec_ws(spark):
    from wvlet_spark import WvletSession

    def make():
        return WvletSession(spark, table_dir=SPEC_DIR, file_base=SPEC_DIR,
                            test_mode=True)

    return make


@pytest.mark.parametrize("fname", _spec_files())
def test_spec_file(spec_ws, fname):
    with open(os.path.join(SPEC_DIR, fname), encoding="utf-8") as f:
        text = f.read()
    # fresh session per file: spec files define models/vals/flows freely
    spec_ws().run(text)
