"""The driver contract itself: ``__spark_entry__`` imports cleanly (no
Spark session or I/O at import time), every query has a callable and an
oracle, and ``entry()`` runs on the smoke scale factor."""

from __future__ import annotations

import importlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_mod():
    sys.path.insert(0, REPO)
    return importlib.import_module("__spark_entry__")


def test_registry_shape_and_oracle_completeness():
    m = _entry_mod()
    qs, oracles = m.queries(), m.oracle_sql()
    # the round driver records only the FIRST 50 entries — the registry
    # must stay within the cap (consolidated via tagged-union gate queries)
    assert 40 <= len(qs) <= 50
    assert all(callable(fn) for fn in qs.values())
    # every query is oracle-checked — no rows-only entries anywhere
    assert set(oracles) == set(qs)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs_on_smoke_sf(spark):
    m = _entry_mod()
    df = m.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == ["r_name", "n_name", "revenue", "order_ct"]
