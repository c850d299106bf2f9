"""Full-sweep driver-gate replica over EVERY registered query at
sf0.001 (VERDICT r03 next #6): the external driver samples ~50 of the
62 queries per round; this test keeps the unsampled tail from silently
rotting by running all of them — Ray pipeline vs DuckDB/golden oracle,
rows + schema + exact values — inside the normal pytest session.

oracle_sql()'s golden layer is re-pointed at sf0.001 via
FORA_ORACLE_SF_DIR (see tools/check_driver.run_gate); queries without a
SQL oracle get the same rows-only smoke check the driver applies.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_full_gate_sf0001(ray_session):
    from check_driver import run_gate

    import __ray_entry__ as e

    results, failed = run_gate(SF_DIR, quiet=True)
    assert len(results) == len(e.queries()), "a registered query was skipped"
    assert not failed, f"gate failures at sf0.001: {failed}"
