"""Registry freeze discipline (r11, VERDICT r10 Next #8): every
registered query must either already be driver-verified (a green row
in some CORRECTNESS_r*.json) or be scheduled in the CURRENT
``workload._WINDOW``. r10 registered four queries after its window
froze — sweep-green but driver-unverified for a full round; this lint
makes that class of gap impossible to ship silently: register before
the freeze and lead the window with it, or hold the registration to
the next round (docs/ROUND_PROTOCOL.md)."""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green() -> set[str]:
    green: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if (isinstance(row, dict) and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") in (True, None)):
                green.add(name)
    return green


def test_every_query_is_verified_or_scheduled():
    from toy_vector_db_spark import workload
    green = _driver_green()
    scheduled = set(workload._WINDOW)
    orphans = [n for n in workload._REGISTRY
               if n not in green and n not in scheduled]
    assert not orphans, (
        f"queries registered but neither driver-verified in any past "
        f"round nor scheduled in _WINDOW (post-freeze gap): {orphans} "
        f"— lead the next window with them or hold the registration")


def test_window_is_exactly_the_driver_head():
    from toy_vector_db_spark import workload
    names = list(workload._REGISTRY)
    assert len(workload._WINDOW) == 50
    assert names[:50] == workload._WINDOW
