"""Structural guard for the end-of-round timing artifact (r12 verdict
next #7: m10_calibration_bins was born one commit after the final
TIMINGS run, so the committed artifact silently covered 215/216).

The committed TIMINGS.json must cover EXACTLY the declared-query
registry: a query born after the last `tools/time_all.py` run turns
this red until the artifact is re-run — making "run TIMINGS after the
LAST code commit" a test, not a habit.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_timings_artifact_covers_registry():
    from pravega_flink_ai_flow_spark.queries import load_all

    path = os.path.join(REPO, "TIMINGS.json")
    art = json.load(open(path))
    timed = set(art["queries"]) | set(art.get("failures", {}))
    registry = set(load_all())
    born_after = sorted(registry - timed)
    removed = sorted(timed - registry)
    assert not born_after, (
        f"TIMINGS.json is stale: {len(born_after)} declared queries were "
        f"born after the last tools/time_all.py run: {born_after} — "
        "re-run it (end-of-round standard)")
    assert not removed, (
        f"TIMINGS.json times queries no longer declared: {removed} — "
        "re-run tools/time_all.py")
