"""The driver-session invariant, pinned.

The verification driver runs `queries()` under ITS OWN vanilla
`SparkSession.builder.getOrCreate()` — none of `session.get_spark`'s
engine confs (nanosAsLong, UTC tz, AQE, shuffle sizing) are present
unless the engine sets them at runtime. Round 1 shipped 11 red
CORRECTNESS rows from exactly this class: a conf that lived only in
`session.py`, so every test passed while the driver's session threw on
the TIMESTAMP(NANOS) fixture. `sources/catalog.load_table` now sets the
load-critical confs at runtime; this test is what keeps that invariant
from regressing.

Runs in a SUBPROCESS so the bare session can't collide with the
session-scoped engine fixture other tests share — `spark.stop()` +
rebuild inside the suite process would tear down their JVM.

One representative query per timestamp-reading family:
- flagship_session_enrichment  (events via load_table, groupBy folds)
- tumbling_window_events       (event-time windows on events.ts)
- variant_props_extract        (VARIANT/JSON over events)
- file_metadata_provenance     (_metadata on a re-exported scan)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys

sys.path.insert(0, {repo!r})

from pyspark.sql import SparkSession

# A deliberately BARE session: no engine confs, exactly what the
# verification driver builds. local[4] only bounds the test's footprint.
spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-driver-session")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

# Import the engine only AFTER the session exists, like the driver does.
import __spark_entry__ as entry_mod

queries = entry_mod.queries()
sf_dir = {sf_dir!r}
for name in [
    "flagship_session_enrichment",
    "tumbling_window_events",
    "variant_props_extract",
    "file_metadata_provenance",
]:
    rows = queries[name](spark, sf_dir).collect()
    assert len(rows) > 0, name
    print("VANILLA_OK", name, len(rows))
print("VANILLA_ALL_OK")
"""


def test_queries_run_under_bare_driver_session(sf_dir):
    script = _SCRIPT.format(repo=REPO, sf_dir=sf_dir)
    env = dict(os.environ)
    # Make sure no engine conf can sneak in through spark-defaults-style
    # env knobs the suite may have set.
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=280,
        env=env,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "VANILLA_ALL_OK" in out, out[-4000:]
