"""Plan-shape gate plumbing (tools/plan_audit.py, VERDICT r4 #7).

The full 105-entry audit is a tools gate (`python tools/plan_audit.py`);
this file keeps the counting logic and the committed manifest honest in
the fast suite.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from plan_audit import MANIFEST, plan_counts  # noqa: E402


def test_manifest_exists_and_covers_every_query():
    import __spark_entry__ as entrymod

    with open(MANIFEST) as fh:
        manifest = json.load(fh)
    missing = set(entrymod.queries()) - set(manifest)
    assert not missing, f"entries without a committed plan shape: {missing}"
    for name, counts in manifest.items():
        assert set(counts) == {"exchanges", "broadcasts", "expands"}, name
        assert all(isinstance(v, int) and v >= 0 for v in counts.values())


def test_plan_counts_sees_shuffles_and_broadcasts(spark):
    from pyspark.sql import functions as F

    a = spark.range(100).withColumn("k", F.col("id") % 10)
    b = spark.range(10).withColumnRenamed("id", "k")
    joined = a.join(F.broadcast(b), on="k")
    c = plan_counts(joined)
    assert c["broadcasts"] == 1 and c["exchanges"] == 0

    agg = a.groupBy("k").count()
    c2 = plan_counts(agg)
    assert c2["exchanges"] == 1 and c2["broadcasts"] == 0

    # cache boundary: exchanges behind an InMemoryRelation don't count
    cached = agg.cache()
    cached.count()
    over = cached.groupBy().sum("count")
    c3 = plan_counts(over)
    assert c3["exchanges"] <= 1
    cached.unpersist()
