"""Skeleton smoke: session builds, tables load, basic CDC operators run."""

from sql_cdc_spark import tables
from sql_cdc_spark.operators import cdc
from tests.conftest import SF_DIR_SMALL


def test_tables_load(spark):
    t = tables.load_all(spark, SF_DIR_SMALL)
    assert set(t) == set(tables.TABLE_NAMES)
    assert t["lineitem"].count() > 0


def test_cdc_operator_chain(spark):
    ev = tables.load(spark, SF_DIR_SMALL, "events").selectExpr(
        "event_id AS change_version", "user_id AS key_id", "event_type AS op"
    )
    bounded = cdc.changes_in_range(ev, 10, 5000)
    latest = cdc.latest_per_key(bounded, ["key_id"])
    batch = cdc.bounded_ordered_batch(latest, 50, "change_version", "key_id")
    rows = batch.collect()
    assert 0 < len(rows) <= 50
    versions = [r.change_version for r in rows]
    assert versions == sorted(versions)
