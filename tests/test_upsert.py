"""Upsert / SCD2 operator tests (claims-shaped CDC scenarios)."""

from __future__ import annotations

import pytest

from airflow_cms_inpatient_etl_spark.operators.upsert import apply_scd2, scd2_init, upsert


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [("C1", 100.0, "open"), ("C2", 200.0, "open"), ("C3", 300.0, "paid")],
        "claim_id string, amount double, status string",
    )
    updates = spark.createDataFrame(
        [("C2", 250.0, "paid"), ("C4", 400.0, "open")],
        "claim_id string, amount double, status string",
    )
    out = upsert(target, updates, ["claim_id"])
    assert _rows(out) == sorted(
        [("C1", 100.0, "open"), ("C2", 250.0, "paid"), ("C3", 300.0, "paid"), ("C4", 400.0, "open")]
    )


def test_upsert_idempotent(spark):
    target = spark.createDataFrame([("C1", 1.0)], "claim_id string, amount double")
    updates = spark.createDataFrame([("C1", 2.0)], "claim_id string, amount double")
    once = upsert(target, updates, ["claim_id"])
    twice = upsert(once, updates, ["claim_id"])
    assert _rows(once) == _rows(twice) == [("C1", 2.0)]


def test_upsert_validate_unique_rejects_dirty_feed(spark):
    import pytest

    from airflow_cms_inpatient_etl_spark.plans.dq import DataQualityError

    target = spark.createDataFrame([("C1", 1.0)], "claim_id string, amount double")
    dirty = spark.createDataFrame(
        [("C1", 2.0), ("C1", 3.0)], "claim_id string, amount double"
    )
    with pytest.raises(DataQualityError, match="not unique"):
        upsert(target, dirty, ["claim_id"], validate_unique=True)


@pytest.mark.slow
def test_scd2_lifecycle(spark):
    snap0 = spark.createDataFrame(
        [("P1", "Male", 12), ("P2", "Female", 6)],
        "patient_id string, sex string, coverage_months int",
    )
    hist = scd2_init(snap0, "2024-01-01 00:00:00")
    assert hist.filter("is_current").count() == 2

    # P2's coverage changes; P3 appears; P1 unchanged
    snap1 = spark.createDataFrame(
        [("P1", "Male", 12), ("P2", "Female", 12), ("P3", "Male", 3)],
        "patient_id string, sex string, coverage_months int",
    )
    hist = apply_scd2(
        hist, snap1, ["patient_id"], ["sex", "coverage_months"], "2024-02-01 00:00:00"
    )
    rows = {(r["patient_id"], r["is_current"]): r for r in hist.collect()}
    assert hist.count() == 4  # P1 current, P2 old+new, P3 new
    assert rows[("P2", False)]["valid_to"] is not None  # closed version
    assert rows[("P2", True)]["coverage_months"] == 12
    assert rows[("P3", True)]["valid_from"] is not None
    # unchanged P1 keeps its original valid_from and stays open
    assert rows[("P1", True)]["valid_to"] is None
    assert str(rows[("P1", True)]["valid_from"]).startswith("2024-01-01")

    # applying the identical snapshot again is a no-op (idempotent)
    hist2 = apply_scd2(
        hist, snap1, ["patient_id"], ["sex", "coverage_months"], "2024-03-01 00:00:00"
    )
    assert hist2.count() == hist.count()
    assert hist2.filter("is_current").count() == 3


def test_snapshot_diff_null_keys(spark):
    """NULL key values must pair via eqNullSafe and presence must come from
    marker columns, not key nullness (round-3 advice): a NULL-key row only in
    the base is 'removed', NULL-key rows in both snapshots match each other."""
    from airflow_cms_inpatient_etl_spark.operators.upsert import snapshot_diff

    base = spark.createDataFrame(
        [(None, 1.0), ("K1", 2.0), ("K2", 3.0)], "k string, v double"
    )
    nxt = spark.createDataFrame(
        [("K1", 2.0), ("K3", 4.0)], "k string, v double"
    )
    d = {r["k"]: r for r in snapshot_diff(base, nxt, ["k"], ["v"]).collect()}
    assert d[None]["change_type"] == "removed"
    assert d["K1"]["change_type"] == "unchanged"
    assert d["K2"]["change_type"] == "removed"
    assert d["K3"]["change_type"] == "added"

    # NULL-key present in BOTH snapshots pairs to one row, not added+removed
    nxt2 = spark.createDataFrame([(None, 9.0)], "k string, v double")
    base2 = spark.createDataFrame([(None, 1.0)], "k string, v double")
    rows = snapshot_diff(base2, nxt2, ["k"], ["v"]).collect()
    assert len(rows) == 1
    assert rows[0]["change_type"] == "changed"
    assert rows[0]["old_v"] == 1.0 and rows[0]["new_v"] == 9.0


def test_upsert_validate_rejects_null_keys(spark):
    """A NULL merge key never equi-joins (it would append forever instead of
    replacing); validate_unique enforces the non-null half of the contract in
    the same aggregate pass as uniqueness."""
    from airflow_cms_inpatient_etl_spark.plans.dq import DataQualityError

    target = spark.createDataFrame([("C1", 1.0)], "claim_id string, amount double")
    nullkey = spark.createDataFrame([(None, 2.0)], "claim_id string, amount double")
    with pytest.raises(DataQualityError, match="NULL keys"):
        upsert(target, nullkey, ["claim_id"], validate_unique=True)


def test_apply_change_feed_three_verbs_and_last_write_wins(spark):
    """Hand frame: update-then-delete nets to delete; delete-then-reinsert
    nets to the reinsert; plain update replaces; untouched rows survive."""
    from airflow_cms_inpatient_etl_spark.operators.upsert import apply_change_feed

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", 1), (1, None, "D", 2),      # U then D -> gone
            (2, None, "D", 1), (2, "b2", "I", 2),      # D then I -> b2
            (3, "c2", "U", 1),                          # plain update
            (9, "new", "I", 1),                         # fresh insert
        ],
        ["k", "v", "op", "seq"],
    )
    got = {r["k"]: r["v"] for r in apply_change_feed(snap, changes, ["k"]).collect()}
    assert got == {2: "b2", 3: "c2", 4: "d", 9: "new"}
