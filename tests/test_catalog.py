"""Snapshot catalog: atomic commit, append vs overwrite, time travel, torn writes."""

import json
import os


def test_overwrite_and_append(tmp_catalog, spark):
    df1 = spark.createDataFrame([(1,), (2,)], "a int")
    df2 = spark.createDataFrame([(3,)], "a int")
    tmp_catalog.commit("t", df1, mode="overwrite")
    tmp_catalog.commit("t", df2, mode="append")
    assert tmp_catalog.read("t").count() == 3
    tmp_catalog.commit("t", df2, mode="overwrite")
    assert tmp_catalog.read("t").count() == 1


def test_time_travel_and_rollback(tmp_catalog, spark):
    for i in range(3):
        tmp_catalog.commit("t", spark.range(i + 1), mode="overwrite", meta={"i": i})
    assert tmp_catalog.read("t", snapshot_id=0).count() == 1
    assert tmp_catalog.read("t").count() == 3
    tmp_catalog.rollback("t", 1)
    assert tmp_catalog.read("t").count() == 2
    assert tmp_catalog.latest("t").meta["i"] == 1


def test_torn_manifest_invisible(tmp_catalog, spark):
    tmp_catalog.commit("t", spark.range(5), mode="overwrite")
    mandir = os.path.join(tmp_catalog.root, "t", "_manifests")
    with open(os.path.join(mandir, "000001.json"), "w") as f:
        f.write('{"snapshot_id": 1, "mode": "overwr')  # torn write
    assert tmp_catalog.latest("t").snapshot_id == 0
    assert tmp_catalog.read("t").count() == 5


def test_missing_table(tmp_catalog):
    assert tmp_catalog.read("nope") is None
    assert not tmp_catalog.exists("nope")
