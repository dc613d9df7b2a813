"""S3 catalog entity extraction, J6 first-match rule classification,
S4/S10 sidecar ops."""

from __future__ import annotations

import json

from neuroimaging_data_pipeline_spark.catalog import catalog_from_paths, layout_get
from neuroimaging_data_pipeline_spark.operators.rulejoin import (
    classify_first_match,
    glob_to_like,
)

PATHS = [
    "/data/bids/sub-004/func/sub-004_task-MID_run-01_bold.nii.gz",
    "/data/bids/sub-004/func/sub-004_task-MID_run-01_events.tsv",
    "/data/bids/sub-004/anat/sub-004_T1w.nii.gz",
    "/data/bids/derivatives/fmriprep/sub-004/func/"
    "sub-004_task-MID_run-01_space-MIITRA_desc-preproc_bold.nii.gz",
    "/data/bids/sub-012/func/sub-012_task-rest_run-02_bold.nii.gz",
]


def test_entity_extraction(spark):
    cat = catalog_from_paths(spark, PATHS).toPandas().set_index("path")
    r = cat.loc[PATHS[0]]
    assert (r.subject, r.task, r.run, r.suffix, r.extension, r.scope) == (
        "004", "MID", "01", "bold", ".nii.gz", "raw"
    )
    d = cat.loc[PATHS[3]]
    assert d.space == "MIITRA" and d.scope == "derivatives" and d.desc == "preproc"
    assert cat.loc[PATHS[2]].suffix == "T1w"


def test_layout_get(spark):
    cat = catalog_from_paths(spark, PATHS)
    got = layout_get(cat, subject="004", suffix="bold", scope="raw")
    assert got.count() == 1
    assert got.first()["task"] == "MID"


def test_glob_to_like():
    assert glob_to_like("*task*") == "%task%"
    assert glob_to_like("ep2d_diff_p2s2_PA") == r"ep2d\_diff\_p2s2\_PA"


def test_first_match_rules(spark):
    rules = spark.createDataFrame(
        [
            (0, "func", "bold", "SeriesDescription", "*task*"),
            (1, "anat", "T1w", "SeriesDescription", "*mprage*"),
            (2, "func", "any", "SeriesDescription", "*"),
        ],
        "priority int, dataType string, modalityLabel string, "
        "criteria_field string, criteria_pattern string",
    )
    items = spark.createDataFrame(
        [(1, "fmri_task_MID"), (2, "t1_mprage_sag"), (3, "localizer")],
        "series_id long, SeriesDescription string",
    )
    got = {
        r["series_id"]: (r["dataType"], r["modalityLabel"], r["priority"])
        for r in classify_first_match(items, rules, "series_id").collect()
    }
    # series 1 matches rules 0 and 2 -> first match (priority 0) wins
    assert got[1] == ("func", "bold", 0)
    assert got[2] == ("anat", "T1w", 1)
    assert got[3] == ("func", "any", 2)


def test_dcm2bids_rules_from_config_shape(spark, tmp_path):
    cfg = {
        "descriptions": [
            {"dataType": "anat", "modalityLabel": "T1w",
             "criteria": {"SeriesDescription": "*mprage*"}},
            {"dataType": "func", "modalityLabel": "bold",
             "customLabels": "task-MID",
             "criteria": {"SidecarFilename": "*task*"}},
        ]
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    from neuroimaging_data_pipeline_spark.sources.rules import read_dcm2bids_rules

    rules = read_dcm2bids_rules(spark, str(p)).orderBy("priority").collect()
    assert rules[0]["criteria_field"] == "SeriesDescription"
    assert rules[0]["criteria_pattern"] == "*mprage*"
    assert rules[1]["criteria_field"] == "SidecarFilename"
    assert rules[1]["customLabels"] == "task-MID"


def test_sidecar_roundtrip(spark, tmp_path):
    from neuroimaging_data_pipeline_spark.sources.sidecar import (
        get_scalar,
        read_sidecars,
        update_sidecar_field,
    )

    (tmp_path / "a_bold.json").write_text(
        json.dumps({"RepetitionTime": 2.0, "TaskName": "MID"})
    )
    (tmp_path / "b_bold.json").write_text(
        json.dumps({"RepetitionTime": 1.5, "TaskName": None})
    )
    sc = read_sidecars(spark, str(tmp_path / "*.json"))
    assert get_scalar(sc, "RepetitionTime", TaskName="MID") == 2.0
    upd = update_sidecar_field(sc, "TaskName", "rest")
    assert [r["TaskName"] for r in upd.collect()] == ["rest", "rest"]


def test_incremental_refresh_equals_full_recompute(spark):
    """Monoid refresh invariant: folding deltas batch-by-batch equals
    aggregating everything at once, including keys that appear ONLY
    in a delta, only in history, or in both; min/max merge handles
    either-side NULL."""
    from pyspark.sql import functions as F

    from neuroimaging_data_pipeline_spark.operators.incremental import (
        agg_state,
        refresh,
    )

    full = spark.range(900).select(
        (F.col("id") % 30).alias("k"),
        (F.col("id") * 3 % 17).alias("x"),
    )
    measures = {
        "n": ("count", ""),
        "sx": ("sum", "x"),
        "mn": ("min", "x"),
        "mx": ("max", "x"),
    }
    want = {tuple(r) for r in agg_state(full, ["k"], measures).collect()}
    state = agg_state(full.filter("id < 300"), ["k"], measures)
    for lo, hi in ((300, 600), (600, 900)):
        state = refresh(
            state,
            full.filter(f"id >= {lo} AND id < {hi}"),
            ["k"],
            measures,
        )
    got = {tuple(r) for r in state.collect()}
    assert got == want
    # delta-only key: refresh with a key history never saw
    extra = spark.createDataFrame([(999, 5)], "k long, x long")
    got2 = {
        tuple(r)
        for r in refresh(state, extra, ["k"], measures).collect()
    }
    assert (999, 1, 5, 5, 5) in got2
