"""Dashboard rendering layer: data side always real; PNG import-gated."""

from __future__ import annotations

import csv
import glob

import pytest

from calidad_del_aire_etl_spark.plans import dashboard

SF = "/root/testdata/sf0.001"


def test_chart_relations_are_chart_sized(spark):
    rels = dashboard.chart_relations(spark, SF)
    assert set(rels) == {
        "dash_kpis",
        "dash_rolling_mean",
        "dash_dow_distribution",
        "dash_station_compare",
        "dash_hourly_pattern",
        "dash_corr_matrix",
    }
    assert rels["dash_kpis"].count() == 1
    assert rels["dash_dow_distribution"].count() == 7
    assert rels["dash_corr_matrix"].count() == 6


def test_export_csv_writes_all_panels(spark, tmp_path):
    paths = dashboard.export_csv(spark, SF, str(tmp_path))
    assert len(paths) == 6
    for p in paths.values():
        files = glob.glob(f"{p}/part-*.csv")
        assert len(files) == 1  # chart-sized single CSV
        with open(files[0]) as f:
            assert len(list(csv.reader(f))) >= 2  # header + data


def test_render_png_gates_cleanly_without_matplotlib(spark, tmp_path):
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if has_mpl:
        out = dashboard.render_png(spark, SF, str(tmp_path / "dash.png"))
        import os

        assert os.path.getsize(out) > 0
    else:
        with pytest.raises(RuntimeError, match="matplotlib not installed"):
            dashboard.render_png(spark, SF, str(tmp_path / "dash.png"))
