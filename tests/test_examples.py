"""The examples double as doc-tests (the reference's evaluated-.pymd-docs
pattern, SURVEY §5)."""

import sys


def test_ndvi_example(spark):
    sys.path.insert(0, "examples")
    import examples.ndvi as ex

    stats = ex.main(spark)
    assert stats["data_cells"] == 256 * 256
    assert 0 <= stats["mean"] <= 1


def test_jp2_example(spark):
    import os

    import pytest

    if not os.path.exists("/root/reference/core/src/test/resources/B01.jp2"):
        pytest.skip("reference fixture not present")
    sys.path.insert(0, "examples")
    import examples.jp2_pipeline as ex

    stats, info, total = ex.main(spark)
    assert stats["data_cells"] == 1830 * 1830
    assert info.crs == "EPSG:32615" and info.dtype == "uint16"
    assert total > 0


def test_zonal_example(spark):
    import examples.zonal_stats as ex

    rows = ex.main(spark)
    assert len(rows) == 2
    assert all(r["cells"] > 0 for r in rows)


def test_dedup_example(spark):
    import examples.dedup_pipeline as ex

    n0, n1, n2, n3 = ex.main(spark)
    assert n0 >= n1 >= n2 >= n3 > 0


def test_curation_example(spark):
    import examples.curation_pipeline as ex

    funnel, n_packs = ex.main(spark)
    counts = [n for _, n in funnel]
    # monotone funnel down to the split, and nothing collapses to zero
    assert counts == sorted(counts, reverse=True) or counts[0] >= counts[-1]
    assert all(n > 0 for n in counts)
    assert 0 < n_packs <= counts[-1]


def test_multimodal_example(spark):
    from examples.multimodal_pipeline import main
    result = main(spark)
    assert len(result) == 12
    kinds = {r["kind"] for r in result}
    assert kinds == {"image", "video", "audio"}


def test_time_series_example(spark):
    import examples.time_series as ex

    out = ex.main(spark)
    assert [q for q, _ in out] == [1, 2, 3, 4]
    means = {q: m for q, m in out}
    # seasonal sine: Q2 (peak) > Q1 > Q3 > Q4 (trough)
    assert means[2] > means[1] > means[3] > means[4]


def test_ml_supervised_example(spark):
    import examples.ml_supervised as ex

    acc, n_tiles = ex.main(spark)
    # the label is a clean function of the two features — a linear model
    # on a separable-ish boundary should be far above chance
    assert acc >= 0.8
    assert n_tiles == 32  # odd grps of 64


def test_ml_unsupervised_example(spark):
    import examples.ml_unsupervised as ex

    n_clusters, n_tiles = ex.main(spark, k=3)
    assert n_clusters == 3
    assert n_tiles == 64


def test_raster_catalogs_example(spark):
    import examples.raster_catalogs as ex

    out = ex.main(spark)
    assert out == {"one_d": 8, "two_d": 8}


def test_nodata_handling_example(spark):
    import examples.nodata_handling as ex

    out = ex.main(spark)
    assert out == {"nd_cells": 5000, "masked_sum": 7500}


def test_geotrellis_migration_example(spark):
    import examples.geotrellis_migration as ex

    total = ex.main(spark)
    assert total > 0


def test_web_ingest_example(spark):
    import examples.web_ingest as ex

    out = ex.main(spark)
    assert out == {"fetched": 12, "after_c4": 10, "after_quality": 10,
                   "after_dedup": 8}


def test_quality_classifier_example(spark):
    import examples.quality_classifier as ex

    acc, keep_frac = ex.main(spark)
    assert acc >= 0.9          # out-of-sample separation is real
    assert keep_frac >= 0.9    # the clean corpus survives its own filter


def test_weather_ingest_example(spark):
    import examples.weather_ingest as ex

    out = ex.main(spark)
    # band 0 of each file, one 32x32 chunk each -> 2 batch rows; the
    # GRIB2 stack exposes both fields as tile columns; streaming sees
    # band-0 tiles of both files and skips the planted non-raster
    # file; the multi-band stream serves t2m+wind from the one 2-field
    # GRIB2 scene (pattern keeps the 1-band edition-1 file out)
    assert out == {"batch_rows": 2, "files": 2, "bands": 2,
                   "streamed_rows": 2, "streamed_multiband_rows": 1}
