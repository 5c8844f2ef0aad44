"""Aggregates vs numpy oracle — mirrors AggregateFunctionsSpec / StatFunctionsSpec
golden-value strategy (SURVEY §5)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.tile import Tile

TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


@pytest.fixture(scope="module")
def tiles(rng):
    out = []
    for i in range(20):
        arr = rng.integers(0, 1000, (8, 8)).astype("uint16")
        mask = rng.random((8, 8)) < 0.1
        out.append(Tile(np.ma.masked_array(arr, mask=mask), "uint16ud65535"))
    return out


@pytest.fixture(scope="module")
def tile_df(spark, tiles):
    return spark.createDataFrame(
        [{"tile_id": f"t{i}", "tile": t.to_row()} for i, t in enumerate(tiles)],
        schema=f"tile_id string, tile {TILE_T}",
    ).repartition(4)


def _all_cells(tiles):
    return np.ma.concatenate([t.masked().astype("float64").ravel() for t in tiles])


def test_agg_stats(spark, tile_df, tiles):
    row = tile_df.agg(rf.rf_agg_stats("tile").alias("s")).head()["s"]
    cells = _all_cells(tiles)
    assert row["data_cells"] == cells.count()
    assert row["no_data_cells"] == int(np.ma.getmaskarray(cells).sum())
    assert row["min"] == float(cells.min())
    assert row["max"] == float(cells.max())
    assert abs(row["mean"] - float(cells.mean())) < 1e-9
    assert abs(row["variance"] - float(cells.var())) < 1e-6


def test_agg_mean_and_counts(spark, tile_df, tiles):
    cells = _all_cells(tiles)
    got = tile_df.agg(
        rf.rf_agg_mean("tile").alias("m"),
        rf.rf_agg_data_cells("tile").alias("dc"),
        rf.rf_agg_no_data_cells("tile").alias("ndc"),
    ).head()
    assert abs(got["m"] - float(cells.mean())) < 1e-9
    assert got["dc"] == cells.count()
    assert got["ndc"] == int(np.ma.getmaskarray(cells).sum())


def test_agg_quantiles_vs_numpy(spark, tile_df, tiles):
    got = rf.rf_agg_approx_quantiles(tile_df, "tile", [0.1, 0.5, 0.9]).head()["quantiles"]
    cells = np.sort(_all_cells(tiles).compressed())
    for g, p in zip(got, [0.1, 0.5, 0.9]):
        lo = np.quantile(cells, max(0, p - 0.02))
        hi = np.quantile(cells, min(1, p + 0.02))
        assert lo <= g <= hi


def test_agg_local_mean_min_max(spark, tile_df, tiles):
    got = rf.agg_local_mean(tile_df, "tile")
    stack = np.ma.stack([t.masked().astype("float64") for t in tiles])
    assert np.allclose(np.asarray(got.masked()), np.asarray(stack.mean(axis=0)))
    gmin = rf.agg_local_min(tile_df, "tile")
    assert np.allclose(np.asarray(gmin.masked()), np.asarray(stack.min(axis=0)))
    gmax = rf.agg_local_max(tile_df, "tile")
    assert np.allclose(np.asarray(gmax.masked()), np.asarray(stack.max(axis=0)))


def test_agg_local_median_quantile(spark, tile_df, tiles):
    """Per-pixel exact median/quantile (the cloud-free composite) vs the
    numpy stack oracle, masked cells excluded per pixel."""
    stack = np.ma.stack([t.masked().astype("float64") for t in tiles])

    got = rf.agg_local_median(tile_df, "tile")
    exp = np.ma.median(stack, axis=0)
    assert np.allclose(np.asarray(got.masked()), np.asarray(exp))
    assert np.array_equal(np.ma.getmaskarray(got.masked()),
                          np.ma.getmaskarray(exp))

    # quantile via the unified API, grouped
    df2 = tile_df.withColumn("g", (F.length("tile_id") % 2).cast("int"))
    out = {r["g"]: r["tile"]
           for r in rf.agg_local(df2, "tile", "quantile",
                                 ["g"], q=0.25).collect()}
    from rasterframes_spark.functions._kernel import decode_struct_pdf
    import pandas as pd
    for g in (0, 1):
        idx = [i for i in range(len(tiles)) if len(f"t{i}") % 2 == g]
        sub = np.ma.stack([tiles[i].masked().astype("float64") for i in idx])
        t = decode_struct_pdf(pd.DataFrame([out[g].asDict()]))[0]
        # continuous-interpolation quantile over unmasked values per pixel
        exp = np.full(sub.shape[1:], np.nan)
        m = np.ma.getmaskarray(sub)
        for rr in range(sub.shape[1]):
            for cc in range(sub.shape[2]):
                vals = np.asarray(sub[:, rr, cc][~m[:, rr, cc]])
                if len(vals):
                    exp[rr, cc] = np.quantile(vals, 0.25)
        got_a = np.asarray(t.masked().filled(np.nan))
        assert np.allclose(got_a, exp, equal_nan=True)


def test_agg_local_quantile_validation(spark, tile_df):
    with pytest.raises(ValueError, match="requires q="):
        rf.agg_local(tile_df, "tile", "quantile")
    with pytest.raises(ValueError, match="in \\[0, 1\\]"):
        rf.agg_local(tile_df, "tile", "quantile", q=1.5)


def test_agg_local_stats_counts(spark, tile_df, tiles):
    stats = rf.agg_local_stats(tile_df, "tile")
    stack = np.ma.stack([t.masked().astype("float64") for t in tiles])
    cnt = (~np.ma.getmaskarray(stack)).sum(axis=0)
    assert np.array_equal(np.asarray(stats["count"].masked()), cnt)
    assert np.allclose(np.asarray(stats["variance"].masked()), np.asarray(stack.var(axis=0)), atol=1e-6)


def test_agg_local_unified_dataframe_api(spark, tile_df, tiles):
    """agg_local returns a DataFrame (distributed finish); grouped 'stats'
    yields five tile columns; no_data_cells derives from the in-state tile
    count (no extra count job)."""
    stack = np.ma.stack([t.masked().astype("float64") for t in tiles])

    # ungrouped: one-row DataFrame, stats -> 5 tile columns
    out = rf.agg_local(tile_df, "tile", "stats")
    assert out.columns == ["count", "min", "max", "mean", "variance"]
    row = out.head()
    from rasterframes_spark.functions._kernel import decode_struct_pdf
    import pandas as pd
    mean_tile = decode_struct_pdf(pd.DataFrame([row["mean"].asDict()]))[0]
    assert np.allclose(np.asarray(mean_tile.masked()),
                       np.asarray(stack.mean(axis=0)))

    # ungrouped no_data_cells == per-cell mask count across rows
    ndc = rf.agg_local_no_data_cells(tile_df, "tile")
    nd = np.ma.getmaskarray(stack).sum(axis=0)
    assert np.array_equal(np.asarray(ndc.masked()), nd)

    # grouped via the unified spelling == deprecated grouped_agg_local
    df2 = tile_df.withColumn("g", (F.length("tile_id") % 2).cast("int"))
    a = rf.agg_local(df2, "tile", "mean", ["g"]).orderBy("g").collect()
    b = rf.grouped_agg_local(df2, ["g"], "tile", "mean").orderBy("g").collect()
    assert [r["tile"] for r in a] == [r["tile"] for r in b]

    # grouped stats: five tile columns per group
    gs = rf.agg_local(df2, "tile", "stats", ["g"])
    assert gs.columns == ["g", "count", "min", "max", "mean", "variance"]
    assert gs.count() == df2.select("g").distinct().count()


def test_agg_extent(spark):
    df = spark.createDataFrame(
        [
            {"e": {"xmin": 0.0, "ymin": 1.0, "xmax": 10.0, "ymax": 11.0}},
            {"e": {"xmin": -5.0, "ymin": 2.0, "xmax": 8.0, "ymax": 20.0}},
        ],
        schema="e struct<xmin:double,ymin:double,xmax:double,ymax:double>",
    )
    got = df.agg(rf.rf_agg_extent("e").alias("ext")).head()["ext"]
    assert (got["xmin"], got["ymin"], got["xmax"], got["ymax"]) == (-5.0, 1.0, 10.0, 20.0)


def test_agg_histogram(spark, tile_df, tiles):
    hist = rf.rf_agg_equal_width_histogram(tile_df, "tile", num_buckets=10).collect()
    cells = _all_cells(tiles).compressed()
    assert sum(r["count"] for r in hist) == len(cells)


def test_grouped_agg_stats(spark, tile_df, tiles):
    with_grp = tile_df.withColumn("grp", (F.regexp_extract("tile_id", r"(\d+)", 1).cast("int") % 2))
    got = {r["grp"]: r["m"] for r in with_grp.groupBy("grp").agg(rf.rf_agg_mean("tile").alias("m")).collect()}
    for g in (0, 1):
        sel = [t for i, t in enumerate(tiles) if i % 2 == g]
        assert abs(got[g] - float(_all_cells(sel).mean())) < 1e-9


def test_streaming_histogram_exact_and_compressed(spark, tile_df, tiles):
    # exact when distinct values <= budget
    hist = rf.rf_agg_approx_histogram(tile_df, "tile", num_buckets=1000).collect()
    cells = _all_cells(tiles).compressed()
    import collections
    exact = collections.Counter(cells.astype("float64").tolist())
    got = {r["value"]: r["count"] for r in hist}
    assert got == dict(exact)
    # compressed: bin budget respected, mass conserved
    small = rf.rf_agg_approx_histogram(tile_df, "tile", num_buckets=5).collect()
    assert len(small) <= 5
    assert sum(r["count"] for r in small) == len(cells)
    vals = [r["value"] for r in small]
    assert vals == sorted(vals)


def test_agg_local_wholecolumn_tree_merge_bound(spark, tiles):
    """agg_local's whole-column finish must NOT funnel one state row per
    input partition into the single final task: with a 64-partition input
    the final task ingests <= 32 tree-merged state rows, and the result is
    identical to a narrow input (VERDICT r5 #3 — the overview pattern)."""
    wide = spark.createDataFrame(
        [{"tile": t.to_row()} for t in tiles],
        schema=f"tile {TILE_T}").repartition(64)
    assert wide.rdd.getNumPartitions() == 64

    from rasterframes_spark.functions import aggregates as A
    seen = {}
    orig = A._local_agg_partials

    def spy(partials, merge_pass, state_schema, merge_partitions):
        out = orig(partials, merge_pass, state_schema, merge_partitions)
        seen["n"] = out.count()
        return out

    A._local_agg_partials = spy
    try:
        row = rf.agg_local(wide, "tile", "stats").head()
    finally:
        A._local_agg_partials = orig
    assert seen["n"] <= 32

    def _dec(struct):
        return Tile.from_parts(struct["cell_type"], struct["cols"],
                               struct["rows"], struct["cells"]).masked()

    mean_t = _dec(row["mean"])
    stack = np.ma.stack([t.masked().astype("float64") for t in tiles])
    assert np.allclose(np.asarray(mean_t), np.asarray(stack.mean(axis=0)),
                       equal_nan=True)
    cnt_t = _dec(row["count"])
    assert np.array_equal(np.asarray(cnt_t),
                          np.asarray((~np.ma.getmaskarray(stack)).sum(axis=0)))
