"""Local map algebra vs numpy oracle — mirrors LocalFunctionsSpec (SURVEY §5)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

import rasterframes_spark as rf
from rasterframes_spark.tile import Tile
from tests.conftest import make_tile_df


TILE_T = "struct<cell_type:string,cols:int,rows:int,cells:binary>"


@pytest.fixture(scope="module")
def tile_df(spark):
    a = Tile(np.arange(100, dtype="float64").reshape(10, 10), "float64")
    b = Tile(np.full((10, 10), 2.0), "float64")
    nd = Tile(
        np.ma.masked_array(
            np.arange(100, dtype="uint16").reshape(10, 10),
            mask=np.arange(100).reshape(10, 10) % 7 == 0,
        ),
        "uint16ud65535",
    )
    return spark.createDataFrame(
        [{"tile_id": "t0", "a": a.to_row(), "b": b.to_row(), "nd": nd.to_row()}],
        schema=f"tile_id string, a {TILE_T}, b {TILE_T}, nd {TILE_T}",
    )


def _one_tile(df, col):
    row = df.select(col).head()[0]
    return Tile.from_parts(row["cell_type"], row["cols"], row["rows"], bytes(row["cells"]))


def test_local_add_tile_tile(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_add("a", F.col("b")).alias("r")), "r")
    assert np.allclose(t.masked(), np.arange(100).reshape(10, 10) + 2)


def test_local_add_scalar(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_add("a", 10).alias("r")), "r")
    assert np.allclose(t.masked(), np.arange(100).reshape(10, 10) + 10)


def test_local_divide_promotes_float64(spark, tile_df):
    out = tile_df.select(rf.rf_local_divide("a", 4).alias("r"))
    t = _one_tile(out, "r")
    assert t.cell_type.name == "float64"
    assert np.allclose(t.masked(), np.arange(100).reshape(10, 10) / 4)


def test_nodata_propagates(spark, tile_df):
    out = tile_df.select(rf.rf_local_add("nd", 1).alias("r"))
    t = _one_tile(out, "r")
    expected_mask = np.arange(100).reshape(10, 10) % 7 == 0
    assert np.array_equal(np.ma.getmaskarray(t.masked()), expected_mask)


def test_comparisons(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_greater("a", 49.5).alias("r")), "r")
    assert int(t.masked().sum()) == 50
    t = _one_tile(tile_df.select(rf.rf_local_equal("a", 3).alias("r")), "r")
    assert int(t.masked().sum()) == 1


def test_where(spark, tile_df):
    cond = rf.rf_local_greater("a", 49.5)
    out = tile_df.select(rf.rf_where(cond, "a", "b").alias("r"))
    t = _one_tile(out, "r")
    arr = np.arange(100, dtype="float64").reshape(10, 10)
    assert np.allclose(t.masked(), np.where(arr > 49.5, arr, 2.0))


def test_normalized_difference(spark, tile_df):
    out = tile_df.select(rf.rf_normalized_difference("a", "b").alias("r"))
    t = _one_tile(out, "r")
    arr = np.arange(100, dtype="float64").reshape(10, 10)
    assert np.allclose(t.masked(), (arr - 2) / (arr + 2))


def test_clamp_round_abs_sqrt(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_clamp("a", 10, 20).alias("r")), "r")
    assert t.masked().min() == 10 and t.masked().max() == 20
    t = _one_tile(tile_df.select(rf.rf_sqrt("a").alias("r")), "r")
    assert np.allclose(t.masked(), np.sqrt(np.arange(100).reshape(10, 10)))


def test_is_in(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_is_in("a", [1, 5, 200]).alias("r")), "r")
    assert int(t.masked().sum()) == 2


def test_extract_bits(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_local_extract_bits("nd", 1, 2).alias("r")), "r")
    arr = np.arange(100).reshape(10, 10)
    expected = (arr >> 1) & 3
    valid = ~(arr % 7 == 0)
    assert np.array_equal(np.asarray(t.masked())[valid], expected[valid])


def test_standardize_rescale(spark, tile_df):
    t = _one_tile(tile_df.select(rf.rf_rescale("a").alias("r")), "r")
    assert t.masked().min() == 0.0 and t.masked().max() == 1.0
    t = _one_tile(tile_df.select(rf.rf_standardize("a").alias("r")), "r")
    assert abs(float(t.masked().mean())) < 1e-12


def test_masking(spark, tile_df):
    out = tile_df.select(rf.rf_mask("a", "nd").alias("r"))
    t = _one_tile(out, "r")
    assert int(np.ma.getmaskarray(t.masked()).sum()) == 15  # multiples of 7 in 0..99
    out = tile_df.select(rf.rf_mask_by_value("a", "nd", 14).alias("r"))
    t2 = _one_tile(out, "r")
    # 14 is masked in nd (14%7==0) so mask tile value never equals 14 … pick 15
    out = tile_df.select(rf.rf_mask_by_value("a", "nd", 15).alias("r"))
    t3 = _one_tile(out, "r")
    assert np.ma.getmaskarray(t3.masked())[1, 5]


def test_fused_matches_unfused_sentinel_boundary(spark):
    """A chained-op result that lands ON the NoData sentinel must become
    NoData identically whether the chain is fused (one UDF) or broken by a
    materialized column (two Arrow round-trips)."""
    # uint16ud10: cells that compute to exactly 10 become NoData on encode
    t = Tile(np.array([[8, 9], [10, 11]], dtype="uint16"), "uint16ud10")
    df = spark.createDataFrame([{"t": t.to_row()}], schema=f"t {TILE_T}")
    # op1 = t + 1 (uint16ud10) -> values 9,10,11,12: the 10 must mask
    fused = df.select(rf.rf_local_add(
        rf.rf_local_add("t", 1), 0).alias("r"))
    mid = df.select(rf.rf_local_add("t", 1).alias("m"))
    unfused = mid.select(rf.rf_local_add("m", 0).alias("r"))
    tf = _one_tile(fused, "r")
    tu = _one_tile(unfused, "r")
    assert tf.cell_type.name == tu.cell_type.name
    assert np.array_equal(np.ma.getmaskarray(tf.masked()),
                          np.ma.getmaskarray(tu.masked()))
    assert np.ma.allequal(tf.masked(), tu.masked())


def test_fused_binary_distinct_udf_inputs_not_merged(spark):
    """Two distinct non-fused UDF columns (both stringify as 'udf(...)')
    must stay distinct inputs in a fused binary op."""
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    a = Tile(np.full((4, 4), 3.0), "float64")
    df = spark.createDataFrame([{"t": a.to_row()}], schema=f"t {TILE_T}")

    def mk(const):
        @pandas_udf(TILE_T)
        def u(s: pd.DataFrame) -> pd.DataFrame:
            from rasterframes_spark.tile import decode_struct_pdf, tiles_to_struct_pdf
            return tiles_to_struct_pdf(
                [None if t is None else Tile(t.masked() * 0 + const, t.cell_type)
                 for t in decode_struct_pdf(s)])
        return u

    five = mk(5.0)(F.col("t"))
    seven = mk(7.0)(F.col("t"))
    t = _one_tile(df.select(rf.rf_local_subtract(five, seven).alias("r")), "r")
    assert float(t.masked()[0, 0]) == -2.0


def test_mask_inverse_kwargs(spark):
    """Reference signature parity: rf_mask(..., inverse=) and
    rf_mask_by_value(..., inverse=) (rasterfunctions.py:633-668)."""
    a = Tile(np.arange(9, dtype="float64").reshape(3, 3), "float64")
    m = Tile(np.ma.masked_array(np.ones((3, 3)), np.eye(3, dtype=bool)),
             "float64")
    mv = Tile(np.array([[1, 2, 1], [2, 1, 2], [1, 1, 1]], dtype="float64"),
              "float64")
    df = spark.createDataFrame(
        [{"a": a.to_row(), "m": m.to_row(), "mv": mv.to_row()}],
        schema=f"a {TILE_T}, m {TILE_T}, mv {TILE_T}")

    def got(c):
        r = df.select(c.alias("r")).head()["r"]
        return Tile.from_parts(r["cell_type"], 3, 3, bytes(r["cells"])).masked()

    assert np.ma.getmaskarray(got(rf.rf_mask("a", "m"))).sum() == 3
    assert np.ma.getmaskarray(got(rf.rf_mask("a", "m", inverse=True))).sum() == 6
    direct = got(rf.rf_mask_by_value("a", "mv", 1))
    assert np.ma.getmaskarray(direct).sum() == 6  # six 1s in mv
    inv = got(rf.rf_mask_by_value("a", "mv", 1, inverse=True))
    assert np.ma.getmaskarray(inv).sum() == 3
    np.testing.assert_array_equal(
        np.ma.getmaskarray(direct) | np.ma.getmaskarray(inv),
        np.ones((3, 3), dtype=bool))


def test_local_is_in_column_values(spark):
    """rf_local_is_in with an array COLUMN (per-row membership sets) —
    reference signature parity (rasterfunctions.py:398-404)."""
    t = Tile(np.arange(9, dtype="float64").reshape(3, 3), "float64")
    df = spark.createDataFrame(
        [{"id": 1, "t": t.to_row(), "vals": [0.0, 4.0, 8.0]},
         {"id": 2, "t": t.to_row(), "vals": [1.0]}],
        schema=f"id int, t {TILE_T}, vals array<double>")
    rows = {r["id"]: r for r in df.select(
        "id", rf.rf_local_is_in("t", "vals").alias("r")).collect()}

    def cells(r):
        return np.asarray(Tile.from_parts(
            r["cell_type"], 3, 3, bytes(r["cells"])).cells)

    np.testing.assert_array_equal(cells(rows[1]["r"]),
                                  np.eye(3, dtype="uint8") * 0 +
                                  np.isin(np.arange(9).reshape(3, 3),
                                          [0, 4, 8]).astype("uint8"))
    assert cells(rows[2]["r"]).sum() == 1
    # list form unchanged
    lst = df.where("id = 1").select(
        rf.rf_local_is_in("t", [0, 4, 8]).alias("r")).head()["r"]
    np.testing.assert_array_equal(cells(lst), cells(rows[1]["r"]))


def test_local_clamp_tile_bounds(spark):
    t = Tile(np.arange(9, dtype="float64").reshape(3, 3), "float64")
    lo = Tile(np.full((3, 3), 2.0), "float64")
    hi = Tile(np.full((3, 3), 6.0), "float64")
    df = spark.createDataFrame(
        [{"t": t.to_row(), "lo": lo.to_row(), "hi": hi.to_row()}],
        schema=f"t {TILE_T}, lo {TILE_T}, hi {TILE_T}")
    r = df.select(rf.rf_local_clamp("t", F.col("lo"), F.col("hi"))
                  .alias("r")).head()["r"]
    out = Tile.from_parts(r["cell_type"], 3, 3, bytes(r["cells"]))
    np.testing.assert_array_equal(
        np.asarray(out.cells), np.clip(np.arange(9).reshape(3, 3), 2, 6))


def test_mask_value_lit_accepted_col_rejected(spark, tile_df):
    """`lit(15)` works as a mask value (the reference API form), but a
    genuine column reference — even one whose NAME parses as a number,
    like F.col('2') — must raise, not silently mask by the constant 2.0
    (regression: literal detection parsed the Column repr)."""
    from pyspark.sql import functions as F

    out = tile_df.select(rf.rf_mask_by_value("a", "nd", F.lit(15)).alias("r"))
    t = _one_tile(out, "r")
    assert np.ma.getmaskarray(t.masked())[1, 5]
    with pytest.raises(TypeError):
        rf.rf_mask_by_value("a", "nd", F.col("2"))
    with pytest.raises(TypeError):
        rf.rf_mask_by_value("a", "nd", F.col("nd"))


def test_mask_value_connect_mode_introspects_expr_not_repr():
    """The no-JVM-node (connect-mode) fallback must introspect the
    column's OWN expression — a LiteralExpression yields its value, a
    column reference raises even when its repr looks numeric
    (``Column<'2'>``)."""
    from rasterframes_spark.functions.mask import _connect_literal_value

    class LiteralExpression:            # shape of connect's literal node
        def __init__(self, v):
            self._value = v

    class ColumnReference:              # shape of a genuine col('2')
        pass

    class FakeCol:
        def __init__(self, expr):
            self._expr = expr

        def __repr__(self):
            return "Column<'2'>"

    assert _connect_literal_value(FakeCol(LiteralExpression(15))) == 15.0
    assert _connect_literal_value(FakeCol(LiteralExpression(1.5))) == 1.5
    with pytest.raises(TypeError):
        _connect_literal_value(FakeCol(ColumnReference()))
    with pytest.raises(TypeError):       # string literal isn't a scalar
        _connect_literal_value(FakeCol(LiteralExpression("2")))
