"""Driver contract for the spark-graft builder (PySpark target).

Tiles are synthesized deterministically from the lineitem table so that
every raster operator reduces to arithmetic DuckDB can reproduce:

    grp  = l_orderkey % 64
    idx  = row_number() over (partition by grp
             order by l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1
    keep idx < 256; cell (row idx//16, col idx%16) of grp's 16x16 tile = value

Cells beyond a group's row count are NoData, which exercises mask semantics.
All integer-valued cells (l_quantity) make sums bit-exact across engines;
ratio results are rounded to 6 decimals on BOTH sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

import rasterframes_spark as rf

TILE_COLS = 16
TILE_ROWS = 16
N_GROUPS = 64

# ---------------------------------------------------------------------------
# shared tile synthesis (Spark) and its SQL mirror (DuckDB oracle CTE)
# ---------------------------------------------------------------------------


def _cells_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("grp").orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("grp", (F.col("l_orderkey") % N_GROUPS).cast("int"))
        .withColumn("idx", F.row_number().over(w) - 1)
        .where(F.col("idx") < TILE_COLS * TILE_ROWS)
        .select(
            "grp",
            (F.col("idx") % TILE_COLS).cast("int").alias("ci"),
            (F.col("idx") / TILE_COLS).cast("int").alias("ri"),
            F.col("l_quantity").alias("qty"),
            (F.col("l_extendedprice") / 1000.0).alias("price"),
            F.col("l_discount").alias("disc"),
        )
    )


_ORACLE_CTE = f"""
with c as (
  select cast(l_orderkey % {N_GROUPS} as int) as grp,
         row_number() over (partition by l_orderkey % {N_GROUPS}
                            order by l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1 as idx,
         l_quantity as qty,
         l_extendedprice/1000.0 as price,
         l_discount as disc
  from lineitem
), cells as (
  select grp, cast(idx % {TILE_COLS} as int) as ci, cast(idx // {TILE_COLS} as int) as ri,
         qty, price, disc
  from c where idx < {TILE_COLS * TILE_ROWS}
)
"""


def _tiles_df(spark: SparkSession, sf_dir: str, value_col: str = "qty",
              cell_type: str = "float64") -> DataFrame:
    cells = _cells_df(spark, sf_dir)
    return rf.assemble_tiles(
        cells, ["grp"], "ci", "ri", value_col, TILE_COLS, TILE_ROWS, cell_type
    ).withColumnRenamed("tile", value_col)


def _two_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _cells_df(spark, sf_dir)
    qty = rf.assemble_tiles(cells, ["grp"], "ci", "ri", "qty", TILE_COLS, TILE_ROWS, "float64")
    price = rf.assemble_tiles(cells, ["grp"], "ci", "ri", "price", TILE_COLS, TILE_ROWS, "float64")
    return (
        qty.withColumnRenamed("tile", "qty")
        .join(price.withColumnRenamed("tile", "price"), "grp")
    )


# ---------------------------------------------------------------------------
# entry: flagship query (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-group normalized-difference stats over two synthesized
    bands — the engine's NDVI workflow (SURVEY.md §7 phase 2)."""
    df = _two_band(spark, "/root/testdata/sf0.001")
    nd = df.select("grp", rf.rf_normalized_difference("price", "qty").alias("nd"))
    return nd.select(
        "grp",
        rf.rf_data_cells("nd").alias("data_cells"),
        F.round(rf.rf_tile_sum("nd"), 6).alias("nd_sum"),
        F.round(rf.rf_tile_mean("nd"), 6).alias("nd_mean"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q_tile_sum(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select("grp", rf.rf_tile_sum("qty").alias("tile_sum"),
                    rf.rf_data_cells("qty").alias("data_cells"),
                    rf.rf_tile_min("qty").alias("tile_min"),
                    rf.rf_tile_max("qty").alias("tile_max"))


def _q_tile_mean(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select("grp", F.round(rf.rf_tile_mean("qty"), 6).alias("tile_mean"))


def _q_local_add(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select("grp", rf.rf_tile_sum(rf.rf_local_add("qty", 5)).alias("s"))


def _q_local_multiply(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select("grp", rf.rf_tile_sum(rf.rf_local_multiply("qty", 3)).alias("s"))


def _q_local_subtract_divide(spark, sf_dir):
    df = _two_band(spark, sf_dir)
    return df.select(
        "grp",
        rf.rf_tile_sum(rf.rf_local_subtract("qty", F.col("price"))).alias("diff_sum"),
        F.round(rf.rf_tile_sum(rf.rf_local_divide("price", 2)), 6).alias("half_price_sum"),
    )


def _q_normalized_difference(spark, sf_dir):
    df = _two_band(spark, sf_dir)
    nd = df.select("grp", rf.rf_normalized_difference("price", "qty").alias("nd"))
    return nd.select("grp", F.round(rf.rf_tile_sum("nd"), 6).alias("nd_sum"),
                     rf.rf_data_cells("nd").alias("n"))


def _q_local_greater(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select("grp", rf.rf_tile_sum(rf.rf_local_greater("qty", 25)).alias("n_gt"))


def _q_where(spark, sf_dir):
    df = _two_band(spark, sf_dir)
    cond = rf.rf_local_greater("qty", 25)
    return df.select(
        "grp",
        F.round(rf.rf_tile_sum(rf.rf_where(cond, "price", "qty")), 6).alias("s"),
    )


def _q_mask_by_value(spark, sf_dir):
    # mask qty where the 0/1 tile (qty>25) equals 1 -> keep only qty<=25 cells
    t = _tiles_df(spark, sf_dir)
    m = t.select("grp", rf.rf_mask_by_value("qty", rf.rf_local_greater("qty", 25), 1).alias("mq"))
    return m.select("grp", rf.rf_tile_sum("mq").alias("s"),
                    rf.rf_data_cells("mq").alias("n"))


def _q_clamp_abs(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select(
        "grp",
        rf.rf_tile_sum(rf.rf_local_clamp("qty", 10, 40)).alias("clamp_sum"),
        rf.rf_tile_sum(rf.rf_abs(rf.rf_local_subtract("qty", 25))).alias("absdev_sum"),
    )


def _q_agg_stats(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    s = t.agg(rf.rf_agg_stats("qty").alias("s")).select(
        F.col("s.data_cells").alias("data_cells"),
        F.col("s.no_data_cells").alias("no_data_cells"),
        F.col("s.min").alias("min_v"),
        F.col("s.max").alias("max_v"),
        F.round(F.col("s.mean"), 6).alias("mean_v"),
        F.round(F.col("s.variance"), 4).alias("var_v"),
    )
    return s


def _q_agg_mean_by_parity(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return (
        t.withColumn("parity", (F.col("grp") % 2).cast("int"))
        .groupBy("parity")
        .agg(F.round(rf.rf_agg_mean("qty"), 6).alias("mean_v"),
             rf.rf_agg_data_cells("qty").alias("n"))
    )


def _q_explode(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    cells = rf.explode_tiles(t, ["qty"])
    return cells.where(F.col("qty").isNotNull()).select(
        "grp", "column_index", "row_index", F.col("qty").alias("cell")
    )


def _q_assemble_roundtrip(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    cells = rf.explode_tiles(t, ["qty"]).where(F.col("qty").isNotNull())
    back = rf.assemble_tiles(cells, ["grp"], "column_index", "row_index", "qty",
                             TILE_COLS, TILE_ROWS, "float64")
    return back.select("grp", rf.rf_tile_sum("tile").alias("s"),
                       rf.rf_data_cells("tile").alias("n"))


def _q_tile_dimensions(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select(
        "grp",
        rf.rf_dimensions("qty").getField("cols").alias("tile_cols"),
        rf.rf_dimensions("qty").getField("rows").alias("tile_rows"),
        rf.rf_cell_type("qty").alias("ct"),
    )


def _q_rescale(spark, sf_dir):
    t = _tiles_df(spark, sf_dir)
    return t.select(
        "grp",
        F.round(rf.rf_tile_sum(rf.rf_rescale("qty", 1.0, 50.0)), 6).alias("s"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_sum": _q_tile_sum,
        "tile_mean": _q_tile_mean,
        "local_add": _q_local_add,
        "local_multiply": _q_local_multiply,
        "local_subtract_divide": _q_local_subtract_divide,
        "normalized_difference": _q_normalized_difference,
        "local_greater": _q_local_greater,
        "where": _q_where,
        "mask_by_value": _q_mask_by_value,
        "clamp_abs": _q_clamp_abs,
        "agg_stats": _q_agg_stats,
        "agg_mean_by_parity": _q_agg_mean_by_parity,
        "explode_tiles": _q_explode,
        "assemble_roundtrip": _q_assemble_roundtrip,
        "tile_dimensions": _q_tile_dimensions,
        "rescale": _q_rescale,
    }


def oracle_sql() -> dict[str, str]:
    C = _ORACLE_CTE
    return {
        "tile_sum": C + """
            select grp, sum(qty) as tile_sum, count(qty) as data_cells,
                   min(qty) as tile_min, max(qty) as tile_max
            from cells group by grp""",
        "tile_mean": C + """
            select grp, round(sum(qty)/count(qty), 6) as tile_mean
            from cells group by grp""",
        "local_add": C + "select grp, sum(qty + 5) as s from cells group by grp",
        "local_multiply": C + "select grp, sum(qty * 3) as s from cells group by grp",
        "local_subtract_divide": C + """
            select grp, sum(qty - price) as diff_sum,
                   round(sum(price / 2), 6) as half_price_sum
            from cells group by grp""",
        "normalized_difference": C + """
            select grp, round(sum((price - qty)/(price + qty)), 6) as nd_sum,
                   count(*) as n
            from cells group by grp""",
        "local_greater": C + """
            select grp, cast(sum(case when qty > 25 then 1 else 0 end) as double) as n_gt
            from cells group by grp""",
        "where": C + """
            select grp, round(sum(case when qty > 25 then price else qty end), 6) as s
            from cells group by grp""",
        "mask_by_value": C + """
            select grp, sum(case when qty > 25 then null else qty end) as s,
                   count(case when qty > 25 then null else qty end) as n
            from cells group by grp""",
        "clamp_abs": C + """
            select grp,
                   sum(case when qty < 10 then 10 when qty > 40 then 40 else qty end) as clamp_sum,
                   sum(abs(qty - 25)) as absdev_sum
            from cells group by grp""",
        "agg_stats": C + """
            select count(qty) as data_cells,
                   (select count(distinct grp) from cells) * 256 - count(qty) as no_data_cells,
                   min(qty) as min_v, max(qty) as max_v,
                   round(sum(qty)/count(qty), 6) as mean_v,
                   round(sum(qty*qty)/count(qty) - (sum(qty)/count(qty))*(sum(qty)/count(qty)), 4) as var_v
            from cells""",
        "agg_mean_by_parity": C + """
            select cast(grp % 2 as int) as parity,
                   round(sum(qty)/count(qty), 6) as mean_v, count(qty) as n
            from cells group by parity""",
        "explode_tiles": C + """
            select grp, ci as column_index, ri as row_index, qty as cell
            from cells""",
        "assemble_roundtrip": C + """
            select grp, sum(qty) as s, count(qty) as n from cells group by grp""",
        "tile_dimensions": C + f"""
            select grp, {TILE_COLS} as tile_cols, {TILE_ROWS} as tile_rows,
                   'float64' as ct
            from cells group by grp""",
        "rescale": C + """
            select grp, round(sum((qty - 1.0)/(50.0 - 1.0)), 6) as s
            from cells group by grp""",
    }
