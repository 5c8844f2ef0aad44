"""GeoTrellis catalog migration — the workflow the README format matrix
promises: take an existing GeoTrellis Avro layer catalog (the storage the
reference reads via `spark.read.geotrellis`, GeoTrellisRelation.scala),
read it natively, and land it in the engine's Z2-clustered Parquet layer
where Spark prunes and joins it natively.  Both storage generations stay
readable behind the same fluent reader name.

Run: python examples/geotrellis_migration.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(spark=None):
    from pyspark.sql import functions as F

    import rasterframes_spark as rf
    from rasterframes_spark import sources as S

    own = spark is None
    if own:
        from rasterframes_spark import create_rf_spark_session

        spark = create_rf_spark_session(master="local[4]",
                                        app_name="gt-migration-example")

    d = tempfile.mkdtemp()
    cat = os.path.join(d, "gt_catalog")

    # --- stand-in for the legacy system: a real GeoTrellis Avro layer
    # (attribute store + zorder-indexed deflated KeyValueRecord files)
    rng = np.random.default_rng(11)
    tiles = [(c, r, rng.integers(0, 3000, (64, 64)).astype("int16"))
             for c in range(4) for r in range(3)]
    S.write_geotrellis_layer(tiles, cat, "elevation", 8,
                             layout_extent=(-180, -90, 180, 90),
                             layout_cols=512, layout_rows=256,
                             nodata=-32768)

    # --- discover what's in the catalog (GeoTrellisCatalog surface)
    listing = spark.read.geotrellis_catalog(cat)
    listing.show(truncate=False)
    row = listing.first()
    assert (row.layer, row.zoom) == ("elevation", 8)

    # --- read the Avro layer natively (distributed binaryFile decode)
    legacy = spark.read.geotrellis(cat, layer="elevation", zoom=8)
    n_tiles = legacy.count()
    total = legacy.agg(F.sum(rf.rf_tile_sum("tile"))).first()[0]
    print(f"legacy layer: {n_tiles} tiles, cell total {total}")
    assert n_tiles == len(tiles)
    assert total == float(sum(int(a.sum()) for _, _, a in tiles))

    # --- migrate: land it as a Z2-clustered Parquet layer
    new_path = os.path.join(d, "parquet_layer")
    S.write_tile_layer(legacy.drop("band"), new_path)

    # --- the migrated layer reads back through the SAME reader name,
    # now with parquet column-stat pruning on spatial_index
    migrated = spark.read.geotrellis(new_path)
    total2 = migrated.agg(F.sum(rf.rf_tile_sum("tile"))).first()[0]
    assert total2 == total, (total2, total)
    print(f"migrated layer: {migrated.count()} tiles, cell total {total2}")

    # spatial pruning works on the migrated layer
    w = 360.0 / 512
    some = S.read_tile_layer(spark, new_path,
                             query_extent=(-180.0, 90 - 3 * (180.0 / 256),
                                           -180 + 2 * w, 90.0))
    print(f"query_extent subset: {some.count()} tiles")

    if own:
        spark.stop()
    return total


if __name__ == "__main__":
    main()
