"""GIS MBR helpers (function_gis.h surface, de-scoped to envelope math)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_st_mbr_and_intersects(spark):
    from griddb_spark.functions.gis import st_make_rect, st_mbr, st_mbr_intersects

    df = spark.createDataFrame(
        [
            (1, "POINT(2 3)"),
            (2, "LINESTRING(0 0, 4 1)"),
            (3, "POLYGON((10 10, 12 10, 12 14, 10 14, 10 10))"),
        ],
        "id int, wkt string",
    )
    out = df.select(
        "id",
        st_mbr("wkt").alias("mbr"),
        st_mbr_intersects(st_mbr("wkt"), st_make_rect(1, 0, 5, 5)).alias("hit"),
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[1].mbr == (2.0, 3.0, 2.0, 3.0)
    assert rows[2].mbr == (0.0, 0.0, 4.0, 1.0)
    assert rows[3].mbr == (10.0, 10.0, 12.0, 14.0)
    assert rows[1].hit and rows[2].hit and not rows[3].hit
