"""Geometry helpers (GridDB GEOMETRY de-scoped to MBR math — SURVEY §1.2).

GridDB stores GEOMETRY as WKT with R-tree MBR indexing (``gis_geometry.cpp``,
``wkt.cpp``, ``rtree_map.cpp``); the TQL surface is ST_GEOMFROMTEXT,
ST_MAKERECT, ST_MBRINTERSECTS and friends (``function_gis.h``,
``function_map.cpp:52-56``). A full planar-geometry engine is out of scope
(Sedona's territory); what IS in scope — and what GridDB's own R-tree
actually evaluates — is bounding-box intersection, which is plain column
math and fully codegen-friendly:

- geometry columns are WKT strings (`StringType`);
- ``st_mbr`` extracts the (xmin, ymin, xmax, ymax) envelope of POINT /
  LINESTRING / POLYGON WKT with JVM-side regex/split expressions;
- ``st_mbr_intersects`` is interval overlap on the envelope struct.

At scale: store the four envelope bounds as top-level columns and the
overlap predicate min/max-pushes into the parquet scan — file/row-group
skipping does the coarse filtering GridDB's R-tree provides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def st_point(x, y) -> Column:
    """POINT WKT from coordinates (ST_MAKEPOINT-ish generator)."""
    return F.concat_ws(
        "", F.lit("POINT("), F.lit(x).cast("string"), F.lit(" "),
        F.lit(y).cast("string"), F.lit(")"),
    )


def st_make_rect(xmin, ymin, xmax, ymax) -> Column:
    """Envelope struct literal (ST_MAKERECT, function_map.cpp:52-56)."""
    return F.struct(
        F.lit(float(xmin)).alias("xmin"), F.lit(float(ymin)).alias("ymin"),
        F.lit(float(xmax)).alias("xmax"), F.lit(float(ymax)).alias("ymax"),
    )


def st_mbr(wkt: Column | str) -> Column:
    """Envelope (xmin, ymin, xmax, ymax) of a WKT geometry.

    Strips keywords/parens, splits "x y[, x y ...]" coordinate text, and
    min/max-aggregates — pure higher-order expressions, no UDF.
    """
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    coord_text = F.regexp_replace(F.upper(c), r"[A-Z()]+", "")
    pairs = F.filter(
        F.split(F.trim(coord_text), r"\s*,\s*"), lambda p: p != ""
    )
    xs = F.transform(pairs, lambda p: F.split(F.trim(p), r"\s+")[0].cast("double"))
    ys = F.transform(pairs, lambda p: F.split(F.trim(p), r"\s+")[1].cast("double"))
    return F.struct(
        F.array_min(xs).alias("xmin"), F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"), F.array_max(ys).alias("ymax"),
    )


def st_mbr_intersects(a: Column, b: Column) -> Column:
    """ST_MBRINTERSECTS: closed-interval overlap of two envelopes."""
    return (
        (a["xmin"] <= b["xmax"]) & (b["xmin"] <= a["xmax"])
        & (a["ymin"] <= b["ymax"]) & (b["ymin"] <= a["ymax"])
    )
