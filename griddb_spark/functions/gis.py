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

Parity note: this envelope surface is not a subset of the reference's —
it IS the reference's. GridDB's exact-geometry predicates
(``intersects``/``contains``/``within``/``relate``/…) are declared but
commented out in ``gis_geometry.h:314-340`` under "Left for OpenGIS
Fullset"; the shipped evaluation path is bounding-rect intersection
(``isBoundingRectIntersects``, ``gis_geometry.h:243``) plus the
quadratic-surface tests (see ``qsf.py``). A user of the reference cannot
run a polygon-exact query today, so none is emulated here.
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


# -- 3D surface + SRID (full function_gis.h parity) -------------------------


def st_geomfromtext(wkt: Column | str) -> Column:
    """ST_GEOMFROMTEXT: WKT text → geometry struct (wkt, srid).

    GridDB's WKT grammar accepts a trailing ``;<int>`` SRID
    (``wkt.cpp:131-132``, ``gisarg ::= gisexpr SEMICOLON [MINUS] INTEGER``);
    srid defaults to -1 when absent (``gis_geometry.cpp:349``).
    """
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    srid_txt = F.regexp_extract(c, r";\s*(-?\d+)\s*$", 1)
    return F.struct(
        F.regexp_replace(c, r"\s*;\s*-?\d+\s*$", "").alias("wkt"),
        F.when(srid_txt == "", F.lit(-1))
        .otherwise(srid_txt.cast("int")).alias("srid"),
    )


def st_getsrid(geom: Column) -> Column:
    """ST_GETSRID (function_gis.h:737-758): the geometry's SRID."""
    return geom["srid"]


def st_make_box(xmin, ymin, zmin, xmax, ymax, zmax) -> Column:
    """ST_MAKEBOX (function_gis.h:151-326): axis-aligned 3D box.

    The reference materializes a 6-face POLYHEDRALSURFACE whose R-tree
    entry is exactly the (min, max) envelope — which is all downstream
    MBR/QSF predicates consume, so the envelope struct IS the box here.
    Accepts plain numbers or Columns; corners may be given unordered
    (normalized with least/greatest like TrRect construction).
    """
    def lit(v):
        return v if isinstance(v, Column) else F.lit(float(v))

    x0, y0, z0, x1, y1, z1 = (lit(v).cast("double")
                              for v in (xmin, ymin, zmin, xmax, ymax, zmax))
    return F.struct(
        F.least(x0, x1).alias("xmin"), F.least(y0, y1).alias("ymin"),
        F.least(z0, z1).alias("zmin"), F.greatest(x0, x1).alias("xmax"),
        F.greatest(y0, y1).alias("ymax"), F.greatest(z0, z1).alias("zmax"),
    )


def st_mbr_xyz(wkt: Column | str) -> Column:
    """3D envelope (xmin..zmax) of a WKT geometry.

    Third coordinate defaults to 0.0 for 2D geometries (a 2D shape sits in
    the z=0 plane of the R-tree's 3D rect). Same pure higher-order
    expression shape as :func:`st_mbr` — no UDF.
    """
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    coord_text = F.regexp_replace(F.upper(c), r"[A-Z()]+", "")
    pairs = F.filter(
        F.split(F.trim(coord_text), r"\s*,\s*"), lambda p: p != ""
    )
    xs = F.transform(pairs, lambda p: F.split(F.trim(p), r"\s+")[0].cast("double"))
    ys = F.transform(pairs, lambda p: F.split(F.trim(p), r"\s+")[1].cast("double"))
    zs = F.transform(
        pairs,
        lambda p: F.coalesce(
            F.split(F.trim(p), r"\s+")[2].cast("double"), F.lit(0.0)
        ),
    )
    return F.struct(
        F.array_min(xs).alias("xmin"), F.array_min(ys).alias("ymin"),
        F.array_min(zs).alias("zmin"), F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"), F.array_max(zs).alias("zmax"),
    )


def st_mbr_intersects_3d(a: Column, b: Column) -> Column:
    """Closed-interval overlap of two 3D envelopes (TrRect semantics)."""
    return (
        (a["xmin"] <= b["xmax"]) & (b["xmin"] <= a["xmax"])
        & (a["ymin"] <= b["ymax"]) & (b["ymin"] <= a["ymax"])
        & (a["zmin"] <= b["zmax"]) & (b["zmin"] <= a["zmax"])
    )
