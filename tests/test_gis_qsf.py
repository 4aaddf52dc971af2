"""Quadratic-surface (ST_MAKE*/ST_QSFMBRINTERSECTS) tests.

Differential strategy: the batched TrPv3Test kernel (faithful to
tr-cpp/TrPv3.cpp) is checked against *independent* exact oracles where the
geometry has a closed form (sphere: clamp-distance; plane: corner minimum)
and against a dense-grid decision with a decisive margin for cylinder/cone
— plus witness soundness on random composites.
"""

from __future__ import annotations

import numpy as np
import pytest

from griddb_spark.functions.gis import st_make_box
from griddb_spark.functions.qsf import (
    Pv3Key,
    pv3_test_batch,
    qsf_and,
    qsf_not,
    qsf_or,
    st_make_cone,
    st_make_cylinder,
    st_make_plane,
    st_make_qsf,
    st_make_sphere,
    st_qsf_mbr_intersects,
)

def _rand_boxes(rng, n: int, lo=-10.0, hi=10.0, max_ext=6.0):
    p0 = rng.uniform(lo, hi, (n, 3))
    p1 = rng.uniform(0.05, max_ext, (n, 3))
    return p0, p1


def test_sphere_matches_clamp_distance_oracle():
    RNG = np.random.default_rng(101)
    for _ in range(20):
        center = RNG.uniform(-8, 8, 3)
        r = float(RNG.uniform(0.5, 6.0))
        key = st_make_sphere(*center, r)
        p0, p1 = _rand_boxes(RNG, 500)
        got = pv3_test_batch(key, p0, p1)
        # independent oracle: nearest box point to the center
        nearest = np.clip(center, p0, p0 + p1)
        dist = np.linalg.norm(nearest - center, axis=1)
        decisive = np.abs(dist - r) > 1e-9
        assert np.array_equal(got[decisive], (dist < r)[decisive])


def test_plane_matches_corner_minimum_oracle():
    RNG = np.random.default_rng(102)
    for _ in range(20):
        anchor = RNG.uniform(-5, 5, 3)
        v = RNG.uniform(-1, 1, 3)
        if np.linalg.norm(v) < 0.1:
            continue
        key = st_make_plane(*anchor, *v)
        p0, p1 = _rand_boxes(RNG, 500)
        got = pv3_test_batch(key, p0, p1)
        # open half-space v.(x-anchor) < 0 meets a box iff its most
        # negative corner is strictly negative
        corners = np.stack(
            [p0 + p1 * np.array([i, j, k])
             for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            axis=1,
        )  # (N,8,3)
        side = (corners - anchor) @ v
        want = side.min(axis=1) < 0.0
        decisive = np.abs(side.min(axis=1)) > 1e-9
        assert np.array_equal(got[decisive], want[decisive])


def _grid_decision(key: Pv3Key, p0, p1, steps=24, margin=1e-3):
    """(decision, decisive) from a dense sample of each box."""
    t = np.linspace(0.0, 1.0, steps)
    gx, gy, gz = np.meshgrid(t, t, t, indexing="ij")
    unit = np.column_stack([gx.ravel(), gy.ravel(), gz.ravel()])  # (G,3)
    n = p0.shape[0]
    dec = np.zeros(n, dtype=bool)
    decisive = np.zeros(n, dtype=bool)
    for i in range(n):
        pts = p0[i] + unit * p1[i]
        f = key.eval(pts)
        mn = f.min()
        dec[i] = mn < 0.0
        decisive[i] = abs(mn) > margin
    return dec, decisive


@pytest.mark.parametrize("maker", ["cylinder", "cone"])
def test_cylinder_cone_vs_dense_grid(maker):
    RNG = np.random.default_rng(103 if maker == "cylinder" else 104)
    for _ in range(6):
        p = RNG.uniform(-4, 4, 3)
        v = RNG.uniform(-1, 1, 3)
        if np.linalg.norm(v) < 0.2:
            v = np.array([0.3, 0.9, 0.1])
        if maker == "cylinder":
            key = st_make_cylinder(*p, *v, float(RNG.uniform(0.5, 3.0)))
        else:
            key = st_make_cone(*p, *v, float(RNG.uniform(15.0, 60.0)))
        p0, p1 = _rand_boxes(RNG, 60, lo=-6, hi=6, max_ext=4.0)
        got = pv3_test_batch(key, p0, p1)
        want, decisive = _grid_decision(key, p0, p1)
        # reference quirk (TrPv3.cpp:422-432): the interior test hits
        # whenever the key's anchor point lies strictly inside the box,
        # regardless of f. The cylinder constructor never sets an anchor
        # (stays at the world origin), so boxes containing key.p report
        # an intersection exactly like the reference does — exempt those
        # from the true-geometry comparison and pin them to True instead.
        anchor_in = np.all((key.p > p0) & (key.p < p0 + p1), axis=1)
        assert np.all(got[anchor_in])
        dec = decisive & ~anchor_in
        # sound: a grid point strictly inside the solid forces a hit;
        # decisive-margin cases must agree exactly
        assert np.all(got[want & dec])
        assert np.array_equal(got[dec], want[dec])


def test_raw_qsf_equals_sphere_coefficients():
    RNG = np.random.default_rng(105)
    center = np.array([1.0, -2.0, 3.0])
    r = 2.5
    sph = st_make_sphere(*center, r)
    raw = st_make_qsf(1, 0, 0, 0, 1, 0, 0, 0, 1,
                      *(-center), float(center @ center) - r * r)
    p0, p1 = _rand_boxes(RNG, 300)
    got_s = pv3_test_batch(sph, p0, p1)
    got_r = pv3_test_batch(raw, p0, p1)
    # raw key lacks the sphere's surface anchor point (p stays 0 —
    # gis_quadraticsurface.h:97-99), which only matters when the sphere
    # hides strictly inside a box without touching its boundary; outside
    # that case decisions are identical
    contains = np.all((center - r > p0) & (center + r < p0 + p1), axis=1)
    assert np.array_equal(got_s[~contains], got_r[~contains])


def test_degenerate_point_box_uses_corner_test():
    key = st_make_sphere(0.0, 0.0, 0.0, 1.0)
    p0 = np.array([[0.1, 0.1, 0.1], [5.0, 5.0, 5.0]])
    p1 = np.zeros((2, 3))
    got = pv3_test_batch(key, p0, p1)
    assert got[0] and not got[1]


def test_and_or_not_composition():
    s1 = st_make_sphere(0, 0, 0, 2.0)
    s2 = st_make_sphere(3, 0, 0, 2.0)
    p0 = np.array([[-0.5, -0.5, -0.5], [1.2, -0.5, -0.5], [7.0, 7.0, 7.0]])
    p1 = np.full((3, 3), 1.0)
    both = pv3_test_batch(qsf_and(s1, s2), p0, p1)
    either = pv3_test_batch(qsf_or(s1, s2), p0, p1)
    neither = pv3_test_batch(qsf_not(qsf_or(s1, s2)), p0, p1)
    assert list(either) == [True, True, False]
    # box 1 straddles both spheres' overlap region
    assert both[1]
    assert neither[2]


def test_spark_qsf_probe_matches_numpy(spark):
    import pyspark.sql.functions as F

    key = st_make_sphere(2.0, 1.0, 0.5, 3.0)
    rows = [(i, float(i % 7) - 3, float(i % 5) - 2, float(i % 3) - 1)
            for i in range(50)]
    df = spark.createDataFrame(rows, "id int, x double, y double, z double")
    out = (
        df.select(
            "id",
            st_make_box(F.col("x"), F.col("y"), F.col("z"),
                        F.col("x") + 1.5, F.col("y") + 1.5,
                        F.col("z") + 1.5).alias("box"),
        )
        .select("id", st_qsf_mbr_intersects(key, F.col("box")).alias("hit"))
        .collect()
    )
    p0 = np.array([[r[1], r[2], r[3]] for r in rows])
    want = pv3_test_batch(key, p0, np.full((50, 3), 1.5))
    got = {r.id: r.hit for r in out}
    assert all(got[i] == bool(want[i]) for i in range(50))


def test_geomfromtext_srid_and_3d_mbr(spark):
    import pyspark.sql.functions as F

    from griddb_spark.functions.gis import (
        st_geomfromtext,
        st_getsrid,
        st_mbr_xyz,
    )

    df = spark.createDataFrame(
        [
            (1, "POINT(1 2 3);4326"),
            (2, "POINT(1 2)"),
            (3, "LINESTRING(0 0 0, 4 1 -2);-7"),
        ],
        "id int, wkt string",
    )
    out = df.select(
        "id",
        st_geomfromtext("wkt").alias("g"),
    ).select(
        "id", st_getsrid(F.col("g")).alias("srid"),
        st_mbr_xyz(F.col("g")["wkt"]).alias("m"),
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[1].srid == 4326 and rows[2].srid == -1 and rows[3].srid == -7
    assert rows[1].m == (1.0, 2.0, 3.0, 1.0, 2.0, 3.0)
    assert rows[2].m == (1.0, 2.0, 0.0, 1.0, 2.0, 0.0)
    assert rows[3].m == (0.0, 0.0, -2.0, 4.0, 1.0, 0.0)
