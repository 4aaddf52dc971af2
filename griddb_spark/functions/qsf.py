"""Quadratic-surface (QSF) geometry: ST_MAKEPLANE / ST_MAKESPHERE /
ST_MAKECYLINDER / ST_MAKECONE / ST_MAKEQSF and ST_QSFMBRINTERSECTS.

GridDB's 3D search primitive is a *quadratic surface probe* against the
R-tree: a solid region ``f(x) = x^T A x + 2 b.x + c < 0`` is tested for
intersection with a 3D bounding box (``TrPv3Key`` / ``TrPv3Test``,
``tr-cpp/TrPv3.h:44-53``, ``TrPv3.cpp:433-487``; TQL surface
``function_gis.h:332-530,618``; constructor-to-key mapping
``gis_quadraticsurface.h:60-175``).

Spark mapping: the QSF is always a *query constant* in the reference (TQL
functors build it from literal args), so keys here are plain Python objects
broadcast into an Arrow-batched vectorized kernel; the per-row side is a 3D
envelope struct (``st_mbr_xyz`` / ``st_make_box``). The kernel evaluates
the reference's exact candidate-point algorithm (corners, edge-interior and
face-interior stationary points, anchor point) batched with numpy — one
pandas UDF call per Arrow batch, no per-row Python. At scale the cheap
coarse prefilter is the envelope overlap (plain column math that pushes to
the scan); the QSF test runs only on survivors.

Key construction formulas are transliterations of ``TrPv3Key_plane/sphere/
cylinder/cone`` (``TrPv3.cpp:144-220``); the box test is ``TrPv3Test``
(``TrPv3.cpp:433-487``) including its published quirks (see comments).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EPSI = 1.0e-8  # TrPv3.cpp:31

# -- key model --------------------------------------------------------------


@dataclass
class Pv3Key:
    """Solid region f(x) = x^T A x + 2 b.x + c  (< 0 inside).

    Mirror of ``TrPv3Key`` (``TrPv3.h:44-53``): 3x3 matrix A, vector b,
    scalar c, anchor point p (used by the interior test), negation flag,
    and AND/OR composition (``TrPv3Key_and/or/not``).
    """

    qtype: str  # none|plane|sphere|cylinder|cone|and|or
    A: np.ndarray = field(default_factory=lambda: np.zeros((3, 3)))
    b: np.ndarray = field(default_factory=lambda: np.zeros(3))
    c: float = 0.0
    p: np.ndarray = field(default_factory=lambda: np.zeros(3))
    negative: bool = False
    k1: "Pv3Key | None" = None
    k2: "Pv3Key | None" = None

    def eval(self, x: np.ndarray) -> np.ndarray:
        """f at points x (..., 3) — TrPv3Key_eval (TrPv3.cpp:94-106)."""
        return (
            np.einsum("...i,ij,...j->...", x, self.A, x)
            + 2.0 * (x @ self.b)
            + self.c
        )


def st_make_plane(px, py, pz, vx, vy, vz) -> Pv3Key:
    """ST_MAKEPLANE(p0, v): half-space v.(x - p0) < 0
    (TrPv3Key_plane, TrPv3.cpp:144-156)."""
    p0 = np.array([px, py, pz], dtype=float)
    v = np.array([vx, vy, vz], dtype=float)
    return Pv3Key("plane", np.zeros((3, 3)), v / 2.0, -float(p0 @ v), p0.copy())


def st_make_sphere(px, py, pz, r) -> Pv3Key:
    """ST_MAKESPHERE(p0, R): open ball |x - p0| < R
    (TrPv3Key_sphere, TrPv3.cpp:158-171; R > 0 enforced like
    gis_quadraticsurface.h:131-136)."""
    if not r > 0:
        raise ValueError("Radius must be positive number")
    p0 = np.array([px, py, pz], dtype=float)
    anchor = p0.copy()
    anchor[0] += r  # reference anchors the +x surface point
    return Pv3Key("sphere", np.eye(3), -p0, float(p0 @ p0) - r * r, anchor)


def st_make_cylinder(px, py, pz, vx, vy, vz, r) -> Pv3Key:
    """ST_MAKECYLINDER(p0, axis, R): infinite open cylinder
    (TrPv3Key_cylinder, TrPv3.cpp:173-194). Anchor stays at origin —
    faithful to the reference (Key_init leaves p = 0)."""
    p0 = np.array([px, py, pz], dtype=float)
    v = np.array([vx, vy, vz], dtype=float)
    pp = math.sqrt(float(v @ v))
    if pp < EPSI:
        raise ValueError("Cannot make cylinder from the arguments")
    n1 = v / pp
    np_ = float(p0 @ n1)
    A = np.eye(3) - np.outer(n1, n1)
    b = np_ * n1 - p0
    c = float(p0 @ p0) - np_ * np_ - r * r
    return Pv3Key("cylinder", A, b, c)


def st_make_cone(px, py, pz, vx, vy, vz, angle_deg) -> Pv3Key:
    """ST_MAKECONE(apex, axis, half-angle-deg): double cone
    cos^2(a)|x-p0|^2 < (n.(x-p0))^2 (TrPv3Key_cone, TrPv3.cpp:196-220;
    _PI_ = 3.1415926 exactly as the reference defines it)."""
    a1 = math.cos((3.1415926 / 180.0) * angle_deg)
    a2 = a1 * a1
    p0 = np.array([px, py, pz], dtype=float)
    v = np.array([vx, vy, vz], dtype=float)
    pp = math.sqrt(float(v @ v))
    if pp < EPSI:
        raise ValueError("Cannot make cone from the arguments")
    n1 = v / pp
    np_ = float(p0 @ n1)
    A = a2 * np.eye(3) - np.outer(n1, n1)
    b = np_ * n1 - a2 * p0
    c = a2 * float(p0 @ p0) - np_ * np_
    return Pv3Key("cone", A, b, c, p0.copy())


def st_make_qsf(*coef) -> Pv3Key:
    """ST_MAKEQSF(A11..A33, b1..b3, c): raw 13-coefficient surface
    (gis_quadraticsurface.h:78-101, row-major A)."""
    if len(coef) != 13:
        raise ValueError("Invalid argument count")
    A = np.array(coef[:9], dtype=float).reshape(3, 3)
    b = np.array(coef[9:12], dtype=float)
    return Pv3Key("none", A, b, float(coef[12]))


def qsf_and(k1: Pv3Key, k2: Pv3Key) -> Pv3Key:
    return Pv3Key("and", k1=k1, k2=k2)


def qsf_or(k1: Pv3Key, k2: Pv3Key) -> Pv3Key:
    return Pv3Key("or", k1=k1, k2=k2)


def qsf_not(k: Pv3Key) -> Pv3Key:
    """De Morgan push-down, leaf negation flip (TrPv3Key_not,
    TrPv3.cpp:238-261)."""
    if k.qtype == "and":
        return Pv3Key("or", k1=qsf_not(k.k1), k2=qsf_not(k.k2))
    if k.qtype == "or":
        return Pv3Key("and", k1=qsf_not(k.k1), k2=qsf_not(k.k2))
    out = Pv3Key(k.qtype, k.A.copy(), k.b.copy(), k.c, k.p.copy(),
                 not k.negative)
    return out


# -- box-vs-key test (vectorized TrPv3Test) ---------------------------------


def _hit(key_neg: bool, f: np.ndarray) -> np.ndarray:
    # (negative==0 && v<0) || (negative!=0 && v>0)  — _c0test and friends
    return (f > 0.0) if key_neg else (f < 0.0)


def pv3_test_batch(key: Pv3Key, p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """TrPv3Test2 over a batch of boxes: p0 (N,3) = min corner, p1 (N,3)
    = extents. Returns bool (N,). Faithful to TrPv3.cpp:433-510 including
    its degenerate-box guards (the reference tests ``p1[1]`` twice where
    ``p1[2]`` was clearly meant — replicated verbatim so decisions match
    bit-for-bit on degenerate boxes)."""
    if key.qtype == "and":
        return pv3_test_batch(key.k1, p0, p1) & pv3_test_batch(key.k2, p0, p1)
    if key.qtype == "or":
        return pv3_test_batch(key.k1, p0, p1) | pv3_test_batch(key.k2, p0, p1)

    n = p0.shape[0]
    # TrPv3Key_conv (TrPv3.cpp:107-125): normalize the key into the unit
    # cube of each box so every candidate test works on u in [0,1]^3.
    A = p1[:, :, None] * key.A[None, :, :] * p1[:, None, :]  # (N,3,3)
    b = p1 * (key.b[None, :] + p0 @ key.A.T)  # (N,3)
    c = (
        key.c
        + 2.0 * (p0 @ key.b)
        + np.einsum("ni,ij,nj->n", p0, key.A, p0)
    )  # (N,)
    degen = p1 < EPSI
    p_anchor = np.where(degen, 0.0, (key.p[None, :] - p0) / np.where(degen, 1.0, p1))

    def feval(u: np.ndarray) -> np.ndarray:
        # u (N,3) in unit-cube coords
        return (
            np.einsum("ni,nij,nj->n", u, A, u)
            + 2.0 * np.einsum("ni,ni->n", b, u)
            + c
        )

    hit = np.zeros(n, dtype=bool)

    # c0: the 8 corners (TrPv3.cpp:282-295,439-446)
    for cx in (0.0, 1.0):
        for cy in (0.0, 1.0):
            for cz in (0.0, 1.0):
                u = np.tile(np.array([cx, cy, cz]), (n, 1))
                hit |= _hit(key.negative, feval(u))

    if key.qtype == "plane":
        return hit  # linear f: extrema at corners only (TrPv3.cpp:448)

    # degenerate-box bail-out (TrPv3.cpp:450, quirky [1] repeat kept)
    live = ~(degen[:, 0] & degen[:, 1] & degen[:, 1])

    # c1: stationary point in each of the 12 open edge interiors
    # (TrPv3.cpp:297-341,452-464)
    for var in range(3):
        o1, o2 = [i for i in range(3) if i != var]
        for u1 in (0.0, 1.0):
            for u2 in (0.0, 1.0):
                u = np.zeros((n, 3))
                u[:, o1] = u1
                u[:, o2] = u2
                A1 = A[:, var, var]
                b1 = -b[:, var] - A[:, var, o1] * u1 - A[:, var, o2] * u2
                ok = live & (np.abs(A1) >= EPSI)
                t = np.where(ok, b1 / np.where(ok, A1, 1.0), 0.0)
                ok &= (t > 0.0) & (t < 1.0)
                u[:, var] = t
                hit |= ok & _hit(key.negative, feval(u))

    # two-degenerate-axes bail-out (TrPv3.cpp:466-469)
    live &= ~(
        (degen[:, 0] & degen[:, 1])
        | (degen[:, 1] & degen[:, 2])
        | (degen[:, 2] & degen[:, 0])
    )

    # c2: stationary point in each of the 6 open face interiors
    # (TrPv3.cpp:343-421,471-478): solve the 2x2 system on the free axes
    for fix in range(3):
        f1, f2 = [i for i in range(3) if i != fix]
        for uf in (0.0, 1.0):
            a00 = A[:, f1, f1]
            a01 = A[:, f1, f2]
            a10 = A[:, f2, f1]
            a11 = A[:, f2, f2]
            b20 = -b[:, f1] - A[:, f1, fix] * uf
            b21 = -b[:, f2] - A[:, f2, fix] * uf
            det = a00 * a11 - a01 * a10
            ok = live & (np.abs(det) >= EPSI)
            sdet = np.where(ok, det, 1.0)
            s0 = (a11 * b20 - a01 * b21) / sdet
            s1 = (-a10 * b20 + a00 * b21) / sdet
            ok &= (s0 > 0.0) & (s0 < 1.0) & (s1 > 0.0) & (s1 < 1.0)
            u = np.zeros((n, 3))
            u[:, fix] = uf
            u[:, f1] = s0
            u[:, f2] = s1
            hit |= ok & _hit(key.negative, feval(u))

    # one-degenerate-axis bail-out (TrPv3.cpp:480, [1] repeat kept)
    live &= ~(degen[:, 0] | degen[:, 1] | degen[:, 1])

    # c3: the key's anchor point strictly inside the box counts as a hit
    # regardless of f (TrPv3.cpp:422-432,482)
    hit |= live & np.all((p_anchor > 0.0) & (p_anchor < 1.0), axis=1)
    return hit


def st_qsf_mbr_intersects(key: Pv3Key, box: Column | str) -> Column:
    """ST_QSFMBRINTERSECTS(qsf, box3d) — function_gis.h:618-672.

    ``box`` is a 3D envelope struct (xmin,ymin,zmin,xmax,ymax,zmax) as
    produced by :func:`griddb_spark.functions.gis.st_make_box` /
    ``st_mbr_xyz``. The constant ``key`` ships inside the Arrow-batched
    kernel; extents are max-min exactly as FunctorQsfmbrIntersects builds
    its TrPv3Box (function_gis.h:653-661).
    """
    b = F.col(box) if isinstance(box, str) else box

    @pandas_udf("boolean")
    def _probe(xmin: pd.Series, ymin: pd.Series, zmin: pd.Series,
               xmax: pd.Series, ymax: pd.Series, zmax: pd.Series) -> pd.Series:
        p0 = np.column_stack([xmin.to_numpy(float), ymin.to_numpy(float),
                              zmin.to_numpy(float)])
        hi = np.column_stack([xmax.to_numpy(float), ymax.to_numpy(float),
                              zmax.to_numpy(float)])
        return pd.Series(pv3_test_batch(key, p0, hi - p0))

    return _probe(b["xmin"], b["ymin"], b["zmin"],
                  b["xmax"], b["ymax"], b["zmax"])
