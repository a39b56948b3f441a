"""Vector kernels over ``array<float>`` columns — JVM higher-order
functions (zip_with/aggregate in double): codegen-able, no Python in the
per-row path.  Shared by the dedup and similarity operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(u: Column, v: Column) -> Column:
    prod = F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(u: Column) -> Column:
    return F.sqrt(dot(u, u))


def cosine(u: Column, v: Column) -> Column:
    return dot(u, v) / (norm(u) * norm(v))


def l2_distance(u: Column, v: Column) -> Column:
    diff = F.zip_with(u, v, lambda x, y: x.cast("double") - y.cast("double"))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))


def scale(u: Column, s: Column) -> Column:
    return F.transform(u, lambda x: x.cast("double") * s)


def add(u: Column, v: Column) -> Column:
    return F.zip_with(u, v, lambda x, y: x.cast("double") + y.cast("double"))
