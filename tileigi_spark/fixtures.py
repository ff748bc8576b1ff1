"""Deterministic synthetic fixtures (FIXTURES.md). seed-free: every value
is a pure function of the row index, so any partitioning/parallelism yields
identical rows — the determinism precondition for golden tile bytes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .mercator import lonlat_to_merc
from .geom.wkb import geom_to_wkb

_EPOCH = 1577836800  # 2020-01-01T00:00:00Z, fixed (no wall clock)

_COORD_FORMATS = 4  # cycled by i
_LANGS = ["en", "de", "fr", "ga"]


def _page_latlon(i: int):
    """Deterministic pseudo-random-ish but exactly reproducible lat/lon."""
    lat = ((i * 2654435761) % 140000) / 1000.0 - 70.0
    lon = ((i * 40503) % 360000) / 1000.0 - 180.0
    return round(lat, 4), round(lon, 4)


def make_pages(n: int) -> pd.DataFrame:
    """FIXTURES.md §1 — Common-Crawl-style pages with 0-3 coordinate
    mentions; every 7th row has no coords; every 11th leads with
    out-of-range junk that must be rejected."""
    rows = []
    for i in range(n):
        url = f"https://example-{i:08d}.test/page"
        lang = _LANGS[i % 4]
        lat, lon = _page_latlon(i)
        fmt = i % _COORD_FORMATS
        if i % 7 == 3:
            text = f"no geo content here, page {i} talks about weather only"
        else:
            if fmt == 0:
                mention = f"{lat}, {lon}"
            elif fmt == 1:
                mention = f"({lat},{lon})"
            elif fmt == 2:
                ns = "S" if lat < 0 else "N"
                ew = "W" if lon < 0 else "E"
                mention = f"{abs(lat)}{ns}, {abs(lon)}{ew}"
            else:
                mention = f"{lat}, {lon} and also {lat}, {lon}"
            junk = f"junk 999.99, 720.13 precedes " if i % 11 == 5 else ""
            text = (f"page {i} reporting {junk}from the site at {mention} "
                    f"near the old town")
        html = (b"<html><body>" + text.encode("utf-8") + b"</body></html>")
        rows.append((url, _EPOCH + i, html, text, lang))
    df = pd.DataFrame(rows, columns=["url", "warc_ts_epoch", "html", "text",
                                     "lang"])
    return df


def pages_df(spark, n: int):
    pdf = make_pages(n)
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F
    return (df.withColumn("warc_ts",
                          F.timestamp_seconds(F.col("warc_ts_epoch")))
            .drop("warc_ts_epoch")
            .select("url", "warc_ts", "html", "text", "lang"))


# --------------------------------------------------------------- features

def _grid_lonlat(i: int, step: float = 5.0):
    cols = int(360.0 / step)
    lon = -177.5 + (i % cols) * step
    lat = -60.0 + ((i // cols) % 24) * step
    return lon, lat


def make_features(n: int) -> pd.DataFrame:
    """FIXTURES.md §2 — mixed geometry layer with every property type the
    reference converts (lib.rs:653-684). Deterministic grid placement."""
    kinds = ["city", "town", "village", "river", "lake", "forest", "park",
             "peak", "island", "border"]
    rows = []
    for i in range(n):
        lon, lat = _grid_lonlat(i)
        cx, cy = lonlat_to_merc(lon, lat)
        cx, cy = float(cx), float(cy)
        s = 40000.0 + (i % 5) * 15000.0  # feature half-size in mercator m
        gtype = i % 6
        if gtype == 0:
            geom = ("Point", (cx, cy))
        elif gtype == 1:
            geom = ("MultiPoint", [(cx, cy), (cx + s, cy + s / 2)])
        elif gtype == 2:
            geom = ("LineString", [(cx - 2 * s, cy), (cx, cy + s),
                                   (cx + 2 * s, cy - s), (cx + 3 * s, cy)])
        elif gtype == 3:
            geom = ("Polygon", [[(cx - s, cy - s), (cx - s, cy + s),
                                 (cx + s, cy + s), (cx + s, cy - s),
                                 (cx - s, cy - s)]])
        elif gtype == 4:
            hole = [(cx - s / 4, cy - s / 4), (cx - s / 4, cy + s / 4),
                    (cx + s / 4, cy + s / 4), (cx + s / 4, cy - s / 4),
                    (cx - s / 4, cy - s / 4)]
            geom = ("Polygon", [[(cx - s, cy - s), (cx - s, cy + s),
                                 (cx + s, cy + s), (cx + s, cy - s),
                                 (cx - s, cy - s)], hole])
        else:
            geom = ("MultiPolygon", [
                [[(cx - s, cy - s), (cx - s, cy), (cx, cy), (cx, cy - s),
                  (cx - s, cy - s)]],
                [[(cx + s / 2, cy + s / 2), (cx + s / 2, cy + s),
                  (cx + s, cy + s), (cx + s, cy + s / 2),
                  (cx + s / 2, cy + s / 2)]],
            ])
        rows.append((
            i,                               # feature_id
            geom_to_wkb(geom),               # way
            f"feat-{i}",                     # name (text)
            kinds[i % 10],                   # kind (interning exercise)
            (i * 977) % 1000000,             # population (int8)
            (i % 10) + 1,                    # admin_level (int4)
            np.float32(i % 100) / 7,         # area_f32 (float4)
            float(i) * 1.25,                 # elevation (float8)
            i % 13 == 0,                     # is_capital (bool)
            None if i % 2 == 0 else f"note-{i}",  # nullable_note
        ))
    return pd.DataFrame(rows, columns=[
        "feature_id", "way", "name", "kind", "population", "admin_level",
        "area_f32", "elevation", "is_capital", "nullable_note"])


def features_df(spark, n: int):
    from pyspark.sql.types import (StructType, StructField, LongType,
                                   BinaryType, StringType, IntegerType,
                                   FloatType, DoubleType, BooleanType)
    schema = StructType([
        StructField("feature_id", LongType()),
        StructField("way", BinaryType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("population", LongType()),
        StructField("admin_level", IntegerType()),
        StructField("area_f32", FloatType()),
        StructField("elevation", DoubleType()),
        StructField("is_capital", BooleanType()),
        StructField("nullable_note", StringType()),
    ])
    pdf = make_features(n)
    return spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)], schema=schema)


# ---------------------------------------------------------- admin polygons

ADMIN_CELL_DEG = 20.0


def make_admin_polygons() -> pd.DataFrame:
    """FIXTURES.md §3 — non-overlapping lon/lat grid cells as admin areas;
    every 5th cell gets a centered hole, every 7th is a 2-part multi."""
    rows = []
    admin_id = 0
    lat0 = -80.0
    for row_i in range(8):  # lat -80..80
        for col_i in range(18):  # lon -180..180
            lon_a = -180.0 + col_i * ADMIN_CELL_DEG
            lat_a = lat0 + row_i * ADMIN_CELL_DEG
            x0, y0 = lonlat_to_merc(lon_a + 0.05, lat_a + 0.05)
            x1, y1 = lonlat_to_merc(lon_a + ADMIN_CELL_DEG - 0.05,
                                    lat_a + ADMIN_CELL_DEG - 0.05)
            x0, y0, x1, y1 = float(x0), float(y0), float(x1), float(y1)
            ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
            if admin_id % 5 == 4:
                mx, my = (x0 + x1) / 2, (y0 + y1) / 2
                w = (x1 - x0) / 8
                hole = [(mx - w, my - w), (mx - w, my + w), (mx + w, my + w),
                        (mx + w, my - w), (mx - w, my - w)]
                geom = ("Polygon", [ring, hole])
            elif admin_id % 7 == 6:
                midx = (x0 + x1) / 2
                geom = ("MultiPolygon", [
                    [[(x0, y0), (x0, y1), (midx - 1000, y1),
                      (midx - 1000, y0), (x0, y0)]],
                    [[(midx + 1000, y0), (midx + 1000, y1), (x1, y1),
                      (x1, y0), (midx + 1000, y0)]],
                ])
            else:
                geom = ("Polygon", [ring])
            rows.append((admin_id, f"admin-{admin_id}",
                         2 if admin_id % 3 == 0 else 4,
                         geom_to_wkb(geom)))
            admin_id += 1
    return pd.DataFrame(rows, columns=["admin_id", "name", "admin_level",
                                       "way"])


def admin_polygons_df(spark):
    from pyspark.sql.types import (StructType, StructField, LongType,
                                   BinaryType, StringType, IntegerType)
    schema = StructType([
        StructField("admin_id", LongType()),
        StructField("name", StringType()),
        StructField("admin_level", IntegerType()),
        StructField("way", BinaryType()),
    ])
    pdf = make_admin_polygons()
    return spark.createDataFrame(
        [tuple(r) for r in pdf.itertuples(index=False)], schema=schema)
