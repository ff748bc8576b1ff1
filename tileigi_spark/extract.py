"""Geotagging front-end: coordinate extraction from web-page text (G21).

North-star requirement (BASELINE.json): extract coordinates from `text`
with vectorized Arrow UDFs, byte-identical extracted span per url. The
extractor is deterministic: scan matches left-to-right, first IN-RANGE
match wins; out-of-range values are rejected and scanning continues.

Supported formats (FIXTURES.md §1):
  * decimal pair:        "48.8566, 2.3522"   (comma or comma+space)
  * parenthesised pair:  "(48.8566,2.3522)"
  * hemisphere-suffixed: "48.8566N, 2.3522E" (also S/W)
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_NUM = r"[+-]?\d{1,3}\.\d{1,6}"

# one combined pattern; group layout distinguishes the formats
COORD_RE = re.compile(
    r"(?P<paren>\((?P<plat>" + _NUM + r"),\s?(?P<plon>" + _NUM + r")\))"
    r"|(?P<hemi>(?P<hlat>" + _NUM + r")\s?(?P<ns>[NS]),\s?(?P<hlon>" + _NUM + r")\s?(?P<ew>[EW]))"
    r"|(?P<plain>(?P<dlat>" + _NUM + r"),\s?(?P<dlon>" + _NUM + r"))"
)


def extract_one(text: str):
    """Return (lat, lon, matched_span) for the first in-range coordinate
    mention, else None. matched_span is the exact substring (byte-identical
    invariant is checked on its UTF-8 encoding)."""
    if not text:
        return None
    for m in COORD_RE.finditer(text):
        if m.group("paren"):
            lat_s, lon_s = m.group("plat"), m.group("plon")
        elif m.group("hemi"):
            lat_s, lon_s = m.group("hlat"), m.group("hlon")
        else:
            lat_s, lon_s = m.group("dlat"), m.group("dlon")
        lat = float(lat_s)
        lon = float(lon_s)
        if m.group("hemi"):
            if m.group("ns") == "S":
                lat = -lat
            if m.group("ew") == "W":
                lon = -lon
        # reject out-of-range junk (FIXTURES.md §1); Web-Mercator clamps
        # latitude to the slippy limit
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0 and abs(lat) <= 85.06:
            return (lat, lon, m.group(0))
    return None


def extract_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized batch extraction for Arrow UDFs: Series[str] ->
    DataFrame(lat float64, lon float64, span str) with NaN/None misses."""
    lats = np.full(len(texts), np.nan)
    lons = np.full(len(texts), np.nan)
    spans = [None] * len(texts)
    for i, t in enumerate(texts):
        r = extract_one(t)
        if r is not None:
            lats[i], lons[i], spans[i] = r
    return pd.DataFrame({"lat": lats, "lon": lons, "span": spans})


def geotag_pages(pages_df, text_col: str = "text", url_col: str = "url"):
    """pages DataFrame -> geotagged points DataFrame
    (url, lang, lat, lon, span, way:binary WKB EPSG:3857).

    Runs as one mapInPandas pass (Arrow-batched, no per-row Python at the
    plan level); rows with no coordinate mention are dropped.
    """
    from pyspark.sql import functions as F
    from .mercator import lonlat_to_merc
    from .geom.wkb import geom_to_wkb

    # JVM-side prefilter: every coordinate mention contains a
    # digit(1-3).digit token, so the no-match majority of a real crawl is
    # skipped before any bytes cross into Python (rlike is a cheap
    # codegen'd scan predicate; the Python regex stays authoritative)
    pages_df = pages_df.filter(
        F.col(text_col).rlike(r"\d{1,3}\.\d"))

    out_schema = ("url string, lang string, lat double, lon double, "
                  "mx double, my double, span string, way binary")

    def run(iterator):
        for pdf in iterator:
            ext = extract_batch(pdf[text_col])
            mask = ~ext["lat"].isna()
            if not mask.any():
                continue
            sub = pdf[mask.values]
            lat = ext["lat"][mask].values
            lon = ext["lon"][mask].values
            mx, my = lonlat_to_merc(lon, lat)
            ways = [geom_to_wkb(("Point", (float(x), float(y))))
                    for x, y in zip(mx, my)]
            yield pd.DataFrame({
                "url": sub[url_col].values,
                "lang": sub["lang"].values if "lang" in sub else None,
                "lat": lat,
                "lon": lon,
                "mx": mx,
                "my": my,
                "span": ext["span"][mask].values,
                "way": ways,
            })

    return pages_df.mapInPandas(run, schema=out_schema)
