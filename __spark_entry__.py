"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship north-star pipeline (geotag pages ->
build MVT pyramid). `queries()` exposes one entry per implemented operator
from SURVEY.md §2 + the training-data operators; `oracle_sql()` gives the
DuckDB-equivalent ANSI SQL. Column names and arithmetic are mirrored
exactly between both sides (pure +,-,*,/,% double math — no libm — so the
value hashes match bit-for-bit).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

MERC = 20037508.342789244
WORLD = 2.0 * MERC  # 40075016.68557849
_R_MERC = repr(MERC)
_R_WORLD = repr(WORLD)


def _doc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mercator points derived from documents.doc_id using
    only integer + double arithmetic (mirrored in SQL oracles)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mx = ((F.col("doc_id") * 7919) % 100000).cast("double") / 100000.0
    my = ((F.col("doc_id") * 104729) % 100000).cast("double") / 100000.0
    return (docs.select(
        "doc_id", "text", "lang",
        ((mx - 0.5) * WORLD).alias("mx"),
        ((my - 0.5) * (WORLD * 0.9)).alias("my")))


_DOC_POINTS_SQL = f"""
    SELECT doc_id, text, lang,
      (CAST((doc_id * 7919) % 100000 AS DOUBLE) / 100000.0 - 0.5)
        * {_R_WORLD} AS mx,
      (CAST((doc_id * 104729) % 100000 AS DOUBLE) / 100000.0 - 0.5)
        * ({_R_WORLD} * 0.9) AS my
    FROM documents
"""


def _key_points_sql(table: str, key: str, mul1: int, mul2: int) -> str:
    return f"""
      SELECT {key},
        (CAST(({key} * {mul1}) % 100000 AS DOUBLE) / 100000.0 - 0.5)
          * {_R_WORLD} AS mx,
        (CAST(({key} * {mul2}) % 100000 AS DOUBLE) / 100000.0 - 0.5)
          * ({_R_WORLD} * 0.9) AS my
      FROM {table}
    """


def _key_points(spark, sf_dir, table, key, mul1, mul2):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    mx = ((F.col(key) * mul1) % 100000).cast("double") / 100000.0
    my = ((F.col(key) * mul2) % 100000).cast("double") / 100000.0
    return df.select(
        key,
        ((mx - 0.5) * WORLD).alias("mx"),
        ((my - 0.5) * (WORLD * 0.9)).alias("my"))


def _point_features(spark, sf_dir) -> DataFrame:
    """documents -> WKB point features for the tile engine. mx/my doubles
    pass through WKB exactly."""
    import pandas as pd
    from tileigi_spark.geom.wkb import geom_to_wkb

    pts = _doc_points(spark, sf_dir).select(
        F.col("doc_id").alias("feature_id"), "mx", "my", "lang")

    def to_wkb(iterator):
        for pdf in iterator:
            pdf = pdf.copy()
            pdf["way"] = [geom_to_wkb(("Point", (float(x), float(y))))
                          for x, y in zip(pdf["mx"], pdf["my"])]
            yield pdf[["feature_id", "way", "lang"]]

    return pts.mapInPandas(to_wkb,
                           schema="feature_id long, way binary, lang string")


# ---------------------------------------------------------------- queries

def _q_tile_assign(spark, sf_dir):
    """G22: slippy tile keys at z8 by pure arithmetic; count per tile."""
    z = 8
    n = 1 << z
    pts = _doc_points(spark, sf_dir)
    u = F.floor((F.col("mx") + MERC) / WORLD * n)
    v = F.floor((MERC - F.col("my")) / WORLD * n)
    clamp = lambda c: F.greatest(F.lit(0), F.least(c, F.lit(n - 1)))
    return (pts.select(clamp(u).cast("long").alias("x"),
                       clamp(v).cast("long").alias("y"))
            .groupBy("x", "y").agg(F.count("*").alias("n"))
            .orderBy("x", "y"))


_TILE_ASSIGN_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL})
SELECT
  GREATEST(0, LEAST(CAST(FLOOR((mx + {_R_MERC}) / {_R_WORLD} * 256) AS BIGINT), 255)) AS x,
  GREATEST(0, LEAST(CAST(FLOOR(({_R_MERC} - my) / {_R_WORLD} * 256) AS BIGINT), 255)) AS y,
  COUNT(*) AS n
FROM pts GROUP BY 1, 2 ORDER BY x, y
"""


def _q_tile_pieces_z3(spark, sf_dir):
    """J1+J3+G2 parity: engine cover->remap->slice on point features at z3;
    per-tile feature-piece counts."""
    from tileigi_spark.engine import with_bbox, cover_metatiles, geometry_stage

    feats = _point_features(spark, sf_dir)
    covered = cover_metatiles(with_bbox(feats), [3], buffer_px=0)
    pieces = geometry_stage(covered, "docs", buffer_px=0, global_maxzoom=14)
    return (pieces.groupBy("zoom", "x", "y")
            .agg(F.count("*").alias("n"))
            .orderBy("x", "y"))


_TILE_PIECES_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
remapped AS (
  SELECT doc_id,
    CAST(FLOOR(((mx - (0.0 / 8.0 * {_R_WORLD} - {_R_MERC}))
      / ((8.0 / 8.0 * {_R_WORLD} - {_R_MERC}) - (0.0 / 8.0 * {_R_WORLD} - {_R_MERC})))
      * 32768.0 + 0.5) AS BIGINT) AS u,
    CAST(FLOOR(((({_R_MERC} - 0.0 / 8.0 * {_R_WORLD}) - my)
      / (({_R_MERC} - 0.0 / 8.0 * {_R_WORLD}) - ({_R_MERC} - 8.0 / 8.0 * {_R_WORLD})))
      * 32768.0 + 0.5) AS BIGINT) AS v
  FROM pts
),
fan AS (
  SELECT doc_id,
    UNNEST(generate_series(
      GREATEST(0, u // 4096 - CASE WHEN u % 4096 = 0 THEN 1 ELSE 0 END),
      LEAST(7, u // 4096))) AS tx,
    v
  FROM remapped WHERE u BETWEEN 0 AND 32768
),
fan2 AS (
  SELECT doc_id, tx,
    UNNEST(generate_series(
      GREATEST(0, v // 4096 - CASE WHEN v % 4096 = 0 THEN 1 ELSE 0 END),
      LEAST(7, v // 4096))) AS ty
  FROM fan WHERE v BETWEEN 0 AND 32768
)
SELECT 3 AS zoom, tx AS x, ty AS y, COUNT(*) AS n
FROM fan2 GROUP BY 1, 2, 3 ORDER BY x, y
"""


def _coord_text_cols():
    """Shared construction of deterministic coordinate-mention text."""
    lat_mil0 = (F.col("doc_id") * 2654435761) % 140000 - 70000
    lon_mil0 = (F.col("doc_id") * 40503) % 360000 - 180000
    return lat_mil0, lon_mil0


def _mil_str(mil0):
    a = F.abs(mil0)
    return F.concat(F.when(mil0 < 0, F.lit("-")).otherwise(F.lit("")),
                    F.format_string("%d.%03d", (a / 1000).cast("long"),
                                    a % 1000))


def _q_extract(spark, sf_dir):
    """G21: coordinate extraction (real regex extractor on deterministic
    text); rows with junk-only text drop; leading junk is skipped."""
    import pandas as pd
    from tileigi_spark.extract import extract_batch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")
    lat0, lon0 = _coord_text_cols()
    lat_s, lon_s = _mil_str(lat0), _mil_str(lon0)
    junk = F.when(F.col("doc_id") % 5 == 0,
                  F.lit("junk 999.99, 720.13 then ")).otherwise(F.lit(""))
    body = F.when(F.col("doc_id") % 9 == 0,
                  F.lit("only junk 999.99, 720.13 here"))
    hemi = F.concat(
        F.format_string("%d.%03d", (F.abs(lat0) / 1000).cast("long"),
                        F.abs(lat0) % 1000),
        F.when(lat0 < 0, F.lit("S")).otherwise(F.lit("N")),
        F.lit(", "),
        F.format_string("%d.%03d", (F.abs(lon0) / 1000).cast("long"),
                        F.abs(lon0) % 1000),
        F.when(lon0 < 0, F.lit("W")).otherwise(F.lit("E")))
    plain = F.concat(lat_s, F.lit(", "), lon_s)
    mention = F.when(F.col("doc_id") % 3 == 1, hemi).otherwise(plain)
    text = F.coalesce(body, F.concat(F.lit("page located at "), junk,
                                     mention, F.lit(" near town")))
    with_text = docs.withColumn("gen_text", text)

    def run(iterator):
        for pdf in iterator:
            ext = extract_batch(pdf["gen_text"])
            mask = ext["span"].notna()
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"][mask.values].values,
                "span": ext["span"][mask].values,
            })
            if len(out):
                yield out

    return (with_text.mapInPandas(run, schema="doc_id long, span string")
            .orderBy("doc_id"))


_EXTRACT_SQL = """
WITH base AS (
  SELECT doc_id,
    (doc_id * 2654435761) % 140000 - 70000 AS lat0,
    (doc_id * 40503) % 360000 - 180000 AS lon0
  FROM documents
)
SELECT doc_id,
  CASE WHEN doc_id % 3 = 1 THEN
    printf('%d.%03d', abs(lat0) // 1000, abs(lat0) % 1000)
      || (CASE WHEN lat0 < 0 THEN 'S' ELSE 'N' END)
      || ', '
      || printf('%d.%03d', abs(lon0) // 1000, abs(lon0) % 1000)
      || (CASE WHEN lon0 < 0 THEN 'W' ELSE 'E' END)
  ELSE
    (CASE WHEN lat0 < 0 THEN '-' ELSE '' END)
      || printf('%d.%03d', abs(lat0) // 1000, abs(lat0) % 1000)
      || ', '
      || (CASE WHEN lon0 < 0 THEN '-' ELSE '' END)
      || printf('%d.%03d', abs(lon0) // 1000, abs(lon0) % 1000)
  END AS span
FROM base
WHERE doc_id % 9 != 0
ORDER BY doc_id
"""


def _nation_boxes(spark, sf_dir):
    """Axis-aligned mercator boxes per nation (J4 polygon side)."""
    import pandas as pd
    from tileigi_spark.geom.wkb import geom_to_wkb

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rows = nation.select("n_nationkey").collect()
    out = []
    for r in rows:
        nk = r["n_nationkey"]
        col_i = nk % 6
        rw = nk // 6
        x0 = (col_i / 6.0 - 0.5) * WORLD + 1000.0
        x1 = x0 + WORLD / 6.0 - 2000.0
        y0 = (rw / 5.0 - 0.5) * (WORLD * 0.9) + 1000.0
        y1 = y0 + (WORLD * 0.9) / 5.0 - 2000.0
        ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
        out.append((nk, geom_to_wkb(("Polygon", [ring]))))
    return spark.createDataFrame(out, "n_nationkey int, way binary")


_NATION_BOX_SQL = f"""
  SELECT n_nationkey,
    (CAST(n_nationkey % 6 AS DOUBLE) / 6.0 - 0.5) * {_R_WORLD} + 1000.0 AS x0,
    (CAST(n_nationkey % 6 AS DOUBLE) / 6.0 - 0.5) * {_R_WORLD} + 1000.0
      + {_R_WORLD} / 6.0 - 2000.0 AS x1,
    (CAST(n_nationkey // 6 AS DOUBLE) / 5.0 - 0.5) * ({_R_WORLD} * 0.9)
      + 1000.0 AS y0,
    (CAST(n_nationkey // 6 AS DOUBLE) / 5.0 - 0.5) * ({_R_WORLD} * 0.9)
      + 1000.0 + ({_R_WORLD} * 0.9) / 5.0 - 2000.0 AS y1
  FROM nation
"""


def _q_pip(spark, sf_dir):
    """J4: cell-prefiltered point-in-polygon join, exact even-odd refine."""
    from tileigi_spark.spatial import point_in_polygon_join

    pts = _doc_points(spark, sf_dir).select("doc_id", "mx", "my")
    polys = _nation_boxes(spark, sf_dir)
    joined = point_in_polygon_join(pts, polys, index_zoom=5)
    return (joined.select("doc_id", F.col("n_nationkey").cast("long")
                          .alias("nationkey"))
            .orderBy("doc_id", "nationkey"))


_PIP_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
boxes AS ({_NATION_BOX_SQL})
SELECT p.doc_id, CAST(b.n_nationkey AS BIGINT) AS nationkey
FROM pts p JOIN boxes b
  ON p.mx > b.x0 AND p.mx < b.x1 AND p.my > b.y0 AND p.my < b.y1
ORDER BY doc_id, nationkey
"""


def _q_knn(spark, sf_dir):
    """J5: kNN via cell-ring expansion, k=3, supplier->customer points."""
    from tileigi_spark.spatial import knn_join

    q = _key_points(spark, sf_dir, "supplier", "s_suppkey", 8191, 524287) \
        .select(F.col("s_suppkey").cast("long").alias("query_id"),
                F.col("mx").alias("qx"), F.col("my").alias("qy"))
    c = _key_points(spark, sf_dir, "customer", "c_custkey", 7919, 104729) \
        .select(F.col("c_custkey").cast("long").alias("cand_id"),
                F.col("mx").alias("cx"), F.col("my").alias("cy"))
    got = knn_join(q, c, k=3, index_zoom=4)
    return (got.select("query_id", "cand_id",
                       F.col("knn_rank").cast("int").alias("knn_rank"))
            .orderBy("query_id", "knn_rank"))


_KNN_SQL = f"""
WITH q AS ({_key_points_sql('supplier', 's_suppkey', 8191, 524287)}),
c AS ({_key_points_sql('customer', 'c_custkey', 7919, 104729)}),
scored AS (
  SELECT CAST(q.s_suppkey AS BIGINT) AS query_id,
         CAST(c.c_custkey AS BIGINT) AS cand_id,
         (q.mx - c.mx) * (q.mx - c.mx) + (q.my - c.my) * (q.my - c.my) AS d2
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT query_id, cand_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, cand_id)
         AS INTEGER) AS knn_rank
  FROM scored
)
SELECT query_id, cand_id, knn_rank FROM ranked WHERE knn_rank <= 3
ORDER BY query_id, knn_rank
"""


def _derived_text():
    return F.when(F.col("doc_id") % 10 < 3,
                  F.concat(F.lit("duplicate-"),
                           (F.col("doc_id") % 7).cast("string"))) \
        .otherwise(F.col("text"))


_DERIVED_TEXT_SQL = ("CASE WHEN doc_id % 10 < 3 THEN 'duplicate-' || "
                     "CAST(doc_id % 7 AS VARCHAR) ELSE text END")


def _q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 groups with representative = min id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("dtext", _derived_text())
    return (docs.groupBy(F.md5(F.col("dtext")).alias("content_md5"))
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("keep_id"))
            .orderBy("content_md5"))


_DEDUP_EXACT_SQL = f"""
SELECT md5({_DERIVED_TEXT_SQL}) AS content_md5,
       COUNT(*) AS n_dups, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY content_md5
"""


def _q_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup pairs over derived variants (exact array
    set ops, JVM-side)."""
    from tileigi_spark.textops import word_ngrams

    base = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("shared prefix tokens alpha beta gamma delta "
                       "epsilon zeta eta theta iota kappa variant "),
                 (F.col("doc_id") % 3).cast("string"))) \
        .otherwise(F.col("text"))
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 40)
            .select("doc_id",
                    F.substring(base, 1,
                                80 + (F.col("doc_id") % 5 * 30).cast("int"))
                    .alias("dtext")))
    g = docs.select("doc_id",
                    F.array_distinct(word_ngrams(F.col("dtext"), 3))
                    .alias("grams"))
    a = g.select(F.col("doc_id").alias("a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("b"), F.col("grams").alias("gb"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (pairs.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= 0.2)
            .select("a", "b", "jaccard")
            .orderBy("a", "b"))


_JACCARD_SQL = """
WITH docs AS (
  SELECT doc_id,
    substr(CASE WHEN doc_id % 2 = 0 THEN
             'shared prefix tokens alpha beta gamma delta epsilon zeta '
             || 'eta theta iota kappa variant ' || CAST(doc_id % 3 AS VARCHAR)
           ELSE text END,
           1, 80 + CAST(doc_id % 5 AS INTEGER) * 30) AS dtext
  FROM documents WHERE doc_id < 40
),
grams AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(regexp_split_to_array(trim(dtext), '\\s+')) >= 3 THEN
      list_transform(
        range(1, len(regexp_split_to_array(trim(dtext), '\\s+')) - 1),
        i -> regexp_split_to_array(trim(dtext), '\\s+')[i] || ' '
          || regexp_split_to_array(trim(dtext), '\\s+')[i+1] || ' '
          || regexp_split_to_array(trim(dtext), '\\s+')[i+2])
    ELSE [] END) AS g
  FROM docs
)
SELECT a.doc_id AS a, b.doc_id AS b,
  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
    / CAST(GREATEST(len(list_distinct(list_concat(a.g, b.g))), 1) AS DOUBLE)
    AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
    / CAST(GREATEST(len(list_distinct(list_concat(a.g, b.g))), 1) AS DOUBLE)
    >= 0.2
ORDER BY a, b
"""


def _q_minhash(spark, sf_dir):
    """MinHash+LSH near-dup pairs. Uses the md5+affine hash family
    (dedup.Md5AffineFamily: ONE md5 per shingle + per-seed affine
    transforms) instead of the xxhash64 production default so DuckDB
    can oracle the full banding+verify logic; the pipeline shape is
    hash-agnostic."""
    from tileigi_spark.dedup import Md5AffineFamily, minhash_dedup_pairs

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 1000)
            .withColumn("dtext", _derived_text()))
    return minhash_dedup_pairs(docs, text_col="dtext", threshold=0.5,
                               hash_fn=Md5AffineFamily()) \
        .orderBy("a", "b")


# md5-derived 60-bit hash, identical on both engines:
#   Spark  conv(substr(md5(x),1,15),16,10)::bigint
#   DuckDB CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)
def _md5h(x):
    return f"CAST(('0x'||substr(md5({x}),1,15)) AS BIGINT)"


def _minhash_sig_cols():
    # mirror dedup.Md5AffineFamily: b = md5_hash64(g) & (2^30-1),
    # m_s = MIN((a_s*b + c_s) % (2^31-1))
    from tileigi_spark.dedup import _AFFINE_P, affine_coeffs
    cols = []
    for s in range(16):
        a, c = affine_coeffs(s)
        cols.append(f"MIN(({a} * b + {c}) % {_AFFINE_P}) AS m{s}")
    return ",\n    ".join(cols)


_MINHASH_SIG_COLS = _minhash_sig_cols()

_MINHASH_BANDS = "\n      ".join(
    "WHEN {b} THEN {h}".format(
        b=b,
        h=_md5h("||'|'||".join(f"CAST(m{b * 4 + r} AS VARCHAR)"
                               for r in range(4))))
    for b in range(4))

_MINHASH_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_DERIVED_TEXT_SQL} AS dtext
  FROM documents WHERE doc_id < 1000
),
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(dtext), '\\s+') AS w FROM docs
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
  FROM toks WHERE len(w) >= 3
),
gb AS (
  SELECT doc_id, g, ({_md5h('g')} & 1073741823) AS b FROM grams
),
sigs AS (
  SELECT doc_id,
    {_MINHASH_SIG_COLS}
  FROM gb GROUP BY doc_id
),
banded AS (
  SELECT doc_id, band_idx,
    CASE band_idx
      {_MINHASH_BANDS}
    END AS band_hash
  FROM sigs, (VALUES (0), (1), (2), (3)) AS bb(band_idx)
),
kept AS (
  SELECT * FROM (
    SELECT b.*, COUNT(*) OVER (PARTITION BY band_idx, band_hash) AS bn
    FROM banded b) WHERE bn <= 10000
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM kept l JOIN kept r
    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
   AND l.doc_id < r.doc_id
),
gsets AS (
  SELECT doc_id, list_distinct(list(g)) AS gs FROM grams GROUP BY doc_id
)
SELECT c.a, c.b,
  CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
    / CAST(GREATEST(len(list_distinct(list_concat(x.gs, y.gs))), 1)
           AS DOUBLE) AS jaccard
FROM cand c JOIN gsets x ON x.doc_id = c.a JOIN gsets y ON y.doc_id = c.b
WHERE CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
    / CAST(GREATEST(len(list_distinct(list_concat(x.gs, y.gs))), 1)
           AS DOUBLE) >= 0.5
ORDER BY a, b
"""


def _q_simhash(spark, sf_dir):
    """SimHash near-dup pairs, Hamming <= 1, md5-derived token hash so
    the bit-vote + pigeonhole-block logic has a DuckDB oracle twin
    (xxhash64 stays the production default)."""
    from tileigi_spark.dedup import MD5_HASH64_SQL, simhash_near_dups

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 500)
            .withColumn("dtext", _derived_text()))
    return simhash_near_dups(docs, text_col="dtext", max_hamming=1,
                             token_hash_sql=MD5_HASH64_SQL.format(x="t")) \
        .orderBy("a", "b")


# The md5-derived hash is 60 bits, so token-hash bits 60-63 are always
# zero and their majority votes are zero on both engines; the oracle only
# materializes bits 0-59. SUM over BIGINT is HUGEINT in DuckDB — cast back.
_SIMHASH_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_DERIVED_TEXT_SQL} AS dtext
  FROM documents WHERE doc_id < 500
),
tok AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(trim(dtext), '\\s+'), t -> t != '')) AS t
  FROM docs
),
th AS (SELECT doc_id, {_md5h('t')} AS h FROM tok),
votes AS (
  SELECT doc_id, b, SUM((h >> b) & 1) AS v, COUNT(*) AS n
  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bits
  GROUP BY doc_id, b
),
sigp AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v * 2 > n
             THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
             ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM docs d LEFT JOIN sigp s ON d.doc_id = s.doc_id
),
blk AS (
  SELECT doc_id, simhash, block_idx,
    CASE WHEN block_idx = 0 THEN simhash & 4294967295
         ELSE (simhash >> 32) & 4294967295 END AS block_val
  FROM sig, (VALUES (0), (1)) AS bb(block_idx)
),
kept AS (
  SELECT * FROM (
    SELECT blk.*, COUNT(*) OVER (PARTITION BY block_idx, block_val) AS bn
    FROM blk) WHERE bn <= 10000
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         l.simhash AS sh_a, r.simhash AS sh_b
  FROM kept l JOIN kept r
    ON l.block_idx = r.block_idx AND l.block_val = r.block_val
   AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 1
ORDER BY a, b
"""


def _q_ann(spark, sf_dir):
    """Brute-force cosine top-k over embeddings (exact baseline)."""
    from tileigi_spark.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_vec")))
    got = brute_force_topk(queries, emb, k=5)
    return got.select("query_id", "vec_id", "sim_rank") \
        .orderBy("query_id", "sim_rank")


_ANN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
    list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(q.qv, q.qv))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))) AS cosine
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, vec_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS INTEGER)
      AS sim_rank
  FROM scored
)
SELECT query_id, vec_id, sim_rank FROM ranked WHERE sim_rank <= 5
ORDER BY query_id, sim_rank
"""


def _q_dedup_embedding(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (integer output; the float
    cosine threshold mirrors the oracle's arithmetic term-for-term)."""
    from tileigi_spark.dedup import embedding_near_dups_exact

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 400))
    return (embedding_near_dups_exact(emb, threshold=0.4)
            .select("a", "b").orderBy("a", "b"))


_DEDUP_EMBEDDING_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < 400
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v))) >= 0.4
ORDER BY a, b
"""


def _q_dedup_embedding_lsh(spark, sf_dir):
    """Banded AND-OR hyperplane-LSH near-dup (scale path). At these knobs
    (32 tables × 4 bits for the loose 0.4 threshold) recall vs the exact
    twin is 1.0 on the fixtures, and the cosine verify guarantees
    containment — so it shares the exact path's DuckDB oracle. 32
    tables: at 24 the sf0.1 fixture missed one true pair — the verify
    keeps containment, so more tables only moves output TOWARD the
    oracle and already-exact SFs are unchanged."""
    from tileigi_spark.dedup import embedding_near_dups

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 400))
    return (embedding_near_dups(emb, threshold=0.4, n_tables=32, n_bits=4)
            .select("a", "b").orderBy("a", "b"))


_DEDUP_EMBEDDING_LSH_SQL = _DEDUP_EMBEDDING_SQL  # exact twin: recall 1.0


def _q_ann_lsh(spark, sf_dir):
    """Banded multiprobe LSH approximate top-k (scale path). At these
    knobs recall@5 vs brute force is 1.0 on the fixtures, so it shares
    the exact oracle (ranks agree whenever every true top-k candidate is
    probed). n_tables=16: at 8 tables the sf0.001 fixture (500 vectors)
    missed two rank-5 neighbors — every probed set is verified exactly,
    so raising recall can only move the output TOWARD the oracle and
    leaves already-exact SFs byte-identical."""
    from tileigi_spark.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_vec")))
    got = lsh_topk(queries, emb, k=5, n_tables=16, n_bits=6, n_probes=6)
    return got.select("query_id", "vec_id", "sim_rank") \
        .orderBy("query_id", "sim_rank")


def _q_lang_quality(spark, sf_dir):
    """Text-analysis aggregates per lang. All output columns are BIGINT
    (hash-stable across renderers): the mean is emitted as floor-divided
    milli-tokens instead of a raw double."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (docs
            .select("lang", "doc_id", F.length("text").alias("n_chars"),
                    n_tokens.alias("n_tokens"))
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("sum_tokens"),
                 F.sum("n_chars").cast("long").alias("sum_chars"))
            .withColumn("avg_tokens_milli",
                        F.expr("CAST((sum_tokens * 1000) DIV n_docs"
                               " AS BIGINT)"))
            .orderBy("lang"))


_LANG_QUALITY_SQL = """
WITH agg AS (
  SELECT lang, COUNT(*) AS n_docs,
    CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
      AS sum_tokens,
    CAST(SUM(length(text)) AS BIGINT) AS sum_chars
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, sum_tokens, sum_chars,
  CAST((sum_tokens * 1000) // n_docs AS BIGINT) AS avg_tokens_milli
FROM agg ORDER BY lang
"""


def _q_langid(spark, sf_dir):
    """Marker-word language ID counts per guessed language."""
    from tileigi_spark.textops import with_lang_guess

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_lang_guess(docs)
            .groupBy("lang_guess").agg(F.count("*").alias("n"))
            .orderBy("lang_guess"))


_LANGID_SQL = """
WITH scores AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '\\b(the|and|of|is)\\b')) AS s_en,
    len(regexp_extract_all(text, '\\b(der|die|und|ist)\\b')) AS s_de,
    len(regexp_extract_all(text, '\\b(el|los|que|es)\\b')) AS s_es,
    len(regexp_extract_all(text, '\\b(le|la|et|est)\\b')) AS s_fr
  FROM documents
)
SELECT lang_guess, COUNT(*) AS n FROM (
  SELECT CASE
    -- fold: start 'de', replace when strictly greater, order de,en,es,fr
    WHEN s_en > s_de THEN
      CASE WHEN s_es > s_en THEN
             CASE WHEN s_fr > s_es THEN 'fr' ELSE 'es' END
           ELSE CASE WHEN s_fr > s_en THEN 'fr' ELSE 'en' END END
    ELSE
      CASE WHEN s_es > s_de THEN
             CASE WHEN s_fr > s_es THEN 'fr' ELSE 'es' END
           ELSE CASE WHEN s_fr > s_de THEN 'fr' ELSE 'de' END END
    END AS lang_guess
  FROM scores
) GROUP BY lang_guess ORDER BY lang_guess
"""


def _q_fingerprint(spark, sf_dir):
    """Rolling polynomial document fingerprint (Catalyst HOF aggregate)."""
    from tileigi_spark.textops import with_fingerprint

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 100)
            .select("doc_id", F.substring("text", 1, 64).alias("text")))
    return with_fingerprint(docs).select("doc_id", "fingerprint") \
        .orderBy("doc_id")


_FINGERPRINT_SQL = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split(substr(text, 1, 64), ''),
                     c -> CAST(ascii(c) AS BIGINT))),
    (a, b) -> (a * 31 + b) % {1 << 57}) AS fingerprint
FROM documents WHERE doc_id < 100 ORDER BY doc_id
"""


def _q_events_hourly(spark, sf_dir):
    """Streaming-shaped tumbling-window aggregate (batch form): hourly
    counts + exact milli-sums per event type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hour_s = F.date_format(F.date_trunc("hour", F.col("ts")),
                           "yyyy-MM-dd HH:00")
    return (ev.groupBy(hour_s.alias("hour"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .cast("long").alias("sum_value_milli"))
            .orderBy("hour", "event_type"))


_EVENTS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
  event_type, COUNT(*) AS n,
  CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
    AS sum_value_milli
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def _q_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min gap) per user — the batch twin of
    the applyInPandasWithState streaming operator. Timezone-free integer
    seconds on both sides."""
    from tileigi_spark.streaming import sessionize_events_batch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (sessionize_events_batch(ev, gap_seconds=1800)
            .orderBy("user_id", "session_start"))


_SESSIONS_SQL = """
WITH e AS (
  SELECT user_id,
    datediff('second', TIMESTAMP '2024-01-01 00:00:00',
             date_trunc('second', ts)) AS t,
    CAST(round(value * 1000) AS BIGINT) AS vm
  FROM events
),
m AS (
  SELECT user_id, t, vm,
    CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t) > 1800
         OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
         THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, t, vm,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, MIN(t) AS session_start, MAX(t) AS session_end,
  COUNT(*) AS n_events, CAST(SUM(vm) AS BIGINT) AS sum_value_milli
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def _q_pricing(spark, sf_dir):
    """Relational baseline (TPC-H Q1 shape) with exact integer cents."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_cents = F.round(F.col("l_extendedprice") *
                         (1 - F.col("l_discount")) * 100).cast("long")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(cents).alias("sum_base_cents"),
                 F.sum(disc_cents).alias("sum_disc_cents"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_base_cents,
  CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
    AS BIGINT) AS sum_disc_cents,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# bbox used by the bbox-restricted pyramid query (lon/lat)
_BBOX_LL = (-60.0, -40.0, 30.0, 40.0)


def _q_bbox_pyramid(spark, sf_dir):
    """S6+bbox: build_tiles restricted to a lon/lat bbox at z0-z3; emits
    the surviving (zoom, x, y) keys. Exercises the --bbox path end-to-end:
    feature prefilter -> metatile-range filter -> tile-range filter."""
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles

    feats = _point_features(spark, sf_dir)
    layers = Layers(layers=[Layer(id="docs", source="docs", minzoom=0,
                                  maxzoom=14, buffer=0)],
                    global_maxzoom=14)
    tiles = build_tiles(spark, {"docs": feats}, layers, 0, 3, bbox=_BBOX_LL)
    return tiles.select("zoom", "x", "y").orderBy("zoom", "x", "y")


def _bbox_pyramid_sql() -> str:
    """Oracle: per zoom, remap+fan doc points over the single world
    metatile (z<=3), then keep tiles inside the bbox's integer tile range.
    The ranges come from the same driver-side bbox_tile_range() the engine
    uses, so no float bbox math enters the SQL."""
    from tileigi_spark.mercator import bbox_lonlat_to_merc, bbox_tile_range

    merc = bbox_lonlat_to_merc(_BBOX_LL)
    ctes, selects = [], []
    for z in range(0, 4):
        x0, y0, x1, y1 = bbox_tile_range(merc, z)
        n = 1 << z
        ext = 4096 * n
        ctes.append(f"""
rm{z} AS (
  SELECT
    CAST(FLOOR(((mx - (0.0 / {n}.0 * {_R_WORLD} - {_R_MERC}))
      / (({n}.0 / {n}.0 * {_R_WORLD} - {_R_MERC})
         - (0.0 / {n}.0 * {_R_WORLD} - {_R_MERC})))
      * {ext}.0 + 0.5) AS BIGINT) AS u,
    CAST(FLOOR(((({_R_MERC} - 0.0 / {n}.0 * {_R_WORLD}) - my)
      / (({_R_MERC} - 0.0 / {n}.0 * {_R_WORLD})
         - ({_R_MERC} - {n}.0 / {n}.0 * {_R_WORLD})))
      * {ext}.0 + 0.5) AS BIGINT) AS v
  FROM pts
)""")
        selects.append(f"""
SELECT DISTINCT {z} AS zoom, tx AS x, ty AS y FROM (
  SELECT tx, UNNEST(generate_series(
    GREATEST(0, v // 4096 - CASE WHEN v % 4096 = 0 THEN 1 ELSE 0 END),
    LEAST({n - 1}, v // 4096))) AS ty
  FROM (
    SELECT UNNEST(generate_series(
      GREATEST(0, u // 4096 - CASE WHEN u % 4096 = 0 THEN 1 ELSE 0 END),
      LEAST({n - 1}, u // 4096))) AS tx, v
    FROM rm{z} WHERE u BETWEEN 0 AND {ext} AND v BETWEEN 0 AND {ext}
  )
)
WHERE tx BETWEEN {x0} AND {x1} AND ty BETWEEN {y0} AND {y1}""")
    return (f"WITH pts AS ({_DOC_POINTS_SQL}),"
            + ",".join(ctes)
            + "\nSELECT zoom, x, y FROM ("
            + "\nUNION ALL".join(selects)
            + ") ORDER BY zoom, x, y")


def _q_poly_pieces(spark, sf_dir):
    """G7+G9+G11 polygon parity: axis-aligned nation rectangles through
    cover -> remap -> buffered clip -> quadtree tile slice at z2, emitting
    SQL-checkable integers per piece: tile-local bbox and 2x shoelace
    area. Pins the non-point branch of geometry_stage (engine polygon
    path; ref lib.rs:559-728)."""
    import pandas as pd
    from tileigi_spark.engine import (cover_metatiles, geometry_stage,
                                      with_bbox)
    from tileigi_spark.geom.wkb import wkb_to_geom

    boxes = _nation_boxes(spark, sf_dir) \
        .withColumn("feature_id", F.col("n_nationkey").cast("long"))
    covered = cover_metatiles(with_bbox(boxes), [2], buffer_px=2)
    pieces = geometry_stage(covered, "boxes", buffer_px=2, global_maxzoom=14)

    schema = ("zoom int, x long, y long, nationkey long, minu long, "
              "minv long, maxu long, maxv long, area2 long")

    def measure(iterator):
        for pdf in iterator:
            rows = {k: [] for k in ("zoom", "x", "y", "nationkey", "minu",
                                    "minv", "maxu", "maxv", "area2")}
            for r in pdf.itertuples(index=False):
                typ, data = wkb_to_geom(bytes(r.geom))
                polys = [data] if typ == "Polygon" else data
                a2 = 0
                xs, ys = [], []
                for rings in polys:
                    ring = rings[0]
                    for i in range(len(ring) - 1):
                        a2 += (int(ring[i][0]) * int(ring[i + 1][1])
                               - int(ring[i + 1][0]) * int(ring[i][1]))
                    xs.extend(int(p[0]) for p in ring)
                    ys.extend(int(p[1]) for p in ring)
                rows["zoom"].append(int(r.zoom))
                rows["x"].append(int(r.x))
                rows["y"].append(int(r.y))
                rows["nationkey"].append(int(r.feature_id))
                rows["minu"].append(min(xs))
                rows["minv"].append(min(ys))
                rows["maxu"].append(max(xs))
                rows["maxv"].append(max(ys))
                rows["area2"].append(abs(a2))
            if rows["zoom"]:
                yield pd.DataFrame(rows)

    return (pieces.mapInPandas(measure, schema=schema)
            .orderBy("x", "y", "nationkey"))


_POLY_PIECES_SQL = f"""
WITH boxes AS ({_NATION_BOX_SQL}),
rm AS (
  SELECT n_nationkey,
    CAST(FLOOR(((x0 - (0.0 / 4.0 * {_R_WORLD} - {_R_MERC}))
      / ((4.0 / 4.0 * {_R_WORLD} - {_R_MERC})
         - (0.0 / 4.0 * {_R_WORLD} - {_R_MERC})))
      * 16384.0 + 0.5) AS BIGINT) AS u0,
    CAST(FLOOR(((x1 - (0.0 / 4.0 * {_R_WORLD} - {_R_MERC}))
      / ((4.0 / 4.0 * {_R_WORLD} - {_R_MERC})
         - (0.0 / 4.0 * {_R_WORLD} - {_R_MERC})))
      * 16384.0 + 0.5) AS BIGINT) AS u1,
    CAST(FLOOR(((({_R_MERC} - 0.0 / 4.0 * {_R_WORLD}) - y1)
      / (({_R_MERC} - 0.0 / 4.0 * {_R_WORLD})
         - ({_R_MERC} - 4.0 / 4.0 * {_R_WORLD})))
      * 16384.0 + 0.5) AS BIGINT) AS v0,
    CAST(FLOOR(((({_R_MERC} - 0.0 / 4.0 * {_R_WORLD}) - y0)
      / (({_R_MERC} - 0.0 / 4.0 * {_R_WORLD})
         - ({_R_MERC} - 4.0 / 4.0 * {_R_WORLD})))
      * 16384.0 + 0.5) AS BIGINT) AS v1
  FROM boxes
),
fan AS (
  SELECT n_nationkey, u0, u1, v0, v1,
    UNNEST(generate_series(GREATEST(0, (u0 - 32) // 4096),
                           LEAST(3, (u1 + 32) // 4096))) AS tx
  FROM rm
),
fan2 AS (
  SELECT *,
    UNNEST(generate_series(GREATEST(0, (v0 - 32) // 4096),
                           LEAST(3, (v1 + 32) // 4096))) AS ty
  FROM fan
),
pieces AS (
  SELECT 2 AS zoom, tx AS x, ty AS y,
    CAST(n_nationkey AS BIGINT) AS nationkey,
    GREATEST(tx * 4096 - 32, u0) - tx * 4096 AS minu,
    GREATEST(ty * 4096 - 32, v0) - ty * 4096 AS minv,
    LEAST((tx + 1) * 4096 + 32, u1) - tx * 4096 AS maxu,
    LEAST((ty + 1) * 4096 + 32, v1) - ty * 4096 AS maxv
  FROM fan2
)
SELECT zoom, x, y, nationkey, minu, minv, maxu, maxv,
  CAST(2 * (maxu - minu) * (maxv - minv) AS BIGINT) AS area2
FROM pieces WHERE maxu > minu AND maxv > minv
ORDER BY x, y, nationkey
"""


def _q_tiles(spark, sf_dir):
    """Full MVT pyramid z0-z4 over document points, ORACLED VIA DECODE:
    every emitted tile's bytes are decoded back (in-repo MVT decoder,
    geom/mvt.py) into integer facts per tile — feature count, tile-local
    coordinate sums, distinct lang-tag count — which a DuckDB remap+fan
    twin verifies exactly. Encoder/decoder shared-bug risk is covered
    separately by the golden-byte fixtures (tests/test_engine_golden*)
    at two parallelism levels."""
    from tileigi_spark.config import Layer, Layers
    from tileigi_spark.engine import build_tiles

    feats = _point_features(spark, sf_dir)
    layers = Layers(layers=[Layer(id="docs", source="docs", minzoom=0,
                                  maxzoom=14, buffer=2)],
                    global_maxzoom=14)
    tiles = build_tiles(spark, {"docs": feats}, layers, 0, 4)

    def dec(iterator):
        import pandas as pd
        from tileigi_spark.geom.mvt import decode_tile, decode_geometry

        for pdf in iterator:
            rows = {k: [] for k in ("zoom", "x", "y", "n_feat",
                                    "sum_px", "sum_py", "n_lang")}
            for z, x, y, tb in zip(pdf["zoom"], pdf["x"], pdf["y"],
                                   pdf["tile"]):
                n = sx = sy = 0
                langs = set()
                for layer in decode_tile(bytes(tb)):
                    keys, vals = layer["keys"], layer["values"]
                    for ftype, tags, gpay, _fid in layer["features"]:
                        n += 1
                        g = decode_geometry(ftype, gpay)
                        pts = [g[1]] if g[0] == "Point" else g[1]
                        for px, py in pts:
                            sx += px
                            sy += py
                        for ki, vi in zip(tags[::2], tags[1::2]):
                            if keys[ki] == "lang":
                                langs.add(vals[vi])
                rows["zoom"].append(int(z))
                rows["x"].append(int(x))
                rows["y"].append(int(y))
                rows["n_feat"].append(n)
                rows["sum_px"].append(sx)
                rows["sum_py"].append(sy)
                rows["n_lang"].append(len(langs))
            yield pd.DataFrame(rows)

    return (tiles.mapInPandas(
        dec, schema="zoom int, x long, y long, n_feat long, "
                    "sum_px long, sum_py long, n_lang long")
        .orderBy("zoom", "x", "y"))


# DuckDB twin of the z0-z4 point pyramid, decoded-tile facts. Metatile
# bounds are dyadic (±MERC_MAX, 0) so every remap constant below is the
# EXACT double the engine computes (x0t/n*WORLD - MERC_MAX for
# power-of-two positions); operation order in vx/vy matches the numpy
# fast path bit-for-bit. Fan math mirrors engine._points_fast_path:
# keep u,v in [-32, extent+32], tile t iff u in [t*4096-32, (t+1)*4096+32].
# z0-z3 are single world metatiles (size_mt = 2^z); z4 has 2x2 metatiles
# of 8 tiles (metatile_scale 8).
_MVT_PYRAMID_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
mt(zoom, size_mt, x0t, y0t, minx, maxy, den, extent) AS (VALUES
  (0, 1, 0, 0, -{_R_MERC}, {_R_MERC}, {_R_WORLD}, 4096.0),
  (1, 2, 0, 0, -{_R_MERC}, {_R_MERC}, {_R_WORLD}, 8192.0),
  (2, 4, 0, 0, -{_R_MERC}, {_R_MERC}, {_R_WORLD}, 16384.0),
  (3, 8, 0, 0, -{_R_MERC}, {_R_MERC}, {_R_WORLD}, 32768.0),
  (4, 8, 0, 0, -{_R_MERC}, {_R_MERC}, {_R_MERC}, 32768.0),
  (4, 8, 8, 0, 0.0, {_R_MERC}, {_R_MERC}, 32768.0),
  (4, 8, 0, 8, -{_R_MERC}, 0.0, {_R_MERC}, 32768.0),
  (4, 8, 8, 8, 0.0, 0.0, {_R_MERC}, 32768.0)),
rem AS (
  SELECT m.zoom, m.size_mt, m.x0t, m.y0t, p.lang,
    ((p.mx - m.minx) / m.den) * m.extent AS vx,
    ((m.maxy - p.my) / m.den) * m.extent AS vy
  FROM pts p CROSS JOIN mt m
),
uv AS (
  SELECT zoom, size_mt, x0t, y0t, lang,
    CAST(CASE WHEN vx >= 0 THEN FLOOR(vx + 0.5)
              ELSE CEIL(vx - 0.5) END AS BIGINT) AS u,
    CAST(CASE WHEN vy >= 0 THEN FLOOR(vy + 0.5)
              ELSE CEIL(vy - 0.5) END AS BIGINT) AS v
  FROM rem
),
keep AS (
  SELECT * FROM uv
  WHERE u BETWEEN -32 AND size_mt * 4096 + 32
    AND v BETWEEN -32 AND size_mt * 4096 + 32
),
fanx AS (
  SELECT zoom, size_mt, x0t, y0t, lang, u, v,
    UNNEST(generate_series(
      GREATEST(0, CAST(CEIL((u - 32) / 4096.0) AS BIGINT) - 1),
      LEAST(size_mt - 1, (u + 32) // 4096))) AS tx
  FROM keep
),
fany AS (
  SELECT zoom, x0t, y0t, lang, u, v, tx,
    UNNEST(generate_series(
      GREATEST(0, CAST(CEIL((v - 32) / 4096.0) AS BIGINT) - 1),
      LEAST(size_mt - 1, (v + 32) // 4096))) AS ty
  FROM fanx
)
SELECT zoom, x0t + tx AS x, y0t + ty AS y,
  COUNT(*) AS n_feat,
  CAST(SUM(u - tx * 4096) AS BIGINT) AS sum_px,
  CAST(SUM(v - ty * 4096) AS BIGINT) AS sum_py,
  COUNT(DISTINCT lang) AS n_lang
FROM fany
GROUP BY 1, 2, 3
ORDER BY zoom, x, y
"""


def _q_multimodal(spark, sf_dir):
    """Multimodal image pipeline over real PNG bytes: synthesize a valid
    PNG per document (deterministic size from doc_id), run the binary
    column through image_features, and emit the parsed header metadata —
    true width/height/channels, SQL-predictable."""
    import pandas as pd
    from tileigi_spark.multimodal import image_features, tiny_png

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id")

    def make_png(iterator):
        for pdf in iterator:
            out = pdf.copy()
            out["blob"] = [tiny_png(1 + int(d) % 64, 1 + (int(d) * 7) % 64)
                           for d in pdf["doc_id"]]
            yield out[["doc_id", "blob"]]

    blobs = docs.mapInPandas(make_png, schema="doc_id long, blob binary")
    return (image_features(blobs, bin_col="blob")
            .select("doc_id", "width", "height", "channels", "format")
            .orderBy("doc_id"))


_MULTIMODAL_SQL = """
SELECT doc_id,
  1 + doc_id % 64 AS width,
  1 + (doc_id * 7) % 64 AS height,
  3 AS channels,
  'png' AS format
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------- cell layout

_CELL_Z = 3
_CELL_N = 1 << _CELL_Z
_CELL_SPAN = WORLD / _CELL_N
from tileigi_spark.partition import cell_slack as _cell_slack

_CELL_SLACK = _cell_slack(_CELL_Z, 2)
_CELL_GROW = 1.5 * _CELL_SPAN                       # feature box max size
_CELL_BBOX = (-MERC + 1.3 * _CELL_SPAN, -MERC + 2.1 * _CELL_SPAN,
              -MERC + 4.6 * _CELL_SPAN, -MERC + 5.2 * _CELL_SPAN)


def _q_cell_read(spark, sf_dir):
    """Cell-partitioned 100-TB feature-table layout (partition.py): stage
    a supplier-derived box table partitionBy(cell_x, cell_y) with the
    boundary-slack copy fan, read a bbox rectangle back, and emit each
    surviving feature with its surviving copy's cell. The oracle replays
    the write-side cell fan and the greatest(origin, rect-min) survivor
    rule in SQL — proving the read is exactly-once with the right copy,
    against an independent engine."""
    import tempfile

    from tileigi_spark.partition import (read_cell_partitioned,
                                         write_cell_partitioned)

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    mxf = ((F.col("s_suppkey") * 1151) % 100000).cast("double") / 100000.0
    myf = ((F.col("s_suppkey") * 70001) % 100000).cast("double") / 100000.0
    wf = ((F.col("s_suppkey") * 73) % 1000).cast("double") / 1000.0
    hf = ((F.col("s_suppkey") * 37) % 1000).cast("double") / 1000.0
    xmin = (mxf - 0.5) * WORLD
    ymin = (myf - 0.5) * (WORLD * 0.9)
    feats = sup.select(
        F.col("s_suppkey").cast("long").alias("feature_id"),
        xmin.alias("xmin"), ymin.alias("ymin"),
        (xmin + wf * _CELL_GROW).alias("xmax"),
        (ymin + hf * _CELL_GROW).alias("ymax"))
    path = os.path.join(tempfile.mkdtemp(prefix="tileigi_cells_"), "t")
    write_cell_partitioned(feats, path, cell_zoom=_CELL_Z, buffer_px=2)
    got = read_cell_partitioned(spark, path, bbox_merc=_CELL_BBOX,
                                keep_cells=True)
    return (got.select("feature_id",
                       F.col("cell_x").cast("int").alias("cell_x"),
                       F.col("cell_y").cast("int").alias("cell_y"))
            .orderBy("feature_id"))


def _cell_read_sql() -> str:
    from tileigi_spark.partition import read_rect

    rx0, ry0, rx1, ry1 = read_rect(_CELL_BBOX, _CELL_Z)
    slack, span, grow = (repr(_CELL_SLACK), repr(_CELL_SPAN),
                         repr(_CELL_GROW))
    hi = _CELL_N - 1
    return f"""
WITH boxes AS (
  SELECT CAST(s_suppkey AS BIGINT) AS feature_id,
    (CAST((s_suppkey * 1151) % 100000 AS DOUBLE) / 100000.0 - 0.5)
      * {_R_WORLD} AS xmin,
    (CAST((s_suppkey * 70001) % 100000 AS DOUBLE) / 100000.0 - 0.5)
      * ({_R_WORLD} * 0.9) AS ymin,
    CAST((s_suppkey * 73) % 1000 AS DOUBLE) / 1000.0 AS wf,
    CAST((s_suppkey * 37) % 1000 AS DOUBLE) / 1000.0 AS hf
  FROM supplier
),
rects AS (
  SELECT feature_id, xmin, ymin,
         xmin + wf * {grow} AS xmax,
         ymin + hf * {grow} AS ymax
  FROM boxes
),
cells AS (
  SELECT feature_id,
    GREATEST(0, LEAST(CAST(FLOOR((xmin - {slack} + {_R_MERC}) / {span})
                           AS INTEGER), {hi})) AS cx0,
    GREATEST(0, LEAST(CAST(FLOOR((xmax + {slack} + {_R_MERC}) / {span})
                           AS INTEGER), {hi})) AS cx1,
    GREATEST(0, LEAST(CAST(FLOOR(({_R_MERC} - (ymax + {slack})) / {span})
                           AS INTEGER), {hi})) AS cy0,
    GREATEST(0, LEAST(CAST(FLOOR(({_R_MERC} - (ymin - {slack})) / {span})
                           AS INTEGER), {hi})) AS cy1
  FROM rects
)
SELECT feature_id,
       GREATEST(cx0, {rx0}) AS cell_x,
       GREATEST(cy0, {ry0}) AS cell_y
FROM cells
WHERE cx1 >= {rx0} AND cx0 <= {rx1} AND cy1 >= {ry0} AND cy0 <= {ry1}
ORDER BY feature_id
"""


_RAS_ZOOM, _RAS_RES = 1, 16
_RAS_NPX = (1 << _RAS_ZOOM) * _RAS_RES


def _q_rasterize(spark, sf_dir):
    """Vector -> raster: doc points onto the (zoom, res) pixel grid;
    sparse raster rows (raster.rasterize_points, north-rule raster<->vector)."""
    from tileigi_spark.raster import rasterize_points

    pts = _doc_points(spark, sf_dir)
    return (rasterize_points(pts, zoom=_RAS_ZOOM, res=_RAS_RES)
            .orderBy("x", "y", "px", "py"))


_RASTERIZE_CELLS_SQL = f"""
WITH pts AS ({_DOC_POINTS_SQL}),
gpix AS (
  SELECT
    GREATEST(0, LEAST(CAST(FLOOR((mx + {_R_MERC}) / {_R_WORLD} * {_RAS_NPX})
                           AS BIGINT), {_RAS_NPX - 1})) AS gx,
    GREATEST(0, LEAST(CAST(FLOOR(({_R_MERC} - my) / {_R_WORLD} * {_RAS_NPX})
                           AS BIGINT), {_RAS_NPX - 1})) AS gy
  FROM pts
),
cells AS (
  SELECT gx // {_RAS_RES} AS x, gy // {_RAS_RES} AS y,
         gx % {_RAS_RES} AS px, gy % {_RAS_RES} AS py,
         COUNT(*) AS cnt
  FROM gpix GROUP BY 1, 2, 3, 4
)"""

_RASTERIZE_SQL = _RASTERIZE_CELLS_SQL + """
SELECT x, y, px, py, cnt FROM cells ORDER BY x, y, px, py
"""


def _q_raster_vectorize(spark, sf_dir):
    """Raster -> vector roundtrip: rasterize doc points, then rectangle
    decomposition of cells with cnt >= 2 (raster.vectorize_raster)."""
    from tileigi_spark.raster import rasterize_points, vectorize_raster

    pts = _doc_points(spark, sf_dir)
    ras = rasterize_points(pts, zoom=_RAS_ZOOM, res=_RAS_RES)
    return (vectorize_raster(ras, threshold=2)
            .orderBy("x", "y", "px0", "py0", "px1", "py1"))


_RASTER_VECTORIZE_SQL = _RASTERIZE_CELLS_SQL + """,
lit_cells AS (SELECT * FROM cells WHERE cnt >= 2),
runs AS (
  SELECT x, y, py, MIN(px) AS px0, MAX(px) AS px1
  FROM (SELECT *, px - ROW_NUMBER() OVER
          (PARTITION BY x, y, py ORDER BY px) AS rk FROM lit_cells)
  GROUP BY x, y, py, rk
),
rects AS (
  SELECT x, y, px0, px1, MIN(py) AS py0, MAX(py) AS py1
  FROM (SELECT *, py - ROW_NUMBER() OVER
          (PARTITION BY x, y, px0, px1 ORDER BY py) AS ck FROM runs)
  GROUP BY x, y, px0, px1, ck
)
SELECT x, y, px0, py0, px1, py1,
       (px1 - px0 + 1) * (py1 - py0 + 1) AS cells
FROM rects ORDER BY x, y, px0, py0, px1, py1
"""


def _q_raster_pyramid(spark, sf_dir):
    """Raster overview build: one downsample step of the zoom-1 raster
    (2x2 pixel blocks sum into the zoom-0 raster; raster.downsample_raster)."""
    from tileigi_spark.raster import downsample_raster, rasterize_points

    pts = _doc_points(spark, sf_dir)
    ras = rasterize_points(pts, zoom=_RAS_ZOOM, res=_RAS_RES)
    return (downsample_raster(ras, res=_RAS_RES)
            .orderBy("x", "y", "px", "py"))


_RASTER_PYRAMID_SQL = _RASTERIZE_CELLS_SQL + f""",
halved AS (
  SELECT (x * {_RAS_RES} + px) // 2 AS gx,
         (y * {_RAS_RES} + py) // 2 AS gy, cnt
  FROM cells
)
SELECT gx // {_RAS_RES} AS x, gy // {_RAS_RES} AS y,
       gx % {_RAS_RES} AS px, gy % {_RAS_RES} AS py,
       CAST(SUM(cnt) AS BIGINT) AS cnt
FROM halved GROUP BY 1, 2, 3, 4 ORDER BY x, y, px, py
"""


_S2_LEVEL = 12

_S2_BASE_SQL = """
SELECT doc_id AS key, doc_id % 6 AS face,
  CAST((doc_id * 7919) % 100000 AS DOUBLE) / 100000.0 * 2.0 - 1.0 AS u,
  CAST((doc_id * 104729) % 100000 AS DOUBLE) / 100000.0 * 2.0 - 1.0 AS v
FROM documents
"""


def _q_s2_cells(spark, sf_dir):
    """S2 cell ids (pure-numpy Hilbert kernel, tileigi_spark/s2.py) at
    level 12 over deterministic per-doc (face, u, v); the oracle re-runs
    the same integer recurrence as a generated DuckDB CASE ladder."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def compute(batches):
        import numpy as np

        from tileigi_spark.s2 import (cell_id, face_ij_to_pos, st_to_ij,
                                      uv_to_st)
        for b in batches:
            doc = b["doc_id"].to_numpy(np.int64)
            face = doc % 6
            u = (doc * 7919 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
            v = (doc * 104729 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
            i = st_to_ij(uv_to_st(u), _S2_LEVEL)
            j = st_to_ij(uv_to_st(v), _S2_LEVEL)
            pos = face_ij_to_pos(face, i, j, _S2_LEVEL)
            yield pd.DataFrame({
                "key": doc, "face": face, "i": i, "j": j, "pos": pos,
                "cell_id": cell_id(face, pos, _S2_LEVEL)})

    out = docs.mapInPandas(
        compute,
        schema="key long, face long, i long, j long, pos long, cell_id long")
    return out.orderBy("key")


def _s2_cells_sql() -> str:
    from tileigi_spark.s2 import s2_pos_sql
    return s2_pos_sql(_S2_LEVEL, _S2_BASE_SQL) + " ORDER BY key"


_S2_PARENT_LEVEL = 6


def _q_s2_rollup(spark, sf_dir):
    """Hierarchical aggregation on packed S2 ids: count level-12 doc
    cells per level-6 ancestor, the parent computed by integer
    arithmetic on the id alone (s2.cell_id_parent — no curve recompute).
    The oracle derives the same parent arithmetically from (face, pos)."""
    import pandas as pd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def compute(batches):
        import numpy as np

        from tileigi_spark.s2 import (cell_id, cell_id_parent,
                                      face_ij_to_pos, st_to_ij, uv_to_st)
        for b in batches:
            doc = b["doc_id"].to_numpy(np.int64)
            face = doc % 6
            u = (doc * 7919 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
            v = (doc * 104729 % 100000).astype(np.float64) / 100000.0 * 2.0 - 1.0
            i = st_to_ij(uv_to_st(u), _S2_LEVEL)
            j = st_to_ij(uv_to_st(v), _S2_LEVEL)
            ids = cell_id(face, face_ij_to_pos(face, i, j, _S2_LEVEL),
                          _S2_LEVEL)
            yield pd.DataFrame({
                "parent_id": cell_id_parent(ids, _S2_LEVEL,
                                            _S2_PARENT_LEVEL)})

    cells = docs.mapInPandas(compute, schema="parent_id long")
    return (cells.groupBy("parent_id").agg(F.count("*").alias("n_docs"))
            .orderBy("parent_id"))


def _s2_rollup_sql() -> str:
    from tileigi_spark.s2 import s2_pos_sql
    drop = 4 ** (_S2_LEVEL - _S2_PARENT_LEVEL)
    shift = 2 * (30 - _S2_PARENT_LEVEL)
    marker = 1 << shift
    inner = s2_pos_sql(_S2_LEVEL, _S2_BASE_SQL)
    return f"""
WITH lvl AS ({inner}),
parents AS (
  SELECT CASE WHEN face >= 4 THEN (face - 8) * {1 << 61}
              ELSE face * {1 << 61} END
         + (pos // {drop}) * {marker * 2} + {marker} AS parent_id
  FROM lvl
)
SELECT parent_id, COUNT(*) AS n_docs
FROM parents GROUP BY 1 ORDER BY parent_id
"""


# ------------------------------------------------------------ entrypoints

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geotag synthetic pages -> extract coords -> build the MVT
    pyramid z0-z4 over the geotagged points (the full north-star path)."""
    sf_dir = "/root/testdata/sf0.001"
    return _q_tiles(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tile_assign": _q_tile_assign,
        "tile_pieces_z3": _q_tile_pieces_z3,
        "extract_coords": _q_extract,
        "pip_join": _q_pip,
        "knn_points": _q_knn,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard": _q_jaccard,
        "dedup_minhash": _q_minhash,
        "dedup_simhash": _q_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        "ann_topk": _q_ann,
        "ann_lsh": _q_ann_lsh,
        "lang_quality": _q_lang_quality,
        "langid": _q_langid,
        "fingerprint": _q_fingerprint,
        "events_hourly": _q_events_hourly,
        "sessions": _q_sessions,
        "pricing_summary": _q_pricing,
        "bbox_pyramid": _q_bbox_pyramid,
        "poly_pieces_z2": _q_poly_pieces,
        "mvt_pyramid": _q_tiles,
        "multimodal_features": _q_multimodal,
        "cell_read": _q_cell_read,
        "rasterize": _q_rasterize,
        "raster_vectorize": _q_raster_vectorize,
        "raster_pyramid": _q_raster_pyramid,
        "s2_cells": _q_s2_cells,
        "s2_rollup": _q_s2_rollup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tile_assign": _TILE_ASSIGN_SQL,
        "tile_pieces_z3": _TILE_PIECES_SQL,
        "extract_coords": _EXTRACT_SQL,
        "pip_join": _PIP_SQL,
        "knn_points": _KNN_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_jaccard": _JACCARD_SQL,
        "dedup_minhash": _MINHASH_SQL,
        "dedup_simhash": _SIMHASH_SQL,
        "dedup_embedding": _DEDUP_EMBEDDING_SQL,
        "dedup_embedding_lsh": _DEDUP_EMBEDDING_LSH_SQL,
        "ann_topk": _ANN_SQL,
        "ann_lsh": _ANN_SQL,
        "lang_quality": _LANG_QUALITY_SQL,
        "langid": _LANGID_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        "events_hourly": _EVENTS_SQL,
        "sessions": _SESSIONS_SQL,
        "pricing_summary": _PRICING_SQL,
        "bbox_pyramid": _bbox_pyramid_sql(),
        "poly_pieces_z2": _POLY_PIECES_SQL,
        "multimodal_features": _MULTIMODAL_SQL,
        # mvt_pyramid: tile BYTES aren't SQL-expressible, so the query
        # decodes every emitted tile (in-repo MVT decoder) into integer
        # facts and those are oracled; bytes stay pinned by golden-byte
        # pytest fixtures at two parallelism levels
        "mvt_pyramid": _MVT_PYRAMID_SQL,
        "cell_read": _cell_read_sql(),
        "rasterize": _RASTERIZE_SQL,
        "raster_vectorize": _RASTER_VECTORIZE_SQL,
        "raster_pyramid": _RASTER_PYRAMID_SQL,
        "s2_cells": _s2_cells_sql(),
        "s2_rollup": _s2_rollup_sql(),
    }
