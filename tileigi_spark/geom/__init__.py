"""Pure-Python/numpy exact-integer geometry core. No Spark imports here.

Every function is `Geometry -> Optional[Geometry]` on plain tuples, so the
whole module is unit-testable offline and usable inside Arrow-batched
pandas UDFs. Geometry representation (mirrors the `geo` crate enum used by
the reference, /root/reference/src/lib.rs):

    ('Point', (x, y))
    ('MultiPoint', [(x, y), ...])
    ('LineString', [(x, y), ...])
    ('MultiLineString', [[(x, y), ...], ...])
    ('Polygon', [ring, ...])          # ring 0 = exterior, rest interiors
    ('MultiPolygon', [[ring, ...], ...])

Coordinates are Python ints (tile space, i32 contract) or floats (EPSG:3857
before remap). All integer arithmetic is exact; division replicates Rust's
truncate-toward-zero semantics via `tdiv`.
"""

from .types import (
    GeomType,
    tdiv,
    trem,
)
from .wkb import wkb_to_geom, geom_to_wkb
from .remap import remap_geometry
from .simplify import (
    remove_duplicate_points,
    remove_spikes,
    remove_spikes_linestring,
    remove_unneeded_points,
    simplify,
)
from .clip import clip_to_bbox, clip_geometry_to_tiles
from .validity import (
    is_valid,
    is_valid_skip_expensive,
    make_valid,
    ensure_polygon_orientation,
    intersection,
)
from .mvt import encode_tile, encode_layer

__all__ = [
    "GeomType", "tdiv", "trem",
    "wkb_to_geom", "geom_to_wkb",
    "remap_geometry",
    "remove_duplicate_points", "remove_spikes", "remove_spikes_linestring",
    "remove_unneeded_points", "simplify",
    "clip_to_bbox", "clip_geometry_to_tiles",
    "is_valid", "is_valid_skip_expensive", "make_valid",
    "ensure_polygon_orientation", "intersection",
    "encode_tile", "encode_layer",
]
