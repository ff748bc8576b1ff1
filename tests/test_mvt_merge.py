"""MVT decoder + partial-merge equivalence: merging salted partial layer
messages must produce byte-identical output to encoding all features in
one pass — the invariant the skew-breaking path depends on."""

import gzip

from tileigi_spark.geom import mvt


FEATURES = [
    (("Point", (10, 20)), {"name": "a", "rank": 1, "score": 2.5,
                           "flag": True}),
    (("LineString", [(0, 0), (100, 50), (200, 0)]), {"name": "b", "rank": 1}),
    (("Polygon", [[(0, 0), (0, 40), (40, 40), (40, 0), (0, 0)],
                  [(10, 10), (30, 10), (30, 30), (10, 30), (10, 10)]]),
     {"name": "a", "kind": "water", "f": ("f32", 1.5)}),
    (("MultiPoint", [(5, 5), (6, 6)]), {"rank": 2, "nothing": None}),
    (("MultiPolygon", [[[(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]],
                       [[(20, 20), (20, 30), (30, 30), (30, 20), (20, 20)]]]),
     {"name": "c"}),
]


def test_decode_roundtrip():
    lb = mvt.encode_layer("test", FEATURES)
    lay = mvt.decode_layer(lb)
    assert lay["name"] == "test"
    assert lay["extent"] == 4096
    assert len(lay["features"]) == len(FEATURES)
    assert "name" in lay["keys"] and "rank" in lay["keys"]
    assert "a" in lay["values"] and 1 in lay["values"]
    assert 2.5 in lay["values"]
    assert ("f32", 1.5) in lay["values"]
    assert True in [v for v in lay["values"] if isinstance(v, bool)]
    # geometry types
    types = [f[0] for f in lay["features"]]
    assert types == [1, 2, 3, 1, 3]


def test_merge_equals_single_pass():
    whole = mvt.encode_layer("l", FEATURES)
    for split in (1, 2, 3):
        partials = [
            mvt.encode_layer("l", FEATURES[i:i + split])
            for i in range(0, len(FEATURES), split)
        ]
        merged = mvt.merge_partial_layers(partials)
        assert merged == whole, f"merge mismatch at split={split}"


def test_merge_reinterns_values():
    # two partials sharing keys/values: merged dictionaries dedup
    p1 = mvt.encode_layer("l", [(("Point", (1, 1)), {"k": "v", "n": 7})])
    p2 = mvt.encode_layer("l", [(("Point", (2, 2)), {"k": "v", "n": 7})])
    merged = mvt.decode_layer(mvt.merge_partial_layers([p1, p2]))
    assert merged["keys"] == ["k", "n"]
    assert merged["values"] == ["v", 7]
    assert len(merged["features"]) == 2


def test_tile_bytes_deterministic_and_gzip():
    lb = mvt.encode_layer("l", FEATURES)
    t1 = mvt.encode_tile([lb])
    t2 = mvt.encode_tile([lb])
    assert t1 == t2
    raw = gzip.decompress(t1)
    assert mvt.encode_tile([lb], compress=False) == raw
