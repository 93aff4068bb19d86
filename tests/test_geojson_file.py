"""Whole-file GeoJSON source vs published expectations
(ogr_geojson.py tests 2-8 extents/types/counts, test 67's bare
{"features":[...]} tolerance, point_with_utf8bom)."""

import json

from gdal_spark.sources.geojsonfile import (GeoJsonFileDataSource,
                                            doc_features, geom_wkb)
from gdal_spark.sources.shapefile import iso_wkt

D = "/root/reference/autotest/ogr/data/geojson"


def test_bare_features_key_7198():
    doc = json.load(open(f"{D}/grenada.geojson"))
    feats = doc_features(doc)
    assert len(feats) == 1
    assert feats[0]["geometry"]["type"] == "MultiPolygon"


def test_standalone_geometry_wrap():
    doc = json.load(open(f"{D}/point.geojson"))
    feats = doc_features(doc)
    assert len(feats) == 1
    assert iso_wkt(geom_wkb(feats[0]["geometry"])) == "POINT (100 0)"


def test_spark_scan_with_bom(spark):
    spark.dataSource.register(GeoJsonFileDataSource)
    rows = (spark.read.format("geojsonfile")
            .load(f"{D}/point_with_utf8bom.json").collect())
    assert len(rows) == 1
    assert rows[0]["geom_type"] == "Point"


def test_spark_properties_map(spark):
    spark.dataSource.register(GeoJsonFileDataSource)
    rows = (spark.read.format("geojsonfile")
            .load(f"{D}/grenada.geojson").collect())
    assert rows[0]["properties"]["name"] == "Grenada"
    assert rows[0]["properties"]["ISO3166-1:alpha3"] == "GRD"
    assert rows[0]["n_points"] == 426
