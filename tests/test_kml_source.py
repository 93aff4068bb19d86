"""KML source parity vs the published ogr_kml.py pins
(attributes_1..4 + point/linestring/polygon_read)."""

from gdal_spark.sources.kml import KmlDataSource
from gdal_spark.sources.shapefile import iso_wkt

KML = "/root/reference/autotest/ogr/data/kml/samples.kml"


def _layer(spark, name):
    spark.dataSource.register(KmlDataSource)
    return (spark.read.format("kml").option("layer", name)
            .load(KML).orderBy("fid").collect())


def test_placemarks_published(spark):
    rows = _layer(spark, "Placemarks")
    assert [r["name"] for r in rows] == [
        "Simple placemark", "Floating placemark", "Extruded placemark"]
    assert rows[0]["description"] == (
        "Attached to the ground. Intelligently places itself at "
        "the\nheight of the underlying terrain.")
    assert rows[2]["description"] == (
        'Tethered to the ground by a customizable\n"tail"')
    # published POINT(-122.0822035425683 37.42228990140251 0)
    w = iso_wkt(rows[0]["wkb"], rows[0]["zs"])
    assert w.startswith("POINT Z (-122.082203542568")
    assert rows[1]["zs"] == [50.0]


def test_paths_published(spark):
    rows = _layer(spark, "Paths")
    assert rows[0]["name"] == "Tessellated"
    assert rows[0]["description"].startswith(
        "If the <tessellate> tag has a value of 1")
    assert rows[1]["description"].startswith(
        "If the <tessellate> tag has a value of 0")
    assert rows[2]["zs"][0] == 2357.0 and len(rows[2]["zs"]) == 11


def test_campus_polygons(spark):
    rows = _layer(spark, "Google Campus")
    assert [r["name"] for r in rows] == [
        f"Building 4{i}" for i in range(4)]
    assert all(r["geom_type"] == "Polygon" for r in rows)
