"""Custom Spark data sources — the engine's format-driver surface.

GDAL's core extension point is the format driver (SURVEY §2.1:
GDALDriver / OGRSFDriver registration, ~220 drivers in frmts/ and
ogr/ogrsf_frmts/). Spark 4's Python DataSource API is the native
analog: a registered class that reports a schema, splits a dataset
into input partitions, and yields rows per partition — scan
parallelism, column schema, and partition planning all surface to
Catalyst exactly like a built-in format.
"""
