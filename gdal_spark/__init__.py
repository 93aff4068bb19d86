"""gdal_spark — a from-scratch, PySpark-native spatial-join + tiling engine.

Re-creates the query / data-processing semantics of the reference GDAL
tree (AbelPau/gdal, read-only at /root/reference) as idiomatic Spark
DataFrame pipelines over Common-Crawl-style web-page tables:

- geocoding pages into point geometries (deterministic, hash/TLD rules;
  shape of ogr/ogr_geocoding.cpp without network calls),
- H3/S2-style hierarchical cell indexing (true S2 cell ids in pure
  numpy + Web-Mercator XYZ tile/quadkey cells; gdal2tiles.py math),
- point-in-polygon spatial joins (3-stage filter semantics of
  ogr/ogrsf_frmts/generic/ogrlayer.cpp:4005-4078),
- kNN via cell-ring expansion (radius-doubling twin of
  alg/gdalgrid.cpp:905-976),
- rasterize / polygonize / zonal stats / warp envelope / tile pyramids
  (alg/llrasterize.cpp, alg/polygonize.cpp, alg/zonal.cpp,
  alg/gdaltransformer.cpp:342-1170, osgeo_utils/gdal2tiles.py),
- OGR SQL relational surface (filters, first-match LEFT joins per
  ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1334-1546, summary aggregates,
  ORDER BY / LIMIT, UNION ALL),
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing).

Architecture: no custom executor, no RDD hot paths. The package only
*generates DataFrame plans*; Catalyst + AQE do the physical planning.
Heavy math is vectorized numpy inside Arrow-batched pandas UDFs (the
container has no shapely/pyproj/h3 — every kernel here is self-contained
and ported from the exact published formulas).
"""

__version__ = "0.1.0"

from gdal_spark.session import get_spark  # noqa: F401
