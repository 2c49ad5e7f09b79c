from pyshp_spark.sources.shapefile import (  # noqa: F401
    parse_shp_bytes,
    parse_dbf_bytes,
    shapefile_to_pandas,
    read_shapefiles,
    GEOM_FIELDS,
)
