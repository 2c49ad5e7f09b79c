from pyshp_spark.sources.shapefile import (  # noqa: F401
    GEOM_FIELDS,
    parse_dbf_bytes,
    parse_shp_bytes,
    read_shapefile_urls,
    read_shapefiles,
    read_url_shapefile,
    read_zip_shapefile,
    shapefile_to_pandas,
)
from pyshp_spark.sources.datasource import ShapefileDataSource  # noqa: F401
from pyshp_spark.sources.shp_writer import write_dbf, write_shp  # noqa: F401
