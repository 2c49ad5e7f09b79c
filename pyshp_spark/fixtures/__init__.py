from pyshp_spark.fixtures.polygons import polygon_fixture, fixture_shapefile_bytes  # noqa: F401
from pyshp_spark.fixtures.images import images_fixture  # noqa: F401
