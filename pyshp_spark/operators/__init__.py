from pyshp_spark.operators.spatial import (  # noqa: F401
    point_in_polygon_join,
    spatial_semi_join,
    spatial_anti_join,
    tile_assignment,
    knn_brute,
    knn_join,
)
