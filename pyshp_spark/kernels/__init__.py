from pyshp_spark.kernels.rings import (  # noqa: F401
    signed_area,
    is_cw,
    ring_bbox,
    ring_contains_points,
    ring_contains_point,
    ring_sample,
    organize_polygon_rings,
    points_in_rings_even_odd,
)
from pyshp_spark.kernels.wkb import (  # noqa: F401
    wkb_point,
    wkb_multipoint,
    wkb_linestring,
    wkb_multilinestring,
    wkb_polygon,
    wkb_multipolygon,
    parse_wkb,
    wkb_rings,
)
