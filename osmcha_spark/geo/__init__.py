from osmcha_spark.geo.cells import (  # noqa: F401
    cell_col,
    cell_sql,
    cell_np,
    cell_level_for_radius,
    covering_cells_col,
    neighbors_col,
)
from osmcha_spark.geo.pip import point_in_ring_col, point_in_ring_np  # noqa: F401
from osmcha_spark.geo.intersects import rect_ring_intersects_udf  # noqa: F401
