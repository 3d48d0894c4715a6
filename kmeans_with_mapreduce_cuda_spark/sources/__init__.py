from .readers import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    points_from_lineitem,
    points_xy,
    read_points_text,
    register_views,
)
from .writers import format_centroids, write_centroids_text  # noqa: F401
