from geo_epic_spark.operators.spatial import (  # noqa: F401
    nearest_grid_join,
    pip_join,
    rasterize,
    zonal_stats,
)
