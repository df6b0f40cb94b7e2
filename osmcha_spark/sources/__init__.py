from osmcha_spark.sources.replication import (  # noqa: F401
    read_replication,
    read_replication_robust,
)
from osmcha_spark.sources.geojson import load_aoi_ring  # noqa: F401
from osmcha_spark.sources.tables import load_table  # noqa: F401
