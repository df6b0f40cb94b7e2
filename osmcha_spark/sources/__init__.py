from osmcha_spark.sources.replication import read_replication  # noqa: F401
from osmcha_spark.sources.geojson import load_aoi_ring  # noqa: F401
from osmcha_spark.sources.tables import load_table  # noqa: F401
