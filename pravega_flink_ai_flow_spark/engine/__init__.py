from .session import get_spark, stop_spark
from .catalog import Catalog, DatasetEntry

__all__ = ["get_spark", "stop_spark", "Catalog", "DatasetEntry"]
