from .table import VersionedParquetTable, DeltaLayer, delta_layer

__all__ = ["VersionedParquetTable", "DeltaLayer", "delta_layer"]
