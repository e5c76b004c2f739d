"""Sources: the deterministic synthetic web generator and the snapshot
table catalog (parquet + manifest commits standing in for Iceberg)."""
