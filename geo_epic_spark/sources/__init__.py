"""Sources/sinks: fixed-width text scans, partitioned table writer with
Iceberg detection and Parquet fallback (SURVEY §2.1)."""
