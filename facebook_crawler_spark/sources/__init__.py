"""Sources & sinks: synthetic deterministic generators (FIXTURES.md) and
partitioned parquet IO with Iceberg-like commit semantics (tables shim)."""
