"""Sources & sinks: NDJSON (reference-native format), Parquet, CSV."""

from .ndjson import (  # noqa: F401
    read_ndjson,
    resource_type_from_name,
    write_ndjson,
)
