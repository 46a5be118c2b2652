"""Sources & sinks (SURVEY §2.1)."""

from mldb_spark.sources.text_io import export_csv, import_json, import_text  # noqa: F401
