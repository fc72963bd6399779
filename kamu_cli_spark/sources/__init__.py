from kamu_cli_spark.sources.testdata import load_table, load_tables

__all__ = ["load_table", "load_tables"]
