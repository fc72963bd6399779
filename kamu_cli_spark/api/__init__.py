from kamu_cli_spark.api.rest import serve

__all__ = ["serve"]
