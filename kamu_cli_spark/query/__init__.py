from kamu_cli_spark.query.service import QueryService

__all__ = ["QueryService"]
