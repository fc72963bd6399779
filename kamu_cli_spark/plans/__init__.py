from kamu_cli_spark.plans.offsets import assign_offsets

__all__ = ["assign_offsets"]
