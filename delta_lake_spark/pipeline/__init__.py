"""Medallion pipeline API (Bronze → Silver → Gold over managed tables)."""

from delta_lake_spark.pipeline.medallion import MedallionPipeline

__all__ = ["MedallionPipeline"]
