"""Spark layer: schemas, Arrow UDF wrappers, pipeline, checkpoint/lineage."""
