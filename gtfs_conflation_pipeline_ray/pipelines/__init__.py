"""Pipelines: stage compositions + the driver-facing query registry."""
