"""End-to-end ETL pipelines (the reference's declared shape,
README.md:2: App Store API -> S3 landing -> Spark transform -> serving
warehouse)."""

from .appstore import run_sales_pipeline  # noqa: F401
