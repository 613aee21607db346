"""External data sources (SURVEY.md §2.11): the JDBC/RDBMS connector that
is the reference's entire ingress, plus catalog-view registration for BI
exposure of the denormalized invoice view."""

from sql_cdc_spark.sources.delta_cdf import (  # noqa: F401
    cdf_options,
    cdf_to_changelog,
    read_cdf,
    read_cdf_stream,
)
from sql_cdc_spark.sources.jdbc import jdbc_options, read_jdbc  # noqa: F401
from sql_cdc_spark.sources.views import register_invoice_views  # noqa: F401
