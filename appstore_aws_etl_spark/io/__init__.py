"""Sources and sinks: landing-zone management, format readers/writers,
warehouse (JDBC) sink."""

from .landing import LandingZone  # noqa: F401
from .sinks import write_jdbc, write_parquet  # noqa: F401
