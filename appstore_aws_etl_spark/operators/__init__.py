"""Reusable composite operators the built-in DataFrame API lacks."""

from .asof import asof_join  # noqa: F401
from .sessionize import sessionize  # noqa: F401
