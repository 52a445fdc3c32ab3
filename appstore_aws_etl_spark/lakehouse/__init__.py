"""ACID lakehouse table format over parquet (log.py, table.py).

Public-design provenance: the Delta Lake action-log protocol (Armbrust
et al., VLDB 2020) + Iceberg manifest-statistics scan planning, written
from scratch against the Hadoop FS API. See log.py's module docstring
for the full design and the 100 TB scale argument.
"""

from .log import CommitConflict, ConcurrentModification, Snapshot
from .table import LakeTable

__all__ = ["LakeTable", "Snapshot", "CommitConflict", "ConcurrentModification"]
