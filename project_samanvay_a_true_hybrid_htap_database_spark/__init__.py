"""Samanvay-Spark: a PySpark-native analytics engine with the query surface of
Project Samanvay (reference: 1byinf8/Project-Samanvay-A-true-Hybrid-HTAP-Database,
a C++17 single-process HTAP store — see SURVEY.md).

The reference's observable surface (SURVEY.md §2) is re-expressed Spark-first:
DataFrame/SQL + Catalyst replace the hand-written executor
(reference: StorageEngine/SQLLayer/query_executor.cpp), Parquet replaces
SSTables/columnar files (reference: StorageEngine/include/sstable.hpp,
columnar_file.hpp), and a hot-rows overlay with newest-sequence-wins merge
replaces the skiplist memtable (reference: StorageEngine/include/memtable.hpp).
"""

__version__ = "0.1.0"

from .session import get_spark
from .engine import SamanvayEngine, ResultSet

__all__ = ["get_spark", "SamanvayEngine", "ResultSet", "__version__"]
