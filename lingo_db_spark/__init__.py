"""lingo_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of LingoDB (lingo-db/lingo-db).

Architecture: the reference compiles SQL through MLIR dialects
(RelAlg -> SubOp -> DB -> LLVM; see reference src/execution/Execution.cpp:403-451).
In Spark those three layers collapse: RelAlg == Catalyst logical plan,
SubOp == Spark physical operators, DB scalars == Spark expressions.  This
package is therefore (a) an engine facade (`connect`, mirroring the
reference Python API tools/python/lingodb/__init__.py:43-72), (b) an
operator/function library pinning LingoDB semantics where Spark defaults
differ, and (c) large-scale data-pipeline operators (dedup, similarity,
text analysis) built DataFrame-first.
"""

from lingo_db_spark.session import build_session, stop_session
from lingo_db_spark.connection import Connection, connect, create_in_memory

__all__ = [
    "build_session",
    "stop_session",
    "Connection",
    "connect",
    "create_in_memory",
]

__version__ = "0.1.0"
