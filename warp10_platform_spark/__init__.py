"""warp10_platform_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the Warp 10 time-series platform
(reference: senx/warp10-platform).

Architecture (NOT a port): the reference's stack-machine interpreter and
LevelDB/FoundationDB storage are replaced by idiomatic Spark —
DataFrame/Catalyst for batch, Parquet for storage, Structured Streaming
for ingest. What is preserved is WHAT the reference computes: the GTS
data model (SURVEY.md §1), the frame-operation semantics
(BUCKETIZE / MAP / REDUCE / APPLY / FILTER / FILL), and the analytic
function surface (SURVEY.md §2).

Entry points:
    from warp10_platform_spark import GTSFrame, get_spark
"""

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.session import get_spark

__all__ = ["GTSFrame", "get_spark"]
__version__ = "0.1.0"
