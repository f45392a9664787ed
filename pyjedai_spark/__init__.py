"""pyjedai_spark — a PySpark-native entity-resolution / near-duplicate
detection engine, re-expressing the capabilities of AI-team-UoA/pyJedAI
(reference at /root/reference, studied for *what* it computes only) as
idiomatic Spark DataFrame plans.

Architecture (Spark-first, not a port):

- Entities are rows of a DataFrame ``(eid long, text string, ...)``.
- A block collection is never a dict: it is a long "postings" DataFrame
  ``(key string, eid long)`` (reference: dict[token -> Block],
  src/pyjedai/datamodel.py:479-506).
- Candidate pairs / the blocking graph are an edge DataFrame
  ``(id1, id2, weight)`` with ``id1 < id2`` canonical order
  (reference: networkx.Graph, src/pyjedai/matching.py:94).
- Clusters are an assignment DataFrame ``(eid, cluster_id)``
  (reference: list[set[int]], src/pyjedai/clustering.py:463).

Every stage is a lazy DataFrame -> DataFrame transform; Catalyst handles
predicate pushdown / column pruning / join strategy, and the only Python
in the hot path is Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

from .pipeline import der_dedup_pipeline, minhash_dedup_pipeline  # noqa: F401
from .session import get_spark  # noqa: F401
from .workflow import BlockingBasedWorkFlow, ProgressiveWorkFlow  # noqa: F401
