"""PySpark-native knowledge-graph construction pipeline.

A from-scratch reinterpretation of lmmx/wikidata-pq's entity/claim
flattening (reference at /root/reference, read-only) as a
transcript -> (subj, pred, obj) triple factory:

- stable turn ordering per conversation (window sort),
- mention detection + triple extraction: a pure-Catalyst regex
  extractor by default (zero Python in the hot path), with an
  Arrow-batched ``mapInPandas`` path (conversation carry, no per-row
  Python) for rules Catalyst can't express,
- entity linking via broadcast alias dictionary with salted fallback
  for hot entities,
- canonicalization via connected components over same-as edges
  (driver union-find under a size threshold, distributed min-label
  propagation + pointer jumping above; size-gated broadcast rewrite),
- graph materialization as subject-hash-bucketed nodes/edges tables
  with per-partition lineage sidecars,
- resumable per-partition checkpoints.

See SURVEY.md for the reference operator inventory this covers.
"""

__version__ = "0.1.0"

# convenience top-level API: the two pipelines and the session factory
# (operators stay under wikidata_pq_spark.operators.<family>)
from .curation_pipeline import CurationPipeline  # noqa: E402,F401
from .pipeline import ChunkedKGPipeline, KGPipeline  # noqa: E402,F401
from .session import get_spark  # noqa: E402,F401
