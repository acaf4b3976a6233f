"""PySpark-native knowledge-graph construction pipeline.

A from-scratch reinterpretation of lmmx/wikidata-pq's entity/claim
flattening (reference at /root/reference, read-only) as a
transcript -> (subj, pred, obj) triple factory:

- stable turn ordering per conversation (window sort),
- batched mention detection + triple extraction in Arrow pandas UDFs
  (``applyInPandas`` per conv_id group, no per-row Python),
- entity linking via broadcast alias dictionary with salted fallback
  for hot entities,
- canonicalization via connected components over same-as edges,
- graph materialization as subject-hash-bucketed nodes/edges tables
  with per-partition lineage sidecars,
- resumable per-partition checkpoints.

See SURVEY.md for the reference operator inventory this covers.
"""

__version__ = "0.1.0"
