"""mongo2neo_spark — a from-scratch PySpark-native knowledge-graph
construction engine.

Generalizes the document→property-graph ETL of the reference
(DongGYFSu/mongo2neo: Mongo collections → Neo4j nodes/relationships;
the reference checkout at /root/reference is empty — see SURVEY.md §0,
so the binding spec is BASELINE.json's north_star/north_rule) into a
transcript→KG pipeline:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
        → ingest (dedup, order, filter)
        → extract (vectorized mention + triple detection, Arrow UDFs)
        → link    (MinHash/LSH candidate generation + pairwise scoring)
        → canonicalize (iterative connected components, min-label)
        → materialize  (node / edge tables with set-semantics dedup)

Everything is DataFrame-first: Catalyst plans the physical execution,
Python only runs inside Arrow-batched pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
