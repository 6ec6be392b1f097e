"""github_etl_spark — a PySpark-native analytics engine.

Re-expresses the relational capabilities of the reference ETL
(mozilla-conduit/github-etl, studied read-only at /root/reference/) as
explicit, composable PySpark DataFrame operators, plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) required by the north star.

Design stance (SURVEY.md §7): DataFrame/SQL first, Catalyst does the
optimizing; Pandas UDFs only where built-ins genuinely can't express
the semantics; partitioning/broadcast/AQE decisions made for a
1000-executor 100 TB deployment even though tests run on local[32].
"""

__version__ = "0.1.0"
