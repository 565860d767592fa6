"""varda_spark — a PySpark-native analytics engine with the capabilities of
varda/varda (genomic variation frequency database), rebuilt Spark-first.

Design rules (SURVEY.md §7):
- every capability is a pure ``DataFrame -> DataFrame`` function;
- declarative DataFrame/SQL plans so Catalyst optimizes (pushdown, pruning,
  broadcast, AQE); Python UDFs only where built-ins can't express semantics;
- built for 100 TB: partition-by-key fact tables, broadcast dims, binned
  interval joins instead of theta joins, bounded LSH fan-outs.
"""

__version__ = "0.1.0"
