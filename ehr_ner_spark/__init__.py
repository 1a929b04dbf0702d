"""ehr_ner_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-creates the query/data-processing capabilities of allenyummy/EHR_NER
(QA-based nested sequence labeling -> entity spans) as an idiomatic Spark
pipeline: triple extraction (mention detection via a query battery scored by
a batched, Arrow-vectorized scorer UDF), entity linking (char n-gram MinHash
blocking, salted), LSH canonicalization, and graph materialization into
checkpointed, resumable Iceberg-layout tables.

Nothing here is a port: the reference (see /root/reference, cited per-module
as file:line) is a single-process PyTorch/HF pipeline; this engine expresses
the same semantics as DataFrame plans + Arrow-batched pandas UDFs so Catalyst
/ Tungsten / AQE handle planning, codegen, and skew.
"""

__version__ = "0.1.0"
