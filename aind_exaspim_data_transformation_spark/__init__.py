"""PySpark-native analytics & data-processing engine.

A from-scratch Spark DataFrame/SQL implementation of the capabilities of
AllenNeuralDynamics/aind-exaspim-data-transformation (reference studied at
/root/reference; see SURVEY.md for the structural analysis), plus a general
relational analytics surface and LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis), all designed for
100 TB scale on a multi-executor cluster.

Layout:
- ``session``    SparkSession builder with scale-oriented defaults
- ``config``     job-settings model (port of reference models.py semantics)
- ``plans``      grid / shape planning as DataFrame expressions
- ``sources``    table loaders, Imaris-style tensor sources
- ``operators``  downsample kernel, dedup, similarity, text, multimodal
- ``zarrio``     pure-Python Zarr v3 sharded store writer + OME-NGFF metadata
- ``queries``    the declared query surface (drives __spark_entry__)
- ``streaming``  Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
