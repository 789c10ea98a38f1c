"""Column-level helper functions: text analysis, vector math,
multimodal plumbing. All hot-path expressions are built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen); Python
surfaces only in the Arrow-batched multimodal UDFs."""
