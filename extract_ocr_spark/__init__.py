"""extract_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of the reference
``RobertMLayne/extract-ocr`` (a single-threaded Python crawler/extractor),
re-architected Spark-first:

- **Kernel layer** (``extract_ocr_spark.kernels``): pure Python/pandas
  functions with zero Spark imports — HTML tokenization + boilerplate
  stripping + markdown emission, PDF layout-text parsing with reading-order
  reconstruction, OCR normalization, JSON/XML pretty-printing, URL and
  content-kind classification. Unit-testable without a SparkSession.
- **Engine layer** (``schemas``, ``session``, ``datagen``, ``pipeline``):
  DataFrame schemas, the vectorized ``mapInPandas`` extraction stage with
  size-class salted repartitioning, per-partition lineage + metrics tables,
  and anti-join resume.
- **Operators** (``extract_ocr_spark.operators``): relational operators,
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  similarity search, and text-analysis functions over the test tables.

Reference parity map: see SURVEY.md §2 (operator inventory with
reference file:line citations).
"""

__version__ = "0.1.0"
