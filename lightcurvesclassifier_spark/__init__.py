"""lightcurvesclassifier_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of mavrix93/LightCurvesClassifier.

The reference (``/root/reference``, package ``lcc``) is a per-object Python
pipeline: query star catalogs, extract light-curve features ("descriptors"),
train classifiers ("deciders"), and systematically search databases. This
package re-expresses the same capabilities Spark-first:

- the data model is two long-format DataFrames (``stars``, ``observations``)
  plus an array-typed ``curves`` view (see ``schemas.py``),
- per-curve kernels are built-in SQL expressions where possible and
  Arrow-vectorized pandas UDFs otherwise (``functions/``),
- the dict-based query interface compiles to Catalyst predicates
  (``plans/query_compiler.py``),
- descriptors + deciders compose as a ``pyspark.ml.Pipeline``
  (``ml/``), and the systematic search is a DataFrame pipeline with an
  append-only ledger (``streaming/``).

Everything is designed for a multi-executor cluster at ~100 TB: no
driver-resident data paths, broadcast joins for small dimensions, zone
bucketing for spherical crossmatch instead of cross joins.
"""

__version__ = "0.1.0"
