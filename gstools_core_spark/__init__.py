"""gstools_core_spark — a PySpark-native geostatistics + spatial-join engine.

Brand-new engine with the data-processing capabilities of
GeoStat-Framework/GSTools-Core (reference, read-only, /root/reference),
re-expressed Spark-first: DataFrame/Catalyst for the relational shapes,
vectorized pandas/Arrow UDFs for the numeric kernels, cell-prefix hash joins
for the spatial layer.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from gstools_core_spark import kernels  # noqa: F401
