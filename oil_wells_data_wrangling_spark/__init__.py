"""oil_wells_data_wrangling_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo Xin-tong-Jiang/Oil-Wells-Data-Wrangling
(PDF field extraction, CSV cleaning, normalization, upsert, enrichment
joins, serving queries), extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst can optimize; Python
UDFs appear only where semantics genuinely require them (Arrow-batched).
"""

from oil_wells_data_wrangling_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
