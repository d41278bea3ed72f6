from oil_wells_data_wrangling_spark.functions.exact import dsum, dmean

__all__ = ["dsum", "dmean"]
