from oil_wells_data_wrangling_spark.sources.readers import Tables, load_tables

__all__ = ["Tables", "load_tables"]
