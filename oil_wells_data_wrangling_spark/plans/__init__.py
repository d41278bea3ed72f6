from oil_wells_data_wrangling_spark.plans.registry import (
    REGISTRY,
    Query,
    all_queries,
    all_oracle_sql,
    register,
)

__all__ = ["REGISTRY", "Query", "all_queries", "all_oracle_sql", "register"]
