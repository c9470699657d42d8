from model_presto_spark.plans.queries import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
