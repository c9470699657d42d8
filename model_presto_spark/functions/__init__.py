from model_presto_spark.functions import bands, geo, text, vectors

__all__ = ["bands", "geo", "text", "vectors"]
