from redisgraph_spark.cypher.parser import parse

__all__ = ["parse"]
