from redisgraph_spark.planner.planner import CypherPlanner

__all__ = ["CypherPlanner"]
