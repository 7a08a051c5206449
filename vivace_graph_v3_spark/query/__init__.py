from vivace_graph_v3_spark.query.builder import Select, select
from vivace_graph_v3_spark.query.rules import (
    RuleEvaluator, clear_rules, def_rule,
)

__all__ = ["Select", "select", "def_rule", "clear_rules", "RuleEvaluator"]
