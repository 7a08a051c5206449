from vivace_graph_v3_spark.plans.inspect import (PlanFacts, assert_plan,
                                                 plan_facts)

__all__ = ["PlanFacts", "plan_facts", "assert_plan"]
