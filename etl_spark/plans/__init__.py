from etl_spark.plans.guard import assert_vectorized, executed_plan_str  # noqa: F401
