from risinglight_spark.functions import scalar, text, vector  # noqa: F401
