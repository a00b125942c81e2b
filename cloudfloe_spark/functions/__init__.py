from cloudfloe_spark.functions import text, vectors  # noqa: F401
