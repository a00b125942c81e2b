"""Query catalog: every operator the engine implements, as (Spark fn, oracle SQL) pairs.

Importing this package registers all catalog modules.
"""

from cloudfloe_spark.queries.catalog import (  # noqa: F401
    CatalogQuery,
    all_queries,
    oracle_map,
    query_map,
    register,
)

# Registration side effects — each module adds its queries to the registry.
from cloudfloe_spark.queries import relational  # noqa: F401, E402
from cloudfloe_spark.queries import joins  # noqa: F401, E402
from cloudfloe_spark.queries import windows  # noqa: F401, E402
from cloudfloe_spark.queries import dedup  # noqa: F401, E402
from cloudfloe_spark.queries import text  # noqa: F401, E402
from cloudfloe_spark.queries import similarity  # noqa: F401, E402
from cloudfloe_spark.queries import events  # noqa: F401, E402
from cloudfloe_spark.queries import multimodal  # noqa: F401, E402
from cloudfloe_spark.queries import timejoins  # noqa: F401, E402
from cloudfloe_spark.queries import extras  # noqa: F401, E402
from cloudfloe_spark.queries import pipeline  # noqa: F401, E402
from cloudfloe_spark.queries import streaming_twins  # noqa: F401, E402
from cloudfloe_spark.queries import tpch  # noqa: F401, E402
from cloudfloe_spark.queries import funcpack  # noqa: F401, E402
