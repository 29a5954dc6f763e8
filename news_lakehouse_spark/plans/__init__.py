from news_lakehouse_spark.plans.silver import (  # noqa: F401
    SILVER_TABLES,
    build_silver_tables,
    normalize_bronze,
)
from news_lakehouse_spark.plans.gold import (  # noqa: F401
    GOLD_DIMS,
    GOLD_FACTS,
    build_gold_dimensions,
    build_gold_facts,
)
from news_lakehouse_spark.plans.flat_view import articles_flat_view  # noqa: F401
