"""Composable DataFrame -> DataFrame operators (SURVEY.md §2 inventory)."""

from etl_opensky_spark.operators.projections import (  # noqa: F401
    drop_columns,
    rename_columns,
    select_columns,
    with_columns,
)
from etl_opensky_spark.operators.filters import (  # noqa: F401
    dropna_all,
    filter_partition,
    nullify_values,
    where_expr,
)
from etl_opensky_spark.operators.joins import (  # noqa: F401
    check_fk,
    fk_orphans,
    lookup_dim,
)
from etl_opensky_spark.operators.sets import (  # noqa: F401
    append_missing,
    union_by_name,
)
from etl_opensky_spark.operators.keys import (  # noqa: F401
    date_dim_id,
    surrogate_key,
)
from etl_opensky_spark.operators.reshape import (  # noqa: F401
    date_spine,
    melt,
)
from etl_opensky_spark.operators.aggregates import top_k_per_group  # noqa: F401
from etl_opensky_spark.operators.asof import asof_join  # noqa: F401
from etl_opensky_spark.operators.joins import salted_join  # noqa: F401
