"""Pipeline definitions replicating the reference's four loads + ingest.

Each plan is a pure ``build_*`` transform (DataFrames in -> DataFrame out,
unit-testable without a catalog) plus a ``load_*`` wrapper that handles
table IO and the idempotency contract.
"""

from etl_opensky_spark.plans.dim_dates import build_dim_dates, load_dim_dates  # noqa: F401
from etl_opensky_spark.plans.dim_airports import build_dim_airports  # noqa: F401
from etl_opensky_spark.plans.dim_aircrafts import build_dim_aircrafts  # noqa: F401
from etl_opensky_spark.plans.fct_flights import build_fct_flights, load_fct_flights  # noqa: F401
from etl_opensky_spark.plans.ingest_flights import ingest_flights  # noqa: F401
from etl_opensky_spark.plans.runner import Pipeline, Task, TaskStatus  # noqa: F401
