"""Full-catalog physical-plan lint (VERDICT r4 #3): every query in the
catalog is built at sf0.001 and its executed plan swept for scale
hazards (``plans.lint.plan_warnings``).  Any future query with an
unpushed filter, cartesian product, row-Python UDF, or unbounded
single-partition exchange fails here — unless its shape is explicitly
allowlisted below with the documented reason.

The allowlist encodes BOUNDED shapes the linter cannot know are bounded
(its job is to flag them; the docstrings of the queries carry the
boundedness proof):

- ``single-partition-exchange``: scalar/global aggregates over
  already-aggregated tiny tables (a handful of groups), driver-bounded
  top-k reads, or the bounded date spine.
- ``broadcast-nested-loop``: deliberate bounded fallbacks (grid-NN's
  unresolved-leftovers pass; interval joins against a broadcast list of
  a few hundred intervals).
- ``cartesian-product``: bounded self-pair constructions where both
  sides are provably tiny (e.g. 4x4 centroid pairs).
- ``full-width-scan``: gates that intentionally reconstruct a whole
  wide row (serde roundtrips, federated unions).
"""

from __future__ import annotations

import pytest

from etl_opensky_spark.plans.lint import plan_warnings
from etl_opensky_spark.queries import BENCH_ONLY_QUERIES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

CATALOG = {**QUERIES, **BENCH_ONLY_QUERIES}

#: query -> {warning-kind prefixes allowed}, with the boundedness reason.
ALLOW: dict[str, set[str]] = {}


def _kinds(warnings: list[str]) -> set[str]:
    return {w.split(":", 1)[0] for w in warnings}


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_catalog_plan_is_clean(spark, name):
    df = CATALOG[name](spark, SF_DIR)
    got = _kinds(plan_warnings(df))
    unexpected = got - ALLOW.get(name, set())
    assert not unexpected, (
        f"{name}: plan hazards {sorted(unexpected)} — fix the plan or "
        "allowlist with a documented boundedness proof"
    )
