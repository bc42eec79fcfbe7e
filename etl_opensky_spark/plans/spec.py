"""Declarative pipeline specs: data-driven DAG definitions.

The reference defines its DAG in Python code (src/dags/flights_daily.py
operator chaining); production teams usually want the DAG as DATA — a
dict/JSON/YAML document reviewed like config — with the task bodies
resolved from a registry.  This module compiles such a spec into the
in-process :class:`~etl_opensky_spark.plans.runner.Pipeline`:

```python
spec = {
    "tasks": [
        {"name": "extract", "op": "extract_flights",
         "retries": 5, "retry_delay_s": 10.0},
        {"name": "dims", "op": "load_dims", "depends_on": ["extract"]},
        {"name": "fact", "op": "load_fact",
         "depends_on": ["extract", "dims"],
         "trigger_rule": "none_failed"},
    ]
}
pipeline = load_pipeline(spec, registry={"extract_flights": fn, ...})
pipeline.run()
```

Validation happens at LOAD time (unknown op, duplicate name, dangling
dependency, unknown key), not at run time — a bad spec fails before any
task executes.  Cycles are caught by the runner's topological sort.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from etl_opensky_spark.plans.runner import Pipeline, Task

_ALLOWED_KEYS = {
    "name", "op", "depends_on", "retries", "retry_delay_s", "trigger_rule"
}
_TRIGGER_RULES = {"all_success", "none_failed"}


def load_pipeline(
    spec: Mapping, registry: Mapping[str, Callable[[], object]]
) -> Pipeline:
    """Compile a spec dict into a runnable Pipeline; raises ValueError
    on any structural problem before anything runs."""
    tasks = spec.get("tasks")
    if not isinstance(tasks, list) or not tasks:
        raise ValueError("spec must contain a non-empty 'tasks' list")

    names = [t.get("name") for t in tasks]
    dup = {n for n in names if names.count(n) > 1}
    if dup:
        raise ValueError(f"duplicate task names: {sorted(dup)}")

    pipeline = Pipeline()
    for t in tasks:
        unknown = set(t) - _ALLOWED_KEYS
        if unknown:
            raise ValueError(
                f"task {t.get('name')!r}: unknown keys {sorted(unknown)}"
            )
        name, op = t.get("name"), t.get("op")
        if not name or not op:
            raise ValueError(f"task entry missing name/op: {t!r}")
        if op not in registry:
            raise ValueError(
                f"task {name!r}: op {op!r} not in registry "
                f"(available: {sorted(registry)})"
            )
        deps = list(t.get("depends_on", ()))
        dangling = [d for d in deps if d not in names]
        if dangling:
            raise ValueError(f"task {name!r}: unknown dependencies {dangling}")
        rule = t.get("trigger_rule", "all_success")
        if rule not in _TRIGGER_RULES:
            raise ValueError(
                f"task {name!r}: trigger_rule must be one of "
                f"{sorted(_TRIGGER_RULES)}"
            )
        pipeline.add(
            Task(
                name=name,
                fn=registry[op],
                depends_on=deps,
                retries=int(t.get("retries", 0)),
                retry_delay_s=float(t.get("retry_delay_s", 0.0)),
                trigger_rule=rule,
            )
        )
    return pipeline
