"""Plan inspection and auditing (scale-safety checks over Catalyst output)."""

from neuroimaging_data_pipeline_spark.plans.audit import (  # noqa: F401
    assert_plan,
    broadcast_join_count,
    exchange_count,
    explain_str,
    node_count,
    pushed_filters,
    python_eval_count,
    read_schemas,
    sortmerge_join_count,
)
