"""Late-r4 SQL-surface registrations: CUBE grouping, exact
interpolated percentiles, and the ranking-window-function family.

The implementations live in ``queries/relational.py`` (they are
relational operators); they register HERE, after the window-priority
modules, so the driver's bounded 50-query correctness window keeps
the ts-repinned event-time queries this round planned for it
(VERDICT r3 #2). Their green rows are the sf0.01 + sf0.1 replica
runs recorded in SURVEY §8 — same policy as every other brand-new
late-r4 query.
"""

from __future__ import annotations

from neuroimaging_data_pipeline_spark.queries.relational import (
    A_CUBE_SQL,
    A_GROUPING_SETS_SQL,
    J9_SQL,
    J10_SQL,
    U3_SQL,
    A_PERCENTILES_SQL,
    O4_RANKS_SQL,
    P11_PIVOT_SQL,
    P12_UNPIVOT_SQL,
    a_cube,
    a_grouping_sets,
    j9_correlated_scalar,
    j10_having_join,
    a_percentiles,
    o4_window_ranks,
    p11_pivot,
    p12_unpivot,
    u3_except_all,
)

QUERIES = {
    "a_cube": a_cube,
    "a_grouping_sets": a_grouping_sets,
    "j9_correlated_scalar": j9_correlated_scalar,
    "j10_having_join": j10_having_join,
    "a_percentiles": a_percentiles,
    "o4_window_ranks": o4_window_ranks,
    "p11_pivot": p11_pivot,
    "p12_unpivot": p12_unpivot,
    "u3_except_all": u3_except_all,
}

ORACLE = {
    "a_cube": A_CUBE_SQL,
    "a_grouping_sets": A_GROUPING_SETS_SQL,
    "j9_correlated_scalar": J9_SQL,
    "j10_having_join": J10_SQL,
    "a_percentiles": A_PERCENTILES_SQL,
    "o4_window_ranks": O4_RANKS_SQL,
    "p11_pivot": P11_PIVOT_SQL,
    "p12_unpivot": P12_UNPIVOT_SQL,
    "u3_except_all": U3_SQL,
}
